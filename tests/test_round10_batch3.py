"""Round-10 candidate batch 3: Calinski-Harabasz, Hopkins statistic,
LOF outlier scores, link prediction, distinct-n diversity, temperature
scaling."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.analysis import distinct_ngrams
from nbdatatools_spark.operators.clustering import (
    calinski_harabasz,
    hopkins_statistic,
)
from nbdatatools_spark.operators.evaluation import temperature_scaling
from nbdatatools_spark.operators.graph import link_prediction
from nbdatatools_spark.operators.knn import lof_from_knn, lof_scores


def _emb(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )


# -- calinski-harabasz ---------------------------------------------------------


def test_ch_hand_computed_two_clusters(spark):
    # cluster 0 at {0, 2}, cluster 1 at {10, 12} on one axis
    pts = [[0.0], [2.0], [10.0], [12.0]]
    df = _emb(spark, pts).select(
        (F.col("vec_id") < 2).cast("int").alias("g"), "embedding"
    )
    row = calinski_harabasz(df, "g").collect()[0]
    # centroids 1 and 11, global 6; B = 2*25 + 2*25 = 100; W = 4*1 = 4
    assert row["k"] == 2 and row["n"] == 4
    assert abs(row["between_ss"] - 100.0) < 1e-6
    assert abs(row["within_ss"] - 4.0) < 1e-6
    # CH = (100/1) / (4/2) = 50
    assert abs(row["ch_index"] - 50.0) < 1e-6


def test_ch_separation_ordering_and_degenerate(spark):
    import random

    rng = random.Random(7)
    pts = [[rng.gauss(0, 1), rng.gauss(0, 1)] for _ in range(40)] + [
        [rng.gauss(20, 1), rng.gauss(20, 1)] for _ in range(40)
    ]
    good = _emb(spark, pts).select(
        (F.col("vec_id") < 40).cast("int").alias("g"), "embedding"
    )
    bad = _emb(spark, pts).select(
        (F.col("vec_id") % 2).cast("int").alias("g"), "embedding"
    )
    ch_good = calinski_harabasz(good, "g").collect()[0]["ch_index"]
    ch_bad = calinski_harabasz(bad, "g").collect()[0]["ch_index"]
    assert ch_good > 100 * ch_bad
    # single cluster: no variance ratio
    one = _emb(spark, pts[:5]).select(F.lit(0).alias("g"), "embedding")
    assert calinski_harabasz(one, "g").collect()[0]["ch_index"] is None


# -- hopkins -------------------------------------------------------------------


def _md5_frac(seed, j, i):
    h = hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()
    return int(h[:13], 16) / float(1 << 52)


def _md5_key(v, seed):
    return int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:13], 16)


def test_hopkins_python_differential(spark):
    import random

    rng = random.Random(3)
    pts = [[round(rng.uniform(0, 10), 3), round(rng.uniform(0, 10), 3)]
           for _ in range(60)]
    m, seed = 8, 42
    row = hopkins_statistic(_emb(spark, pts), m=m, seed=seed).collect()[0]

    ids = sorted(range(len(pts)), key=lambda i: (_md5_key(i, seed), i))[:m]
    lo = [min(p[d] for p in pts) for d in range(2)]
    hi = [max(p[d] for p in pts) for d in range(2)]
    uni = [
        [round(lo[d] + _md5_frac(seed, j, d) * (hi[d] - lo[d]), 6)
         for d in range(2)]
        for j in range(m)
    ]

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    su = sum(min(d(u, p) for p in pts) for u in uni)
    sw = sum(
        min(d(pts[i], pts[j]) for j in range(len(pts)) if j != i)
        for i in ids
    )
    assert abs(row["sum_u"] - su) < 1e-5
    assert abs(row["sum_w"] - sw) < 1e-5
    assert abs(row["hopkins"] - su / (su + sw)) < 1e-5


def test_hopkins_separates_clustered_from_uniform(spark):
    import random

    rng = random.Random(11)
    # tight blobs -> H near 1; uniform box -> H near 0.5
    blobs = [
        [c + rng.gauss(0, 0.01), c + rng.gauss(0, 0.01)]
        for _ in range(50)
        for c in (0.0, 100.0)
    ]
    unif = [[rng.uniform(0, 10), rng.uniform(0, 10)] for _ in range(100)]
    h_blob = hopkins_statistic(_emb(spark, blobs), m=10).collect()[0]["hopkins"]
    h_unif = hopkins_statistic(_emb(spark, unif), m=10).collect()[0]["hopkins"]
    assert h_blob > 0.9
    assert 0.3 < h_unif < 0.75
    # degenerate: n <= m has no held-out mass to measure against
    tiny = hopkins_statistic(_emb(spark, unif[:5]), m=10).collect()[0]
    assert tiny["hopkins"] is None


# -- link prediction ------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_link_prediction_hand_computed_path(spark):
    # path 1-2-3: the only distance-2 non-edge is (1,3) through 2
    out = link_prediction(_edges(spark, [(1, 2), (2, 3)])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["node_a"], r["node_b"]) == (1, 3)
    assert r["common_neighbors"] == 1
    # deg(1)=deg(3)=1, cn=1 -> jaccard = 1/(1+1-1) = 1
    assert abs(r["jaccard"] - 1.0) < 1e-9
    assert abs(r["adamic_adar"] - 1.0 / math.log(2.0)) < 1e-6


def test_link_prediction_excludes_edges_and_orientation_invariant(spark):
    # square 1-2-3-4-1 plus diagonal 1-3: candidates = (2,4) only
    base = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    out1 = {
        (r["node_a"], r["node_b"]): r["common_neighbors"]
        for r in link_prediction(_edges(spark, base)).collect()
    }
    assert out1 == {(2, 4): 2}
    # both orientations + duplicates must not change scores
    noisy = base + [(b, a) for a, b in base] + base
    out2 = {
        (r["node_a"], r["node_b"]): r["common_neighbors"]
        for r in link_prediction(_edges(spark, noisy)).collect()
    }
    assert out2 == out1


def test_link_prediction_top_n_ordering(spark):
    # star center 0 with leaves 1..5: all leaf pairs share exactly {0}
    star = [(0, i) for i in range(1, 6)]
    out = link_prediction(_edges(spark, star), top_n=3).collect()
    assert len(out) == 3
    assert [(r["node_a"], r["node_b"]) for r in out] == [
        (1, 2), (1, 3), (1, 4)
    ]


# -- LOF -------------------------------------------------------------------------


def _lof_python(pts, k):
    n = len(pts)

    def d(a, b):
        return round(
            math.sqrt(sum(round((x - y) ** 2, 9) for x, y in zip(a, b))), 9
        )

    nn = {}
    for i in range(n):
        cand = sorted(
            ((d(pts[i], pts[j]), j) for j in range(n) if j != i)
        )[:k]
        nn[i] = cand
    kd = {i: max(dd for dd, _ in nn[i]) for i in range(n)}
    lrd = {}
    for i in range(n):
        rs = sum(max(dd, kd[j]) for dd, j in nn[i])
        lrd[i] = round(k / rs, 9) if rs > 0 else None
    lof = {}
    for i in range(n):
        if lrd[i] is None or any(lrd[j] is None for _, j in nn[i]):
            lof[i] = None
        else:
            lof[i] = sum(lrd[j] for _, j in nn[i]) / k / lrd[i]
    return kd, lrd, lof


def test_lof_python_differential(spark):
    import random

    rng = random.Random(5)
    pts = [[round(rng.gauss(0, 1), 3), round(rng.gauss(0, 1), 3)]
           for _ in range(40)] + [[50.0, 50.0]]
    rows = lof_scores(_emb(spark, pts), k=3).collect()
    kd, lrd, lof = _lof_python(pts, 3)
    for r in rows:
        i = r["id"]
        assert abs(r["k_distance"] - kd[i]) < 1e-6
        assert abs(r["lrd"] - lrd[i]) < 1e-6
        assert abs(r["lof"] - lof[i]) < 1e-5
    # the planted far point is a strong outlier; inliers hover near 1
    by_id = {r["id"]: r["lof"] for r in rows}
    assert by_id[40] > 3.0
    inliers = [v for i, v in by_id.items() if i != 40]
    assert sum(1 for v in inliers if 0.5 < v < 2.5) >= 35


def test_lof_coincident_points_flagged(spark):
    pts = [[0.0, 0.0]] * 4 + [[1.0, 1.0]]
    rows = {r["id"]: r for r in lof_scores(_emb(spark, pts), k=3).collect()}
    # the 4 coincident points have zero reach sums -> infinite lrd
    for i in range(4):
        assert rows[i]["coincident"] is True
        assert rows[i]["lof"] is None
    # the separate point is finite but its neighbors are coincident
    assert rows[4]["coincident"] is False
    assert rows[4]["lof"] is None


def test_lof_from_knn_validates_k(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.5)], "id long, nbr long, dist double"
    )
    with pytest.raises(ValueError):
        lof_from_knn(pairs, k=0)


# -- distinct-n ------------------------------------------------------------------


def test_distinct_ngrams_hand_computed(spark):
    df = spark.createDataFrame(
        [("a", "the cat sat"), ("a", "the cat ran"), ("b", "x")],
        "source string, text string",
    )
    out = {
        (r["source"], r["n"]): r
        for r in distinct_ngrams(df, "source", "text").collect()
    }
    # a: tokens 6, types {the,cat,sat,ran} = 4
    assert out[("a", 1)]["total_ngrams"] == 6
    assert out[("a", 1)]["distinct_ngrams"] == 4
    # a: bigrams {the cat}x2, {cat sat}, {cat ran} -> 4 total, 3 types
    assert out[("a", 2)]["total_ngrams"] == 4
    assert out[("a", 2)]["distinct_ngrams"] == 3
    assert abs(out[("a", 2)]["distinct_ratio"] - 0.75) < 1e-9
    # a: trigrams 2 total 2 types
    assert out[("a", 3)]["total_ngrams"] == 2
    # b is 1 token: no bigram/trigram rows
    assert ("b", 2) not in out and ("b", 3) not in out
    assert out[("b", 1)]["total_ngrams"] == 1


def test_distinct_ngrams_validates_orders(spark):
    df = spark.createDataFrame([("a", "x y")], "source string, text string")
    with pytest.raises(ValueError):
        distinct_ngrams(df, "source", "text", ns=[0])


# -- temperature scaling ---------------------------------------------------------


def _temp_python(scores, ys, iterations=5, eps=1e-6):
    ls = [
        round(math.log(min(max(s, eps), 1 - eps)
                       / (1 - min(max(s, eps), 1 - eps))), 9)
        for s in scores
    ]
    b = 1.0
    for _ in range(iterations):
        g = h = 0.0
        for l, y in zip(ls, ys):
            p = 1.0 / (1.0 + math.exp(-b * l))
            g += round((p - y) * l, 9)
            h += round(p * (1 - p) * l * l, 9)
        if h > 0:
            b = round(b - g / h, 9)
    return b


def test_temperature_python_differential(spark):
    import random

    rng = random.Random(13)
    # overconfident scores: true probability is sigmoid(l/2)
    rows = []
    for _ in range(400):
        l = rng.gauss(0, 2)
        p_true = 1.0 / (1.0 + math.exp(-l / 2))
        y = 1 if rng.random() < p_true else 0
        s = round(1.0 / (1.0 + math.exp(-l)), 6)
        rows.append((s, y))
    df = spark.createDataFrame(rows, "score double, y int")
    got = temperature_scaling(df, "score", "y").collect()[0]
    b_py = _temp_python([r[0] for r in rows], [r[1] for r in rows])
    assert abs(got["beta"] - round(b_py, 6)) < 2e-6
    # generated at T=2: the fit recovers an overconfidence temperature
    assert 1.4 < got["temperature"] < 2.8
    assert got["nll_after"] <= got["nll_before"] + 1e-9
    assert got["n"] == 400 and got["n_pos"] == sum(r[1] for r in rows)


def test_temperature_identity_when_calibrated(spark):
    import random

    rng = random.Random(17)
    rows = []
    for _ in range(600):
        l = rng.gauss(0, 1.5)
        p = 1.0 / (1.0 + math.exp(-l))
        rows.append((round(p, 6), 1 if rng.random() < p else 0))
    df = spark.createDataFrame(rows, "score double, y int")
    got = temperature_scaling(df, "score", "y").collect()[0]
    assert 0.8 < got["temperature"] < 1.25


def test_temperature_degenerate_labels_keep_beta(spark):
    df = spark.createDataFrame(
        [(0.5, 1), (0.5, 1), (0.5, 1)], "score double, y int"
    )
    got = temperature_scaling(df, "score", "y").collect()[0]
    # logits all 0 -> Hessian 0 every step -> beta stays 1
    assert got["beta"] == 1.0 and got["temperature"] == 1.0
    with pytest.raises(ValueError):
        temperature_scaling(df, "score", "y", iterations=0)


def test_link_prediction_z_degree_cap(spark):
    # hub 0 connects to 1..6 (deg 7 > cap); side chain 1-2-3 gives z=2
    # with deg 3 <= cap. Capped run keeps only wedges through node 2.
    hub = [(0, i) for i in range(1, 7)] + [(1, 2), (2, 3)]
    capped = link_prediction(
        _edges(spark, hub), top_n=100, max_z_degree=3
    ).collect()
    pairs = {(r["node_a"], r["node_b"]) for r in capped}
    assert pairs == {(1, 3)}
    # endpoint degrees for Jaccard come from the FULL graph: deg(1)=3
    # (0, 2 and the hub edge... 1 connects to 0 and 2), deg(3)=2 (0, 2)
    r = capped[0]
    # 1: neighbors {0, 2}; 3: neighbors {0, 2}; cn via capped z = 1
    assert r["common_neighbors"] == 1
    assert abs(r["jaccard"] - 1 / (2 + 2 - 1)) < 1e-6
    # uncapped run also surfaces hub-centered candidates
    full = link_prediction(_edges(spark, hub), top_n=100).collect()
    assert len(full) > len(capped)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        link_prediction(_edges(spark, hub), max_z_degree=1)
