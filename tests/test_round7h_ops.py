"""Round-8 candidate batch 1: HITS, label propagation, k-center coreset
selection, exact cosine-threshold similarity join, metadata mutual
information, negative-sampling table, burstiness, compression ratio."""

import math
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# graph: HITS
# ---------------------------------------------------------------------------

def test_hits_star_graph(spark):
    """Hub pointing at many authorities: the center is the top hub, leaves
    the top authorities; leaf scores are equal by symmetry."""
    from nbdatatools_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [("h", "a1"), ("h", "a2"), ("h", "a3")], "src string, dst string"
    )
    rows = {r["node"]: r for r in hits_scores(edges, iterations=4).collect()}
    assert rows["h"]["hub"] == pytest.approx(1.0, abs=1e-6)
    assert rows["h"]["authority"] == 0.0
    leaf_auth = {rows[f"a{i}"]["authority"] for i in (1, 2, 3)}
    assert len(leaf_auth) == 1  # symmetric leaves agree exactly
    assert leaf_auth.pop() == pytest.approx(1 / math.sqrt(3), abs=1e-6)
    for i in (1, 2, 3):
        assert rows[f"a{i}"]["hub"] == 0.0


def test_hits_numpy_differential(spark):
    """Fixed-iteration HITS matches a numpy power iteration with the same
    rounding discipline on a small random-ish digraph."""
    import numpy as np

    from nbdatatools_spark.operators.graph import hits_scores

    pairs = [(i, (i * 7 + 3) % 11) for i in range(11)] + [
        (i, (i * 5 + 1) % 11) for i in range(11)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, "src int, dst int")
    got = {
        r["node"]: (r["authority"], r["hub"])
        for r in hits_scores(edges, iterations=5).collect()
    }

    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in set(pairs):
        A[idx[a], idx[b]] = 1.0
    h = np.ones(len(nodes))
    a = np.ones(len(nodes))
    for _ in range(5):
        a = A.T @ np.round(h, 9)
        n = math.sqrt(float(np.sum(np.round(a * a, 9))))
        a = np.round(a / n, 9) if n > 0 else a * 0.0
        h = A @ np.round(a, 9)
        n = math.sqrt(float(np.sum(np.round(h * h, 9))))
        h = np.round(h / n, 9) if n > 0 else h * 0.0
    for n_ in nodes:
        assert got[n_][0] == pytest.approx(a[idx[n_]], abs=2e-6)
        assert got[n_][1] == pytest.approx(h[idx[n_]], abs=2e-6)


def test_hits_rejects_bad_iterations(spark):
    from nbdatatools_spark.operators.graph import hits_scores

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        hits_scores(edges, iterations=0)


# ---------------------------------------------------------------------------
# graph: label propagation
# ---------------------------------------------------------------------------

def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge resolve to two communities
    labeled by their minimum member."""
    from nbdatatools_spark.operators.graph import label_propagation

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(tri1 + tri2 + [(3, 10)], "src int, dst int")
    rows = {r["node"]: r["community"] for r in
            label_propagation(edges, iterations=5).collect()}
    assert rows[1] == rows[2] == rows[3] == 1
    assert rows[10] == rows[11] == rows[12]
    assert rows[10] != rows[1]


def test_label_propagation_deterministic_and_undirected(spark):
    from nbdatatools_spark.operators.graph import label_propagation

    e1 = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    e2 = spark.createDataFrame([(2, 1), (3, 2), (1, 2)], "src int, dst int")
    a = sorted(map(tuple, label_propagation(e1, iterations=3).collect()))
    b = sorted(map(tuple, label_propagation(e2, iterations=3).collect()))
    assert a == b  # orientation + duplicate edges don't matter


# ---------------------------------------------------------------------------
# clustering: k-center greedy selection
# ---------------------------------------------------------------------------

def test_kcenter_picks_spread_points(spark):
    """Three tight blobs, k=3: one center from each blob, seed = min id."""
    from nbdatatools_spark.operators.clustering import kcenter_select

    rows = []
    for b, (cx, cy) in enumerate([(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]):
        for j in range(5):
            rows.append((b * 10 + j, [cx + j * 0.01, cy + j * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sel = kcenter_select(df, k=3).collect()
    assert [r["rank"] for r in sel] == [1, 2, 3]
    assert sel[0]["vec_id"] == 0 and sel[0]["sq_dist"] is None
    blobs = {r["vec_id"] // 10 for r in sel}
    assert blobs == {0, 1, 2}
    # sq_dist non-increasing after the seed
    assert sel[1]["sq_dist"] >= sel[2]["sq_dist"]


def test_kcenter_exhausts_small_input(spark):
    from nbdatatools_spark.operators.clustering import kcenter_select

    df = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0])], "vec_id long, embedding array<float>"
    )
    sel = kcenter_select(df, k=5).collect()
    assert len(sel) == 2
    assert {r["vec_id"] for r in sel} == {1, 2}
    with pytest.raises(ValueError):
        kcenter_select(df, k=0)


def test_kcenter_matches_numpy_greedy(spark, embeddings):
    """Greedy selection matches a numpy farthest-point run with the same
    rounding + tie-break on real embeddings."""
    import numpy as np

    from nbdatatools_spark.operators.clustering import kcenter_select

    sub = embeddings.where(F.col("vec_id") < 120)
    got = [(r["rank"], r["vec_id"]) for r in kcenter_select(sub, k=6).collect()]

    rows = sub.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    ss = (X * X).sum(axis=1)
    chosen = [0]
    mind = None
    for _ in range(5):
        c = X[chosen[-1]]
        d = np.round(np.maximum(0.0, ss - 2 * (X @ c) + float(c @ c)), 9)
        mind = d if mind is None else np.minimum(mind, d)
        mask = np.ones(len(ids), bool)
        mask[chosen] = False
        cand = np.where(mask)[0]
        best = cand[np.lexsort((ids[cand], -mind[cand]))][0]
        chosen.append(int(best))
    want = [(i + 1, int(ids[j])) for i, j in enumerate(chosen)]
    assert got == want


# ---------------------------------------------------------------------------
# dedup: exact cosine-threshold similarity join (prefix filtering)
# ---------------------------------------------------------------------------

def _brute_cosine_pairs(spark, docs, threshold):
    """All-pairs shared-token join with the operator's exact rounding
    discipline — the no-filter oracle."""
    from nbdatatools_spark.functions.text import tokens

    tf = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(tokens(F.lower(F.col("text")))).alias("t"),
        )
        .where(F.col("t") != "")
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    nrm = tf.groupBy("id").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf")).cast("double")).alias("n")
    )
    w = tf.join(nrm, "id").select(
        "id", "t", (F.col("tf").cast("double") / F.col("n")).alias("w")
    )
    a = w.select(F.col("id").alias("id_a"), "t", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("id_b"), "t", F.col("w").alias("wb"))
    return (
        a.join(b, "t")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.round(F.col("wa") * F.col("wb"), 9).cast("decimal(20,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            .alias("c")
        )
        .where(F.col("c") >= threshold)
        .select("id_a", "id_b", F.round("c", 6).alias("cosine"))
    )


@pytest.mark.parametrize("threshold", [0.7, 0.9])
def test_cosine_threshold_pairs_matches_brute_force(spark, documents, threshold):
    from nbdatatools_spark.operators.dedup import cosine_threshold_pairs

    docs = documents.where(F.col("doc_id") < 150)
    got = sorted(map(tuple, cosine_threshold_pairs(docs, threshold).collect()))
    want = sorted(map(tuple, _brute_cosine_pairs(spark, docs, threshold).collect()))
    assert got == want
    assert len(got) > 0  # replica-heavy synthetic corpus has near-dups


def test_cosine_threshold_pairs_finds_planted_dup(spark):
    from nbdatatools_spark.operators.dedup import cosine_threshold_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "one two three four five six"),
            (4, "alpha beta gamma delta epsilon"),  # exact dup of 1
        ],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in cosine_threshold_pairs(docs, 0.8).collect()}
    assert got[(1, 4)] == pytest.approx(1.0, abs=1e-6)
    assert (1, 2) in got and (2, 4) in got
    assert all(a != 3 and b != 3 for a, b in got)
    with pytest.raises(ValueError):
        cosine_threshold_pairs(docs, 0.0)


# ---------------------------------------------------------------------------
# quality_checks: mutual information
# ---------------------------------------------------------------------------

def test_mutual_information_independent_and_identical(spark):
    from nbdatatools_spark.operators.quality_checks import mutual_information

    # perfectly dependent: X == Y -> MI == H(X), NMI == 1
    same = spark.createDataFrame(
        [(str(i % 4), str(i % 4)) for i in range(100)], "a string, b string"
    )
    r = mutual_information(same, "a", "b").collect()[0]
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)
    assert r["mi"] == pytest.approx(r["h_a"], abs=1e-6)

    # independent uniform grid -> MI == 0
    grid = spark.createDataFrame(
        [(str(i % 4), str(j % 5)) for i in range(4) for j in range(5)],
        "a string, b string",
    )
    r = mutual_information(grid, "a", "b").collect()[0]
    assert r["mi"] == pytest.approx(0.0, abs=1e-6)
    assert r["nmi"] == pytest.approx(0.0, abs=1e-6)


def test_mutual_information_scipy_free_differential(spark):
    """MI on a skewed table matches a pure-Python computation."""
    from collections import Counter

    from nbdatatools_spark.operators.quality_checks import mutual_information

    data = [("x" if i % 3 else "y", "p" if i % 2 else "q") for i in range(60)]
    df = spark.createDataFrame(data, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]

    n = len(data)
    ca, cb, cab = Counter(), Counter(), Counter()
    for a, b in data:
        ca[a] += 1
        cb[b] += 1
        cab[(a, b)] += 1
    mi = sum(
        round((o / n) * math.log(o * n / (ca[a] * cb[b])), 9)
        for (a, b), o in cab.items()
    )
    assert r["mi"] == pytest.approx(mi, abs=1e-6)
    assert r["n"] == n and r["levels_a"] == 2 and r["levels_b"] == 2


def test_mutual_information_constant_column_null_nmi(spark):
    from nbdatatools_spark.operators.quality_checks import mutual_information

    df = spark.createDataFrame(
        [("k", str(i % 3)) for i in range(30)], "a string, b string"
    )
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["h_a"] == 0.0 and r["nmi"] is None


# ---------------------------------------------------------------------------
# lm: negative-sampling table
# ---------------------------------------------------------------------------

def test_negative_sampling_table_weights(spark):
    from nbdatatools_spark.operators.lm import negative_sampling_table

    docs = spark.createDataFrame(
        [(1, "a a a a b b c")], "doc_id long, text string"
    )
    rows = negative_sampling_table(docs, vocab_size=10).collect()
    assert [r["token"] for r in rows] == ["a", "b", "c"]
    z = 4**0.75 + 2**0.75 + 1.0
    assert rows[0]["weight"] == pytest.approx(4**0.75 / z, abs=1e-8)
    assert rows[-1]["cum_weight"] == pytest.approx(1.0, abs=1e-8)
    cums = [r["cum_weight"] for r in rows]
    assert cums == sorted(cums)
    with pytest.raises(ValueError):
        negative_sampling_table(docs, vocab_size=0)


def test_negative_sampling_table_vocab_cut_and_order(spark, documents):
    from nbdatatools_spark.operators.lm import negative_sampling_table

    rows = negative_sampling_table(documents, vocab_size=16).collect()
    assert len(rows) == 16
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert [r["rank"] for r in rows] == list(range(1, 17))


# ---------------------------------------------------------------------------
# temporal: burstiness
# ---------------------------------------------------------------------------

def test_burstiness_regular_clock_is_minus_one(spark):
    import datetime

    from nbdatatools_spark.operators.temporal import burstiness

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0 + datetime.timedelta(seconds=60 * i)) for i in range(10)]
    rows += [(2, t0), (2, t0 + datetime.timedelta(seconds=1)),
             (2, t0 + datetime.timedelta(seconds=100)),
             (2, t0 + datetime.timedelta(seconds=101))]
    rows += [(3, t0)]  # below min_events -> dropped
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["user_id"]: r for r in burstiness(df, min_events=3).collect()}
    assert set(got) == {1, 2}
    assert got[1]["burstiness"] == pytest.approx(-1.0, abs=1e-9)
    assert got[1]["mean_gap_s"] == pytest.approx(60.0)
    assert got[2]["burstiness"] > 0.1  # bursty pattern
    # differential for user 2: gaps 1, 99, 1 seconds
    g = [1.0, 99.0, 1.0]
    mu = sum(g) / 3
    sig = math.sqrt(sum(x * x for x in g) / 3 - mu * mu)
    assert got[2]["burstiness"] == pytest.approx((sig - mu) / (sig + mu), abs=1e-6)


def test_burstiness_on_events(spark, sf_dir):
    from nbdatatools_spark.operators.temporal import burstiness

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out = burstiness(ev, min_events=3)
    rows = out.collect()
    assert len(rows) > 0
    assert all(-1.0 <= r["burstiness"] <= 1.0 for r in rows if r["burstiness"] is not None)


# ---------------------------------------------------------------------------
# text: compression ratio
# ---------------------------------------------------------------------------

def test_compression_ratio_orders_repetitive_below_diverse(spark):
    import zlib

    from nbdatatools_spark.functions.text import compression_ratio

    rep = "spam ham " * 200
    div = " ".join(f"w{i * 977 % 7919}" for i in range(400))
    df = spark.createDataFrame(
        [(1, rep), (2, div), (3, ""), (4, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["cr"] for r in
           df.select("doc_id", compression_ratio(F.col("text")).alias("cr")).collect()}
    assert got[1] < got[2]
    assert got[3] is None and got[4] is None
    want = round(len(zlib.compress(rep.encode(), 6)) / len(rep.encode()), 6)
    assert got[1] == pytest.approx(want, abs=1e-9)


def test_cosine_threshold_pairs_max_posting_cap(spark):
    """The cap drops candidates only through over-cap prefix postings:
    capped output is a subset of exact, and pairs whose shared prefix
    tokens sit in small postings survive."""
    from nbdatatools_spark.operators.dedup import cosine_threshold_pairs

    # 20 docs sharing a common token + 2 planted near-dups on rare tokens
    rows = [(i, f"common{i % 2} shared filler{i}") for i in range(20)]
    rows += [(100, "rareq rarew raree rarer"), (101, "rareq rarew raree rarex")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {(r["id_a"], r["id_b"])
             for r in cosine_threshold_pairs(docs, 0.7).collect()}
    capped = {(r["id_a"], r["id_b"])
              for r in cosine_threshold_pairs(docs, 0.7, max_posting=3).collect()}
    assert capped <= exact
    assert (100, 101) in capped  # rare-token prefix posting is under cap
