"""DBSCAN differential vs a pure-Python reference, plus Welch ANOVA and
Cramér's V closed-form checks (round-8 batch 3)."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.clustering import dbscan, dbscan_from_pairs


def _py_dbscan(points, eps, min_pts):
    """Classic DBSCAN on euclidean 2-D points; labels = min reachable
    core id (matching the engine's min-label convention)."""
    import numpy as np

    X = np.asarray(points, dtype=float)
    n = len(X)
    d = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1) ** 0.5
    neigh = [set(j for j in range(n) if j != i and d[i, j] <= eps) for i in range(n)]
    core = {i for i in range(n) if len(neigh[i]) + 1 >= min_pts}
    # components over core-core edges, min-label
    label = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in neigh[i]:
                if j in core and label[j] < label[i]:
                    label[i] = label[j]
                    changed = True
    out = {}
    for i in range(n):
        if i in core:
            out[i] = (label[i], "core")
        else:
            cs = [label[j] for j in neigh[i] if j in core]
            out[i] = (min(cs), "border") if cs else (None, "noise")
    return out


def _pairs_df(spark, points, eps):
    rows = []
    for i in range(len(points)):
        for j in range(i + 1, len(points)):
            d = math.dist(points[i], points[j])
            if d <= eps:
                rows.append((i, j))
    return spark.createDataFrame(rows or [(0, 0)], "id_a long, id_b long").where(
        F.col("id_a") != F.col("id_b")
    )


def _points_df(spark, points):
    return spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(points)],
        "vec_id long, embedding array<double>",
    )


def test_dbscan_two_blobs_and_noise(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    blob1 = rng.randn(15, 2) * 0.2
    blob2 = rng.randn(15, 2) * 0.2 + [10, 10]
    noise = [[5.0, 5.0], [-8.0, 7.0]]
    pts = [list(p) for p in blob1] + [list(p) for p in blob2] + noise
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan_from_pairs(
            _points_df(spark, pts), _pairs_df(spark, pts, 1.0), min_pts=4
        ).collect()
    }
    expect = _py_dbscan(pts, 1.0, 4)
    assert got == expect
    clusters = {c for c, role in got.values() if c is not None}
    assert len(clusters) == 2
    assert got[30] == (None, "noise") and got[31] == (None, "noise")


def test_dbscan_differential_random(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    pts = [list(p) for p in rng.rand(60, 2) * 4]
    for eps, mp in ((0.5, 3), (0.7, 5)):
        got = {
            r["id"]: (r["cluster"], r["role"])
            for r in dbscan_from_pairs(
                _points_df(spark, pts), _pairs_df(spark, pts, eps), min_pts=mp
            ).collect()
        }
        assert got == _py_dbscan(pts, eps, mp), (eps, mp)


def test_dbscan_cosine_wrapper(spark, embeddings):
    sub = embeddings.where(F.col("vec_id") < 120)
    out = dbscan(sub, eps_cosine=0.7, min_pts=4, method="exact").collect()
    assert len(out) == sub.count()
    roles = {r["role"] for r in out}
    assert roles <= {"core", "border", "noise"}
    for r in out:
        assert (r["cluster"] is None) == (r["role"] == "noise")
    # cluster label is the min member id of its core set
    by_cluster = {}
    for r in out:
        if r["cluster"] is not None and r["role"] == "core":
            by_cluster.setdefault(r["cluster"], []).append(r["id"])
    for c, members in by_cluster.items():
        assert c == min(members)


def test_dbscan_all_noise_and_all_core(spark):
    pts = [[float(i * 100), 0.0] for i in range(8)]  # far apart
    got = dbscan_from_pairs(
        _points_df(spark, pts), _pairs_df(spark, pts, 1.0), min_pts=2
    ).collect()
    assert all(r["role"] == "noise" for r in got)
    pts = [[float(i) * 0.01, 0.0] for i in range(8)]  # one dense run
    got = dbscan_from_pairs(
        _points_df(spark, pts), _pairs_df(spark, pts, 1.0), min_pts=3
    ).collect()
    assert all(r["role"] == "core" and r["cluster"] == 0 for r in got)


def test_welch_anova_closed_form(spark):
    from nbdatatools_spark.operators.stats import welch_anova

    data = {
        "a": [1.0, 2.0, 3.0, 4.0, 5.0],
        "b": [2.0, 4.0, 6.0, 8.0, 10.0],
        "c": [10.0, 20.0, 30.0, 40.0, 50.0],
    }
    rows = [("g", c, v) for c, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    r = welch_anova(df, "g", "c", "v").collect()[0]
    # pure-Python replica
    import statistics

    w, m, hsum = {}, {}, 0.0
    for c, vs in data.items():
        m[c] = sum(vs) / len(vs)
        w[c] = len(vs) / statistics.variance(vs)
    W = sum(w.values())
    xw = sum(w[c] * m[c] for c in data) / W
    k = 3
    A = sum(w[c] * (m[c] - xw) ** 2 for c in data) / (k - 1)
    H = sum((1 - w[c] / W) ** 2 / (len(data[c]) - 1) for c in data)
    B = 1 + 2 * (k - 2) / (k * k - 1) * H
    assert (r["k_classes"], r["k_dropped"], r["n"]) == (3, 0, 15)
    assert abs(r["f_stat"] - A / B) < 1e-4
    assert abs(r["df2"] - (k * k - 1) / (3 * H)) < 1e-3


def test_welch_anova_drops_degenerate_classes(spark):
    from nbdatatools_spark.operators.stats import welch_anova

    rows = [("g", "a", float(v)) for v in (1, 2, 3, 4)] + [
        ("g", "b", float(v)) for v in (5, 6, 7, 8)
    ]
    rows += [("g", "const", 9.0)] * 5  # zero variance
    rows += [("g", "single", 1.0)]  # n < 2
    df = spark.createDataFrame(rows, "g string, c string, v double")
    r = welch_anova(df, "g", "c", "v").collect()[0]
    assert r["k_classes"] == 2
    assert r["k_dropped"] == 2


def test_cramers_v_closed_forms(spark):
    from nbdatatools_spark.operators.stats import cramers_v

    # perfect association: a == b -> V = 1
    rows = [(str(i % 3), str(i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b", corrected=True).collect()[0]
    assert r["v"] == 1.0
    assert abs(r["chi2"] - 2 * 90) < 1e-6  # chi2 = n*min(r-1,c-1) at V=1
    # independence by construction: V near 0, corrected clamps at 0
    rows = [(str(i % 2), str(i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["chi2"] < 1e-6
    assert r["v"] == 0.0 and r["v_corrected"] == 0.0


def test_cramers_v_numpy_differential(spark):
    import numpy as np
    from nbdatatools_spark.operators.stats import cramers_v

    rng = np.random.RandomState(7)
    rows = [
        (str(rng.randint(0, 4)), str(rng.randint(0, 6))) for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    avals = sorted({a for a, _ in rows})
    bvals = sorted({b for _, b in rows})
    tab = np.zeros((len(avals), len(bvals)))
    for a, b in rows:
        tab[avals.index(a), bvals.index(b)] += 1
    n = tab.sum()
    e = tab.sum(1, keepdims=True) * tab.sum(0, keepdims=True) / n
    chi2 = ((tab - e) ** 2 / e).sum()
    assert abs(r["chi2"] - chi2) < 1e-4
    v = math.sqrt(chi2 / n / min(len(avals) - 1, len(bvals) - 1))
    assert abs(r["v"] - v) < 1e-6


def test_cramers_v_degenerate_inputs(spark):
    from nbdatatools_spark.operators.stats import cramers_v

    one = spark.createDataFrame([("x", "y")], "a string, b string")
    r = cramers_v(one, "a", "b").collect()[0]
    assert r["n"] == 1 and r["v"] is None and r["v_corrected"] is None
    single_level = spark.createDataFrame(
        [("x", str(i % 3)) for i in range(9)], "a string, b string"
    )
    r = cramers_v(single_level, "a", "b").collect()[0]
    assert r["v"] is None  # min(r-1, c-1) == 0


def test_two_sample_distance_tiny_side_null(spark):
    from nbdatatools_spark.operators.stats import two_sample_distance

    a = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    b = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [1.0, 1.0]), (12, [2.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    r = two_sample_distance(a, b, sample_size=8).collect()[0]
    assert r["n_a"] == 1
    assert r["mmd2"] is None and r["energy"] is None


def test_fleiss_kappa_single_rater_panel(spark):
    from nbdatatools_spark.operators.evaluation import fleiss_kappa

    rows = [(i, "r0", str(i % 2)) for i in range(10)]
    df = spark.createDataFrame(rows, "item long, rater string, cat string")
    out = fleiss_kappa(df, "item", "rater", "cat").collect()[0]
    assert out["n_raters"] == 1
    assert out["p_bar"] is None  # agreement undefined with one rater


def test_dbscan_lsh_corpus_path(spark, embeddings):
    """The documented corpus default (method='lsh') must actually run:
    dbscan forwards dim/n_bits/n_tables to the hyperplane blocker (it
    raised ValueError pre-fix), and the LSH candidate set can only
    shrink the exact eps-graph, so core points are a subset of exact's
    and every shared cluster assignment agrees on id-reachability."""
    from nbdatatools_spark.operators.clustering import dbscan

    sub = embeddings.where(F.col("vec_id") < 200)
    out = dbscan(
        sub, eps_cosine=0.7, min_pts=4, method="lsh", dim=64, n_bits=4,
        n_tables=4,
    ).collect()
    assert len(out) == 200
    exact = {
        r["id"]: r["role"]
        for r in dbscan(sub, eps_cosine=0.7, min_pts=4, method="exact").collect()
    }
    lsh_core = {r["id"] for r in out if r["role"] == "core"}
    exact_core = {i for i, role in exact.items() if role == "core"}
    assert lsh_core <= exact_core
