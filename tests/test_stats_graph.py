"""Differential and closed-form tests for the round-8 stats/graph batch:
mann_whitney_u, kruskal_wallis, brown_forsythe, spearman_corr,
mann_kendall, bh_adjust, two_sample_distance (stats.py),
degree_assortativity, kcore (graph.py), fleiss_kappa (evaluation.py),
lexical_diversity (analysis.py)."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.stats import (
    bh_adjust,
    brown_forsythe,
    grouped_avg_ranks,
    kruskal_wallis,
    mann_kendall,
    mann_whitney_u,
    spearman_corr,
    two_sample_distance,
)


@pytest.fixture(scope="module")
def two_sample(spark):
    rows = [("g1", "a", float(v)) for v in [1, 2, 3, 4, 10]] + [
        ("g1", "b", float(v)) for v in [5, 6, 7, 8, 9]
    ]
    return spark.createDataFrame(rows, "g string, c string, v double")


def test_mann_whitney_hand_computed(two_sample):
    # a ranks {1,2,3,4,10}, R_a = 20, U_a = 20 - 15 = 5; no ties:
    # sigma = sqrt(25*11/12), z = (5 - 12.5)/sigma = -1.566699
    r = mann_whitney_u(two_sample, "g", "c", "v").collect()[0]
    assert (r["n_a"], r["n_b"]) == (5, 5)
    assert r["u_a"] == 5.0
    assert r["cliffs_delta"] == -0.6  # 2*5/25 - 1
    assert abs(r["z"] - (-1.566699)) < 1e-6
    assert abs(r["p_value"] - 0.1172) < 5e-4


def test_mann_whitney_tie_correction(spark):
    # heavy ties: compare against a direct scipy-free computation
    vals = [1.0, 1.0, 1.0, 2.0, 2.0] + [2.0, 2.0, 3.0, 3.0, 3.0]
    rows = [("g", "a", v) for v in vals[:5]] + [("g", "b", v) for v in vals[5:]]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    r = mann_whitney_u(df, "g", "c", "v").collect()[0]
    # ranks: 1.0 -> avg 2, 2.0 -> avg 5.5, 3.0 -> avg 9
    ra = 3 * 2 + 2 * 5.5
    ua = ra - 5 * 6 / 2
    n = 10.0
    tie = (3**3 - 3) + (4**3 - 4) + (3**3 - 3)
    sigma2 = 25.0 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (ua - 12.5) / math.sqrt(sigma2)
    assert r["u_a"] == ua
    assert abs(r["z"] - round(z, 6)) < 1e-6


def test_mann_whitney_drops_non_binary_groups(spark):
    rows = [("g", c, float(i)) for i, c in enumerate(["a", "b", "c"] * 3)]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    assert mann_whitney_u(df, "g", "c", "v").count() == 0


def test_kruskal_wallis_hand_computed(two_sample):
    r = kruskal_wallis(two_sample, "g", "c", "v").collect()[0]
    # H = 12/110 * (400/5 + 1225/5) - 33 = 2.454545; no ties -> h_adj = H
    assert abs(r["h_stat"] - 2.454545) < 1e-6
    assert r["h_adj"] == r["h_stat"]
    assert (r["k_classes"], r["n"], r["dof"]) == (2, 10, 1)


def test_kruskal_wallis_equals_mwu_relationship(spark):
    # for 2 classes without ties: H = z^2 (asymptotically identical tests)
    import random

    rnd = random.Random(7)
    vals = rnd.sample(range(1000), 40)
    rows = [("g", "a" if i < 20 else "b", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    h = kruskal_wallis(df, "g", "c", "v").collect()[0]["h_stat"]
    z = mann_whitney_u(df, "g", "c", "v").collect()[0]["z"]
    assert abs(h - z * z) < 1e-3


def test_brown_forsythe_hand_computed(two_sample):
    r = brown_forsythe(two_sample, "g", "c", "v").collect()[0]
    # medians 3 and 7; z_a = {2,1,0,1,7}, z_b = {2,1,0,1,2}
    # BSS = 2.5, WSS = 33.6 -> F = 2.5/(33.6/8) = 0.595238
    assert abs(r["f_stat"] - 0.595238) < 1e-6
    assert (r["df1"], r["df2"]) == (1, 8)


def test_brown_forsythe_equal_spread_small_f(spark):
    rows = [("g", "a", float(v)) for v in range(20)] + [
        ("g", "b", float(v) + 100.0) for v in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    r = brown_forsythe(df, "g", "c", "v").collect()[0]
    # identical spreads, only the location differs -> F == 0
    assert r["f_stat"] == 0.0


def test_spearman_monotone_and_reversed(spark):
    rows = [("g", float(i), float(i**3)) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    assert spearman_corr(df, "g", "x", "y").collect()[0]["rho"] == 1.0
    rows = [("g", float(i), float(-i)) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    assert spearman_corr(df, "g", "x", "y").collect()[0]["rho"] == -1.0


def test_spearman_with_ties_differential(spark):
    import random

    rnd = random.Random(13)
    xs = [float(rnd.randint(0, 9)) for _ in range(60)]
    ys = [float(rnd.randint(0, 9)) for _ in range(60)]

    def avg_ranks(v):
        sv = sorted(v)
        return {
            x: (sv.index(x) + 1 + sv.index(x) + sv.count(x)) / 2.0
            for x in set(v)
        }

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    ax = [rx[x] for x in xs]
    ay = [ry[y] for y in ys]
    n = len(xs)
    sx, sy = sum(ax), sum(ay)
    sxy = sum(a * b for a, b in zip(ax, ay))
    sxx = sum(a * a for a in ax)
    syy = sum(b * b for b in ay)
    rho = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x double, y double"
    )
    got = spearman_corr(df, "g", "x", "y").collect()[0]["rho"]
    assert abs(got - rho) < 1e-6


def test_mann_kendall_increasing_and_flat(spark):
    rows = [("up", float(i), float(i * 2)) for i in range(10)] + [
        ("flat", float(i), 5.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in mann_kendall(df, "g", "x", "y").collect()}
    assert out["up"]["s_stat"] == 45  # C(10,2) all positive
    assert out["up"]["trend"] == "increasing"
    assert out["flat"]["s_stat"] == 0
    assert out["flat"]["z"] == 0.0
    assert out["flat"]["trend"] == "no_trend"


def test_mann_kendall_tie_corrected_variance(spark):
    ys = [1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 4.0]
    rows = [("g", float(i), y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = mann_kendall(df, "g", "x", "y").collect()[0]
    n = 7
    s = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie = 2 * 1 * 9 + 3 * 2 * 11  # t(t-1)(2t+5) for t=2 and t=3
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    z = (s - 1) / math.sqrt(var)
    assert r["s_stat"] == s
    assert abs(r["z"] - round(z, 6)) < 1e-6


def test_bh_adjust_canonical(spark):
    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.216]
    df = spark.createDataFrame(
        [(f"s{i}", p) for i, p in enumerate(ps)], "k string, p double"
    )
    out = {r["k"]: r for r in bh_adjust(df, "p", ["k"]).collect()}
    assert out["s0"]["p_adj"] == 0.01 and out["s0"]["rejected"]
    assert out["s1"]["p_adj"] == 0.04 and out["s1"]["rejected"]
    # the classic step-up plateau: p(3..5) all adjust to 10*0.042/5
    assert out["s2"]["p_adj"] == out["s3"]["p_adj"] == out["s4"]["p_adj"] == 0.084
    assert not out["s2"]["rejected"]
    assert out["s9"]["p_adj"] == 0.216


def test_bh_adjust_monotone_and_clamped(spark):
    ps = [0.9, 0.95, 0.99, 1.0, 0.5]
    df = spark.createDataFrame(
        [(f"s{i}", p) for i, p in enumerate(ps)], "k string, p double"
    )
    rows = sorted(bh_adjust(df, "p", ["k"]).collect(), key=lambda r: r["p_rank"])
    adj = [r["p_adj"] for r in rows]
    assert adj == sorted(adj)  # step-up adjustment is monotone in rank
    assert all(a <= 1.0 for a in adj)


def test_two_sample_distance_null_and_shift(spark, embeddings):
    a = embeddings.where(F.col("vec_id") % 2 == 0)
    b = embeddings.where(F.col("vec_id") % 2 == 1)
    null = two_sample_distance(a, b, sample_size=48).collect()[0]
    shifted = two_sample_distance(
        a,
        b.withColumn(
            "embedding", F.transform("embedding", lambda x: x + F.lit(2.0))
        ),
        sample_size=48,
    ).collect()[0]
    # same distribution: both stats near 0; shifted: clearly positive
    assert abs(null["mmd2"]) < 0.02
    assert abs(null["energy"]) < 0.2
    assert shifted["mmd2"] > 10 * max(abs(null["mmd2"]), 1e-9)
    assert shifted["energy"] > 10 * max(abs(null["energy"]), 1e-9)


def test_two_sample_distance_numpy_differential(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    A = rng.randn(20, 4)
    B = rng.randn(24, 4) + 0.5
    dfa = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(A)],
        "vec_id long, embedding array<double>",
    )
    dfb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(B)],
        "vec_id long, embedding array<double>",
    )
    got = two_sample_distance(dfa, dfb, gamma=0.25, sample_size=64).collect()[0]

    def d2(x, y):
        return float(sum(round((p - q) * (p - q), 9) for p, q in zip(x, y)))

    def blocks(X, Y, same):
        ks = ds = 0.0
        idx = (
            [(i, j) for i in range(len(X)) for j in range(i + 1, len(X))]
            if same
            else [(i, j) for i in range(len(X)) for j in range(len(Y))]
        )
        for i, j in idx:
            dd = d2(X[i], (X if same else Y)[j])
            ks += round(math.exp(-0.25 * dd), 9)
            ds += round(math.sqrt(dd), 9)
        return ks, ds

    # ids sort as strings in the operator's pair condition, but block
    # SUMS are order-free, so plain index pairs replicate them
    kaa, daa = blocks(A, None, True)
    kbb, dbb = blocks(B, None, True)
    kab, dab = blocks(A, B, False)
    na, nb = 20.0, 24.0
    mmd2 = (
        2 * kaa / (na * (na - 1))
        + 2 * kbb / (nb * (nb - 1))
        - 2 * kab / (na * nb)
    )
    energy = (
        2 * dab / (na * nb)
        - 2 * daa / (na * (na - 1))
        - 2 * dbb / (nb * (nb - 1))
    )
    assert abs(got["mmd2"] - round(mmd2, 6)) < 2e-6
    assert abs(got["energy"] - round(energy, 6)) < 2e-6
    assert (got["n_a"], got["n_b"]) == (20, 24)


def test_grouped_avg_ranks_partition_invariant(spark):
    import random

    rnd = random.Random(3)
    rows = [
        (f"g{i % 3}", float(rnd.randint(0, 20))) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    one = {
        (r["g"], r["v"]): (r["n"], r["avg_rank"])
        for r in grouped_avg_ranks(df.coalesce(1), "g", "v").collect()
    }
    many = {
        (r["g"], r["v"]): (r["n"], r["avg_rank"])
        for r in grouped_avg_ranks(df.repartition(13), "g", "v").collect()
    }
    assert one == many
    # per-group rank identity: sum of n*avg_rank == m(m+1)/2
    per = {}
    for (g, _), (n, ar) in one.items():
        per.setdefault(g, [0, 0.0])
        per[g][0] += n
        per[g][1] += n * ar
    for g, (m, s) in per.items():
        assert s == m * (m + 1) / 2


# ---------------------------------------------------------------------------
# graph.py additions
# ---------------------------------------------------------------------------


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_assortativity_star_is_negative(spark):
    # star graph: hub degree n, leaves degree 1 -> perfectly disassortative
    from nbdatatools_spark.operators.graph import degree_assortativity

    edges = [(0, i) for i in range(1, 7)]
    r = degree_assortativity(_edges_df(spark, edges)).collect()[0]
    assert (r["n_nodes"], r["n_edges"]) == (7, 6)
    assert r["assortativity"] == -1.0


def test_assortativity_regular_graph_null(spark):
    # cycle: every degree 2 -> zero variance -> NULL
    from nbdatatools_spark.operators.graph import degree_assortativity

    edges = [(i, (i + 1) % 6) for i in range(6)]
    r = degree_assortativity(_edges_df(spark, edges)).collect()[0]
    assert r["assortativity"] is None


def test_assortativity_numpy_differential(spark):
    import numpy as np
    from nbdatatools_spark.operators.graph import degree_assortativity

    rng = np.random.RandomState(11)
    edges = set()
    while len(edges) < 40:
        a, b = rng.randint(0, 15), rng.randint(0, 15)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    r_np = np.corrcoef(xs, ys)[0, 1]
    got = degree_assortativity(_edges_df(spark, sorted(edges))).collect()[0]
    assert abs(got["assortativity"] - r_np) < 1e-6


def _py_kcore(edges, k):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(v) for n, v in adj.items() if v}


def test_kcore_differential(spark):
    import random

    rnd = random.Random(29)
    edges = set()
    while len(edges) < 120:
        a, b = rnd.randint(0, 40), rnd.randint(0, 40)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    from nbdatatools_spark.operators.graph import kcore

    for k in (2, 3, 4):
        got = {
            r["node"]: r["degree"]
            for r in kcore(_edges_df(spark, sorted(edges)), k=k).collect()
        }
        assert got == _py_kcore(edges, k), f"k={k}"


def test_kcore_clique_survives(spark):
    from nbdatatools_spark.operators.graph import kcore

    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 10), (10, 11), (11, 12)]
    got = {
        r["node"]: r["degree"]
        for r in kcore(_edges_df(spark, clique + tail), k=4).collect()
    }
    assert got == {i: 4 for i in range(5)}


def test_kcore_empty_when_no_core(spark):
    from nbdatatools_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(6)]
    assert kcore(_edges_df(spark, path), k=2).count() == 0


# ---------------------------------------------------------------------------
# fleiss_kappa / lexical_diversity
# ---------------------------------------------------------------------------


def test_fleiss_kappa_textbook(spark):
    # Fleiss (1971) worked example (Wikipedia table): 10 items, 14 raters,
    # 5 categories -> kappa = 0.20993
    table = [
        [0, 0, 0, 0, 14],
        [0, 2, 6, 4, 2],
        [0, 0, 3, 5, 6],
        [0, 3, 9, 2, 0],
        [2, 2, 8, 1, 1],
        [7, 7, 0, 0, 0],
        [3, 2, 6, 3, 0],
        [2, 5, 3, 2, 2],
        [6, 5, 2, 1, 0],
        [0, 2, 2, 3, 7],
    ]
    rows = []
    for item, cats in enumerate(table):
        r = 0
        for cat, n in enumerate(cats):
            for _ in range(n):
                rows.append((item, f"r{r}", str(cat)))
                r += 1
    from nbdatatools_spark.operators.evaluation import fleiss_kappa

    df = spark.createDataFrame(rows, "item long, rater string, cat string")
    out = fleiss_kappa(df, "item", "rater", "cat").collect()[0]
    assert (out["n_items"], out["n_raters"], out["n_categories"]) == (10, 14, 5)
    assert out["n_items_dropped"] == 0
    assert abs(out["kappa"] - 0.20993) < 1e-4


def test_fleiss_kappa_perfect_agreement(spark):
    from nbdatatools_spark.operators.evaluation import fleiss_kappa

    rows = [(i, f"r{j}", str(i % 2)) for i in range(10) for j in range(3)]
    df = spark.createDataFrame(rows, "item long, rater string, cat string")
    out = fleiss_kappa(df, "item", "rater", "cat").collect()[0]
    assert out["p_bar"] == 1.0
    assert out["kappa"] == 1.0


def test_fleiss_kappa_drops_ragged_items(spark):
    from nbdatatools_spark.operators.evaluation import fleiss_kappa

    rows = [(i, f"r{j}", "x") for i in range(8) for j in range(3)]
    rows += [(100, "r0", "x")]  # one item with a single rater
    df = spark.createDataFrame(rows, "item long, rater string, cat string")
    out = fleiss_kappa(df, "item", "rater", "cat").collect()[0]
    assert out["n_items"] == 8
    assert out["n_items_dropped"] == 1
    assert out["n_raters"] == 3


def test_lexical_diversity_hand_computed(spark):
    from nbdatatools_spark.operators.analysis import lexical_diversity

    df = spark.createDataFrame(
        [(1, "a a a b b c", "s1"), (2, "x y z w", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in lexical_diversity(df).collect()}
    s1 = out["s1"]  # freqs {a:3, b:2, c:1}: N=6, V=3, hapax=1
    assert (s1["n_tokens"], s1["n_types"]) == (6, 3)
    assert abs(s1["root_ttr"] - 3 / math.sqrt(6)) < 1e-6
    assert abs(s1["hapax_ratio"] - 1 / 3) < 1e-6
    # Yule K = 1e4 * (9*1 + 4*1 + 1*1 - 6) / 36
    assert abs(s1["yule_k"] - 1e4 * (14 - 6) / 36) < 1e-3
    s2 = out["s2"]  # all hapax
    assert s2["hapax_ratio"] == 1.0
    assert s2["yule_k"] == 0.0
