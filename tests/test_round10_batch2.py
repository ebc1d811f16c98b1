"""Round-10 candidate batch 2: UniMax water-filling rates, leakage-safe
group splits, Krippendorff's alpha (nominal), Davies-Bouldin index."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.clustering import davies_bouldin
from nbdatatools_spark.operators.evaluation import krippendorff_alpha
from nbdatatools_spark.operators.sampling import group_split, unimax_rates


# -- unimax -------------------------------------------------------------------


def _mkdocs(spark, sizes):
    rows = [
        (f"{s}_{i}", s) for s, n in sizes.items() for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, source string")


def test_unimax_water_filling_hand_computed(spark):
    # sizes 10/30/60, budget 60, max_epochs 1: caps = sizes; water level
    # theta solves min(10,t)+min(30,t)+min(60,t)=60 -> t=25
    df = _mkdocs(spark, {"a": 10, "b": 30, "c": 60})
    rates = unimax_rates(df, budget=60, max_epochs=1.0)
    assert rates["a"] == 1.0             # capped: alloc 10
    assert abs(rates["b"] - 25 / 30) < 1e-12
    assert abs(rates["c"] - 25 / 60) < 1e-12
    # allocations exactly exhaust the budget
    sizes = {"a": 10, "b": 30, "c": 60}
    assert abs(sum(rates[s] * sizes[s] for s in sizes) - 60) < 1e-9


def test_unimax_epoch_cap_and_unattainable_budget(spark):
    df = _mkdocs(spark, {"a": 10, "b": 100})
    # max_epochs=2: tiny stratum may repeat, never beyond 2 passes
    rates = unimax_rates(df, budget=60, max_epochs=2.0)
    assert rates["a"] == 2.0             # cap 20 < uniform share 30
    assert abs(rates["b"] - 40 / 100) < 1e-12
    # budget above sum(caps): every stratum takes its cap
    rates = unimax_rates(df, budget=10_000, max_epochs=1.5)
    assert rates == {"a": 1.5, "b": 1.5}
    with pytest.raises(ValueError):
        unimax_rates(df, budget=0)


def test_unimax_uniform_when_budget_small(spark):
    df = _mkdocs(spark, {"a": 50, "b": 70, "c": 90})
    rates = unimax_rates(df, budget=30, max_epochs=1.0)
    # nobody capped: every stratum contributes exactly budget/3 units
    assert abs(rates["a"] * 50 - 10) < 1e-9
    assert abs(rates["b"] * 70 - 10) < 1e-9
    assert abs(rates["c"] * 90 - 10) < 1e-9


# -- group split --------------------------------------------------------------


def test_group_split_never_straddles(spark):
    rows = [(i, f"g{i % 37}") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = group_split(df, "grp", fractions=(0.6, 0.2, 0.2), names=("tr", "va", "te"))
    per_group = out.groupBy("grp").agg(F.count_distinct("split").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_group)
    # all three splits are populated at 37 groups
    assert out.select("split").distinct().count() == 3


def test_group_split_matches_row_split_of_group_table(spark):
    from nbdatatools_spark.operators.sampling import train_val_test_split

    rows = [(i, f"g{i % 11}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = {
        (r["grp"], r["split"])
        for r in group_split(df, "grp").select("grp", "split").distinct().collect()
    }
    want = {
        (r["grp"], r["split"])
        for r in train_val_test_split(
            df.select("grp").distinct(), key_col="grp"
        ).collect()
    }
    assert got == want


# -- krippendorff -------------------------------------------------------------


def _py_alpha(ratings):
    """ratings: list of (unit, category) — nominal alpha, coincidence form."""
    from collections import Counter, defaultdict

    by_u = defaultdict(Counter)
    for u, c in ratings:
        by_u[u][c] += 1
    kept = {u: cnt for u, cnt in by_u.items() if sum(cnt.values()) >= 2}
    n = sum(sum(c.values()) for c in kept.values())
    agree = sum(
        v * (v - 1) / (sum(cnt.values()) - 1)
        for cnt in kept.values()
        for v in cnt.values()
    )
    nc = Counter()
    for cnt in kept.values():
        nc.update(cnt)
    d_o = (n - agree) / n
    d_e = (n * n - sum(v * v for v in nc.values())) / (n * (n - 1))
    return 1 - d_o / d_e if d_e > 0 else None


def test_krippendorff_matches_python_reference(spark):
    # classic example with missing data: units rated by 2-4 raters
    ratings = (
        [("u1", c) for c in "aaab"]
        + [("u2", c) for c in "bb"]
        + [("u3", c) for c in "abc"]
        + [("u4", c) for c in "cc"]
        + [("u5", "a")]  # single rating -> dropped
    )
    df = spark.createDataFrame(ratings, "unit string, cat string")
    r = krippendorff_alpha(df, "unit", "cat").collect()[0]
    assert r["n_units"] == 4
    assert r["n_units_dropped"] == 1
    assert r["n_ratings"] == 11
    assert r["n_categories"] == 3
    want = _py_alpha(ratings)
    assert abs(r["alpha"] - round(want, 6)) < 1e-6


def test_krippendorff_perfect_and_degenerate(spark):
    perfect = [(f"u{i}", "x" if i % 2 else "y") for i in range(10) for _ in range(3)]
    df = spark.createDataFrame(perfect, "unit string, cat string")
    r = krippendorff_alpha(df, "unit", "cat").collect()[0]
    assert r["alpha"] == 1.0 and r["d_o"] == 0.0
    # single category: D_e = 0 -> NULL alpha
    one = spark.createDataFrame(
        [("u1", "x"), ("u1", "x"), ("u2", "x"), ("u2", "x")], "unit string, cat string"
    )
    r = krippendorff_alpha(one, "unit", "cat").collect()[0]
    assert r["alpha"] is None


def test_krippendorff_missing_data_tolerated(spark):
    # fleiss drops off-modal units entirely; alpha keeps them
    ragged = [("u1", "a"), ("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "b")]
    r = krippendorff_alpha(
        spark.createDataFrame(ragged, "unit string, cat string"), "unit", "cat"
    ).collect()[0]
    assert r["n_units"] == 2 and r["n_ratings"] == 5


# -- davies-bouldin -----------------------------------------------------------


def test_davies_bouldin_hand_computed(spark):
    # two tight 1-D clusters far apart + one loose cluster nearby
    rows = (
        [(i, "a", [0.0 + 0.1 * i]) for i in range(2)]      # centroid 0.05, S=0.05
        + [(10 + i, "b", [10.0 + 0.1 * i]) for i in range(2)]  # centroid 10.05
        + [(20 + i, "c", [12.0 + 1.0 * i]) for i in range(2)]  # centroid 12.5, S=0.5
    )
    df = spark.createDataFrame(rows, "vec_id long, grp string, embedding array<double>")
    out = {r["grp"]: r for r in davies_bouldin(df, "grp").collect()}
    assert out["a"]["n_vectors"] == 2
    assert abs(out["a"]["s_intra"] - 0.05) < 1e-6
    # b's worst neighbor is the near, loose c: R = (0.05+0.5)/2.45
    assert out["b"]["worst_other"] == "c"
    assert abs(out["b"]["r_max"] - (0.05 + 0.5) / 2.45) < 1e-5
    assert out["c"]["worst_other"] == "b"
    # a is far from both: its R values are small
    assert out["a"]["r_max"] < 0.1


def test_davies_bouldin_single_group_and_coincident(spark):
    one = spark.createDataFrame(
        [(1, "a", [0.0, 0.0]), (2, "a", [1.0, 0.0])],
        "vec_id long, grp string, embedding array<double>",
    )
    r = davies_bouldin(one, "grp").collect()[0]
    assert r["r_max"] is None and r["worst_other"] is None
    # coincident centroids -> that pair is excluded, not a crash
    co = spark.createDataFrame(
        [(1, "a", [0.0]), (2, "a", [2.0]), (3, "b", [0.0]), (4, "b", [2.0]),
         (5, "c", [9.0]), (6, "c", [11.0])],
        "vec_id long, grp string, embedding array<double>",
    )
    out = {r["grp"]: r for r in davies_bouldin(co, "grp").collect()}
    # a and b coincide at centroid 1.0: their mutual R is excluded; both
    # still get an R against c
    assert out["a"]["worst_other"] == "c" and out["b"]["worst_other"] == "c"


def test_davies_bouldin_prefers_separated_clusters(spark):
    import random

    rnd = random.Random(7)
    tight = [
        (i, f"g{g}", [g * 100.0 + rnd.gauss(0, 1), rnd.gauss(0, 1)])
        for g in range(3)
        for i in range(g * 50, g * 50 + 20)
    ]
    loose = [
        (1000 + i, f"g{g}", [g * 3.0 + rnd.gauss(0, 2), rnd.gauss(0, 2)])
        for g in range(3)
        for i in range(g * 50, g * 50 + 20)
    ]
    schema = "vec_id long, grp string, embedding array<double>"
    db_tight = (
        davies_bouldin(spark.createDataFrame(tight, schema), "grp")
        .agg(F.avg("r_max"))
        .collect()[0][0]
    )
    db_loose = (
        davies_bouldin(spark.createDataFrame(loose, schema), "grp")
        .agg(F.avg("r_max"))
        .collect()[0][0]
    )
    assert db_tight < db_loose
