"""Regression tests for the round-9 ADVICE fixes:

- sinkhorn_distance's marginal_err now measures the COLUMN (b)
  marginal — the loop ends on a u-update, so row sums equal a by
  construction and the old row-side metric read ~0 after 1 iteration;
- approx_distinct_ngrams' xxhash64 register path masks the low 52
  bits instead of abs()%2^52 (abs(Long.MIN_VALUE) overflows negative
  and Spark's % keeps the dividend sign — a negative register index);
- lof_from_knn LEFT-joins open pair lists and surfaces
  n_missing_neighbors instead of silently shrinking reach/lrd sums;
- hill_tail_index is deterministic at the VALUE grain across
  partitionings even when row_number breaks boundary ties
  arbitrarily (tied kept rows contribute log(x/thr) = 0).
"""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.analysis import (
    approx_distinct_ngrams,
    distinct_ngrams,
    hill_tail_index,
    sinkhorn_distance,
)
from nbdatatools_spark.operators.knn import lof_from_knn


def _two_slices(spark):
    # OVERLAPPING supports with different shapes: on disjoint supports
    # the Laplace kernel factorizes across the gap and Sinkhorn
    # converges in one iteration exactly — overlap is what makes the
    # fixed point take real iterations to mix
    rows = [
        ("a", float(v)) for v in [5, 15, 15, 25, 35, 45, 55, 65]
    ] + [
        ("b", float(v))
        for v in [25, 35, 45, 55, 65, 75, 85, 95, 95, 85]
    ]
    return spark.createDataFrame(rows, "g string, v double")


def test_sinkhorn_marginal_err_reflects_mixing(spark):
    df = _two_slices(spark)

    def err(iters):
        return sinkhorn_distance(
            df, "v", "g", "a", "b", n_bins=10, lo=0.0, hi=100.0,
            eps=0.25, iterations=iters,
        ).collect()[0]["marginal_err"]

    e1, e10 = err(1), err(10)
    # the old row-side metric reads identically 0 here at EVERY
    # iteration count (python differential: rowerr == 0.0, colerr
    # 0.2219 -> 5e-9); the column-side residual is visibly nonzero
    # before convergence ...
    assert e1 > 0.2
    # ... and SHRINKS as the fixed point converges
    assert e10 < 1e-6


def test_sinkhorn_cost_and_counts_sane(spark):
    df = _two_slices(spark)
    out = sinkhorn_distance(
        df, "v", "g", "a", "b", n_bins=10, lo=0.0, hi=100.0,
        eps=0.25, iterations=10,
    ).collect()[0]
    # python differential for this fixture: cost 0.389369 at 10 iters
    assert abs(out["cost"] - 0.389369) < 1e-5
    assert out["n_a"] == 8 and out["n_b"] == 10


def test_xxhash64_register_mask_nonnegative(spark):
    # the exact boundary the old expression got wrong: under ANSI mode
    # (this repo's default) abs(Long.MIN_VALUE) THROWS long-overflow,
    # and with ANSI off it stays negative with a sign-following %
    df = spark.createDataFrame([(-(1 << 63),), (-1,), (7,)], "h long")
    old = F.abs(F.col("h")) % F.lit(1 << 52).cast("long")
    new = F.col("h").bitwiseAND(F.lit((1 << 52) - 1))
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.select(old.alias("old_reg")).collect()
    rows = df.select(new.alias("new_reg")).collect()
    # the branch-free mask is total AND in [0, 2^52) for EVERY input
    assert len(rows) == 3
    assert all(0 <= r["new_reg"] < (1 << 52) for r in rows)
    # known values: -1 keeps all 52 low bits; MIN_VALUE keeps none
    regs = sorted(r["new_reg"] for r in rows)
    assert regs == [0, 7, (1 << 52) - 1]


def test_xxhash64_hll_estimates_track_exact(spark):
    rows = [
        (i, " ".join(f"tok{(i * 13 + j) % 257}" for j in range(30)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        F.lit("s").alias("source"), "text"
    )
    exact = {
        (r["source"], r["n"]): r["distinct_ngrams"]
        for r in distinct_ngrams(df, ns=(1, 2)).collect()
    }
    est = {
        (r["source"], r["n"]): r["distinct_estimate"]
        for r in approx_distinct_ngrams(
            df, ns=(1, 2), precision=12, hash_fn="xxhash64"
        ).collect()
    }
    assert set(est) == set(exact)
    for key, e in est.items():
        assert e > 0
        assert abs(e - exact[key]) / exact[key] < 0.10


def _closed_pairs(spark):
    # 4 points on a line at 0, 1, 2, 10; exact 2-NN, closed over ids
    pts = {0: 0.0, 1: 1.0, 2: 2.0, 3: 10.0}
    pairs = []
    for i, x in pts.items():
        nn = sorted(
            ((abs(x - y), j) for j, y in pts.items() if j != i)
        )[:2]
        pairs += [(i, j, d) for d, j in nn]
    return spark.createDataFrame(pairs, "id long, nbr long, dist double")


def test_lof_closed_pairs_report_zero_missing(spark):
    rows = lof_from_knn(_closed_pairs(spark), k=2).collect()
    assert len(rows) == 4
    assert all(r["n_missing_neighbors"] == 0 for r in rows)
    assert all(r["lof"] is not None for r in rows)
    by_id = {r["id"]: r["lof"] for r in rows}
    assert by_id[3] > max(by_id[0], by_id[1], by_id[2])


def test_lof_open_pairs_surface_missing_not_skew(spark):
    closed = _closed_pairs(spark)
    # rewrite one of point 0's neighbors to an id that never appears
    # as a query point (the ANN-feed hazard from the ADVICE)
    opened = closed.withColumn(
        "nbr",
        F.when(
            (F.col("id") == 0) & (F.col("nbr") == 2), F.lit(99)
        ).otherwise(F.col("nbr")),
    )
    rows = {r["id"]: r for r in lof_from_knn(opened, k=2).collect()}
    # no phantom row for 99, nothing dropped
    assert set(rows) == {0, 1, 2, 3}
    # point 0 sees the missing neighbor and refuses to score
    assert rows[0]["n_missing_neighbors"] == 1
    assert rows[0]["lof"] is None
    assert rows[0]["coincident"] is False
    # points that never referenced 99 still carry 0 missing and score
    for i in (1, 2, 3):
        assert rows[i]["n_missing_neighbors"] == 0
        assert rows[i]["lof"] is not None


def test_hill_tail_boundary_ties_deterministic(spark):
    # k=3 over values with a TIE spanning the k+1 boundary: whichever
    # tied rows row_number keeps, the kept multiset {5,4,3} and the
    # threshold 3 are unchanged
    vals = [5.0, 4.0, 3.0, 3.0, 3.0, 2.0]
    rows = [("g", v) for v in vals]
    expected = 3.0 / (math.log(5.0 / 3.0) + math.log(4.0 / 3.0))
    seen = set()
    for parts in (1, 3, 7):
        df = spark.createDataFrame(
            rows, "source string, v double"
        ).repartition(parts)
        r = hill_tail_index(df, "v", k=3).collect()[0]
        assert r["k_used"] == 3
        assert r["x_threshold"] == 3.0
        assert abs(r["hill_alpha"] - expected) < 1e-5
        seen.add((r["x_threshold"], r["hill_alpha"]))
    assert len(seen) == 1


def test_burstiness_mean_gap_integer_halfup(spark):
    # round-10 sf0.1 sweep finding (events_burstiness hash-fail): the
    # mean of integer MICRO gaps at 6dp-of-seconds is integer-micro
    # grain, so a float round(sg/n/1e6, 6) lands exact rationals on
    # 6dp ties where the engines' rounding disagrees by an ulp. The
    # fix is the pure-integer half-up mean: gaps [1us, 2us] -> mean
    # 1.5us -> half-up 2us, deterministically on both engines.
    from datetime import datetime, timezone

    from nbdatatools_spark.operators.temporal import burstiness

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (1, 10, t0),
        (1, 11, t0.replace(microsecond=1)),
        (1, 12, t0.replace(microsecond=3)),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp"
    )
    r = burstiness(df, min_events=3, tie_col="event_id").collect()[0]
    assert r["n_events"] == 3
    assert r["mean_gap_s"] == 2e-06
