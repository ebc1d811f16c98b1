"""Skew-mitigation utilities (100TB posture; SURVEY §7 extension surface).

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew
at runtime, but two cases still need explicit salting on very hot keys:

- joins where the skewed side is so concentrated that even split
  partitions overwhelm one executor's input (a handful of keys holding
  percents of a 100TB table), and
- high-cardinality aggregations with a few degenerate keys where the
  map-side partial aggregate can't compress (e.g. collect_list-style
  aggregation buffers).

``salted_join`` spreads each hot key of the big side over ``salts``
sub-keys and replicates the matching small-side rows across all salt
values — the join stays a hash equi-join, shuffle keys become uniform,
and results are identical to the unsalted join.

``two_phase_agg`` pre-aggregates on (key, salt) then merges — the manual
form of map-side combine for aggregates whose partial state grows with
group size.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Equivalent to ``big.join(small, on, how)`` for how in
    {inner, left, left_outer}: every big-side row gets a deterministic
    pseudo-random salt in [0, salts), every small-side row is exploded to
    all salt values, and the join adds the salt column to the key — so a
    key that held N rows in one shuffle partition now spreads over
    ``salts`` partitions. Cost: small side is duplicated ``salts`` times
    (keep it the genuinely-small side; for broadcast-able smalls prefer
    F.broadcast and no salting at all).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = list(on)
    # deterministic per-row salt: hash the key AND a per-row disambiguator
    # derived from all columns, so identical key values still spread
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns], F.lit(seed)), F.lit(salts)
    ).cast("int")
    b = big.withColumn("__salt", salt_col)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = b.join(s, keys + ["__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Callable[[], Sequence[Column]],
    merge_aggs: Callable[[], Sequence[Column]],
    salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Manual two-phase aggregation for skewed group keys.

    Phase 1 groups on (keys..., salt) computing ``partial_aggs()``; phase 2
    groups on keys computing ``merge_aggs()`` over the partials. The caller
    provides algebraic partial/merge pairs (sum/sum, count/sum,
    min/min, max/max, collect_list/flatten...).
    """
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed)), F.lit(salts)
    ).cast("int")
    phase1 = df.withColumn("__salt", salt_col).groupBy(
        *[F.col(k) for k in keys], F.col("__salt")
    ).agg(*partial_aggs())
    return phase1.groupBy(*[F.col(k) for k in keys]).agg(*merge_aggs())


def key_skew_stats(
    df: DataFrame, key_col: str, top_k: int = 20
) -> DataFrame:
    """Hot-key diagnostics — the measurement that decides whether a join
    or aggregate needs ``salted_join``/AQE skew handling at all: per
    hottest key, its row count, share of the table, and the cumulative
    share of all keys at or above its rank. Returns
    ``(rank INT, key, n BIGINT, share DOUBLE, cum_share DOUBLE)``.

    Plan: ONE map-side-combinable groupBy(key) count is the only pass
    over data; the global total is one bounded driver scalar (the bm25
    N pattern); the top-k is TakeOrderedAndProject over the key-count
    table; the rank/cumulative window runs over the k returned rows
    only. Shares are one double division each, rounded to 6dp —
    engine-exact on integer inputs.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = df.count()
    if total == 0:
        raise ValueError("key_skew_stats needs a non-empty frame")
    from pyspark.sql import Window

    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(top_k)
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    cum = F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "key",
        "n",
        F.round(F.col("n") / F.lit(float(total)), 6).alias("share"),
        F.round(cum / F.lit(float(total)), 6).alias("cum_share"),
    )
