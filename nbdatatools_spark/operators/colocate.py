"""Bucketed co-located joins — the shuffle-elimination path for repeated
big-big joins (SURVEY 'Optimize for scale'; the 100TB answer to the
reference's pre-sorted slab/ordinal alignment, SlabReader.java pages-page
ordering).

A join between two large fact tables shuffles BOTH sides on every query.
Bucketing pays that shuffle ONCE at write time: both tables are hash-
partitioned into the same number of buckets on the join key and sorted
within buckets, so Catalyst plans a SortMergeJoin with NO Exchange on
either side (and with matching sortBy, no per-task Sort either). At 100TB
this turns the dominant repeated cost of a star-join workload into a
one-time layout decision — exactly how a production deployment would lay
out lineitem/orders on orderkey.

Spark only honors bucket metadata through the catalog, so bucketed data
must be written with ``saveAsTable`` (an external table via ``path`` keeps
the files where the caller wants them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and bucket-sorted) on ``keys``.

    ``num_buckets`` should be sized so one bucket of the LARGER table fits
    an executor core's working memory at target scale (e.g. 100TB / 2048
    buckets ≈ 50GB per bucket across all files of that bucket id — combined
    with per-file row groups this keeps task inputs bounded).
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.

    With equal bucket counts on both sides Catalyst elides both exchanges;
    callers can assert that with :func:`join_shuffle_count` == 0.
    """
    return spark.table(left_table).join(spark.table(right_table), keys, how)


def join_shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan (0 for a fully
    co-located join). AQE wraps the plan, so count on the final string."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange ") + plan.count("Exchange(")
