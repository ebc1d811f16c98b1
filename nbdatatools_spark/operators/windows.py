"""Ordinal window slicing and logical re-basing (P1/W2 in SURVEY §2).

Reference semantics: FWindow / FInterval multi-interval ordinal windows
(layout/FWindow.java:32-140, layoutv2/DSWindow.java:29-54) with logical→
physical index translation
(spec/datasets/impl/xvec/CoreXVecVectorDatasetViewMethods.java:389-403).

A window is a list of half-open ``[start, end)`` ordinal intervals. Slicing is
a pure filter (pushes down to parquet via min/max stats); logical re-basing is
a row_number over the global ordinal order — a shuffle, applied only when the
caller genuinely needs 0-based logical ordinals (cacheable).
"""

from __future__ import annotations

import re
from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INTERVAL_RX = re.compile(r"^\s*(\d+)\s*\.\.\s*(\d+)\s*$")


def parse_window(spec: str | int | list) -> list[tuple[int, int]]:
    """Parse window sugar (docs/specs/dataset_yaml_v1.md:65-79):
    ``"0..1000"`` -> [(0, 1000)); bare count ``1000`` -> [(0, 1000));
    list of either -> multi-interval."""
    if isinstance(spec, int):
        return [(0, spec)]
    if isinstance(spec, list):
        return [iv for s in spec for iv in parse_window(s)]
    s = str(spec).strip()
    if s.isdigit():
        return [(0, int(s))]
    m = _INTERVAL_RX.match(s)
    if not m:
        raise ValueError(f"unparseable window spec: {spec!r}")
    a, b = int(m.group(1)), int(m.group(2))
    if b < a:
        raise ValueError(f"window end before start: {spec!r}")
    return [(a, b)]


def window_slice(
    df: DataFrame, spec: str | int | list, ordinal: str = "ordinal"
) -> DataFrame:
    """Restrict to the window's ordinal intervals (multi-interval = OR of
    between-clauses; each pushes to the scan)."""
    intervals = parse_window(spec)
    cond = reduce(
        or_,
        [(F.col(ordinal) >= a) & (F.col(ordinal) < b) for a, b in intervals],
    )
    return df.where(cond)


def global_row_index(
    df: DataFrame, order_cols: list, out: str = "__idx"
) -> DataFrame:
    """Scalable 0-based global row index in ``order_cols`` order — the
    zipWithIndex shape, pure DataFrame ops (VERDICT r1 #5: the old
    unpartitioned ``Window.orderBy`` serialized the whole table through one
    reducer; this runs at any scale).

    Two phases over ONE range-partitioned, partition-sorted frame:
    1. partition-local index = low 33 bits of monotonically_increasing_id()
       (Spark's contract: id = partitionId * 2^33 + rowInPartition);
    2. per-partition row counts -> running offsets (a window over the P-row
       count table only), broadcast-joined back on partition id.

    The pid-tagged frame is localCheckpoint(eager=False)-pinned so BOTH
    branches (the data rows and the P-row offset table) read the same
    materialized partitioning. Without the pin the two branches merely
    share a ReusedExchange, and AQE is free to re-plan them differently
    in larger plans (observed at sf0.1 / 8 shuffle partitions: the offset
    side saw different partition boundaries than the row side, yielding
    duplicated/gapped indexes — caught by the round-8 sf0.1 oracle
    sweep). The only unpartitioned window runs over P rows (one per
    partition), not the data.

    ``order_cols`` must be a total order (unique key tuples) — with ties the
    index assignment within a tie group is partition-dependent, exactly as
    row_number's would be nondeterministic.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n_part = max(int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    with_local = (
        df.repartitionByRange(n_part, *cols)
        .sortWithinPartitions(*cols)
        .select(
            "*",
            F.spark_partition_id().alias("__pid"),
            (F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))).alias(
                "__local"
            ),
        )
        .localCheckpoint(eager=False)
    )
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        with_local.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"))
        .select("__pid", F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"))
    )
    return (
        with_local.join(F.broadcast(offs), "__pid")
        .withColumn(out, (F.col("__off") + F.col("__local")).cast("bigint"))
        .drop("__pid", "__local", "__off")
    )


def rebase_ordinals(
    df: DataFrame, ordinal: str = "ordinal", out: str = "ordinal"
) -> DataFrame:
    """Renumber ordinals 0..n-1 in existing ordinal order (W2;
    CoreXVecVectorDatasetViewMethods.java:389-403 logical index translation).
    Two-phase partition-offset renumbering — no single-reducer stage."""
    res = global_row_index(df, [F.col(ordinal).asc()], out="__logical")
    if out == ordinal:
        res = res.drop(ordinal)
    return res.withColumnRenamed("__logical", out)
