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


# --- Z-order layout ---------------------------------------------------------

def zorder_value(cols, bounds, bits: int = 16):
    """Morton (Z-order) key over N numeric columns: each column is affine-
    scaled into [0, 2^bits) with the provided (min, max) bounds, then the
    bit planes are interleaved — pure Catalyst shift/mask arithmetic,
    codegen-friendly, no UDF.

    Sorting data by this key clusters rows that are close in EVERY listed
    dimension, so parquet row-group min/max stats become selective for
    filters on ANY of the columns (the multi-dimensional data-skipping
    layout Delta/Iceberg expose as OPTIMIZE ZORDER). A single-column sort
    only bounds its own column's spans.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if bits * n > 62:
        raise ValueError(f"bits * n_cols must fit a long, got {bits}x{n}")
    scaled = []
    for c, (lo, hi) in zip(cols, bounds):
        span = float(hi) - float(lo)
        if span <= 0:
            scaled.append(F.lit(0).cast("long"))
            continue
        x = (F.col(c).cast("double") - float(lo)) * (((1 << bits) - 1) / span)
        scaled.append(
            F.greatest(
                F.lit(0), F.least(F.lit((1 << bits) - 1), F.round(x, 0).cast("long"))
            )
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return z


def column_bounds(df: DataFrame, cols) -> list:
    """One aggregate pass: [(min, max), ...] for each column."""
    from pyspark.sql import functions as F

    row = df.agg(
        *[f for c in cols for f in (F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                                    F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))]
    ).first()
    return [(row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols]


def write_zordered(
    df: DataFrame,
    path: str,
    cols,
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write parquet laid out in Z-order over ``cols``: range-partition on
    the Morton key (num_files contiguous key ranges -> one file each) and
    sort within partitions, so every file's row-group stats bound a small
    hyper-rectangle of the key space. One shuffle, paid once at layout
    time — the multi-dimensional analogue of write_bucketed."""
    from pyspark.sql import functions as F

    bounds = column_bounds(df, cols)
    z = zorder_value(cols, bounds, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_mb: int = 128,
    sort_cols=None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    roughly ``target_mb`` each — the lakehouse maintenance job (streaming
    sinks and per-batch MERGE writers accrete small files; scan cost at
    100 TB is dominated by file-open overhead once files shrink below the
    row-group size). Returns the output file count.

    Partition count = ceil(total_bytes / target_mb) from the source's
    actual on-disk size (no data scan to plan). With ``sort_cols`` the
    rewrite range-partitions and sorts within partitions (repartitionByRange
    + sortWithinPartitions), so every output file covers a tight key range
    — min/max pruning works after compaction (the write_zordered
    single-key analogue). Without it, coalesce-style repartition only.
    """
    import math as _math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, _math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    if sort_cols:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in sort_cols]
        out = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst_dir)
    return sum(
        1
        for root, _dirs, files in os.walk(dst_dir)
        for f in files
        if f.endswith(".parquet")
    )


def layout_report(spark, path: str, cols=None):
    """Per-row-group min/max layout report for a parquet dataset — the
    observability behind data skipping: after write_zordered or
    compact_parquet(sort_cols=...), this is how you SEE that each file
    bounds a tight range (and how you catch layout rot as appends land).

    Returns (file, row_group, n_rows, column, min, max) — stats read from
    parquet FOOTERS only, never data pages. The file list fans out over
    the cluster (mapInPandas over a file-name DataFrame, pyarrow footer
    reads per executor), so a million-file lake reports in parallel;
    values are stringified (layout inspection, not arithmetic).
    """
    import os

    files = []
    for root, _dirs, names in os.walk(path):
        for f in names:
            if f.endswith(".parquet"):
                files.append(os.path.join(root, f))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    fdf = spark.createDataFrame([(f,) for f in sorted(files)], "file STRING")

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for fname in pdf["file"]:
                md = pq.read_metadata(fname)
                schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
                want = [
                    i
                    for i, n in enumerate(schema_names)
                    if cols is None or n in set(cols)
                ]
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for i in want:
                        c = g.column(i)
                        st = c.statistics
                        rows.append(
                            {
                                "file": fname,
                                "row_group": rg,
                                "n_rows": g.num_rows,
                                "column": schema_names[i],
                                "min": None if st is None else str(st.min),
                                "max": None if st is None else str(st.max),
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=["file", "row_group", "n_rows", "column", "min", "max"],
            )

    return fdf.repartition(min(len(files), 64)).mapInPandas(
        read_footers,
        "file STRING, row_group INT, n_rows BIGINT, column STRING, min STRING, max STRING",
    )
