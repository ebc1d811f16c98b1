"""Event-time windowing — batch + Structured Streaming (beyond-reference
surface, SURVEY §2.9/§7.8).

The reference has no event-time streaming (its "streaming" is sequential file
IO, datatools-testdata-apis/.../fileio/VectorFileStream.java); these operators
are the engine's extension for the driver's ``events`` table. Each windowing
helper works identically on a batch DataFrame and a streaming one (pass a
``readStream`` input and add a watermark); sessionize has a batch
(gaps-and-islands window functions) implementation whose semantics match
``F.session_window`` for the streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    duration: str = "1 hour",
    ts: str = "ts",
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling window counts/sums keyed by window start (+ optional keys)."""
    if watermark:
        df = df.withWatermark(ts, watermark)
    group = [F.window(ts, duration).alias("win")] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*group).agg(
        F.count("*").alias("n_events"), F.sum("value").alias("sum_value")
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        *[F.col(k) for k in (keys or [])],
        "n_events",
        "sum_value",
    )


def sliding_window_agg(
    df: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts: str = "ts",
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) window agg — each event lands in duration/slide
    windows."""
    if watermark:
        df = df.withWatermark(ts, watermark)
    group = [F.window(ts, duration, slide).alias("win")] + [
        F.col(k) for k in (keys or [])
    ]
    out = df.groupBy(*group).agg(
        F.count("*").alias("n_events"), F.sum("value").alias("sum_value")
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        *[F.col(k) for k in (keys or [])],
        "n_events",
        "sum_value",
    )


def assign_sessions(
    df: DataFrame,
    gap: str = "30 minutes",
    ts: str = "ts",
    user: str = "user_id",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Row-level session assignment (gaps-and-islands): every input row
    gains a ``session_id`` (0-based per user, in time order) that breaks
    when the gap to the user's previous event exceeds ``gap``. One hash
    shuffle on the user key; both windows share its partitioning."""
    w = Window.partitionBy(user).orderBy(F.col(ts).asc(), F.col(order_tiebreak).asc())
    gap_expr = F.expr(f"INTERVAL {gap}")
    marked = df.withColumn(
        "__new_sess",
        F.when(
            F.col(ts).cast("timestamp") - F.lag(ts).over(w) > gap_expr, 1
        ).otherwise(0),
    )
    return marked.withColumn(
        "session_id",
        F.sum("__new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new_sess")


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    ts: str = "ts",
    user: str = "user_id",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Batch sessionization via gaps-and-islands: a session breaks when the
    gap to the previous event of the same user exceeds ``gap``.

    Returns (user, session_id, session_start, session_end, n_events,
    sum_value). Semantics line up with streaming ``F.session_window(ts, gap)``
    so batch and stream agree on session boundaries.
    """
    sess = assign_sessions(df, gap=gap, ts=ts, user=user, order_tiebreak=order_tiebreak)
    return sess.groupBy(user, "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def stream_dedup(
    df: DataFrame,
    keys: list | None = None,
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state: keeps the first event per
    key, dropping later duplicates that arrive within the watermark delay.

    ``dropDuplicatesWithinWatermark`` expires per-key state once the
    watermark passes — state size is bounded by (keys arriving within the
    delay window), not by the full stream history, which is what makes
    exact dedup feasible on an unbounded 100TB/day stream. On a batch
    DataFrame this degrades to plain dropDuplicates for parity testing.
    """
    keys = keys or ["event_id"]
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "10 minutes",
    watermark: str = "1 hour",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream interval join: each left row pairs with right rows of
    the same ``by`` key whose event time falls in
    ``[left_ts - lookback, left_ts]`` (the click-to-impression attribution
    shape from the Structured Streaming join guide).

    On streams BOTH sides get event-time watermarks and the range
    condition bounds join state: Spark retires buffered right rows once
    the left watermark passes ``right_ts + lookback`` — state is bounded
    by (events per lookback window), not stream history, which is what
    makes the join feasible on an unbounded stream. Inner rows emit as
    they match (no watermark wait). On batch frames the same condition
    runs as a plain join, giving stream==batch parity for free.

    Right columns come back ``{right_prefix}``-renamed to keep the output
    unambiguous.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    r = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    rts = f"{right_prefix}{right_ts}"
    cond = (
        (F.col(by) == F.col(f"{right_prefix}{by}"))
        & (F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(rts) <= F.col(left_ts))
    )
    return left.join(r, cond, "inner")


def stream_events(
    spark, path: str, schema=None, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a parquet events directory (file-source streaming).

    ``maxFilesPerTrigger`` is the ingestion-rate knob (the analogue of the
    reference's chunk schedulers, merklev2/ChunkScheduler.java:24-75 — policy
    collapses to a rate limit under Spark's own task scheduling)."""
    from pyspark.sql.types import TimestampNTZType

    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    out = reader.parquet(path)
    # Event-time watermarks require TIMESTAMP (LTZ); parquet written with
    # isAdjustedToUTC=false (e.g. pyarrow timestamp[us] default) arrives as
    # TIMESTAMP_NTZ and withWatermark would throw. Wall-clock values are
    # preserved (interpreted in the session timezone).
    for f in out.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            out = out.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return out


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — the dimension-lookup shape of every
    ingest pipeline (events joined to a user/device/geo table while in
    flight). The static side re-resolves per micro-batch, so a dimension
    refreshed underneath the query (new parquet files in its path) is
    picked up without restarting the stream.

    Stream-static joins are STATELESS (only stream-stream joins buffer
    state), so no watermark is needed; inner/left joins are supported by
    Structured Streaming, and ``how`` defaults to 'left' so late
    dimension rows can't silently drop events. ``broadcast_dim=True``
    (the common case: dimensions fit in memory) makes every micro-batch
    a map-side hash join — no shuffle of the stream whatsoever; pass
    False for big dimensions and let AQE shuffle each micro-batch.

    Runs unchanged on batch frames (stream==batch parity testable).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"stream-static join supports inner/left, got {how!r}")
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_apply_changes(
    changes_stream: DataFrame,
    target_dir: str,
    key_cols,
    op_col: str = "op",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming MERGE sink — the Delta/Iceberg ``MERGE INTO`` streaming
    idiom without a table format: each micro-batch of change rows
    (``op_col`` in upsert/delete) is applied to the keyed parquet snapshot
    at ``target_dir`` via ``operators.cdc.apply_changes``, and the snapshot
    is atomically swapped (write-new-then-rename; a reader sees the old or
    the new snapshot, never a half-written one).

    foreachBatch is the exactly-once boundary Structured Streaming gives a
    non-transactional sink: the checkpoint records the batch id BEFORE the
    swap, so a crash between write and checkpoint replays the batch —
    apply_changes is idempotent per batch (same keys, same rows), making
    replay safe. Within a batch, duplicate change keys fail loudly
    (apply_changes' guard); across batches, later batches win — standard
    CDC ordering, the caller's responsibility to feed in commit order
    (one batch per source commit window).

    Returns the streaming query (caller awaits termination). The batch
    parity property: draining a change stream through this sink equals
    one big apply_changes of all batches applied in order.
    """
    import os
    import shutil
    import tempfile

    from nbdatatools_spark.operators.cdc import apply_changes

    keys = list(key_cols)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = spark.read.parquet(target_dir)
        merged = apply_changes(target, batch_df, keys, op_col=op_col)
        # write beside, swap atomically (rename within the same filesystem)
        parent = os.path.dirname(os.path.abspath(target_dir))
        tmp = tempfile.mkdtemp(prefix="__merge_", dir=parent)
        out = os.path.join(tmp, "snapshot")
        merged.write.mode("overwrite").parquet(out)
        old = target_dir + f".old_{batch_id}"
        os.rename(target_dir, old)
        os.rename(out, target_dir)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)

    writer = changes_stream.writeStream.foreachBatch(apply_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_drift_monitor(
    stream,
    baseline,
    metrics_dir: str,
    vec_col: str = "embedding",
    n_bins: int = 10,
    lo: float = -4.0,
    hi: float = 4.0,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming drift monitor: per micro-batch, compute the per-dimension
    PSI of the batch against a STATIC baseline (operators.analysis
    .embedding_psi) and append one row per dimension to a parquet metrics
    sink tagged with the batch id — the production guardrail that pages
    before a drifted embedding model poisons a corpus build.

    foreachBatch because PSI is a batch-vs-reference comparison, not a
    running aggregate: each micro-batch is its own "current" population.
    The baseline re-resolves per batch (stream_enrich discipline), so a
    refreshed baseline parquet is picked up without restart.
    """
    from nbdatatools_spark.operators.analysis import embedding_psi

    def measure(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        psi = embedding_psi(
            baseline, batch_df, vec=vec_col, n_bins=n_bins, lo=lo, hi=hi
        ).withColumn("batch_id", F.lit(batch_id))
        psi.write.mode("append").parquet(metrics_dir)

    writer = stream.writeStream.foreachBatch(measure).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_cms_sketch(
    stream: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Running count-min sketch over a document STREAM: the same (d, pos)
    cell aggregation as the batch ``operators.lm.cms_cells``, expressed as
    a native streaming aggregation — Spark keeps the running counts as
    aggregation state, and the state is BOUNDED at depth*width cells
    regardless of how much text flows through (the whole point of a
    sketch in a stream: frequency tracking with O(1) memory, no watermark
    or eviction needed because the key space cannot grow).

    Returns the streaming cells frame (d, pos, cnt); drive it with
    outputMode("complete") to a sink (or foreachBatch-snapshot it).
    Stream-equals-batch: draining any prefix of the stream yields exactly
    ``cms_cells`` of the same rows — pinned by
    tests/test_streaming.py::test_stream_cms_equals_batch.
    """
    from nbdatatools_spark.operators.lm import cms_cells

    return cms_cells(stream, text_col=text_col, depth=depth, width=width)


def stream_hll_sketch(
    stream: DataFrame,
    text_col: str = "text",
    precision: int = 8,
) -> DataFrame:
    """Running HyperLogLog registers over a document STREAM: the same
    register build as the batch ``operators.lm.hll_registers``, expressed
    as a native streaming aggregation — groupBy(register) + max(rank)
    keeps the running maxima as aggregation state, BOUNDED at
    ``2^precision`` cells however much text flows through (the HLL
    insert is idempotent and order-free, so no watermark or eviction is
    needed and any drain prefix equals the batch build of the same
    rows).

    Returns the streaming register frame (reg, mx); drive it with
    outputMode("complete") (or foreachBatch-snapshot it) and feed the
    drained registers to the batch estimator arithmetic for a running
    distinct-count readout. Stream-equals-batch pinned by
    tests/test_streaming.py::test_stream_hll_equals_batch.
    """
    from nbdatatools_spark.operators.lm import hll_registers

    return hll_registers(stream, text_col=text_col, precision=precision)


def stream_value_histogram(
    stream: DataFrame,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 100.0,
    n_bins: int = 64,
) -> DataFrame:
    """Running fixed-grid value histogram over a STREAM — the same build
    as the batch ``operators.analysis.value_histogram`` expressed as a
    native streaming aggregation (groupBy(bin) + count), state BOUNDED
    at ``n_bins`` cells however much data flows through; counts are
    order-free and idempotent-merge so no watermark or eviction is
    needed and any drain prefix equals the batch build of the same rows
    (the stream_hll_sketch / stream_cms_sketch pattern — this completes
    the sketch trio: distinct, frequency, QUANTILE).

    Drive with outputMode("complete") and feed the drained bins to
    ``operators.analysis.histogram_quantiles``'s estimator arithmetic
    for a running quantile readout. Stream-equals-batch pinned by
    tests/test_streaming_round7.py.
    """
    from nbdatatools_spark.operators.analysis import value_histogram

    return value_histogram(stream, value_col, lo, hi, n_bins)
