"""Sequence packing: map documents onto fixed-length training sequences
(SURVEY §7.8 training-data extension).

LM training consumes fixed-length token windows; the standard
concat-then-chunk packing lays all documents end-to-end in a deterministic
order and slices the stream every ``max_tokens`` (GPT-3 §2.3 appendix B
input pipeline; T5 "packing"). The pipeline artifact is the doc -> sequence
span map: where each document's tokens start in the global stream and which
sequence window(s) they land in.

Scale shape: the global running sum is the same two-phase partition-offset
pattern as windows.global_row_index (VERDICT r1 #5 — no single-reducer
window): partition-local running sums (Arrow-batched, zero shuffle) + a
P-row offset table broadcast back. The only data shuffle is the initial
range partition on the ordering key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    start_col: str = "start_tok",
    seq_prefix: str = "seq",
) -> DataFrame:
    """Assign each document its token-stream span under concat-then-chunk
    packing at ``max_tokens`` per sequence.

    Documents are laid out in ``order_col`` order (must be a unique total
    order — ties would make spans partition-dependent). Appends:

    - ``start_tok``: first global token index of the document;
    - ``{seq_prefix}_first`` / ``{seq_prefix}_last``: the sequence windows
      containing the document's first and last token (a document longer
      than ``max_tokens`` spans many; an empty document occupies none and
      reports the window its boundary falls in for both);
    - ``{seq_prefix}_offset``: position of the first token within its
      sequence window.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")

    n_part = max(int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    d = (
        df.repartitionByRange(n_part, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )

    # phase 1: partition-local exclusive running sum — Arrow-batched pass in
    # partition order, zero shuffle (a Window.partitionBy(__pid) here would
    # re-exchange the data on __pid; the iterator accumulates instead)
    out_schema = StructType(list(d.schema) + [StructField("__local_start", LongType())])
    tok = token_col

    def local_cumsum(batches):
        running = 0
        for pdf in batches:
            t = pdf[tok].to_numpy()
            starts = t.cumsum() - t + running
            running = int(starts[-1] + t[-1]) if len(t) else running
            yield pdf.assign(__local_start=starts)

    local = d.mapInPandas(local_cumsum, out_schema)

    # phase 2: per-partition token totals -> running offsets (P rows only),
    # broadcast back; both branches reuse the range-partition exchange
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        d.groupBy("__pid")
        .agg(F.sum(tok).cast("long").alias("__cnt"))
        .select("__pid", F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"))
    )

    # integer `div`, not floor(double /): exact for any BIGINT token stream
    # (a 100TB corpus is ~25T tokens — double floor would hold today, but
    # the integer form costs nothing and never degrades)
    start = (F.col("__off") + F.col("__local_start")).cast("long")
    return (
        local.join(F.broadcast(offs), "__pid")
        .withColumn(start_col, start)
        .withColumn(f"{seq_prefix}_first", F.expr(f"{start_col} div {max_tokens}"))
        .withColumn(
            f"{seq_prefix}_last",
            F.expr(
                f"CASE WHEN {tok} > 0"
                f" THEN ({start_col} + {tok} - 1) div {max_tokens}"
                f" ELSE {start_col} div {max_tokens} END"
            ),
        )
        .withColumn(f"{seq_prefix}_offset", F.col(start_col) % max_tokens)
        .drop("__pid", "__local_start", "__off")
    )
