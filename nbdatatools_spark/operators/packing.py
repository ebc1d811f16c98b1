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

from typing import Sequence

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
        # pin the partitioning: the mapInPandas branch and the P-row offset
        # branch must read the SAME materialized exchange (the
        # global_row_index sf0.1 AQE defect)
        .localCheckpoint(eager=False)
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


def pack_sequences_bucketed(
    df: DataFrame,
    max_tokens: int,
    bucket_col: str,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    start_col: str = "start_tok",
    seq_prefix: str = "seq",
) -> DataFrame:
    """Length-bucketed (curriculum) packing: an independent
    concat-then-chunk token stream PER ``bucket_col`` value — the padding-
    waste reduction of T5/fairseq length-bucketed batching (similar-length
    docs pack together, so sequences rarely straddle a short doc against a
    long one). Output columns match :func:`pack_sequences`, with
    ``start_tok`` / ``{seq_prefix}_*`` relative to the document's OWN
    bucket stream.

    Scale shape: same two-phase partition-offset cumsum as
    :func:`pack_sequences`, keyed by bucket — data is range-partitioned on
    (bucket, order) so each bucket is contiguous, the Arrow-batched local
    pass resets its accumulator at bucket boundaries (vectorized groupwise
    cumsum, no per-row Python), and the offset table is per (partition,
    bucket) — P x B_per_partition rows, still tiny. A giant bucket spreads
    over MANY partitions (range partitioning splits it), unlike a naive
    ``Window.partitionBy(bucket)`` which would serialize it through one
    reducer.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    import numpy as np

    n_part = max(int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    d = (
        df.repartitionByRange(n_part, F.col(bucket_col), F.col(order_col))
        .sortWithinPartitions(bucket_col, order_col)
        .withColumn("__pid", F.spark_partition_id())
        # pin the partitioning (the global_row_index sf0.1 AQE defect)
        .localCheckpoint(eager=False)
    )
    out_schema = StructType(list(d.schema) + [StructField("__local_start", LongType())])
    tok, bkt = token_col, bucket_col

    def local_cumsum(batches):
        run = 0  # running token count of the open bucket
        prev = None  # the open bucket's value (None before any row)
        for pdf in batches:
            t = pdf[tok].to_numpy()
            b = pdf[bkt].to_numpy()
            n = len(t)
            if n == 0:
                yield pdf.assign(__local_start=np.array([], dtype=np.int64))
                continue
            cs = t.cumsum() - t  # exclusive cumsum over the batch
            # first row index of each bucket group within the batch
            firsts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
            sizes = np.diff(np.r_[firsts, n])
            starts = cs - np.repeat(cs[firsts], sizes)
            if prev is not None and b[0] == prev:
                starts[: sizes[0]] += run
            run = int(starts[n - 1] + t[n - 1])
            prev = b[n - 1]
            yield pdf.assign(__local_start=starts.astype(np.int64))

    local = d.mapInPandas(local_cumsum, out_schema)

    # per-(pid, bucket) totals -> per-bucket running offsets across
    # partitions (window over the tiny totals table, keyed by bucket)
    woff = (
        Window.partitionBy("__b")
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        d.groupBy(F.col("__pid"), F.col(bkt).alias("__b"))
        .agg(F.sum(tok).cast("long").alias("__cnt"))
        .select(
            F.col("__pid").alias("__opid"),
            "__b",
            F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"),
        )
    )
    start = (F.col("__off") + F.col("__local_start")).cast("long")
    return (
        local.join(
            F.broadcast(offs),
            (F.col("__pid") == F.col("__opid"))
            & F.col(bkt).eqNullSafe(F.col("__b")),
        )
        .drop("__opid")
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
        .drop("__pid", "__local_start", "__b", "__off")
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    ``chunk_size``-token windows whose starts step by ``stride`` tokens
    (stride < chunk_size ⇒ overlapping chunks — the retrieval/context-window
    preparation shape; stride == chunk_size ⇒ disjoint chunks).

    Reference scope analogue: the reference slices vector files into
    fixed-size logical windows (datatools-vectordata window slicing); this
    is the text-column counterpart a training/RAG pipeline needs.

    Scale shape: pure map-side Catalyst — normalize, split once (let-bound,
    see functions.text.word_shingles for the re-evaluation trap), generate
    starts with ``sequence(0, n-1, stride)``, explode, slice. No shuffle,
    no UDF; chunking 100 TB is embarrassingly parallel.

    Output: one row per chunk — (id, chunk_id, start_token, n_chunk_tokens,
    chunk_text). Empty/whitespace-only documents yield zero chunks.
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    stride = chunk_size if stride is None else stride
    if not 0 < stride <= chunk_size:
        raise ValueError(
            f"stride must be in (0, chunk_size], got {stride} (chunk_size {chunk_size})"
        )
    from ..functions.text import normalize_text

    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__toks"),
    ).where(F.element_at("__toks", 1) != "")
    out = (
        toks.select(
            "id",
            "__toks",
            F.size("__toks").alias("__n"),
            F.posexplode(
                F.sequence(F.lit(0), F.size("__toks") - 1, F.lit(stride))
            ).alias("chunk_id", "start_token"),
        )
        .select(
            F.col("id").alias(id_col),
            "chunk_id",
            "start_token",
            F.least(F.lit(chunk_size), F.col("__n") - F.col("start_token")).alias(
                "n_chunk_tokens"
            ),
            F.array_join(
                F.slice(F.col("__toks"), F.col("start_token") + 1, F.lit(chunk_size)),
                " ",
            ).alias("chunk_text"),
        )
    )
    return out


def packing_report(
    df: DataFrame,
    max_tokens_candidates: Sequence[int],
    token_col: str = "n_tokens",
) -> DataFrame:
    """Packing-parameter tuning readout (the pack_sequences companion of
    minhash_quality_report / ann_tuning_report): for each candidate
    sequence length, the sequence count, padding waste, and oversized-doc
    exposure a concat-then-chunk packing run would produce — the measured
    answer to "train at 2k, 4k, or 8k?" before a 100-TB tokenization run
    commits.

    One corpus pass computes (total_tokens, n_docs, max_doc_tokens,
    per-candidate oversized-doc counts) as a single map-side-combinable
    aggregate; every report row is closed-form arithmetic on those
    scalars. Concat-then-chunk wastes only the final partial sequence
    (padding_frac = tail padding / capacity); docs longer than the
    candidate straddle sequence boundaries (n_oversized_docs exposes how
    often attention masks must cut).

    Returns one row per candidate: ``(max_tokens, n_sequences,
    total_tokens, padding_tokens, padding_frac, n_oversized_docs)``.
    """
    cands = sorted({int(c) for c in max_tokens_candidates})
    if not cands or cands[0] < 1:
        raise ValueError(
            f"max_tokens_candidates must be positive ints, got {max_tokens_candidates}"
        )
    tok = F.col(token_col).cast("long")
    aggs = [
        F.sum(tok).alias("__total"),
        F.count(F.lit(1)).alias("__docs"),
    ] + [
        F.sum(F.when(tok > c, 1).otherwise(0)).cast("long").alias(f"__over_{c}")
        for c in cands
    ]
    row = df.agg(*aggs)
    spark = df.sparkSession
    out = None
    for c in cands:
        n_seq = F.ceil(F.col("__total") / F.lit(float(c))).cast("long")
        pad = (n_seq * F.lit(c) - F.col("__total")).cast("long")
        one = row.select(
            F.lit(c).alias("max_tokens"),
            n_seq.alias("n_sequences"),
            F.col("__total").cast("long").alias("total_tokens"),
            pad.alias("padding_tokens"),
            F.when(n_seq > 0, F.round(pad / (n_seq * F.lit(float(c))), 6))
            .otherwise(F.lit(0.0))
            .alias("padding_frac"),
            F.col(f"__over_{c}").alias("n_oversized_docs"),
        )
        out = one if out is None else out.unionByName(one)
    return out


def contrastive_chunk_pairs(
    df: DataFrame,
    chunk_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contrastive training-pair mining from document chunks: anchors and
    positives are ADJACENT disjoint chunks of the same document (the
    within-document coherence signal contrastive encoders train on);
    each pair gets a deterministic hard-ish negative — the FIRST chunk
    of the next chunk-bearing document in id order (in-corpus, not
    random, and never from the anchor's own document).

    Scale shape: chunking is map-side (chunk_documents); adjacent pairs
    are one self-join on (id, chunk_id+1) — equi-keyed; the negative
    attaches via the two-phase partition-offset index
    (windows.global_row_index) over the DISTINCT chunked-doc id table:
    next-doc-in-id-order = the doc at (idx + 1) mod n, one keyed
    self-join on the index — the doc-grain table is corpus-sized (one
    row per document), so an unpartitioned lead() window here would
    serialize every doc id through one reducer at 100 TB (VERDICT r8
    task #3); the index formulation keeps every stage keyed.

    Returns (doc_id, chunk_a, chunk_b, anchor, positive, negative_doc,
    negative); documents with < 2 chunks contribute nothing; the LAST
    chunked document wraps to the first (so every pair has a negative).
    Degenerate case: when only ONE document yields chunks, the wrap would
    point back at the anchor's own document — the pair is emitted with
    NULL negative_doc/negative instead (never a same-document negative).
    """
    chunks = chunk_documents(
        df, chunk_size=chunk_size, stride=None, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=False)
    a = chunks.select(
        F.col(id_col).alias("doc_id"),
        F.col("chunk_id").alias("chunk_a"),
        F.col("chunk_text").alias("anchor"),
    )
    b = chunks.select(
        F.col(id_col).alias("doc_id"),
        (F.col("chunk_id") - 1).alias("chunk_a"),
        F.col("chunk_id").alias("chunk_b"),
        F.col("chunk_text").alias("positive"),
    )
    pairs = a.join(b, ["doc_id", "chunk_a"])
    from nbdatatools_spark.operators.windows import global_row_index

    docs_with_chunks = chunks.select(F.col(id_col).alias("doc_id")).distinct()
    idx = global_row_index(docs_with_chunks, ["doc_id"], out="__idx").localCheckpoint(
        eager=False
    )
    total = idx.agg(F.count(F.lit(1)).alias("__n"))
    tgt = idx.crossJoin(F.broadcast(total)).select(
        "doc_id", ((F.col("__idx") + 1) % F.col("__n")).alias("__tgt")
    )
    # single-chunked-doc corpus: the wrap points back at the anchor's own
    # document — NULL it out rather than ship a same-doc "negative"
    nxt = tgt.join(
        idx.select(F.col("__idx").alias("__tgt"), F.col("doc_id").alias("__nd")),
        "__tgt",
    ).select(
        "doc_id",
        F.when(F.col("__nd") != F.col("doc_id"), F.col("__nd")).alias(
            "negative_doc"
        ),
    )
    first_chunks = chunks.where(F.col("chunk_id") == 0).select(
        F.col(id_col).alias("negative_doc"), F.col("chunk_text").alias("negative")
    )
    return (
        pairs.join(nxt, "doc_id")
        .join(first_chunks, "negative_doc", "left")
        .select(
            "doc_id", "chunk_a", "chunk_b", "anchor", "positive",
            "negative_doc", "negative",
        )
        .orderBy("doc_id", "chunk_a")
    )


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_rate: float = 0.15,
    mean_span: int = 3,
    seed: int = 42,
) -> DataFrame:
    """T5-style span-corruption pair generation (Raffel et al. 2020 §3.1.4
    / 3.3.4): mask contiguous token spans, replace each span with a
    sentinel in the input and emit the masked spans behind the same
    sentinels as the target — the standard denoising-objective data prep.

    Determinism contract: spans are a pure function of (id, position,
    seed) via md5-uint52 hashes — partition-invariant, re-run-stable, and
    engine-portable (a DuckDB oracle rebuilds the exact masks). A span
    starts at position j iff ``h(id:j:seed) < (mask_rate/mean_span)*2^52``;
    its length is ``1 + h2 % (2*mean_span - 1)`` (uniform on [1,
    2*mean_span-1], mean = mean_span). Overlapping spans merge.

    Plan shape: one posexplode -> map-side start/length projection ->
    per-doc window pass (partitionBy id — doc-grain keys, embarrassingly
    parallel; reach = max(start_pos + len) over the bounded trailing
    frame, so masked(i) is a single bounded-frame window max, no
    recursion) -> one groupBy(id) rebuilds input/target with ordered
    sentinel numbering. No shuffle wider than the (id, pos) explode.

    Returns (id, n_tokens, n_masked, n_spans, corrupted, target).
    """
    from nbdatatools_spark.functions.text import normalize_text, tokens

    if not 0.0 < mask_rate < 1.0:
        raise ValueError(f"mask_rate must be in (0, 1), got {mask_rate}")
    if mean_span < 1:
        raise ValueError(f"mean_span must be >= 1, got {mean_span}")
    span_mod = 2 * mean_span - 1  # lengths 1..span_mod, mean = mean_span
    p_start = mask_rate / mean_span
    thresh = int(p_start * (1 << 52))

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(tokens(normalize_text(F.col(text_col)))).alias(
            "pos", "tok"
        ),
    ).where(F.col("tok").isNotNull() & (F.length("tok") > 0))
    key = F.concat_ws(
        ":", F.col("id").cast("string"), F.col("pos").cast("string"), F.lit(str(seed))
    )
    h1 = F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(key), 14, 13), 16, 10).cast("long")
    marked = toks.select(
        "id",
        "pos",
        "tok",
        (h1 < F.lit(thresh)).alias("start"),
        (F.lit(1) + (h2 % F.lit(span_mod))).cast("int").alias("len"),
    )

    w_reach = (
        Window.partitionBy("id").orderBy("pos").rowsBetween(-(span_mod - 1), 0)
    )
    reach = F.max(
        F.when(F.col("start"), F.col("pos") + F.col("len"))
    ).over(w_reach)
    flagged = marked.select(
        "id", "pos", "tok", "start", (F.coalesce(reach, F.lit(-1)) > F.col("pos")).alias("masked")
    )
    w_ord = Window.partitionBy("id").orderBy("pos")
    spans = flagged.select(
        "id",
        "pos",
        "tok",
        "masked",
        (
            F.col("masked")
            & ~F.coalesce(F.lag("masked").over(w_ord), F.lit(False))
        ).alias("span_start"),
    ).withColumn(
        "span_id",
        (F.sum(F.col("span_start").cast("int")).over(w_ord) - 1).cast("int"),
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("span_id"), F.lit(">"))
    pieces = spans.select(
        "id",
        "pos",
        "masked",
        "span_start",
        F.when(F.col("span_start"), sentinel)
        .when(~F.col("masked"), F.col("tok"))
        .alias("in_piece"),
        F.when(F.col("span_start"), F.concat(sentinel, F.lit(" "), F.col("tok")))
        .when(F.col("masked"), F.col("tok"))
        .alias("tgt_piece"),
    )

    def joined(col):
        return F.concat_ws(
            " ",
            F.filter(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", F.col(col).alias("p")))),
                    lambda s: s["p"],
                ),
                lambda x: x.isNotNull(),
            ),
        )

    return (
        pieces.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("masked").cast("int")).cast("int").alias("n_masked"),
            F.sum(F.col("span_start").cast("int")).cast("int").alias("n_spans"),
            joined("in_piece").alias("corrupted"),
            joined("tgt_piece").alias("target"),
        )
        .orderBy("id")
    )


def length_batching_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 32,
) -> DataFrame:
    """Padding-waste audit of length-grouped vs arrival-order batching —
    the measurement behind the classic training-loader optimization:
    batching sequences sorted by length makes every batch near-uniform,
    so padding-to-max wastes almost nothing, while arrival-order batches
    pay ``batch_max - len`` per sequence. Run it BEFORE wiring a
    length-bucketed loader to know what the reorder actually buys.

    Both strategies are measured with the same accounting: documents get
    a global row index in strategy order (the two-phase
    windows.global_row_index discipline — range partition + local index
    + broadcast offsets, no single-reducer window), batch = idx div
    ``batch_size``, and each batch pays ``n_in_batch * max_len -
    sum_len`` padding tokens (the trailing partial batch pays only its
    own size). Everything is integer counts; the ratio divides at the
    end.

    Returns two rows ``(strategy, n_docs, n_batches, total_tokens,
    padded_tokens, waste_ratio)`` — strategy in ('arrival', 'sorted'),
    ordered; waste_ratio = padded / (padded + total) at 6dp.
    """
    from nbdatatools_spark.functions.text import token_count
    from nbdatatools_spark.operators.windows import global_row_index

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    base = df.select(
        F.col(id_col).alias("__id"),
        token_count(F.col(text_col)).cast("long").alias("__len"),
    ).localCheckpoint(eager=False)

    def audit(order_cols, name):
        idx = global_row_index(base, order_cols, out="__idx")
        per = (
            idx.select(
                F.floor(F.col("__idx") / F.lit(batch_size))
                .cast("long")
                .alias("__b"),
                "__len",
            )
            .groupBy("__b")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.max("__len").alias("__mx"),
                F.sum("__len").alias("__sm"),
            )
        )
        return per.agg(
            F.sum("__n").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_batches"),
            F.sum("__sm").cast("bigint").alias("total_tokens"),
            F.sum(F.col("__n") * F.col("__mx") - F.col("__sm"))
            .cast("bigint")
            .alias("padded_tokens"),
        ).select(F.lit(name).alias("strategy"), "*")

    rows = audit([F.col("__id")], "arrival").unionAll(
        audit([F.col("__len"), F.col("__id")], "sorted")
    )
    return rows.select(
        "strategy",
        "n_docs",
        "n_batches",
        "total_tokens",
        "padded_tokens",
        F.when(
            F.col("padded_tokens") + F.col("total_tokens") > 0,
            F.round(
                F.col("padded_tokens")
                / (F.col("padded_tokens") + F.col("total_tokens")),
                6,
            ),
        ).alias("waste_ratio"),
    ).orderBy("strategy")


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    id_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Deterministic near-balanced shard assignment by weight (token
    count): the output-sharding step of a training-data pipeline — N
    files whose token totals match, so no data-loader rank starves.

    Greedy shape: order rows by (weight DESC, id ASC) and deal them
    boustrophedon (serpentine) across shards — shard
    ``idx % (2n) < n ? idx % n : n - 1 - idx % n`` — the classic
    card-dealing balance trick: each full double-round gives every
    shard exactly one heavy and one light pick, so totals track the
    optimum closely without any sequential bin-packing state.

    Scale shape: ONE two-phase global row index over (weight DESC, id)
    (windows.global_row_index — range-partitioned, no single-reducer
    window) + a pure modular projection. Fully deterministic and
    engine-replayable (integer arithmetic on the index).

    Returns ``df`` + ``out_col`` (int shard id).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from nbdatatools_spark.operators.windows import global_row_index

    idx = global_row_index(
        df, [F.col(weight_col).desc(), F.col(id_col).asc()], out="__idx"
    )
    m = F.col("__idx") % F.lit(2 * n_shards)
    shard = F.when(m < n_shards, m).otherwise(2 * n_shards - 1 - m)
    return idx.withColumn(out_col, shard.cast("int")).drop("__idx")


def shard_balance_report(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard totals for :func:`balanced_shards` — the balance audit
    a shard writer logs: ``(shard, n_rows, total_weight)`` plus each
    shard's ratio to the mean shard weight (1.0 = perfectly even)."""
    assigned = balanced_shards(df, n_shards, weight_col, id_col)
    per = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(weight_col).cast("long")).alias("total_weight"),
    )
    mean = per.agg(
        (F.sum("total_weight").cast("double") / F.count(F.lit(1))).alias("__m")
    )
    return (
        per.crossJoin(F.broadcast(mean))
        .select(
            "shard",
            "n_rows",
            "total_weight",
            F.round(F.col("total_weight") / F.col("__m"), 6).alias(
                "weight_ratio"
            ),
        )
        .orderBy("shard")
    )


def shard_mixing_report(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shard mixing audit for :func:`balanced_shards`: per-shard SOURCE
    entropy vs the corpus's — training shards must not only balance
    token mass (shard_balance_report) but MIX sources, or a data-loader
    rank sees one domain for minutes at a time and the loss curve
    staircases.

        H_shard = -sum_g p_g ln p_g   over the shard's group shares
        mixing_ratio = H_shard / H_corpus   (1 = perfectly mixed)

    Returns ``(shard, n_rows, n_groups, entropy, mixing_ratio)`` per
    shard at 6dp, ordered by shard; mixing_ratio NULL when the corpus
    itself is single-group.

    Plan: the balanced_shards assignment (two-phase global index) -> one
    (shard, group) count aggregate -> shard-level DECIMAL entropy
    reduce + a 1-row corpus entropy broadcast. Log terms round to 9dp
    so both engines agree.
    """
    assigned = balanced_shards(
        df, n_shards, weight_col, id_col=id_col, out_col="__shard"
    )
    cells = assigned.groupBy("__shard", F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__n")
    ).localCheckpoint(eager=False)

    def _dsum(expr):
        return F.sum(F.round(expr, 9).cast("decimal(30,9)")).cast("double")

    def _entropy(grouped, key):
        tot = grouped.groupBy(*key).agg(F.sum("__n").alias("__t"))
        j = grouped.join(F.broadcast(tot), list(key)) if key else grouped.crossJoin(
            F.broadcast(tot)
        )
        p = F.col("__n").cast("double") / F.col("__t").cast("double")
        return j.groupBy(*key).agg(
            F.sum("__n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_groups"),
            (-_dsum(p * F.round(F.log(p), 9))).alias("entropy"),
        )

    per_shard = _entropy(cells, ("__shard",))
    corpus = _entropy(
        cells.groupBy("__g").agg(F.sum("__n").alias("__n")), ()
    ).select(F.col("entropy").alias("__hc"))
    return (
        per_shard.crossJoin(F.broadcast(corpus))
        .select(
            F.col("__shard").alias("shard"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_groups").cast("int").alias("n_groups"),
            (F.round("entropy", 6) + 0.0).alias("entropy"),
            (
                F.round(
                    F.when(F.col("__hc") > 0.0, F.col("entropy") / F.col("__hc")),
                    6,
                )
                + 0.0
            ).alias("mixing_ratio"),
        )
        .orderBy("shard")
    )


def packing_efficiency(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Packing-quality audit of concat-then-chunk at ``max_tokens``: the
    numbers a pipeline owner checks before committing a sequence budget
    — how much attention-contamination the packing creates (documents
    split across sequence boundaries attend across unrelated context)
    and how much budget the stream shape wastes:

    - ``split_docs`` / ``split_frac``: non-empty documents whose span
      crosses a sequence boundary (seq_first != seq_last),
    - ``docs_per_seq_mean``: mean distinct documents TOUCHING a
      sequence (sum of per-doc window counts / n_seqs — the
      cross-contamination fan-in),
    - ``tail_waste_tokens``: padding the final partial sequence needs.

    Returns ONE row ``(n_docs, n_nonempty, total_tokens, n_seqs,
    split_docs, split_frac, docs_per_seq_mean, tail_waste_tokens)``;
    ratios at 6dp, everything else exact integers. Empty inputs return
    zero counts with NULL ratios.

    Scale shape: :func:`pack_sequences`'s two-phase partition-offset
    cumsum (no single-reducer window), then ONE map-side-combinable
    aggregate over the packed frame.
    """
    packed = pack_sequences(
        df, max_tokens, token_col=token_col, order_col=order_col
    )
    nonempty = F.col(token_col) > 0
    spans = F.when(nonempty, F.col("seq_last") - F.col("seq_first") + 1)
    agg = packed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(nonempty.cast("int")).cast("bigint").alias("n_nonempty"),
        F.sum(F.col(token_col)).cast("bigint").alias("total_tokens"),
        F.sum(
            F.when(
                nonempty & (F.col("seq_last") != F.col("seq_first")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("split_docs"),
        F.sum(spans).cast("bigint").alias("__touches"),
    )
    n_seqs = (
        F.when(
            F.col("total_tokens") > 0,
            F.floor(
                (F.col("total_tokens") + max_tokens - 1) / max_tokens
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return agg.select(
        "n_docs",
        "n_nonempty",
        "total_tokens",
        n_seqs.alias("n_seqs"),
        "split_docs",
        (
            F.round(
                F.when(
                    F.col("n_nonempty") > 0,
                    F.col("split_docs") / F.col("n_nonempty").cast("double"),
                ),
                6,
            )
            + 0.0
        ).alias("split_frac"),
        (
            F.round(
                F.when(
                    n_seqs > 0,
                    F.col("__touches") / n_seqs.cast("double"),
                ),
                6,
            )
            + 0.0
        ).alias("docs_per_seq_mean"),
        F.when(
            F.col("total_tokens") > 0,
            (max_tokens - F.col("total_tokens") % max_tokens) % max_tokens,
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("tail_waste_tokens"),
    )
