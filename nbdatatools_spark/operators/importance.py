"""DSIR-style importance weighting (SURVEY §7.8 training-data extension).

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169): score every raw document by the log-likelihood ratio of
its features under a TARGET domain model vs the RAW corpus model, then
sample proportionally to the weights. This module computes the feature
models (unigram bag-of-words with add-alpha smoothing over a capped
vocabulary + an out-of-vocabulary bucket) and the per-document log weight;
pair with operators.sampling.hash_sample / stratified_sample for the
resampling step.

Scale shape: two groupBy token-count aggregations (map-side combinable,
16-byte-ish rows), a TakeOrdered vocabulary cap, then ONE broadcast join
of the exploded raw corpus against the (vocab_size)-row ratio table and a
groupBy(doc) sum. No driver-side data paths; the only large shuffle keys
on doc id.

Exactness: per-token log ratios are rounded to 9dp and cast to
DECIMAL(20,9) BEFORE the per-document sum, so the aggregation is exact
integer arithmetic — order-independent across partitions and bit-equal in
any engine (the same decimal-before-arithmetic rule the relational gate
queries use for money sums). A raw double sum here would hash-diverge:
partial-aggregation order is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RATIO_DEC = "decimal(20,9)"
# sum of per-token (count * ratio) terms; wide enough for trillion-token docs
_WEIGHT_DEC = "decimal(38,9)"


def _token_counts(df: DataFrame, text_col: str) -> DataFrame:
    from nbdatatools_spark.functions.text import normalize_text, tokens

    # explode_outer + null drop: see winnow_candidate_pairs (Catalyst
    # InferFiltersFromGenerate would inline the tokenize chain at the scan)
    return (
        df.select(F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("token"))
        .where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    vocab_size: int = 10_000,
    alpha: float = 1.0,
) -> tuple[DataFrame, float]:
    """Per-token log ratios ln(p_target / p_raw) over a capped vocabulary.

    The vocabulary is the top ``vocab_size`` tokens by combined count
    (ties broken by token — deterministic); everything else shares one OOV
    bucket. Both unigram models use add-``alpha`` smoothing over V+1
    outcomes (V vocab tokens + OOV), so zero-count tokens and the OOV
    bucket stay finite.

    Returns ``(ratios_df, oov_ratio)``: ``ratios_df`` has
    ``(token, log_ratio DECIMAL(20,9))`` and is vocab-sized (broadcastable
    by construction); ``oov_ratio`` is the float log ratio of the OOV
    bucket, applied to tokens outside the vocabulary.
    """
    rc = _token_counts(raw, text_col).withColumnRenamed("n", "n_raw")
    tc = _token_counts(target, text_col).withColumnRenamed("n", "n_tgt")
    joined = rc.join(tc, "token", "full_outer").select(
        "token",
        F.coalesce("n_raw", F.lit(0)).alias("n_raw"),
        F.coalesce("n_tgt", F.lit(0)).alias("n_tgt"),
    )
    vocab = joined.orderBy(
        (F.col("n_raw") + F.col("n_tgt")).desc(), F.col("token").asc()
    ).limit(vocab_size)

    # totals over the FULL corpora (driver-side scalars; tiny aggregates)
    tot = joined.agg(
        F.sum("n_raw").alias("tr"), F.sum("n_tgt").alias("tt")
    ).collect()[0]
    in_vocab = vocab.agg(
        F.sum("n_raw").alias("vr"), F.sum("n_tgt").alias("vt")
    ).collect()[0]
    n_raw_total, n_tgt_total = int(tot["tr"] or 0), int(tot["tt"] or 0)
    oov_raw = n_raw_total - int(in_vocab["vr"] or 0)
    oov_tgt = n_tgt_total - int(in_vocab["vt"] or 0)

    v1 = vocab_size + 1  # V vocab outcomes + the OOV bucket
    denom_t = float(n_tgt_total) + alpha * v1
    denom_r = float(n_raw_total) + alpha * v1
    log_norm = F.log(F.lit(denom_r) / F.lit(denom_t))

    ratios = vocab.select(
        "token",
        F.round(
            F.log((F.col("n_tgt") + alpha) / (F.col("n_raw") + alpha)) + log_norm, 9
        )
        .cast(_RATIO_DEC)
        .alias("log_ratio"),
    )
    import math

    oov_ratio = round(
        math.log((oov_tgt + alpha) / (oov_raw + alpha)) + math.log(denom_r / denom_t),
        9,
    )
    return ratios, oov_ratio


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance log-weight: sum over the document's
    tokens of ln(p_target/p_raw). Higher = more target-like. Returns
    ``(id_col, n_tokens, dsir_logweight DOUBLE)``; documents with no
    tokens get weight 0."""
    from nbdatatools_spark.functions.text import normalize_text, tokens

    ratios, oov_ratio = dsir_log_ratios(raw, target, text_col, vocab_size, alpha)
    oov = F.lit(oov_ratio).cast(_RATIO_DEC)

    ex = raw.select(
        F.col(id_col),
        F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("token"),
    ).where(F.col("token").isNotNull())
    scored = ex.join(F.broadcast(ratios), "token", "left").select(
        id_col, F.coalesce("log_ratio", oov).alias("log_ratio")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("log_ratio").cast(_WEIGHT_DEC)).alias("__w"),
    )
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("__w").cast("double"), F.lit(0.0)).alias(
                "dsir_logweight"
            ),
        )
    )
