"""Declarative corpus-pipeline runner: a pipeline is DATA (a list of named
steps with params — loadable from YAML/JSON), not code. The composition
surface over the training-data operators: a curation run becomes a config
artifact that is diffable, reviewable, and replayable, and the runner
builds ONE lazily-planned DataFrame chain (Catalyst optimizes across step
boundaries exactly as it does for the hand-written doc_training_pipeline
gate).

    steps:
      - op: strip_markup
      - op: lang_filter
        langs: [en]
      - op: quality_filter
        min_score: 0.3
      - op: exact_dedup
      - op: split
        fractions: [0.9, 0.05, 0.05]

Every step maps a documents frame to a documents frame (filter or
projection); ``run_pipeline`` returns the composed frame plus an optional
per-step row-count report (each count is an action — pass
``count_steps=False`` for pure lazy composition).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _op_strip_markup(df, text_col="text", **_):
    from nbdatatools_spark.functions.text import strip_markup

    return df.withColumn(text_col, strip_markup(F.col(text_col)))


def _op_redact_pii(df, text_col="text", **_):
    from nbdatatools_spark.functions.text import redact_pii

    return df.withColumn(text_col, redact_pii(F.col(text_col)))


def _op_lang_filter(df, langs=("en",), lang_col="lang", **_):
    return df.where(F.col(lang_col).isin(*list(langs)))


def _op_quality_filter(df, min_score=0.3, text_col="text", **_):
    from nbdatatools_spark.functions.text import quality_score

    return df.where(F.round(quality_score(F.col(text_col)), 6) >= float(min_score))


def _op_gopher_filter(df, text_col="text", **_):
    from nbdatatools_spark.functions.text import gopher_quality_flags

    return df.where(gopher_quality_flags(F.col(text_col))["keep"])


def _op_repetition_filter(df, max_dup_line_frac=0.3, text_col="text", **_):
    from nbdatatools_spark.functions.text import dup_line_fraction

    return df.where(dup_line_fraction(F.col(text_col)) <= float(max_dup_line_frac))


def _op_fineweb_filter(df, text_col="text", langs=None, lang_col="lang", **_):
    """FineWeb composite preset (Penedo et al. 2024): language gate (when
    ``langs`` given and the column exists) AND gopher_quality_flags.keep
    AND the fineweb_flags line-shape/repetition/placeholder conjunction —
    one map-side predicate stack, no shuffle."""
    from nbdatatools_spark.functions.text import (
        fineweb_flags,
        gopher_quality_flags,
    )

    keep = (
        gopher_quality_flags(F.col(text_col))["keep"]
        & fineweb_flags(F.col(text_col))["keep"]
    )
    if langs and lang_col in df.columns:
        keep = keep & F.col(lang_col).isin(*list(langs))
    return df.where(keep)


def _op_c4_clean(df, min_words=3, min_sentences=3, text_col="text", **_):
    from nbdatatools_spark.functions.text import c4_clean_lines, c4_page_keep

    cleaned = df.withColumn(
        text_col, c4_clean_lines(F.col(text_col), min_words=int(min_words))
    )
    return cleaned.where(c4_page_keep(F.col(text_col), min_sentences=int(min_sentences)))


def _op_exact_dedup(df, id_col="doc_id", text_col="text", **_):
    from nbdatatools_spark.operators.dedup import exact_dedup

    return exact_dedup(df, id_col=id_col, text_col=text_col)


def _op_minhash_dedup(df, **params):
    from nbdatatools_spark.operators.dedup import minhash_dedup

    return minhash_dedup(df, **params)


def _op_split(df, fractions=(0.98, 0.01, 0.01), names=("train", "val", "test"),
              key_col="doc_id", seed=42, **_):
    from nbdatatools_spark.operators.sampling import train_val_test_split

    return train_val_test_split(
        df, fractions=tuple(float(x) for x in fractions), names=tuple(names),
        key_col=key_col, seed=int(seed),
    )


def _op_lm_filter(df, max_score=8.0, text_col="text", id_col="doc_id", **_):
    """Self-scored bigram-LM fluency filter (CCNet-style): drop documents
    whose mean -ln p(w2|w1) under a model fit on the batch itself exceeds
    ``max_score``. Documents too short to score (< 2 tokens) are kept —
    the length rules, not the LM, own that call."""
    from nbdatatools_spark.operators.lm import bigram_lm_score

    scored = bigram_lm_score(df, text_col=text_col, id_col=id_col)
    keep = scored.where(
        F.col("lm_score").isNull() | (F.col("lm_score") <= float(max_score))
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


def _op_remove_dup_spans(df, k=13, min_occurrences=2, id_col="doc_id",
                         text_col="text", **_):
    """ExactSubstr duplicated-span removal as a pipeline step (Lee et al.
    2107.06499): text is REWRITTEN (duplicated k-token windows cut), all
    other columns carried through on one id-keyed join."""
    from nbdatatools_spark.operators.dedup import remove_duplicate_spans

    cleaned = remove_duplicate_spans(
        df, id_col=id_col, text_col=text_col, k=int(k),
        min_occurrences=int(min_occurrences),
    ).select(F.col(id_col), F.col("clean_text"))
    others = [c for c in df.columns if c != text_col]
    return (
        df.select(*others)
        .join(cleaned, id_col)
        .withColumnRenamed("clean_text", text_col)
    )


def _op_perplexity_filter(df, keep=("head", "middle"), n_buckets=3,
                          id_col="doc_id", text_col="text", **_):
    """CCNet tier filter: keep only documents in the named perplexity
    buckets (plus unscored short docs if 'unscored' is listed)."""
    from nbdatatools_spark.operators.lm import perplexity_buckets

    tiers = perplexity_buckets(
        df, text_col=text_col, id_col=id_col, n_buckets=int(n_buckets)
    ).where(F.col("bucket_label").isin(*list(keep))).select(id_col)
    return df.join(tiers, id_col, "left_semi")


def _op_token_budget(df, budget_tokens=1_000_000, id_col="doc_id",
                     text_col="text", **_):
    """Best-first token-budget selection (the 'best N tokens' assembly
    cut): rank by 6dp-rounded quality_score, keep the whole-document
    prefix that fits the budget."""
    from nbdatatools_spark.functions.text import quality_score, token_count
    from nbdatatools_spark.operators.sampling import token_budget_select

    scored = df.withColumn(
        "__q", F.round(quality_score(F.col(text_col)), 6)
    ).withColumn("__nt", token_count(F.col(text_col)).cast("long"))
    return token_budget_select(
        scored, int(budget_tokens), quality_col="__q", token_col="__nt",
        id_col=id_col,
    ).drop("__q", "__nt", "start_tok")


def _op_domain_cap(df, cap=100, strata_col="source", key_col="doc_id", seed=42, **_):
    from nbdatatools_spark.operators.sampling import domain_cap

    return domain_cap(df, cap=int(cap), strata_col=strata_col, key_col=key_col, seed=int(seed))


def _op_stratified_sample(df, rates=None, strata_col="source", key_col="doc_id",
                          default_rate=1.0, seed=42, **_):
    from nbdatatools_spark.operators.sampling import stratified_sample

    return stratified_sample(
        df, rates=dict(rates or {}), strata_col=strata_col, key_col=key_col,
        default_rate=float(default_rate), seed=int(seed),
    )


def _op_sentence_dedup(df, min_docs=2, id_col="doc_id", text_col="text", **_):
    """Cross-document repeated-sentence removal (round 7): replaces the
    text column with the sentence-deduped rebuild, preserving every
    other column (ONE equi-join back on id)."""
    from nbdatatools_spark.operators.dedup import sentence_dedup

    sd = sentence_dedup(
        df, id_col=id_col, text_col=text_col, min_docs=int(min_docs)
    ).select(id_col, F.col("text_dedup").alias(text_col))
    return df.drop(text_col).join(sd, id_col)


def _op_temperature_sample(df, temperature=2.0, strata_col="source",
                           key_col="doc_id", cap=1.0, seed=42, **_):
    """Temperature-balanced downsampling (round 7): rates = p ∝ w^(1/T)
    from temperature_mixture_rates, applied as the deterministic
    per-stratum hash sample (the stratified_sample convention). The
    rates table is strata-bounded — broadcast join, no driver collect."""
    from nbdatatools_spark.operators.sampling import (
        _HASH_SPACE,
        sample_hash,
        temperature_mixture_rates,
    )

    rates = temperature_mixture_rates(
        df, strata_col=strata_col, temperature=float(temperature), cap=float(cap)
    ).select(F.col("stratum").alias(strata_col), "rate")
    joined = df.join(F.broadcast(rates), strata_col, "left")
    return joined.where(
        sample_hash(F.col(key_col), int(seed))
        < F.coalesce(F.col("rate"), F.lit(1.0)) * _HASH_SPACE
    ).drop("rate")


def _op_schema_check(df, columns=None, **_):
    """Data-contract guard: fail the pipeline LOUDLY at plan time if the
    frame is missing expected columns (optionally with types). ``columns``
    is a dict {name: type_string} or a list of names; a mismatch raises
    before any job runs — config errors must not surface as downstream
    AnalysisExceptions three steps later."""
    if not columns:
        raise ValueError("schema_check needs 'columns' (list or {name: type})")
    have = dict(df.dtypes)
    if isinstance(columns, dict):
        wanted = columns.items()
    else:
        wanted = ((c, None) for c in columns)
    for name, typ in wanted:
        if name not in have:
            raise ValueError(f"schema_check: missing column {name!r}; have {sorted(have)}")
        if typ is not None and have[name] != typ:
            raise ValueError(
                f"schema_check: column {name!r} is {have[name]}, expected {typ}"
            )
    return df


def _op_token_stats(df, text_col="text", **_):
    from nbdatatools_spark.functions.text import token_count

    return df.withColumn("n_tokens", token_count(F.col(text_col)))


def _op_classifier_filter(df, threshold=0.5, top_frac=0.25, bottom_frac=0.25,
                          text_col="text", **_):
    """Self-trained classifier filter (the GPT-3/CCNet reference-vs-crawl
    setup without an external reference corpus): label the heuristic-quality
    extremes of THIS batch (top ``top_frac`` as positive, bottom
    ``bottom_frac`` as negative), train the hashed-BoW logistic model on
    them, score everything, and keep docs above ``threshold``. The
    classifier generalizes beyond the seed heuristic — it learns lexical
    evidence the closed-form score can't express. Quantile cut points are
    two bounded scalars; training is distributed; scoring is JVM map-only."""
    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.quality_model import quality_filter, train_quality_filter

    scored = df.withColumn("__q", F.round(quality_score(F.col(text_col)), 6))
    cuts = scored.agg(
        F.expr(f"percentile(__q, {1.0 - float(top_frac)})").alias("hi"),
        F.expr(f"percentile(__q, {float(bottom_frac)})").alias("lo"),
    ).collect()[0]
    pos = scored.where(F.col("__q") >= float(cuts.hi)).drop("__q")
    neg = scored.where(F.col("__q") <= float(cuts.lo)).drop("__q")
    model = train_quality_filter(pos, neg, text_col=text_col)
    return quality_filter(df, model, threshold=float(threshold), text_col=text_col)


def _op_quality_budget(df, keep_weight_frac=0.5, n_steps=100,
                       text_col="text", id_col="doc_id", **_):
    """Token-budget quality cut: keep the HIGHEST-quality documents whose
    combined token mass still meets ``keep_weight_frac`` of the corpus —
    the yield-curve threshold pick as a pipeline step ("keep the best
    half of the tokens"). The threshold is the LARGEST score cut whose
    token yield stays >= the target, read off evaluation.
    filter_yield_curve's (n_steps+1)-row table (a bounded driver
    collect, the mixture-rates convention); the filter itself is one
    map-side predicate."""
    from nbdatatools_spark.functions.text import quality_score, token_count
    from nbdatatools_spark.operators.evaluation import filter_yield_curve

    frac = float(keep_weight_frac)
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"keep_weight_frac must be in (0, 1], got {frac}")
    scored = df.select(
        F.round(quality_score(F.col(text_col)), 6).alias("__q"),
        token_count(F.col(text_col)).cast("long").alias("__w"),
    )
    curve = filter_yield_curve(scored, "__q", "__w", n_steps=int(n_steps))
    rows = curve.collect()  # bounded: n_steps + 1 rows
    eligible = [
        r["threshold"]
        for r in rows
        if r["weight_yield"] is not None and r["weight_yield"] >= frac
    ]
    cut = max(eligible) if eligible else 0.0
    return df.where(F.round(quality_score(F.col(text_col)), 6) >= cut)


STEP_REGISTRY = {
    "strip_markup": _op_strip_markup,
    "redact_pii": _op_redact_pii,
    "lang_filter": _op_lang_filter,
    "quality_filter": _op_quality_filter,
    "gopher_filter": _op_gopher_filter,
    "repetition_filter": _op_repetition_filter,
    "fineweb_filter": _op_fineweb_filter,
    "c4_clean": _op_c4_clean,
    "exact_dedup": _op_exact_dedup,
    "minhash_dedup": _op_minhash_dedup,
    "split": _op_split,
    "token_stats": _op_token_stats,
    "schema_check": _op_schema_check,
    "classifier_filter": _op_classifier_filter,
    "lm_filter": _op_lm_filter,
    "remove_dup_spans": _op_remove_dup_spans,
    "perplexity_filter": _op_perplexity_filter,
    "token_budget": _op_token_budget,
    "domain_cap": _op_domain_cap,
    "stratified_sample": _op_stratified_sample,
    "sentence_dedup": _op_sentence_dedup,
    "temperature_sample": _op_temperature_sample,
    "quality_budget": _op_quality_budget,
}


def load_pipeline_config(path: str) -> list[dict]:
    """Load a pipeline spec from YAML (if pyyaml is importable) or JSON.
    The spec is ``{"steps": [{"op": name, ...params}, ...]}`` or a bare
    list of steps."""
    with open(path) as f:
        raw = f.read()
    try:
        import yaml  # type: ignore

        data = yaml.safe_load(raw)
    except ImportError:
        data = json.loads(raw)
    steps = data["steps"] if isinstance(data, dict) else data
    if not isinstance(steps, list):
        raise ValueError(f"pipeline config must be a list of steps, got {type(steps)}")
    return steps


def run_pipeline(
    df: DataFrame,
    steps: list[dict],
    count_steps: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Compose ``steps`` over ``df``. Unknown ops and non-dict steps fail
    loudly up front (config validation before any job runs). Returns
    ``(result_frame, report)`` — report rows carry the step name, params,
    and (when ``count_steps``) the row count after the step."""
    for s in steps:
        if not isinstance(s, dict) or "op" not in s:
            raise ValueError(f"each step needs an 'op' key, got {s!r}")
        if s["op"] not in STEP_REGISTRY:
            raise ValueError(
                f"unknown pipeline op {s['op']!r}; known: {sorted(STEP_REGISTRY)}"
            )
    report: list[dict] = []
    out = df
    for s in steps:
        params = {k: v for k, v in s.items() if k != "op"}
        out = STEP_REGISTRY[s["op"]](out, **params)
        row: dict = {"op": s["op"], **params}
        if count_steps:
            row["rows"] = out.count()
        report.append(row)
    return out, report


def filter_funnel(
    df: DataFrame,
    stages: list[tuple[str, "F.Column"]],
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """Cumulative filter-attrition report: for an ORDERED list of
    ``(name, boolean Column)`` filter stages, the documents and tokens
    surviving after each stage is applied cumulatively — the curation
    funnel table every large-corpus writeup publishes (C4 / Gopher
    appendix attrition, RefinedWeb Table 2, FineWeb's filtering funnel)
    and the first thing a data engineer asks of a new filter chain
    ("which stage is eating my tokens?").

    One corpus pass: every stage becomes a cumulative boolean flag and
    ONE global aggregate produces all per-stage doc/token sums
    (map-side combinable, no shuffle beyond the single-row reduce); the
    k+1 report rows then unfold from that row declaratively. A NULL
    predicate drops the row (WHERE semantics).

    Returns one row per stage, stage 0 = the unfiltered input:
    ``(stage, name, docs, tokens, drop_docs, drop_tokens, pct_docs,
    pct_tokens)`` — pcts are of the ORIGINAL input at 6dp via the
    pure-integer half-up ratio (integer/integer quotients land on the
    6dp grid exactly where float rounding ties cross-engine).

    100-TB shape: flags are map-side expressions over the scan; the
    aggregate is one row. Nothing scales with anything but the scan.
    """
    from nbdatatools_spark.functions.text import token_count

    if not stages:
        raise ValueError("stages must be a non-empty list of (name, Column)")
    names = [n for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names}")
    ntok = (
        F.col(token_col).cast("long")
        if token_col
        else token_count(F.col(text_col)).cast("long")
    )
    work = df.select(ntok.alias("__nt"), *[
        F.coalesce(pred.cast("boolean"), F.lit(False)).alias(f"__p{i}")
        for i, (_, pred) in enumerate(stages, 1)
    ])
    cum = F.lit(True)
    aggs = [
        F.count(F.lit(1)).alias("d0"),
        F.coalesce(F.sum("__nt"), F.lit(0)).cast("long").alias("t0"),
    ]
    for i in range(1, len(stages) + 1):
        cum = cum & F.col(f"__p{i}")
        aggs.append(
            F.coalesce(F.sum(cum.cast("long")), F.lit(0)).cast("long").alias(f"d{i}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(cum, F.col("__nt")).otherwise(F.lit(0))), F.lit(0))
            .cast("long")
            .alias(f"t{i}")
        )
    one = work.agg(*aggs)
    entries = []
    for i, name in enumerate(["input"] + names):
        prev = max(i - 1, 0)
        entries.append(
            F.struct(
                F.lit(i).cast("int").alias("stage"),
                F.lit(name).alias("name"),
                F.col(f"d{i}").alias("docs"),
                F.col(f"t{i}").alias("tokens"),
                (F.col(f"d{prev}") - F.col(f"d{i}")).cast("long").alias("drop_docs"),
                (F.col(f"t{prev}") - F.col(f"t{i}")).cast("long").alias("drop_tokens"),
            )
        )
    rows = one.select(
        F.col("d0").alias("__d0"), F.col("t0").alias("__t0"),
        F.explode(F.array(*entries)).alias("s"),
    )
    # integer half-up 6dp ratio; DECIMAL(38,0) so 2*tokens*1e6 cannot
    # overflow BIGINT at 100-TB token counts (ANSI would throw)
    pct = lambda v, tot: F.when(  # noqa: E731
        F.col(f"__{tot}") > 0,
        F.expr(
            f"(2 * CAST(s.{v} AS DECIMAL(38,0)) * 1000000 + __{tot})"
            f" div (2 * CAST(__{tot} AS DECIMAL(38,0)))"
        ).cast("double")
        / 1e6,
    )
    return rows.select(
        F.col("s.stage").alias("stage"),
        F.col("s.name").alias("name"),
        F.col("s.docs").alias("docs"),
        F.col("s.tokens").alias("tokens"),
        F.col("s.drop_docs").alias("drop_docs"),
        F.col("s.drop_tokens").alias("drop_tokens"),
        (pct("docs", "d0") + 0.0).alias("pct_docs"),
        (pct("tokens", "t0") + 0.0).alias("pct_tokens"),
    ).orderBy("stage")
