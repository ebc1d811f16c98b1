"""Corpus language-model scoring + lexical retrieval (beyond-reference
surface, SURVEY §7.8).

Bigram-LM fluency scoring — the CCNet / Wenzek et al. arXiv:1911.00359
quality signal:
score each document by its per-token negative log-likelihood under a
language model; low = fluent/common, high = noise. The classic pipeline
uses a pretrained KenLM; the engine computes the self-contained variant —
an add-k-smoothed bigram model fit on the corpus itself (or a reference
corpus), entirely in DataFrame ops.

Model: ``p(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k * V)`` with unigram
occurrence counts ``c(w1)``, bigram counts ``c(w1 w2)``, vocabulary size
``V`` (distinct corpus tokens), Laplace-style ``add_k``. Per-document
score = mean over the document's bigrams of ``-ln p(w2 | w1)``.

100-TB shape:
- tokens/bigrams are never shuffled as strings: every count/join key is
  the 128-bit md5 hex of the token or bigram (the same slim-digest rule
  the dedup family uses — a 13-gram string shuffle was this repo's
  round-2 scale bug; not repeated here);
- counting is groupBy on digests (map-side partial aggregation); scoring
  is two hash joins (bigram digest, then first-token digest) + one
  groupBy(doc) — all keyed, nothing all-pairs;
- ``V`` is one driver-side scalar (a count job), inlined as a literal —
  same bounded-collect pattern as sampling.mixture_rates.

Exactness: the per-bigram term ``-ln p`` is rounded to 9dp and cast to
DECIMAL(20,9) BEFORE summation (exact, order-invariant), then ONE double
division by the bigram count — the dsir_log_ratios convention, replicated
bit-for-bit by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nbdatatools_spark.functions.text import tokens

_TERM_DEC = "decimal(20,9)"
_SUM_DEC = "decimal(38,9)"


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    lm_corpus: DataFrame | None = None,
) -> DataFrame:
    """Score every ``docs`` row under an add-k bigram LM fit on
    ``lm_corpus`` (default: ``docs`` itself — self-scoring, the common
    corpus-filtering setup). Returns ``(id_col, n_bigrams INT, lm_score
    DOUBLE)`` — mean ``-ln p(w2|w1)`` rounded to 6dp; NULL score (and
    n_bigrams = 0) for documents with fewer than two tokens. Bigrams
    unseen in ``lm_corpus`` get the smoothed floor ``k / (c(w1) + kV)``
    (and ``c(w1) = 0`` for unseen first tokens).
    """
    if add_k <= 0:
        raise ValueError(f"add_k must be > 0, got {add_k}")
    corpus = lm_corpus if lm_corpus is not None else docs

    def _toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            tokens(F.lower(F.col(text_col))).alias("__t"),
        )

    corpus_toks = _toks(corpus)
    # unigram counts keyed by md5(token); V = distinct tokens. Local-
    # checkpointed (lazy — the module's reuse policy: released when the
    # frame is GC'd, no session-lifetime persistentRDDs entry): the V
    # count job materializes it, and the scoring join below reuses the
    # cached counts instead of re-tokenizing the corpus.
    # explode_outer across this module: inner explode's inferred size()>0
    # filter inlines the tokenize chain into an interpreted per-row scan
    # filter (the winnow_candidate_pairs trap; measured 3x on this gate).
    # Every site drops the empty-doc null row explicitly so counts, V, and
    # groupings are bit-identical to the inner-explode semantics.
    uni = (
        corpus_toks.select(F.explode_outer("__t").alias("__w"))
        .where(F.col("__w").isNotNull())
        .groupBy(F.md5(F.col("__w")).alias("__h1"))
        .agg(F.count(F.lit(1)).alias("__n1"))
        .localCheckpoint(eager=False)
    )
    vocab_size = uni.count()  # bounded driver scalar, inlined below
    # bigram digests per doc: (doc, md5(bigram), md5(first token)).
    # Space-joined pairs are collision-free (tokens are whitespace-split).
    # The token array is let-bound (functions.text._let) so the tokenize
    # split runs once per row, not once per bigram after Catalyst inlines
    # the projection. The size guard matters: Spark's sequence(2, n)
    # DESCENDS for n < 2 instead of returning empty.
    def _bigrams(df: DataFrame) -> DataFrame:
        from nbdatatools_spark.functions.text import _let

        def pairs_of(t):
            return F.when(
                F.size(t) >= 2,
                F.transform(
                    F.sequence(F.lit(2), F.size(t)),
                    lambda i: F.struct(
                        F.concat(
                            F.element_at(t, i - 1), F.lit(" "), F.element_at(t, i)
                        ).alias("bg"),
                        F.element_at(t, i - 1).alias("w1"),
                    ),
                ),
            ).otherwise(F.expr("CAST(array() AS array<struct<bg:string,w1:string>>)"))

        # explode_outer + explicit null drop: inner explode's inferred
        # size()>0 filter inlines the tokenize chain into an interpreted
        # scan filter (the winnow_candidate_pairs trap); the null row a
        # <2-token doc emits must NOT reach the count (it would score 1
        # phantom bigram), hence the isNotNull before the digests.
        pairs = _let(F.col("__t"), pairs_of)
        return (
            df.select("__id", F.explode_outer(pairs).alias("__p"))
            .where(F.col("__p").isNotNull())
            .select(
                "__id",
                F.md5(F.col("__p.bg")).alias("__h2"),
                F.md5(F.col("__p.w1")).alias("__h1"),
            )
        )

    # Self-scoring reuses ONE checkpointed bigram-digest pass for both
    # the model counts and the per-doc scoring rows (they are the same
    # relation); scoring a separate corpus computes each side once.
    if lm_corpus is None:
        doc_bigrams = _bigrams(corpus_toks).localCheckpoint(eager=False)
        corpus_bigrams = doc_bigrams
    else:
        corpus_bigrams = _bigrams(corpus_toks)
        doc_bigrams = _bigrams(_toks(docs))
    big = (
        corpus_bigrams
        .groupBy("__h2")
        .agg(F.count(F.lit(1)).alias("__n2"))
    )
    denom = F.coalesce(F.col("__n1"), F.lit(0)) + F.lit(float(add_k) * vocab_size)
    p = (F.coalesce(F.col("__n2"), F.lit(0)) + F.lit(float(add_k))) / denom
    term = F.round(-F.log(p), 9).cast(_TERM_DEC)
    per_doc = (
        doc_bigrams.join(big, "__h2", "left")
        .join(uni, "__h1", "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("__nb"),
            F.sum(term).cast(_SUM_DEC).alias("__s"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("__nb"), F.lit(0)).cast("int").alias("n_bigrams"),
            F.round(
                F.col("__s").cast("double") / F.col("__nb"), 6
            ).alias("lm_score"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Okapi BM25 lexical retrieval: score every document against a bag of
    query terms and return the global top-k — the classic keyword-search
    primitive (Robertson & Zaragoza 2009), with the Lucene idf variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Plan: document lengths are one map-side projection; df (document
    frequency) per query term comes from ONE filtered groupBy — the
    corpus is filtered to the literal query-term set BEFORE any shuffle,
    so the aggregate touches |terms-in-query| keys, not the vocabulary.
    N and avgdl are two bounded driver scalars. tf is a second filtered
    groupBy keyed (doc, term). The final top-k is TakeOrderedAndProject
    (no global sort).

    Exactness: idf and each per-term score contribution are rounded to
    9dp and DECIMAL-summed per doc (order-invariant — a doc's terms sum
    in unknown order), then ONE rounding to 6dp; ties break on doc_id.
    Returns ``(id_col, score DOUBLE, rank INT)``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    terms = sorted({t.lower() for t in query_terms})
    toks = docs.select(
        F.col(id_col).alias("__id"),
        tokens(F.lower(F.col(text_col))).alias("__t"),
    )
    lens = toks.select("__id", F.size("__t").alias("__dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("__dl").alias("tot")
    ).collect()[0]
    n_docs, total_tokens = int(stats["n"]), int(stats["tot"] or 0)
    if n_docs == 0:
        raise ValueError("bm25_topk needs a non-empty corpus")
    avgdl = total_tokens / n_docs  # one double division, engine-exact
    hits = toks.select(
        "__id", F.explode_outer("__t").alias("__w")
    ).where(F.col("__w").isin(terms))
    df_counts = (
        hits.groupBy("__w").agg(F.count_distinct("__id").alias("__df"))
    )
    tf = hits.groupBy("__id", "__w").agg(F.count(F.lit(1)).alias("__tf"))
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        ),
        9,
    )
    contrib = F.round(
        idf
        * (F.col("__tf") * F.lit(float(k1) + 1.0))
        / (
            F.col("__tf")
            + F.lit(float(k1))
            * (
                F.lit(1.0 - float(b))
                + F.lit(float(b)) * F.col("__dl") / F.lit(float(avgdl))
            )
        ),
        9,
    ).cast(_TERM_DEC)
    scored = (
        tf.join(df_counts, "__w")
        .join(lens, "__id")
        .groupBy("__id")
        .agg(F.sum(contrib).cast(_SUM_DEC).alias("__s"))
        .select(
            F.col("__id").alias(id_col),
            F.round(F.col("__s").cast("double"), 6).alias("score"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


def rrf_fuse(
    ranked: list,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher SIGIR 2009) —
    the standard hybrid-retrieval combiner: fuse any number of ranked
    candidate lists (lexical BM25, dense KNN, ...) into one list by
    ``score(d) = sum over lists of 1 / (k0 + rank_l(d))``. Documents
    missing from a list simply contribute nothing — no imputation.

    Each input frame needs ``(id_col, rank_col)``; anything else is
    ignored. Plan: union the slim (id, rank) projections (wide payloads
    never enter the fusion), ONE map-side-combinable groupBy on the id,
    TakeOrderedAndProject global top-k — no full sort, no join between
    the lists. At 100 TB the candidate lists are top-k outputs (bounded),
    so fusion is a trivially small job; the shape still holds for
    million-row candidate pools (digest-sized shuffle keys).

    Exactness: each reciprocal term is rounded to 9dp and DECIMAL-summed
    (order-invariant across lists), then ONE 6dp rounding of the double —
    the bm25_topk convention, replicable verbatim in an oracle engine.
    Returns ``(id_col, n_lists INT, rrf_score DOUBLE, rank INT)`` ranked
    by (rrf_score DESC, id ASC).
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    slim = None
    for df in ranked:
        part = df.select(
            F.col(id_col).alias("__id"),
            F.col(rank_col).cast("int").alias("__r"),
        )
        slim = part if slim is None else slim.unionByName(part)
    term = F.round(F.lit(1.0) / (F.lit(int(k0)) + F.col("__r")), 9).cast(_TERM_DEC)
    fused = (
        slim.groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_lists"),
            F.sum(term).cast(_SUM_DEC).alias("__s"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_lists",
            F.round(F.col("__s").cast("double"), 6).alias("rrf_score"),
        )
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


def posting_lists(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_postings: int = 1000,
) -> DataFrame:
    """Inverted-index export — per token: document frequency and a
    bounded, doc-id-ordered posting list. The materialization behind
    lexical search (the artifact BM25 queries at serve time), as
    ``(token, df BIGINT, postings ARRAY<BIGINT>)``.

    Plan: distinct (token, doc) hits -> ONE token-keyed ranking window
    caps each posting list at ``max_postings`` BEFORE any collect (an
    uncapped ``collect_list`` on a stopword at corpus scale is an
    executor OOM — the cap is enforced in the shuffle, not after it) ->
    one groupBy(token) on the SAME key computes the full df count and
    conditionally collects only in-cap ids (``collect_list`` skips the
    NULLed-out overflow), so AQE reuses the window's partitioning.
    ``sort_array`` makes the list partition-order-independent. Hot-token
    skew is the documented hazard: AQE skew handling splits the sort,
    and ``min_df`` prunes the long tail.
    """
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if max_postings < 1:
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    from nbdatatools_spark.functions.text import normalize_text, tokens as _tok

    hits = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.explode_outer(_tok(normalize_text(F.col(text_col)))).alias("token"),
        )
        .where(F.col("token").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("token").orderBy(F.col("__id").asc())
    capped = hits.withColumn("__rn", F.row_number().over(w))
    out = (
        capped.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("__rn") <= max_postings, F.col("__id"))
                )
            ).alias("postings"),
        )
    )
    if min_df > 1:
        out = out.where(F.col("df") >= min_df)
    return out


def token_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram Shannon entropy in nats — the lexical-diversity
    quality signal (low entropy = repetitive/templated text, the same family
    as the Gopher repetition rules but distribution-based):

        H = ln(n) - (sum_w c_w ln c_w) / n

    over lowercased whitespace tokens. Returns ``(id_col, n_tokens,
    n_distinct, entropy)``; entropy is NULL for empty documents and exactly
    0.0 for single-token ones.

    Plan: one explode -> groupBy (doc, md5(token)) count (the shuffle key is
    the id plus a 16-byte digest — token strings never shuffle, the
    bigram_lm_score discipline) -> one same-key doc rollup. The c*ln(c)
    terms are rounded to 9dp and DECIMAL-summed (order-independent, so the
    result is partition-count-invariant and engine-exact); the final
    ``ln(n) - s/n`` is one double expression per document.
    """
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("__w"),
    ).where(F.col("__w").isNotNull())
    per_tok = toks.groupBy("__id", F.md5("__w").alias("__h")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    term = F.round(F.col("__c") * F.log(F.col("__c").cast("double")), 9).cast(_TERM_DEC)
    per_doc = per_tok.groupBy("__id").agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).alias("__distinct"),
        F.sum(term).cast(_SUM_DEC).alias("__s"),
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("__n"), F.lit(0)).cast("int").alias("n_tokens"),
            F.coalesce(F.col("__distinct"), F.lit(0)).cast("int").alias("n_distinct"),
            F.when(F.col("__n").isNull(), F.lit(None).cast("double")).otherwise(
                F.round(
                    F.log(F.col("__n").cast("double"))
                    - F.col("__s").cast("double") / F.col("__n"),
                    6,
                )
            ).alias("entropy"),
        )
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-k PMI collocations (Church & Hanks 1990): adjacent token pairs
    scored by ln(p(xy) / (p(x) p(y))), the classic corpus-linguistics
    collocation mine — and, for a training corpus, the quickest detector
    of templated boilerplate (high-PMI pairs dominating the corpus are
    sentence skeletons, not language).

    Scale shape: one map-side-combinable unigram aggregate and one bigram
    aggregate (shuffle payload = distinct vocab/bigram keys, not corpus
    rows), min_count prunes the bigram tail BEFORE the two vocab-keyed
    equi-joins, and top-k plans as TakeOrderedAndProject. Corpus totals
    (N tokens, P pairs) are two bounded driver scalars, the bm25 pattern.

    Engine-exact: pmi = round(ln(ratio-of-exact-integer-ratios), 6) — same
    ln discipline as token_entropy's oracle; ties break on (left, right).
    """
    toks = df.select(tokens(F.lower(F.col(text_col))).alias("__t"))
    uni = (
        toks.select(F.explode_outer("__t").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n1"))
        .localCheckpoint(eager=False)
    )
    from nbdatatools_spark.functions.text import _let

    def pairs_of(t):
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(2), F.size(t)),
                lambda i: F.struct(
                    F.element_at(t, i - 1).alias("left"),
                    F.element_at(t, i).alias("right"),
                ),
            ),
        ).otherwise(F.expr("CAST(array() AS array<struct<left:string,right:string>>)"))

    # explode_outer: inner explode's inferred size()>0 filter would inline
    # the tokenize chain into the scan filter (see winnow_candidate_pairs);
    # the null rows from <2-token docs fail the != '' predicates below.
    big = (
        toks.select(F.explode_outer(_let(F.col("__t"), pairs_of)).alias("p"))
        .select("p.left", "p.right")
        .where((F.col("left") != "") & (F.col("right") != ""))
        .groupBy("left", "right")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
    )
    totals = uni.agg(
        F.sum("n1").alias("n_tokens"),
    ).first()
    n_tokens = int(totals["n_tokens"] or 0)
    n_pairs = int(
        toks.select(
            F.sum(F.greatest(F.size("__t") - 1, F.lit(0))).alias("p")
        ).first()["p"]
        or 0
    )
    if n_tokens == 0 or n_pairs == 0:
        return big.select(
            "left", "right", "n_pair",
            F.lit(None).cast("double").alias("pmi"),
            F.lit(0).cast("int").alias("rank"),
        ).limit(0)
    ul = uni.select(F.col("w").alias("left"), F.col("n1").alias("n_left"))
    ur = uni.select(F.col("w").alias("right"), F.col("n1").alias("n_right"))
    scored = (
        big.join(ul, "left")
        .join(ur, "right")
        .select(
            "left",
            "right",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair").cast("double") / F.lit(float(n_pairs)))
                    / (
                        (F.col("n_left").cast("double") / F.lit(float(n_tokens)))
                        * (F.col("n_right").cast("double") / F.lit(float(n_tokens)))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    ranked = scored.orderBy(
        F.col("pmi").desc(), F.col("left").asc(), F.col("right").asc()
    ).limit(top_k)
    w = Window.orderBy(F.col("pmi").desc(), F.col("left").asc(), F.col("right").asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("int"))


def perplexity_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 3,
    add_k: float = 0.5,
    lm_corpus: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. arXiv:1911.00359
    §4.3): rank every document by its LM score (bigram_lm_score) and cut
    the scored corpus into ``n_buckets`` equal-count tiers — bucket 0
    ("head") = most fluent, last bucket ("tail") = noisiest. The standard
    curriculum/quality dial: train on head+middle, drop or down-weight
    tail.

    Scale shape: scoring is bigram_lm_score's digest-keyed shape; the
    global ranking is the two-phase partition-offset index
    (windows.global_row_index) — no single-reducer window. The bucket cut
    is pure integer arithmetic ``min(nb-1, nb * rank // n)`` on the
    0-based rank (exact in both engines — no double division whose
    representation could flip a boundary row). Unscored documents
    (< 2 tokens) get bucket NULL / label 'unscored'.

    Returns ``(id_col, n_bigrams, lm_score, bucket INT, bucket_label)``.
    """
    from nbdatatools_spark.operators.windows import global_row_index

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    # local-checkpointed (lazy): the scored frame is read three times (the
    # n_scored count, the ranked tier branch, the unscored branch) —
    # without it the whole LM model build re-runs per action; unlike
    # .persist() the blocks release when the frame is GC'd.
    scored = bigram_lm_score(
        docs, text_col=text_col, id_col=id_col, add_k=add_k, lm_corpus=lm_corpus
    ).localCheckpoint(eager=False)
    has_score = scored.where(F.col("lm_score").isNotNull())
    n_scored = has_score.count()  # bounded driver scalar, inlined below
    ranked = global_row_index(
        has_score,
        [F.col("lm_score").asc(), F.col(id_col).asc()],
        out="__rank",
    )
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.expr(f"({int(n_buckets)} * __rank) DIV {max(n_scored, 1)}"),
    ).cast("int")
    labels = (
        ["head", "middle", "tail"]
        if n_buckets == 3
        else [f"b{i}" for i in range(n_buckets)]
    )
    label = F.element_at(F.array(*[F.lit(s) for s in labels]), bucket + 1)
    tiered = ranked.select(
        id_col,
        "n_bigrams",
        "lm_score",
        bucket.alias("bucket"),
        label.alias("bucket_label"),
    )
    unscored = scored.where(F.col("lm_score").isNull()).select(
        id_col,
        "n_bigrams",
        "lm_score",
        F.lit(None).cast("int").alias("bucket"),
        F.lit("unscored").alias("bucket_label"),
    )
    return tiered.unionByName(unscored)


def _kn_bigram_pairs(
    docs: DataFrame, text_col: str, id_col: str, keep_id: bool = False
) -> DataFrame:
    """Digest-keyed bigram stream for the KN family: one row per bigram
    occurrence with md5 keys for the pair, w1, and w2 (slim-digest
    discipline — raw strings carry once as exemplars, never as join
    keys). ``keep_id`` additionally carries the document id (the
    scoring path needs the doc grain; the training path does not)."""
    toks = docs.select(
        F.col(id_col).alias("__id"),
        tokens(F.lower(F.col(text_col))).alias("__t"),
    )
    from nbdatatools_spark.functions.text import _let

    def pairs_of(t):
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(2), F.size(t)),
                lambda i: F.struct(
                    F.element_at(t, i - 1).alias("w1"),
                    F.element_at(t, i).alias("w2"),
                ),
            ),
        ).otherwise(F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))

    # explode_outer + explicit null drop (the winnow_candidate_pairs trap:
    # inner explode's inferred size()>0 filter inlines the tokenize chain
    # into an interpreted per-row scan filter).
    cols = [
        F.md5(F.concat("__p.w1", F.lit(" "), "__p.w2")).alias("__hb"),
        F.md5("__p.w1").alias("__h1"),
        F.md5("__p.w2").alias("__h2"),
        F.col("__p.w1").alias("__w1"),
        F.col("__p.w2").alias("__w2"),
    ]
    if keep_id:
        cols = [F.col("__id")] + cols
    return (
        toks.select("__id", F.explode_outer(_let(F.col("__t"), pairs_of)).alias("__p"))
        .where(F.col("__p").isNotNull())
        .select(*cols)
        .localCheckpoint(eager=False)
    )


def _kn_model_tables(docs: DataFrame, text_col: str, id_col: str):
    """The four interpolated-KN bigram model tables + the global type
    count: types(__hb, __nb, w1, w2, __h1, __h2), c1(__h1, __c1),
    nfollow(__h1, __nf), nprec(__h2, __np), n_types (bounded driver
    scalar — vocab-grain count job, the mixture_rates collect pattern)."""
    pairs = _kn_bigram_pairs(docs, text_col, id_col)
    # distinct bigram types with counts + exemplar strings (md5 is 1:1 on
    # the space-joined pair — whitespace-split tokens cannot collide)
    types = (
        pairs.groupBy("__hb")
        .agg(
            F.count(F.lit(1)).alias("__nb"),
            F.min("__w1").alias("w1"),
            F.min("__w2").alias("w2"),
            F.min("__h1").alias("__h1"),
            F.min("__h2").alias("__h2"),
        )
        .localCheckpoint(eager=False)
    )
    c1 = pairs.groupBy("__h1").agg(F.count(F.lit(1)).alias("__c1"))
    nfollow = types.groupBy("__h1").agg(F.count(F.lit(1)).alias("__nf"))
    nprec = types.groupBy("__h2").agg(F.count(F.lit(1)).alias("__np"))
    n_types = types.count()  # bounded driver scalar (vocab-bounded)
    return types, c1, nfollow, nprec, n_types


def kneser_ney_bigrams(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Chen & Goodman 1998),
    the production smoothing for n-gram LMs (KenLM's default) — the
    principled upgrade over ``bigram_lm_score``'s add-k:

        P_KN(w2|w1) = max(c(w1 w2) - d, 0) / c(w1 .)
                      + (d * N1+(w1, .) / c(w1 .)) * Pcont(w2)
        Pcont(w2)   = N1+(. , w2) / N1+(. , .)

    with ``c(w1 .)`` = count of w1 in first position, ``N1+`` the
    continuation type counts. Returns the ``top_n`` bigrams by
    probability: ``(w1, w2, n_bigram, p_kn)`` ordered (p_kn DESC, w1,
    w2).

    Exactness: all inputs are integer counts; the probability is ONE
    fixed-shape double expression, term1 + term2 with explicit
    parenthesization mirrored by the oracle, rounded to 9dp.

    100-TB shape: counting groups on md5 digests (map-side partials;
    each distinct bigram carries its exemplar strings once, the bm25
    term-table discipline); the three model tables join digest-keyed;
    the global type count is one bounded driver scalar; the final top-n
    is a TakeOrderedAndProject, never a full sort.
    """
    types, c1, nfollow, nprec, n_types = _kn_model_tables(
        docs, text_col=text_col, id_col=id_col
    )
    d = float(discount)
    term1 = F.greatest(F.col("__nb") - d, F.lit(0.0)) / F.col("__c1")
    term2 = ((d * F.col("__nf")) / F.col("__c1")) * (
        F.col("__np") / F.lit(float(n_types))
    )
    return (
        types.join(c1, "__h1")
        .join(nfollow, "__h1")
        .join(nprec, "__h2")
        .select(
            "w1",
            "w2",
            F.col("__nb").alias("n_bigram"),
            F.round(term1 + term2, 9).alias("p_kn"),
        )
        .orderBy(F.desc("p_kn"), "w1", "w2")
        .limit(top_n)
    )


def kn_perplexity_score(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    floor: float = 1e-9,
) -> DataFrame:
    """Per-document perplexity under an interpolated Kneser-Ney bigram
    model trained on a SEPARATE corpus — the apply-at-scale companion
    to :func:`kneser_ney_bigrams` (which reports the model's top
    bigrams but scores nothing): train on the reference slice, score
    every held-out document. The CCNet-style quality signal with the
    production smoothing instead of ``bigram_lm_score``'s add-k.

    Probability per scored bigram (w1, w2):

    - both known:  P_KN = max(c(w1 w2) - d, 0)/c(w1 .)
      + (d * N1+(w1,.)/c(w1 .)) * Pcont(w2)   (unseen bigrams of known
      words get pure discounted continuation mass — the standard KN
      backoff behavior),
    - w1 unseen:   P = Pcont(w2) = N1+(. , w2) / N1+(. , .),
    - P <= 0 (w2 also unseen): the ``floor`` (1e-9 default) — the
      KenLM-style OOV floor, so one novel token cannot zero a document.

    Returns ``(doc_id, n_bigrams, n_unseen, mean_logp, perplexity)``
    per scored document with >= 1 bigram, ordered by id: n_unseen =
    bigrams absent from the model's type table, mean_logp = mean
    9dp-rounded ln P (INTEGER-NANO mean — n_bigrams are small round
    integers, exactly the 6dp-tie hazard rarity_scores hit), and
    perplexity = exp(-mean_logp) at 6dp.

    100-TB shape: model tables are vocab-grain and join digest-keyed
    onto the scored bigram stream (three LEFT hash joins + one
    (doc)-keyed aggregate); the scored corpus never shuffles strings,
    only 16-byte digests. n_types is one bounded driver scalar.
    """
    per_doc = _kn_scored_terms(
        train, score, text_col, id_col, discount, floor
    ).groupBy("__id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__t").alias("__s"),
        F.sum("__unseen").alias("__nu"),
    )
    mean_micro = F.expr("(__s + 500 * __n) div (1000 * __n)")
    return per_doc.select(
        F.col("__id").alias(id_col),
        F.col("__n").cast("bigint").alias("n_bigrams"),
        F.col("__nu").cast("bigint").alias("n_unseen"),
        (-(mean_micro.cast("double") / 1e6) + 0.0).alias("mean_logp"),
        (F.round(F.exp(mean_micro.cast("double") / 1e6), 6) + 0.0).alias(
            "perplexity"
        ),
    ).orderBy(id_col)


def _kn_scored_terms(
    train: DataFrame,
    score: DataFrame,
    text_col: str,
    id_col: str,
    discount: float,
    floor: float,
) -> DataFrame:
    """Per-bigram scored term stream shared by :func:`kn_perplexity_score`
    and :func:`mink_prob_score`: one row per scored bigram occurrence —
    ``(__id, __t, __unseen)`` with ``__t`` the 9dp-rounded -ln P as
    exact BIGINT nanos (always >= 0: P <= 1) and ``__unseen`` = 1 when
    the bigram is absent from the model's type table."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0,1), got {discount}")
    if not 0.0 < floor < 1.0:
        raise ValueError(f"floor must be in (0,1), got {floor}")
    types, c1, nfollow, nprec, n_types = _kn_model_tables(
        train, text_col=text_col, id_col=id_col
    )
    d = float(discount)
    sc = _kn_bigram_pairs(score, text_col, id_col, keep_id=True)
    joined = (
        sc.select("__id", "__hb", "__h1", "__h2")
        .join(types.select("__hb", "__nb"), "__hb", "left")
        .join(c1, "__h1", "left")
        .join(nfollow, "__h1", "left")
        .join(nprec, "__h2", "left")
    )
    pcont = F.coalesce(F.col("__np"), F.lit(0)).cast("double") / F.lit(
        float(n_types)
    )
    p_known = (
        F.greatest(F.coalesce(F.col("__nb"), F.lit(0)) - d, F.lit(0.0))
        / F.col("__c1")
        + ((d * F.col("__nf")) / F.col("__c1")) * pcont
    )
    p_raw = F.when(F.col("__c1").isNotNull(), p_known).otherwise(pcont)
    p_eff = F.when(p_raw > 0.0, p_raw).otherwise(F.lit(float(floor)))
    # negated log terms are >= 0 (p <= 1), so the integer half-up mean
    # never divides a negative sum (div semantics differ cross-engine
    # on negatives)
    neg_nano = F.round(F.round(-F.log(p_eff), 9) * 1e9, 0).cast("long")
    return joined.select(
        "__id",
        neg_nano.alias("__t"),
        F.col("__nb").isNull().cast("int").alias("__unseen"),
    )


def mink_prob_score(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_pct: float = 0.2,
    discount: float = 0.75,
    floor: float = 1e-9,
) -> DataFrame:
    """Min-K% Prob membership/contamination signal (Shi et al. 2023,
    "Detecting Pretraining Data from Large Language Models") over the
    interpolated-KN bigram model: per scored document, the mean log
    probability of its K% LEAST-probable bigrams. A document the model
    has effectively memorized has NO very-surprising spans, so its
    min-k mean sits close to 0; genuinely novel text drags it down.
    The standard eval-contamination audit, here driven by the engine's
    own KN model instead of an external LLM.

    Returns ``(doc_id, n_bigrams, k_used, mink_logp)`` per scored
    document with >= 1 bigram, ordered by id: k_used =
    max(1, floor(k_pct * n_bigrams)); mink_logp = the INTEGER-NANO
    mean of the k_used smallest 9dp log-probabilities.

    Determinism at ties: the per-doc rank window orders by the nano
    term value alone, so row_number over tied terms is assignment-
    nondeterministic — but the KEPT MULTISET is value-grain
    deterministic (the hill_tail rationale: whichever tied rows land
    inside k_used carry the identical value), so the sum and mean are
    engine-exact.

    100-TB shape: the scored term stream (one row per bigram) takes
    ONE (doc)-keyed rank window (per-task state bounded by the doc's
    own bigram count) + one (doc)-keyed aggregate; model joins are the
    kn_perplexity_score digest joins.
    """
    if not 0.0 < k_pct <= 1.0:
        raise ValueError(f"k_pct must be in (0,1], got {k_pct}")
    terms = _kn_scored_terms(
        train, score, text_col, id_col, discount, floor
    )
    n_per = terms.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy("__id").orderBy(F.col("__t").desc())
    ranked = (
        terms.withColumn("__r", F.row_number().over(w))
        .join(n_per, "__id")
        .withColumn(
            "__k",
            F.greatest(
                F.lit(1),
                F.floor(F.lit(float(k_pct)) * F.col("__n")).cast("int"),
            ),
        )
        .where(F.col("__r") <= F.col("__k"))
    )
    agg = ranked.groupBy("__id", "__n", "__k").agg(
        F.sum("__t").alias("__s")
    )
    mean_micro = F.expr("(__s + 500 * __k) div (1000 * __k)")
    return agg.select(
        F.col("__id").alias(id_col),
        F.col("__n").cast("bigint").alias("n_bigrams"),
        F.col("__k").cast("int").alias("k_used"),
        (-(mean_micro.cast("double") / 1e6) + 0.0).alias("mink_logp"),
    ).orderBy(id_col)


def kn_perplexity_by_slice(
    train: DataFrame,
    score: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    floor: float = 1e-9,
) -> DataFrame:
    """Per-slice Kneser-Ney perplexity report with head/middle/tail
    tiers: aggregate :func:`kn_perplexity_score`'s per-document means to
    the slice grain (source / domain / snapshot) and rank slices into
    terciles — the domain-level quality table of the CCNet pipeline
    (Wenzek et al. arXiv:1911.00359 bucket documents; The Pile and
    corpus ablations publish the same statistic per COMPONENT, which is
    this report). "Which domains does my reference LM find fluent" is
    the first mixture-reweighting input after a new crawl lands.

    Determinism: each document's mean ln P is the pure-integer half-up
    MICRO mean of 9dp nano terms (exactly ``kn_perplexity_score``); the
    slice mean over those per-doc micro integers is again an integer
    half-up mean, so every reported mean sits on the micro grid on both
    engines (the rarity_scores/burstiness 6dp-tie discipline — doc and
    slice counts are exactly the small round denominators that tie).
    ``perplexity`` = exp of that micro-grain mean at 6dp (irrational,
    off-grid, float-round safe). Tiers: ntile(3) ordered by
    (slice mean micro, slice) — deterministic, slice names break ties.

    100-TB shape: the scored term stream never shuffles strings (16-byte
    digest joins, see ``kn_perplexity_score``); this adds one (doc)
    aggregate, one digest join to recover the slice key, one slice-grain
    aggregate, and a window over the slice-count-sized frame. DECIMAL
    sums: 10^12 docs x 2e7 micros overflows BIGINT.

    Returns one row per slice: ``(slice_col, n_docs, n_bigrams,
    mean_logp, perplexity, tier)`` ordered by (mean micro, slice).
    """
    per_doc = _kn_scored_terms(
        train, score, text_col, id_col, discount, floor
    ).groupBy("__id").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__t").alias("__s")
    )
    doc_micro = per_doc.select(
        "__id",
        F.col("__n"),
        F.expr("(__s + 500 * __n) div (1000 * __n)").alias("__mm"),
    )
    labeled = doc_micro.join(
        score.select(
            F.col(id_col).alias("__id"), F.col(slice_col).alias("__g")
        ),
        "__id",
    )
    agg = labeled.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__nd"),
        F.sum("__n").cast("long").alias("__nb"),
        F.sum(F.col("__mm").cast("decimal(38,0)")).alias("__sm"),
    )
    sliced = agg.select(
        F.col("__g"),
        F.col("__nd").cast("bigint").alias("n_docs"),
        F.col("__nb").alias("n_bigrams"),
        F.expr(
            "CAST((2 * __sm + __nd) div (2 * CAST(__nd AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ).alias("__micro"),
    )
    w = Window.orderBy(F.col("__micro").asc(), F.col("__g").asc())
    tier = F.ntile(3).over(w)
    return sliced.select(
        F.col("__g").alias(slice_col),
        "n_docs",
        "n_bigrams",
        (-(F.col("__micro").cast("double") / 1e6) + 0.0).alias("mean_logp"),
        (F.round(F.exp(F.col("__micro").cast("double") / 1e6), 6) + 0.0).alias(
            "perplexity"
        ),
        F.when(tier == 1, F.lit("head"))
        .when(tier == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("tier"),
    ).orderBy(F.desc("mean_logp"), F.asc(slice_col))


def _cms_tokens(df: DataFrame, text_col: str) -> DataFrame:
    """Normalized token stream for the CMS family (shared by the batch
    audit and the streaming sketch — identical tokenization, so the
    stream-equals-batch parity holds by construction)."""
    from nbdatatools_spark.functions.text import normalize_text
    from nbdatatools_spark.session import spread_small_input

    # the CMS consumers hash every token depth times (md5-uint52 per
    # row) — spread an under-split batch scan first (round 10). On a
    # STREAMING frame getNumPartitions is unsupported and the helper
    # returns the input unchanged (stream==batch parity unaffected).
    return spread_small_input(df).select(
        F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("token")
    ).where(F.length("token") > 0)


def _cms_pos(d: int, tok, width: int):
    """Row-d sketch position of a token: md5-uint52 of 'd:token' mod width
    (the repo's portable hash convention — DuckDB-replicable)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(d)), tok)), 1, 13), 16, 10
    ).cast("long")
    return (h % F.lit(width)).cast("int")


def cms_cells(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min-sketch cell counts (d, pos, cnt) over a document frame —
    the shared build for :func:`cms_heavy_hitters` (batch audit) and
    ``streaming.events.stream_cms_sketch`` (running sketch as native
    streaming aggregation state). ONE groupBy over (row, position) keys
    with map-side combine; at most depth*width result cells regardless of
    corpus size."""
    toks = _cms_tokens(df, text_col)
    stack_args = []
    for d in range(depth):
        stack_args += [F.lit(d), _cms_pos(d, F.col("token"), width)]
    return (
        toks.select(F.stack(F.lit(depth), *stack_args).alias("d", "pos"))
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    topk: int = 20,
) -> DataFrame:
    """Count-min-sketch heavy-hitter audit (Cormode & Muthukrishnan 2005):
    build a depth x width CMS over the corpus token stream, then report
    the exact top-k tokens with their sketch estimates and the (always
    >= 0) overestimate — the standard sketch-quality readout.

    100-TB shape: the sketch is the point. Its size is ``depth*width``
    cells REGARDLESS of corpus size — the build is one groupBy over
    (row, position) keys with map-side partial aggregation, so the
    shuffle carries at most ``partitions * depth * width`` partial cells,
    never the vocabulary. Positions are md5-uint52 double-hashed per row
    (portable, engine-exact). The exact top-k side exists to AUDIT the
    sketch (estimate >= truth per the CMS guarantee; the overestimate
    distribution measures collision pressure at the chosen width); in
    production the sketch alone answers point queries and the exact side
    is dropped. Estimates join the tiny top-k frame against ``depth``
    sketch slices — broadcast, bounded.

    Returns (token, exact_n, cms_est, overestimate) ordered by
    (exact_n DESC, token).
    """
    toks = _cms_tokens(df, text_col)

    def pos_of(d, tok):
        return _cms_pos(d, tok, width)

    cells = cms_cells(df, text_col=text_col, depth=depth, width=width)

    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "token")
        .limit(topk)
    )
    est = exact
    for d in range(depth):
        slice_d = cells.where(F.col("d") == d).select(
            F.col("pos").alias(f"__p{d}"), F.col("cnt").alias(f"__c{d}")
        )
        est = est.join(
            F.broadcast(slice_d), pos_of(d, F.col("token")) == F.col(f"__p{d}")
        ).drop(f"__p{d}")
    return est.select(
        "token",
        "exact_n",
        F.least(*[F.col(f"__c{d}") for d in range(depth)]).alias("cms_est"),
        (
            F.least(*[F.col(f"__c{d}") for d in range(depth)]) - F.col("exact_n")
        ).alias("overestimate"),
    ).orderBy(F.desc("exact_n"), "token")


def source_similarity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise tf-idf cosine similarity between corpus slices — the
    source-mix audit (which crawls/domains carry near-identical content
    mixes; the vector-space sibling of dedup.source_overlap_matrix's
    exact-gram view). idf = ln(n_slices / df) zeroes out tokens present
    in every slice, so ubiquitous stopwords cannot dominate.

    Plan: token counts per (slice, md5-16 token key) — ONE digest-keyed
    groupBy; slice-count df per key; weights w = tf * idf rounded to 9dp;
    norms are per-slice DECIMAL sums of round(w^2, 9); the pairwise dot
    is a self-join ON THE TOKEN KEY (never slice x slice x vocab), so
    each token contributes only to slices that share it. Intended for
    bounded slice counts (sources/domains after capping — the per-pair
    result is n_slices^2). Engine-exact: products round to 9dp and
    DECIMAL-sum; final cosine rounds to 6dp.

    Returns (source_a, source_b, cosine) for a < b, ordered.
    """
    from nbdatatools_spark.functions.text import normalize_text

    toks = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("tok"),
        )
        .where(F.col("tok").isNotNull() & (F.length("tok") > 0))
        .select("grp", F.substring(F.md5("tok"), 1, 16).alias("h"))
    )
    tf = toks.groupBy("grp", "h").agg(F.count(F.lit(1)).alias("tf"))
    n_src = tf.select("grp").distinct().count()  # bounded: slice count
    dfreq = tf.groupBy("h").agg(F.count(F.lit(1)).alias("dft"))
    # localCheckpoint: the weight frame feeds the norm aggregate AND both
    # sides of the pairwise dot join — without it the tokenize+count chain
    # re-executes three times (17 -> 7 exchanges in the audited plan)
    w = (
        tf.join(dfreq, "h")
        .select(
            "grp",
            "h",
            F.round(
                F.col("tf").cast("double") * F.log(F.lit(float(n_src)) / F.col("dft")),
                9,
            ).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    norms = w.groupBy("grp").agg(
        F.sqrt(
            F.sum(F.round(F.col("w") * F.col("w"), 9).cast("decimal(28,9)"))
            .cast("decimal(38,9)")
            .cast("double")
        ).alias("nrm")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.grp") < F.col("b.grp")))
        .groupBy(F.col("a.grp").alias("source_a"), F.col("b.grp").alias("source_b"))
        .agg(
            F.sum(F.round(F.col("a.w") * F.col("b.w"), 9).cast("decimal(28,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("grp").alias("source_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("grp").alias("source_b"), F.col("nrm").alias("nb"))
    # full pair grid so slices sharing NO weighted vocabulary still report
    # cosine 0.0 (the inner token join alone would drop the pair row)
    grid = na.crossJoin(F.broadcast(nb)).where(F.col("source_a") < F.col("source_b"))
    return (
        grid.join(dots, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0) & F.col("dot").isNotNull(),
                F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("cosine"),
        )
        .orderBy("source_a", "source_b")
    )


def hll_registers(
    df: DataFrame,
    text_col: str = "text",
    precision: int = 8,
) -> DataFrame:
    """HLL register table ``(reg, mx)`` over a document frame — the
    shared build for :func:`hll_distinct` (batch audit) and
    ``streaming.events.stream_hll_sketch`` (running sketch: groupBy +
    max is a native streaming aggregation whose state is bounded at
    ``2^precision`` registers regardless of stream length). md5-uint52
    hashing; rank = leading zeros of the (52 - precision)-bit suffix
    + 1, via bin() bit-length (no float log)."""
    m = 1 << precision
    rbits = 52 - precision
    rmax = rbits + 1
    toks = _cms_tokens(df, text_col)
    h = F.conv(F.substring(F.md5("token"), 1, 13), 16, 10).cast("long")
    hashed = toks.select(
        (h % m).cast("int").alias("reg"),
        F.shiftright(h, precision).alias("w"),
    )
    # rank = leading zeros of the rbits-wide suffix + 1; bin() drops
    # leading zeros so bitlength(w) = length(bin(w)) for w > 0
    ranked = hashed.select(
        "reg",
        F.when(F.col("w") == 0, F.lit(rmax))
        .otherwise(F.lit(rbits) - F.length(F.bin("w")) + 1)
        .cast("int")
        .alias("rank"),
    )
    return ranked.groupBy("reg").agg(F.max("rank").alias("mx"))


def hll_distinct(
    df: DataFrame,
    text_col: str = "text",
    precision: int = 8,
) -> DataFrame:
    """HyperLogLog distinct-token audit (Flajolet et al. 2007): build a
    ``2^precision``-register HLL over the corpus token stream, report the
    estimate next to the exact distinct count and the relative error —
    the sketch-quality readout, the cardinality sibling of
    :func:`cms_heavy_hitters`.

    100-TB shape: the sketch is the point — ``m = 2^precision`` registers
    REGARDLESS of corpus size. The build is one groupBy(register) with
    map-side partial max, so the shuffle carries at most
    ``partitions * m`` partial registers, never the vocabulary. Tokens
    hash via the repo's portable md5-uint52 convention: low ``precision``
    bits pick the register, the leading-zero rank of the remaining
    ``52 - precision`` bits feeds the register max. The harmonic-mean
    denominator ``sum 2^-M_j`` is computed as an EXACT integer sum of
    ``2^(rmax - M_j)`` (every term a dyadic rational scaled to int64 —
    no float accumulation-order hazard); the linear-counting small-range
    correction applies below ``2.5 m`` when empty registers remain. The
    exact distinct side exists to AUDIT the sketch (one distinct-count
    aggregate); production drops it and keeps the m-cell sketch.

    Returns one row ``(n_tokens, exact_distinct, registers, zero_registers,
    hll_estimate, rel_error)``; estimate and error at 6dp.
    """
    if not 4 <= precision <= 16:
        raise ValueError(f"precision must be in [4, 16], got {precision}")
    m = 1 << precision
    rbits = 52 - precision
    rmax = rbits + 1  # rank of an all-zero suffix
    toks = _cms_tokens(df, text_col)
    regs = hll_registers(df, text_col=text_col, precision=precision)
    # exact integer harmonic sum: 2^-M scaled by 2^rmax
    sketch = regs.agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - mx)")).alias(
            "hsum_used"
        ),
    )
    counts = toks.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("exact_distinct"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    out = counts.crossJoin(F.broadcast(sketch)).select(
        "n_tokens",
        "exact_distinct",
        F.lit(m).alias("registers"),
        (F.lit(m) - F.col("used")).alias("zero_registers"),
        # empty registers contribute 2^-0 = 1 -> 2^rmax each, exactly
        (
            F.col("hsum_used")
            + (F.lit(m) - F.col("used")).cast("long")
            * F.shiftleft(F.lit(1).cast("long"), rmax)
        ).alias("hsum"),
    )
    pow2 = float(1 << rmax)
    raw = F.lit(alpha) * m * m * pow2 / F.col("hsum")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("zero_registers") > 0),
        F.round(
            F.lit(float(m))
            * F.log(F.lit(float(m)) / F.col("zero_registers")),
            6,
        ),
    ).otherwise(F.round(raw, 6))
    return out.select(
        "n_tokens",
        "exact_distinct",
        "registers",
        "zero_registers",
        est.alias("hll_estimate"),
        F.when(
            F.col("exact_distinct") > 0,
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct"), 6
            ),
        ).alias("rel_error"),
    )


def ppmi_word_vectors(
    df: DataFrame,
    text_col: str = "text",
    window: int = 2,
    vocab_size: int = 512,
    dim: int = 64,
) -> DataFrame:
    """Static word vectors via PPMI + truncated SVD (Levy & Goldberg
    2014: SGNS is implicitly factorizing the shifted PMI matrix) — train
    small, fully deterministic word embeddings from the corpus itself,
    no external model: the in-engine tool for query expansion, lexical
    drift probes, and cheap similarity features.

    Pipeline: co-occurrence counts within ``window`` positions over the
    top-``vocab_size`` tokens (offset equi-joins on (doc, pos) — linear
    in corpus tokens, the textrank edge discipline), positive PMI
    ``max(0, ln(n_ab * T / (n_a * n_b)))`` per cell, then SVD of the
    V x V PPMI matrix on the DRIVER — bounded by vocabulary choice, not
    corpus size (V=512 -> a 2 MB dense matrix; the fitting-sketch
    collect shape). Vectors are ``U_d * sqrt(S_d)`` with a
    deterministic sign convention (the largest-|loading| coordinate of
    each component is made positive), so results are partition- and
    platform-stable up to float noise.

    Returns ``(token, freq, vector)`` for the vocabulary, vector values
    rounded to 6dp, ordered by (freq DESC, token).
    """
    from nbdatatools_spark.functions.text import normalize_text, tokens

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not 1 <= dim <= vocab_size:
        raise ValueError(f"need 1 <= dim <= vocab_size, got dim={dim}")
    spark = df.sparkSession
    # the doc id MUST be assigned in its own projection BEFORE the
    # generator: monotonically_increasing_id in the same select as
    # posexplode runs per OUTPUT row, giving every token its own "doc"
    # and an empty pair table
    base = df.select(
        F.monotonically_increasing_id().alias("doc"),
        F.col(text_col).alias("__txt"),
    )
    pos = (
        base.select(
            "doc",
            F.posexplode_outer(
                tokens(normalize_text(F.col("__txt")))
            ).alias("pos", "w"),
        )
        .where(F.length("w") > 0)
        .localCheckpoint(eager=False)
    )
    vocab = (
        pos.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "w")
        .limit(vocab_size)
        .localCheckpoint(eager=False)
    )
    cpos = pos.join(F.broadcast(vocab.select("w")), "w")
    offs = spark.range(1, window + 1).select(
        F.col("id").cast("int").alias("o")
    )
    a = cpos.select("doc", "pos", F.col("w").alias("wa"))
    b = cpos.select("doc", F.col("pos").alias("pos_b"), F.col("w").alias("wb"))
    # symmetric counts: each (a earlier, b later) occurrence feeds both
    # (wa, wb) and (wb, wa) — the Levy-Goldberg symmetric-context window
    raw = (
        a.join(F.broadcast(offs), F.lit(True))
        .join(
            b,
            (b["doc"] == a["doc"]) & (b["pos_b"] == a["pos"] + F.col("o")),
        )
        .select("wa", "wb")
    )
    pairs = (
        raw.select("wa", "wb")
        .union(raw.select(F.col("wb").alias("wa"), F.col("wa").alias("wb")))
        .groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    cells = pairs.collect()  # bounded: <= vocab_size^2 non-zero cells
    vrows = vocab.collect()
    import numpy as np

    toks = [r["w"] for r in vrows]
    freq = {r["w"]: int(r["freq"]) for r in vrows}
    idx = {w: i for i, w in enumerate(toks)}
    v = len(toks)
    if v == 0:
        return spark.createDataFrame(
            [], "token string, freq bigint, vector array<double>"
        )
    c = np.zeros((v, v), dtype=np.float64)
    for r in cells:
        c[idx[r["wa"]], idx[r["wb"]]] = float(r["n_ab"])
    total = c.sum()
    if total == 0:
        vecs = np.zeros((v, min(dim, v)))
    else:
        na = c.sum(axis=1, keepdims=True)
        nb = c.sum(axis=0, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            pmi = np.log(c * total / (na * nb))
        ppmi = np.where(np.isfinite(pmi) & (pmi > 0), pmi, 0.0)
        u, s, _ = np.linalg.svd(ppmi, full_matrices=False)
        d = min(dim, v)
        u, s = u[:, :d], s[:d]
        # deterministic signs: largest-|loading| coordinate positive
        for k in range(d):
            j = int(np.argmax(np.abs(u[:, k])))
            if u[j, k] < 0:
                u[:, k] = -u[:, k]
        vecs = u * np.sqrt(s)
    rows = [
        (w, freq[w], [round(float(x), 6) for x in vecs[idx[w]]])
        for w in toks
    ]
    return spark.createDataFrame(
        rows, "token string, freq bigint, vector array<double>"
    ).orderBy(F.desc("freq"), "token")


def negative_sampling_table(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    power: float = 0.75,
) -> DataFrame:
    """word2vec-style negative-sampling table (Mikolov et al.,
    "Distributed Representations of Words and Phrases...", NeurIPS 2013
    §2.2): the top-``vocab_size`` tokens by count with sampling weight
    proportional to ``count^power`` (0.75 dampens head dominance) and the
    cumulative weight boundary a sampler needs for inverse-CDF draws —
    the companion table to ppmi_word_vectors' static embeddings.

    Exactness: weights are ``round(count^0.75, 9)`` DECIMAL-normalized
    by their DECIMAL sum (order-invariant); ``cum_weight`` is a running
    DECIMAL sum over the deterministic (count DESC, token ASC) order, so
    every boundary is engine-exact. The final row's cum_weight is the
    rounding-residual short of 1.0 by construction — samplers clamp.

    Scale shape: ONE explode -> token count aggregate (map-side partial,
    md5-digest keys are unnecessary here because the vocab cut happens
    immediately); the top-k cut is a TakeOrderedAndProject; the running
    sum is a window over the VOCAB-sized table only (bounded by
    ``vocab_size``, never corpus-sized — the vocab_topk discipline).

    Returns ``(rank, token, count, weight, cum_weight)``.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    counts = (
        # explode_outer + drop, never inner explode of a computed array
        # (InferFiltersFromGenerate pushes an interpreted size()>0 scan
        # filter otherwise -- the doc_winnow_pairs 292s lesson)
        docs.select(
            F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("token")
        )
        .where(F.col("token").isNotNull() & (F.col("token") != ""))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(vocab_size)
    )
    w = F.round(F.pow(F.col("count").cast("double"), F.lit(float(power))), 9)
    weighted = counts.select(
        "token", "count", w.cast(_TERM_DEC).alias("__w")
    )
    denom = weighted.agg(F.sum("__w").cast(_SUM_DEC).alias("__z"))
    order = Window.orderBy(F.desc("count"), F.asc("token"))
    return (
        weighted.crossJoin(F.broadcast(denom))
        .select(
            F.row_number().over(order).alias("rank"),
            "token",
            "count",
            # cast decimals to double BEFORE dividing: decimal/decimal
            # result scale differs between engines, double/double doesn't
            F.round(
                F.col("__w").cast("double") / F.col("__z").cast("double"), 9
            ).alias("weight"),
            F.round(
                F.sum("__w")
                .over(order.rowsBetween(Window.unboundedPreceding, 0))
                .cast("double")
                / F.col("__z").cast("double"),
                9,
            ).alias("cum_weight"),
        )
        .orderBy("rank")
    )


def lsa_topics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 256,
    n_topics: int = 5,
    top_terms: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Latent semantic analysis topics (Deerwester et al. 1990):
    truncated SVD of the tf-idf document-term matrix, reported as the
    ``top_terms`` highest-|loading| terms of each of the ``n_topics``
    leading right singular vectors — the deterministic, training-free
    topic sketch for corpus drift and slice comparison.

    Pipeline: (doc, term, tf*idf) over the top-``vocab_size`` tokens by
    document frequency (idf = round(ln(N/df), 9), the tfidf_top_terms
    convention), then the V x V term gramian ``G = A^T A`` via ONE
    doc-keyed self-join (per-doc fan-out bounded by the doc's distinct
    vocab terms), DECIMAL-summed cells, and an eigendecomposition of the
    collected gramian on the DRIVER — bounded by vocabulary choice, not
    corpus size (V=256 -> 0.5 MB dense; the ppmi_word_vectors collect
    shape). Right singular vectors of A are eigenvectors of G; singular
    values are sqrt of its eigenvalues. Deterministic sign convention:
    each topic's largest-|loading| coordinate is made positive
    (ties break to the lexicographically first term).

    Returns ``(topic, sv, term_rank, term, loading)`` — ``n_topics *
    top_terms`` rows, loadings at 6dp, ordered (topic, term_rank).
    Eigensolver output is platform-floating; the driver gate records
    rows-only, with the numpy differential + orthonormality invariants
    in tests/test_lsa.py as the correctness evidence.
    """
    from nbdatatools_spark.functions.text import normalize_text, tokens

    if n_topics < 1 or top_terms < 1:
        raise ValueError("n_topics and top_terms must be >= 1")
    spark = df.sparkSession
    from nbdatatools_spark.session import spread_small_input

    ex = (
        spread_small_input(df).select(
            F.col(id_col).alias("doc"),
            F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("w"),
        )
        .where(F.col("w").isNotNull() & (F.length("w") > 0))
        .localCheckpoint(eager=False)
    )
    n_docs = ex.select("doc").distinct().count()
    vocab = (
        ex.groupBy("w")
        .agg(F.count_distinct("doc").alias("df"))
        .where(F.col("df") >= min_df)
        .orderBy(F.desc("df"), "w")
        .limit(vocab_size)
        .select(
            "w",
            F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 9).alias("idf"),
        )
    )
    tf = ex.groupBy("doc", "w").agg(F.count(F.lit(1)).alias("tf"))
    # A is consumed exactly once (by the gramian list aggregate below) —
    # no checkpoint needed since the pair fan-out moved map-side
    A = tf.join(F.broadcast(vocab), "w").select(
        "doc", "w", (F.col("tf") * F.col("idf")).alias("wgt")
    )
    # Gramian pairs generated MAP-SIDE from a sorted per-doc term list
    # (optimization round 10, guide §2.4): the old doc-keyed self-join
    # shuffled and sorted A twice just to fan out each doc's term pairs;
    # one collect_list aggregate + posexplode/slice emits the identical
    # (t1 <= t2) upper-triangle pair multiset without the join — the
    # array is term-sorted, so slice-from-i yields pairs in the same
    # lexicographic orientation, and the 9dp DECIMAL cell sums are
    # order-invariant. NULL docs are dropped explicitly (the old join
    # never matched them).
    lists = (
        A.where(F.col("doc").isNotNull())
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("w", "wgt"))).alias("__ts"))
    )
    cells = (
        lists.select("__ts", F.posexplode("__ts").alias("__i", "__s1"))
        .select(
            "__s1",
            F.explode(
                F.slice(
                    "__ts", F.col("__i") + 1, F.size("__ts") - F.col("__i")
                )
            ).alias("__s2"),
        )
        .groupBy(
            F.col("__s1.w").alias("t1"), F.col("__s2.w").alias("t2")
        )
        .agg(
            F.sum(
                F.round(F.col("__s1.wgt") * F.col("__s2.wgt"), 9).cast(
                    "decimal(30,9)"
                )
            )
            .cast("double")
            .alias("g")
        )
        .collect()
    )  # bounded: <= vocab_size^2 cells
    vrows = vocab.collect()
    import numpy as np

    toks = sorted(r["w"] for r in vrows)
    idx = {w: i for i, w in enumerate(toks)}
    v = len(toks)
    out_schema = "topic int, sv double, term_rank int, term string, loading double"
    if v == 0:
        return spark.createDataFrame([], out_schema)
    G = np.zeros((v, v), dtype=np.float64)
    for r in cells:
        i, j = idx[r["t1"]], idx[r["t2"]]
        G[i, j] = r["g"]
        G[j, i] = r["g"]
    eigval, eigvec = np.linalg.eigh(G)
    order = np.argsort(eigval)[::-1]
    k = min(n_topics, v)
    rows = []
    for t in range(k):
        col = eigvec[:, order[t]].copy()
        sv = float(np.sqrt(max(eigval[order[t]], 0.0)))
        # sign fix: largest |loading|, ties to the first term index
        j = int(np.argmax(np.abs(col)))
        if col[j] < 0:
            col = -col
        ranked = sorted(
            range(v), key=lambda i: (-abs(col[i]), toks[i])
        )[: min(top_terms, v)]
        for rk, i in enumerate(ranked):
            rows.append(
                (t, round(sv, 6), rk, toks[i], round(float(col[i]), 6))
            )
    return spark.createDataFrame(rows, out_schema).orderBy("topic", "term_rank")
