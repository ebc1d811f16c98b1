"""WordPiece tokenizer training + greedy ``##`` segmentation (SURVEY §7.8
training-data extension; Schuster & Nakajima ICASSP 2012, Wu et al. 2016
arXiv:1609.08144 — the BERT tokenizer lineage).

WordPiece differs from BPE (operators/bpe.py) in the merge OBJECTIVE:
instead of the most frequent adjacent pair it merges the pair with the
largest unigram-LM likelihood gain,

    score(a, b) = count(ab) / (count(a) * count(b))

(the public HuggingFace-tokenizers trainer formulation of the Schuster-
Nakajima criterion), and in the SYMBOL SPACE: non-initial symbols carry
the ``##`` continuation prefix, so "hello" starts as
``[h, ##e, ##l, ##l, ##o]`` and merging ``(##l, ##l)`` yields ``##ll``
(the continuation marker of the LEFT symbol survives; the right one is
consumed).

Distributed formulation (the bpe.py factorization):

1. ONE corpus pass builds the word-frequency vocabulary (``groupBy
   word``) — the corpus is never touched again;
2. each merge iteration runs over the VOCABULARY only (Heaps' law):
   one pair explode and one symbol explode, both weighted by word count
   and map-side combinable; a bounded join scores every pair; the argmax
   is fully deterministic (score DESC, then (left, right) ASC); the
   rewrite is the same leftmost-greedy Catalyst fold as BPE;
3. ENCODING is not merge-replay (unlike BPE): WordPiece segments by
   greedy longest-match-first against the final vocabulary, falling back
   to ``[UNK]`` when any position has no match (the BERT contract). The
   matcher is word-local and inherently iterative — an Arrow-batched
   pandas pass with a per-batch word memo (the unigram_encode pattern);
   the vocabulary is a bounded broadcast.

At 100 TB the corpus pass dominates and is embarrassingly parallel; the
k merge iterations cost k tiny vocab-sized shuffles; segmentation is a
map-only projection (no shuffle), memoized per batch so each distinct
word in a batch is matched once.

Reference parity: nbdatatools ships BPE-style subword segmentation in
its token-statistics CLI (see SURVEY §2.6 F6/doc_subword_tokens); the
WordPiece trainer/segmenter completes the deployed-tokenizer family
(BPE / byte-level BPE / unigram-LM / WordPiece) per VERDICT r8 task #2.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _strip_cont(sym: str) -> str:
    """Character payload of a symbol (drop the ## continuation prefix)."""
    return sym[2:] if sym.startswith("##") else sym


def wordpiece_vocabulary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-frequency vocabulary with WordPiece initial symbols:
    ``(word, count, symbols)`` where symbols[0] is the first character
    and every later symbol carries the ``##`` continuation prefix."""
    from ..functions.text import normalize_text

    words = (
        df.select(
            F.explode_outer(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )
    syms = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.when(i == 1, F.col("word").substr(i, F.lit(1))).otherwise(
            F.concat(F.lit("##"), F.col("word").substr(i, F.lit(1)))
        ),
    )
    return words.withColumn("symbols", syms)


def learn_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
) -> list[tuple[int, str, str, int, float]]:
    """Learn up to ``n_merges`` WordPiece merges from a document corpus.

    Returns ``[(step, left, right, pair_count, score), ...]`` in merge
    order. Each step picks the pair maximizing
    ``pair_count / (left_count * right_count)`` (counts weighted by word
    frequency; symbol counts measured over the CURRENT symbol arrays)
    AMONG pairs occurring at least ``min_count`` times — the floor
    FILTERS candidates rather than stopping training (the HF-tokenizers
    ``min_frequency`` semantics: score favors rare pairs, so a stop-rule
    floor would end training at step 0 on any corpus with a singleton
    pair). Stops early only when no pair passes the floor.
    Deterministic: ties break on score DESC, then (left, right)
    lexicographic ASC.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    vocab = wordpiece_vocabulary(df, text_col).cache()
    prev = None  # one-generation unpersist lag (the bpe.py discipline)
    merges: list[tuple[int, str, str, int, float]] = []
    try:
        for step in range(n_merges):
            pairs = (
                vocab.where(F.size("symbols") >= 2)
                .select(
                    "count",
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(1), F.size("symbols") - 1),
                            lambda i: F.struct(
                                F.element_at("symbols", i).alias("left"),
                                F.element_at("symbols", i + 1).alias("right"),
                            ),
                        )
                    ).alias("pair"),
                )
                .groupBy("pair.left", "pair.right")
                .agg(F.sum("count").alias("pair_count"))
                .where(F.col("pair_count") >= min_count)
            )
            sym_counts = (
                vocab.select("count", F.explode("symbols").alias("sym"))
                .groupBy("sym")
                .agg(F.sum("count").alias("sym_count"))
            )
            best = (
                pairs.join(
                    F.broadcast(
                        sym_counts.select(
                            F.col("sym").alias("left"),
                            F.col("sym_count").alias("__lc"),
                        )
                    ),
                    "left",
                )
                .join(
                    F.broadcast(
                        sym_counts.select(
                            F.col("sym").alias("right"),
                            F.col("sym_count").alias("__rc"),
                        )
                    ),
                    "right",
                )
                .select(
                    "left",
                    "right",
                    "pair_count",
                    (
                        F.col("pair_count").cast("double")
                        / (
                            F.col("__lc").cast("double")
                            * F.col("__rc").cast("double")
                        )
                    ).alias("score"),
                )
                .orderBy(F.desc("score"), "left", "right")
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right = best[0]["left"], best[0]["right"]
            merges.append(
                (
                    step,
                    left,
                    right,
                    int(best[0]["pair_count"]),
                    float(best[0]["score"]),
                )
            )
            merged = left + _strip_cont(right)
            nxt = vocab.withColumn(
                "symbols", _wp_merge_pair(F.col("symbols"), left, right, merged)
            ).cache()
            if prev is not None:
                prev.unpersist()
            prev = vocab
            vocab = nxt
    finally:
        if prev is not None:
            prev.unpersist()
        vocab.unpersist()
    return merges


def _wp_merge_pair(sym_col, left: str, right: str, merged: str):
    """Leftmost-greedy single-pass merge with an explicit merged symbol
    (WordPiece strips the right symbol's ## prefix; bpe._merge_pair
    concatenates verbatim)."""
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def wordpiece_base_symbols(df: DataFrame, text_col: str = "text") -> list[str]:
    """Distinct base symbols of the normalized corpus: every word-initial
    character plus every ##-prefixed continuation character. Bounded by
    2x the alphabet; one vocab-sized explode + distinct."""
    rows = (
        wordpiece_vocabulary(df, text_col)
        .select(F.explode("symbols").alias("s"))
        .distinct()
        .collect()
    )
    return sorted(r.s for r in rows)


def wordpiece_vocab(
    merges, base_symbols, unk: str = "[UNK]"
) -> dict[str, int]:
    """Token-id vocabulary: [UNK] first, then the base symbols (sorted),
    then merge outputs in merge order — the BERT-style id layout."""
    toks = [unk] + list(dict.fromkeys(sorted(base_symbols)))
    for _, left, right, _, _ in merges:
        t = left + _strip_cont(right)
        if t not in toks:
            toks.append(t)
    return {t: i for i, t in enumerate(toks)}


def _greedy_pieces(word: str, vocab: frozenset, unk: str) -> list[str]:
    """BERT greedy longest-match-first: at each position take the longest
    vocab entry (##-prefixed past position 0); if ANY position has no
    match the whole word becomes [unk]."""
    pieces: list[str] = []
    i, n = 0, len(word)
    while i < n:
        end = n
        hit = None
        while end > i:
            sub = word[i:end]
            if i > 0:
                sub = "##" + sub
            if sub in vocab:
                hit = sub
                break
            end -= 1
        if hit is None:
            return [unk]
        pieces.append(hit)
        i = end
    return pieces


def wordpiece_segment(
    df: DataFrame,
    vocab,
    text_col: str = "text",
    out_col: str = "wp_tokens",
    unk: str = "[UNK]",
) -> DataFrame:
    """Segment a corpus with a trained WordPiece vocabulary: per-word
    greedy longest-match against the vocab (Arrow-batched, per-batch word
    memo so each distinct word is matched once per batch; the vocab is a
    bounded broadcast). Appends ``out_col ARRAY<STRING>``. Map-only —
    no shuffle."""
    from ..functions.text import normalize_text

    vset = frozenset(vocab)

    def run(batches: Iterator) -> Iterator:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for text in pdf["__norm"]:
                toks: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = _greedy_pieces(w, vset, unk)
                        memo[w] = got
                    toks.extend(got)
                out.append(toks)
            pdf = pdf.drop(columns=["__norm"])
            pdf[out_col] = out
            yield pdf

    base = df.withColumn("__norm", normalize_text(F.col(text_col)))
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return base.mapInPandas(run, f"{schema}, {out_col} ARRAY<STRING>")


def wordpiece_word_pieces(
    words: DataFrame,
    vocab,
    word_col: str = "word",
    out_col: str = "pieces",
    unk: str = "[UNK]",
) -> DataFrame:
    """Greedy segmentation of a WORD table (one row per distinct word —
    the Heaps-bounded factorization for vocab-level audits): appends
    ``out_col ARRAY<STRING>``."""
    vset = frozenset(vocab)

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf[out_col] = [
                _greedy_pieces(w, vset, unk) if w else [unk]
                for w in pdf[word_col]
            ]
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in words.schema.fields
    )
    return words.mapInPandas(run, f"{schema}, {out_col} ARRAY<STRING>")
