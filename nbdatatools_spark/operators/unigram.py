"""Unigram-LM (SentencePiece-style) tokenizer training (SURVEY §7.8
training-data extension; Kudo ACL 2018, arXiv:1804.10959).

The BPE sibling (operators/bpe.py) learns a merge table bottom-up; the
unigram model starts from a LARGE seed vocabulary of substrings and
iteratively re-estimates piece probabilities with EM, pruning pieces the
model stops using — the tokenizer family SentencePiece defaults to.

Distributed formulation (same factorization as bpe.py):

1. ONE corpus pass builds the word-frequency vocabulary (``groupBy
   word``) — the corpus is never touched again;
2. the seed vocabulary explodes substrings (len 2..max_piece_len) of the
   DISTINCT words, weighted by word count — vocab-sized, one map-side-
   combinable groupBy; all single characters are always included so every
   word stays segmentable;
3. each EM iteration runs Viterbi segmentation per DISTINCT word under
   the current piece log-probs (an Arrow-batched pandas UDF — the DP is
   word-local and embarrassingly parallel; the piece table is a bounded
   broadcast of seed_size + alphabet entries), aggregates weighted piece
   usage counts (one vocab-sized shuffle), and re-normalizes on the
   driver (bounded collect: one row per piece).

This is HARD EM (Viterbi counts, the common deterministic simplification
of Kudo's forward-backward expected counts): each step re-estimates on
the best segmentation, so the Viterbi objective is monotone
non-decreasing — re-segmentation improves likelihood for fixed probs,
re-estimation improves it for the fixed segmentation. Pruning drops
pieces with zero Viterbi usage (never single characters), mirroring
SentencePiece's shrink-until-vocab-size loop in bounded form.

Determinism contract: integer seed frequencies, fixed iteration count,
word-local float64 DP with ties broken (longer piece, then lexicographic)
— results are partition-invariant and re-run-stable.

At 100 TB: the corpus pass dominates and is embarrassingly parallel; EM
iterations cost k vocab-sized shuffles + k bounded driver collects
(pieces, not corpus rows). Nothing corpus-sized is ever collected.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nbdatatools_spark.operators.bpe import word_vocabulary


def seed_vocabulary(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 6,
    seed_size: int = 2000,
) -> DataFrame:
    """(piece, freq): candidate pieces = top ``seed_size`` substrings of
    length 2..max_piece_len by corpus-weighted frequency (ties on piece
    string) UNION every single character (weighted by occurrences).
    Substring explosion runs over the DISTINCT-word vocabulary — Heaps-
    bounded, not corpus-sized."""
    if max_piece_len < 2:
        raise ValueError(f"max_piece_len must be >= 2, got {max_piece_len}")
    vocab = word_vocabulary(df, text_col).select("word", "count")
    # guard i < length(word): sequence() DESCENDS when start > stop
    subs_expr = (
        "flatten(transform(sequence(1, length(word)), i -> "
        "CASE WHEN i < length(word) THEN "
        f"transform(sequence(i + 1, least(i + {int(max_piece_len)} - 1, "
        "length(word))), j -> substring(word, i, j - i + 1)) "
        "ELSE CAST(array() AS array<string>) END))"
    )
    multi = (
        vocab.select("count", F.explode(F.expr(subs_expr)).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("count").alias("freq"))
        .orderBy(F.desc("freq"), "piece")
        .limit(seed_size)
    )
    chars = (
        vocab.select(
            "count",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.col("word").substr(i, F.lit(1)),
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("count").alias("freq"))
    )
    return chars.unionByName(multi)


def _viterbi(word: str, logp: dict, max_len: int):
    """Best segmentation of ``word`` under piece log-probs: returns the
    piece list (None entries impossible — single chars are always in the
    table). Ties break on longer piece, then lexicographically smaller."""
    n = len(word)
    best = [(-math.inf, None)] * (n + 1)
    best[0] = (0.0, None)
    for i in range(1, n + 1):
        for l in range(1, min(max_len, i) + 1):
            piece = word[i - l : i]
            lp = logp.get(piece)
            if lp is None:
                continue
            prev = best[i - l][0]
            if prev == -math.inf:
                continue
            score = prev + lp
            cur = best[i]
            if (
                cur[1] is None
                or score > cur[0]
                or (
                    score == cur[0]
                    and (
                        len(piece) > len(cur[1])
                        or (len(piece) == len(cur[1]) and piece < cur[1])
                    )
                )
            ):
                best[i] = (score, piece)
    pieces: list[str] = []
    i = n
    while i > 0:
        p = best[i][1]
        if p is None:
            # OOV character at encode time (never happens in training —
            # every training char is in the table): emit it bare with a
            # hard penalty and keep going
            p = word[i - 1 : i]
            best[i] = (best[i - 1][0] - 1e9, p)
        pieces.append(p)
        i -= len(p)
    pieces.reverse()
    return best[n][0], pieces


def _segment_counts_udf(logp: dict, max_len: int):
    """mapInPandas kernel: (word, count) -> exploded (piece, wcount,
    wll) Viterbi usage rows; wll carries count * best-path log-prob so
    the per-iteration corpus objective is one aggregate away."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pieces_out, counts_out, ll_out = [], [], []
            for word, cnt in zip(pdf["word"], pdf["count"]):
                ll, pieces = _viterbi(word, logp, max_len)
                for p in pieces:
                    pieces_out.append(p)
                    counts_out.append(int(cnt))
                    ll_out.append(float(ll) * int(cnt) / len(pieces))
            yield pd.DataFrame(
                {"piece": pieces_out, "wcount": counts_out, "wll": ll_out}
            )

    return run


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    max_piece_len: int = 6,
    seed_size: int = 2000,
    n_iter: int = 3,
):
    """Train a unigram-LM tokenizer. Returns ``(pieces, history)``:
    ``pieces`` = list of (piece, prob) sorted by (prob DESC, piece ASC),
    len <= vocab_size (single characters always retained); ``history`` =
    per-iteration corpus Viterbi log-likelihood (monotone non-decreasing
    — the hard-EM guarantee the gate pins).
    """
    if vocab_size < 2:
        raise ValueError(f"vocab_size must be >= 2, got {vocab_size}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    spark = df.sparkSession
    vocab = word_vocabulary(df, text_col).select("word", "count").localCheckpoint(
        eager=False
    )
    seed_rows = seed_vocabulary(
        df, text_col, max_piece_len=max_piece_len, seed_size=seed_size
    ).collect()  # bounded: seed_size + alphabet rows
    if not seed_rows:
        raise ValueError(
            "unigram_train needs a non-empty corpus (no words after "
            "normalization)"
        )
    total = float(sum(r["freq"] for r in seed_rows))
    logp = {r["piece"]: math.log(r["freq"] / total) for r in seed_rows}
    singles = {p for p in logp if len(p) == 1}
    history: list[float] = []
    for it in range(n_iter):
        counts = (
            vocab.mapInPandas(
                _segment_counts_udf(logp, max_piece_len),
                "piece STRING, wcount LONG, wll DOUBLE",
            )
            .groupBy("piece")
            .agg(F.sum("wcount").alias("n"), F.sum("wll").alias("ll"))
            .collect()  # bounded: one row per piece in use
        )
        history.append(float(sum(r["ll"] for r in counts)))
        used = {r["piece"]: int(r["n"]) for r in counts}
        last = it == n_iter - 1
        if last and len(used) > vocab_size:
            # final prune to vocab_size: keep all singles, then the
            # highest-usage multi-char pieces (ties on piece string)
            multi = sorted(
                ((p, n) for p, n in used.items() if len(p) > 1),
                key=lambda x: (-x[1], x[0]),
            )
            keep_multi = {
                p for p, _ in multi[: max(vocab_size - len(singles), 0)]
            }
            used = {
                p: n
                for p, n in used.items()
                if len(p) == 1 or p in keep_multi
            }
        # M-step = the EXACT maximizer p = n/total of the hard-count
        # objective (Gibbs), so the Viterbi LL is monotone non-decreasing
        # by construction. Singles with zero usage stay OUT of the
        # normalization and get an epsilon backstop instead (coverage for
        # unseen words at encode time; eps is far below any used piece's
        # prob, so it can never join a training best path and cannot
        # perturb monotonicity).
        tot = float(sum(used.values()))
        logp = {p: math.log(n / tot) for p, n in used.items() if n > 0}
        for s in singles:
            if s not in logp:
                logp[s] = math.log(1e-12)
    probs = {p: math.exp(lp) for p, lp in logp.items()}
    pieces = sorted(probs.items(), key=lambda x: (-x[1], x[0]))
    return pieces, history


def unigram_encode(
    df: DataFrame,
    pieces,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    max_piece_len: int = 6,
) -> DataFrame:
    """Segment a corpus with a trained piece table: per-word Viterbi
    under the piece log-probs (Arrow-batched; the piece table is a
    bounded broadcast). Appends ``out_col ARRAY<STRING>``."""
    from nbdatatools_spark.functions.text import normalize_text

    logp = {p: math.log(pr) for p, pr in pieces}

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for text in pdf["__norm"]:
                toks: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    _, ps = _viterbi(w, logp, max_piece_len)
                    toks.extend(ps)
                out.append(toks)
            pdf = pdf.drop(columns=["__norm"])
            pdf[out_col] = out
            yield pdf

    base = df.withColumn("__norm", normalize_text(F.col(text_col)))
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return base.mapInPandas(run, f"{schema}, {out_col} ARRAY<STRING>")
