"""Round-10 candidate batch 4: ECE/MCE, Sinkhorn OT distance,
SentencePiece-style BPE, packing-efficiency audit."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.analysis import sinkhorn_distance
from nbdatatools_spark.operators.bpe import (
    SP_MARK,
    learn_sentencepiece_bpe,
    sentencepiece_segment,
)
from nbdatatools_spark.operators.evaluation import expected_calibration_error
from nbdatatools_spark.operators.packing import packing_efficiency


# -- ECE -------------------------------------------------------------------------


def test_ece_hand_computed(spark):
    # bin 0 (scores ~0.05): 2 rows, conf 0.05, acc 0.5 -> gap 0.45
    # bin 9 (scores ~0.95): 2 rows, conf 0.95, acc 1.0 -> gap 0.05
    df = spark.createDataFrame(
        [(0.05, 0), (0.05, 1), (0.95, 1), (0.95, 1)], "score double, y int"
    )
    row = expected_calibration_error(df, "score", "y").collect()[0]
    assert row["n"] == 4 and row["n_bins_occupied"] == 2
    assert abs(row["ece"] - (0.45 * 2 + 0.05 * 2) / 4) < 1e-9
    assert abs(row["mce"] - 0.45) < 1e-9


def test_ece_zero_when_perfectly_calibrated(spark):
    # each bin's positive rate equals its confidence exactly
    rows = []
    for conf, k in [(0.25, 4), (0.75, 4)]:
        pos = int(conf * k)
        rows += [(conf, 1)] * pos + [(conf, 0)] * (k - pos)
    df = spark.createDataFrame(rows, "score double, y int")
    row = expected_calibration_error(df, "score", "y").collect()[0]
    assert row["ece"] == 0.0 and row["mce"] == 0.0


def test_ece_validates(spark):
    df = spark.createDataFrame([(0.5, 1)], "score double, y int")
    with pytest.raises(ValueError):
        expected_calibration_error(df, "score", "y", n_bins=1)
    with pytest.raises(ValueError):
        expected_calibration_error(df, "score", "y", lo=1.0, hi=0.0)


# -- sinkhorn --------------------------------------------------------------------


def _sink_py(ca, cb, n_bins, eps, iterations):
    """Pure-Python replica with the engine's 9dp/12dp rounding."""
    B = n_bins
    na, nb = sum(ca), sum(cb)
    a = [round(c / na, 9) for c in ca]
    b = [round(c / nb, 9) for c in cb]
    K = [
        [round(math.exp(-(abs(i - j) / (B - 1)) / eps), 9) for j in range(B)]
        for i in range(B)
    ]
    C = [[round(abs(i - j) / (B - 1), 9) for j in range(B)] for i in range(B)]
    u = [1.0 if a[i] > 0 else 0.0 for i in range(B)]
    for _ in range(iterations):
        v = []
        for j in range(B):
            s = sum(round(K[i][j] * u[i], 9) for i in range(B))
            v.append(round(b[j] / s, 9) if s > 0 else 0.0)
        u = []
        for i in range(B):
            s = sum(round(K[i][j] * v[j], 9) for j in range(B))
            u.append(round(a[i] / s, 9) if s > 0 else 0.0)
    cost = sum(
        round(round(u[i] * K[i][j] * v[j], 12) * C[i][j], 9)
        for i in range(B)
        for j in range(B)
    )
    return round(cost, 6)


def _valdf(spark, vals_a, vals_b):
    rows = [(v, "0") for v in vals_a] + [(v, "1") for v in vals_b]
    return spark.createDataFrame(rows, "v double, grp string")


def test_sinkhorn_python_differential(spark):
    import random

    rng = random.Random(19)
    va = [rng.uniform(0, 10) for _ in range(300)]
    vb = [rng.uniform(3, 10) for _ in range(200)]
    B, eps, iters = 8, 0.25, 10
    row = sinkhorn_distance(
        _valdf(spark, va, vb), "v", "grp", "0", "1",
        n_bins=B, lo=0.0, hi=10.0, eps=eps, iterations=iters,
    ).collect()[0]
    width = 10.0 / B
    ca = [0] * B
    for v in va:
        ca[min(max(int(v // width), 0), B - 1)] += 1
    cb = [0] * B
    for v in vb:
        cb[min(max(int(v // width), 0), B - 1)] += 1
    assert row["n_a"] == 300 and row["n_b"] == 200
    assert abs(row["cost"] - _sink_py(ca, cb, B, eps, iters)) < 1e-5
    assert row["marginal_err"] < 1e-3


def test_sinkhorn_orders_by_shift_and_zero_for_identical(spark):
    base = [float(i % 10) for i in range(500)]
    small = [min(v + 1.0, 9.99) for v in base]
    big = [min(v + 5.0, 9.99) for v in base]
    kw = dict(n_bins=10, lo=0.0, hi=10.0, eps=0.1, iterations=10)
    same = sinkhorn_distance(
        _valdf(spark, base, list(base)), "v", "grp", "0", "1", **kw
    ).collect()[0]["cost"]
    c_small = sinkhorn_distance(
        _valdf(spark, base, small), "v", "grp", "0", "1", **kw
    ).collect()[0]["cost"]
    c_big = sinkhorn_distance(
        _valdf(spark, base, big), "v", "grp", "0", "1", **kw
    ).collect()[0]["cost"]
    # identical marginals keep the ENTROPIC BIAS (the regularized plan
    # spreads mass over the kernel — the reason Sinkhorn DIVERGENCES
    # debias); the distance is still far below any real shift and the
    # shift ordering is strict
    assert same < 0.1
    assert same < c_small < c_big


def test_sinkhorn_validates(spark):
    df = _valdf(spark, [1.0], [2.0])
    for kw in (
        dict(n_bins=1), dict(lo=5.0, hi=1.0), dict(iterations=0),
        dict(eps=0.0),
    ):
        with pytest.raises(ValueError):
            sinkhorn_distance(df, "v", "grp", "0", "1", **kw)


# -- sentencepiece BPE -----------------------------------------------------------


def _sp_ref(word_counts, n_merges, min_count):
    """Pure-Python Sennrich BPE over MARKED words (test_chunk_bpe_weighted
    _bpe_ref with the U+2581 prefix)."""
    vocab = {tuple(SP_MARK + w): c for w, c in word_counts.items()}
    merges = []
    for step in range(n_merges):
        pairs = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = (
                    pairs.get((sym[i], sym[i + 1]), 0) + c
                )
        if not pairs:
            break
        best = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((step, a, b, cnt))
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_sentencepiece_merges_match_python_reference(spark, documents):
    docs = documents.limit(50)
    merges = learn_sentencepiece_bpe(docs, n_merges=6, min_count=2)
    counts = {}
    for r in docs.collect():
        for w in " ".join((r.text or "").lower().split()).split():
            if w:
                counts[w] = counts.get(w, 0) + 1
    assert merges == _sp_ref(counts, 6, 2)
    # every first merge in this lineage starts at the word boundary or
    # inside a word — but the marker can only appear at position 1
    for _, left, right, _ in merges:
        assert SP_MARK not in right
        assert not left.startswith(SP_MARK) or left.count(SP_MARK) == 1


def test_sentencepiece_roundtrip_lossless(spark):
    df = spark.createDataFrame(
        [(1, "The  cat SAT on the mat"), (2, "a aa aaa"), (3, "")],
        "doc_id long, text string",
    )
    merges = learn_sentencepiece_bpe(df, n_merges=5, min_count=2)
    seg = sentencepiece_segment(df, merges)
    out = seg.select(
        F.trim(
            F.regexp_replace(F.concat_ws("", "sp_tokens"), SP_MARK, " ")
        ).alias("detok"),
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("norm"),
    ).collect()
    for r in out:
        assert r["detok"] == r["norm"]


def test_sentencepiece_marker_merges_word_initial_pieces(spark):
    # 'the' dominates: expect merges to build toward '▁the'
    df = spark.createDataFrame(
        [(1, "the the the the cat")], "doc_id long, text string"
    )
    merges = learn_sentencepiece_bpe(df, n_merges=3, min_count=2)
    # ascii symbols sort before U+2581, so ties go (h,e) -> (t,he) ->
    # (▁,the): the marker merge lands LAST but the word-initial piece
    # '▁the' is built within 3 merges
    toks = set()
    for _, left, right, _ in merges:
        toks.add(left + right)
    assert SP_MARK + "the" in toks


# -- packing efficiency ----------------------------------------------------------


def test_packing_efficiency_hand_computed(spark):
    # budget 10; docs 6, 6, 8, 0: starts 0, 6, 12; total 20
    # doc1 spans seqs 0-1 (split), doc2 spans 1-1, doc3... wait:
    #   doc 0: [0, 5]   -> seq 0      (no split)
    #   doc 1: [6, 11]  -> seqs 0-1   (split)
    #   doc 2: [12, 19] -> seq 1      (no split)
    #   doc 3: empty    -> excluded from split/touch stats
    df = spark.createDataFrame(
        [(0, 6), (1, 6), (2, 8), (3, 0)], "doc_id long, n_tokens long"
    )
    row = packing_efficiency(df, 10).collect()[0]
    assert row["n_docs"] == 4 and row["n_nonempty"] == 3
    assert row["total_tokens"] == 20 and row["n_seqs"] == 2
    assert row["split_docs"] == 1
    assert abs(row["split_frac"] - 1 / 3) < 1e-6
    # touches: 1 + 2 + 1 = 4 over 2 seqs
    assert abs(row["docs_per_seq_mean"] - 2.0) < 1e-9
    assert row["tail_waste_tokens"] == 0


def test_packing_efficiency_tail_and_long_doc(spark):
    # one 25-token doc at budget 10: spans seqs 0-2, tail waste 5
    df = spark.createDataFrame([(0, 25)], "doc_id long, n_tokens long")
    row = packing_efficiency(df, 10).collect()[0]
    assert row["n_seqs"] == 3 and row["split_docs"] == 1
    assert row["tail_waste_tokens"] == 5
    assert abs(row["docs_per_seq_mean"] - 1.0) < 1e-9


def test_packing_efficiency_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    row = packing_efficiency(df, 10).collect()[0]
    assert row["n_docs"] == 0 and row["n_seqs"] == 0
    assert row["split_frac"] is None and row["tail_waste_tokens"] == 0
