"""Unigram-LM tokenizer training (round 7): pure-Python differential,
Viterbi closed forms, hard-EM monotonicity, partition invariance,
encode round-trips."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.unigram import (
    _viterbi,
    seed_vocabulary,
    unigram_encode,
    unigram_train,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate the rat"),
        (3, "a cat and a rat sat"),
        (4, "the mat and the cat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_train(texts, vocab_size=64, max_len=6, seed_size=50, n_iter=3):
    """Sequential replica of unigram_train: same seed rule, same hard-EM,
    same tie-breaks — the distributed pipeline must reproduce it."""
    words = {}
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    seed = {}
    for w, c in words.items():
        for i in range(len(w)):
            for l in range(2, max_len + 1):
                if i + l <= len(w):
                    seed[w[i : i + l]] = seed.get(w[i : i + l], 0) + c
    multi = sorted(seed.items(), key=lambda x: (-x[1], x[0]))[:seed_size]
    chars = {}
    for w, c in words.items():
        for ch in w:
            chars[ch] = chars.get(ch, 0) + c
    freqs = dict(multi)
    freqs.update(chars)
    total = float(sum(freqs.values()))
    logp = {p: math.log(f / total) for p, f in freqs.items()}
    singles = set(chars)
    history = []
    for it in range(n_iter):
        used, ll_tot = {}, 0.0
        for w, c in words.items():
            ll, pieces = _viterbi(w, logp, max_len)
            ll_tot += ll * c
            for p in pieces:
                used[p] = used.get(p, 0) + c
        history.append(ll_tot)
        if it == n_iter - 1 and len(used) > vocab_size:
            m = sorted(
                ((p, n) for p, n in used.items() if len(p) > 1),
                key=lambda x: (-x[1], x[0]),
            )
            keep = {p for p, _ in m[: max(vocab_size - len(singles), 0)]}
            used = {p: n for p, n in used.items() if len(p) == 1 or p in keep}
        tot = float(sum(used.values()))
        logp = {p: math.log(n / tot) for p, n in used.items() if n > 0}
        for s in singles:
            if s not in logp:
                logp[s] = math.log(1e-12)
    probs = {p: math.exp(lp) for p, lp in logp.items()}
    return sorted(probs.items(), key=lambda x: (-x[1], x[0])), history


def test_viterbi_closed_form():
    logp = {"a": math.log(0.5), "b": math.log(0.2), "ab": math.log(0.25)}
    ll, pieces = _viterbi("ab", logp, 6)
    assert pieces == ["ab"] and ll == pytest.approx(math.log(0.25))
    # tie: p(ab) == p(a)*p(b) -> prefer the longer piece
    logp = {"a": math.log(0.5), "b": math.log(0.5), "ab": math.log(0.25)}
    _, pieces = _viterbi("ab", logp, 6)
    assert pieces == ["ab"]
    # OOV char at encode time: emitted bare, never crashes
    _, pieces = _viterbi("axb", {"a": -1.0, "b": -1.0}, 6)
    assert pieces == ["a", "x", "b"]


def test_train_matches_python_replica(spark, tiny):
    texts = [r["text"] for r in tiny.collect()]
    want, want_hist = _py_train(texts)
    got, got_hist = unigram_train(
        tiny, vocab_size=64, max_piece_len=6, seed_size=50, n_iter=3
    )
    assert [(p, pytest.approx(pr, rel=1e-12)) for p, pr in want] == got
    assert got_hist == pytest.approx(want_hist, rel=1e-9)


def test_history_monotone_and_probs_normalized(spark, documents):
    pieces, hist = unigram_train(
        documents.limit(100), vocab_size=256, seed_size=400, n_iter=3
    )
    for a, b in zip(hist, hist[1:]):
        assert b >= a - 1e-6  # hard-EM monotonicity
    # probs sum to 1 (epsilon-backstop singles contribute <= k * 1e-12)
    assert sum(pr for _, pr in pieces) == pytest.approx(1.0, abs=1e-6)
    assert len(pieces) <= 256 + 64  # vocab_size + alphabet slack


def test_partition_invariance(spark, tiny):
    a, ha = unigram_train(tiny, vocab_size=64, seed_size=50, n_iter=2)
    b, hb = unigram_train(
        tiny.repartition(7), vocab_size=64, seed_size=50, n_iter=2
    )
    assert a == b and ha == pytest.approx(hb, rel=1e-12)


def test_encode_round_trip(spark, tiny):
    pieces, _ = unigram_train(tiny, vocab_size=64, seed_size=50, n_iter=2)
    enc = unigram_encode(tiny, pieces).collect()
    for r in enc:
        norm = " ".join(r["text"].lower().split())
        assert "".join(r["unigram_tokens"]) == norm.replace(" ", "")


def test_seed_vocabulary_counts(spark):
    df = spark.createDataFrame([(1, "aa aa ab")], "doc_id long, text string")
    rows = {r["piece"]: r["freq"] for r in seed_vocabulary(df, seed_size=10).collect()}
    # words: aa(x2), ab(x1); substrings len2: aa->2, ab->1; chars: a=5, b=1
    assert rows["aa"] == 2 and rows["ab"] == 1
    assert rows["a"] == 5 and rows["b"] == 1


def test_validation(spark, tiny):
    with pytest.raises(ValueError):
        unigram_train(tiny, vocab_size=1)
    with pytest.raises(ValueError):
        unigram_train(tiny, n_iter=0)
    with pytest.raises(ValueError):
        seed_vocabulary(tiny, max_piece_len=1)
