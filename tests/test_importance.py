"""DSIR importance-weighting tests: pure-Python differential replica,
OOV bucket behavior, and directional sanity."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.importance import dsir_log_ratios, dsir_weights


RAW = [
    (0, "stocks rallied on earnings news"),
    (1, "the cat chased the dog"),
    (2, "earnings beat estimates stocks up"),
    (3, "dogs and cats play outside"),
    (4, ""),
]
TARGET = [
    (10, "stocks surged after earnings"),
    (11, "markets rallied earnings strong"),
]


def _norm_tokens(text):
    return [t for t in " ".join(text.lower().split()).split(" ") if t]


def _py_dsir(raw_rows, tgt_rows, vocab_size, alpha):
    rc = Counter(t for _, x in raw_rows for t in _norm_tokens(x))
    tc = Counter(t for _, x in tgt_rows for t in _norm_tokens(x))
    combined = {t: rc.get(t, 0) + tc.get(t, 0) for t in set(rc) | set(tc)}
    vocab = sorted(combined, key=lambda t: (-combined[t], t))[:vocab_size]
    v1 = vocab_size + 1
    denom_r = sum(rc.values()) + alpha * v1
    denom_t = sum(tc.values()) + alpha * v1
    norm = math.log(denom_r / denom_t)
    ratio = {
        t: round(math.log((tc.get(t, 0) + alpha) / (rc.get(t, 0) + alpha)) + norm, 9)
        for t in vocab
    }
    oov_r = sum(rc.values()) - sum(rc.get(t, 0) for t in vocab)
    oov_t = sum(tc.values()) - sum(tc.get(t, 0) for t in vocab)
    oov = round(math.log((oov_t + alpha) / (oov_r + alpha)) + norm, 9)
    out = {}
    for i, x in raw_rows:
        toks = _norm_tokens(x)
        out[i] = (len(toks), sum(ratio.get(t, oov) for t in toks))
    return out


@pytest.mark.parametrize("vocab_size", [10_000, 5])
def test_dsir_weights_match_python_replica(spark, vocab_size):
    raw = spark.createDataFrame(RAW, "doc_id BIGINT, text STRING").repartition(3)
    tgt = spark.createDataFrame(TARGET, "doc_id BIGINT, text STRING")
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logweight"])
        for r in dsir_weights(raw, tgt, vocab_size=vocab_size).collect()
    }
    want = _py_dsir(RAW, TARGET, vocab_size, 1.0)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9), i
    # vocab_size=5 forces real OOV traffic through the bucket ratio
    if vocab_size == 5:
        ratios, _ = dsir_log_ratios(raw, tgt, vocab_size=5)
        assert ratios.count() == 5


def test_dsir_direction_and_empty_doc(spark):
    raw = spark.createDataFrame(RAW, "doc_id BIGINT, text STRING")
    tgt = spark.createDataFrame(TARGET, "doc_id BIGINT, text STRING")
    got = {
        r["doc_id"]: r["dsir_logweight"] for r in dsir_weights(raw, tgt).collect()
    }
    # finance-flavored raw docs score strictly above the pet-flavored ones
    assert min(got[0], got[2]) > max(got[1], got[3])
    # empty document: zero tokens, weight exactly 0
    assert got[4] == 0.0
