"""Winnowing fingerprints and BPE-ish token counting: differential tests
against a pure-Python reference implementation of the published algorithm."""

import hashlib

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.functions.text import (
    subword_token_count,
    winnow_fingerprints,
    winnow_overlap,
)


def _py_winnow(text: str, k: int, w: int) -> set:
    """Reference winnowing on the portable md5 hash: k-gram hashes,
    per-window minima, distinct."""
    text = " ".join(text.lower().split())
    grams = (
        [text[i : i + k] for i in range(len(text) - k + 1)]
        if len(text) >= k
        else [text]
    )
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    n_windows = max(len(hs) - w + 1, 1)
    return {min(hs[i : i + min(w, len(hs) - i)]) for i in range(n_windows)}


TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "a b",  # shorter than k: single-shingle path
    "aaaaaaaaaaaaaaaa",  # degenerate: all k-grams identical
    "It's 2026, and   whitespace\tcollapses!",
]


@pytest.mark.parametrize("text", TEXTS)
def test_winnow_matches_python_reference(spark, text):
    df = spark.createDataFrame([(text,)], "text STRING")
    got = set(
        winnow_fingerprints(df, k=5, w=4, portable=True).first()["fingerprints"]
    )
    assert got == _py_winnow(text, k=5, w=4)


def test_winnow_guarantee_shared_substring(spark):
    """Any shared run of length >= k + w - 1 must share a fingerprint."""
    k, w = 5, 4
    shared = "this exact phrase is long enough to guarantee a match"
    a = "PREFIX AAA " + shared + " SUFFIX one"
    b = "other text " + shared + " differs here"
    df = spark.createDataFrame([(1, a), (2, b)], "id INT, text STRING")
    fps = winnow_fingerprints(df, k=k, w=w).select("id", "fingerprints")
    fa = fps.where(F.col("id") == 1).select(F.col("fingerprints").alias("fp_a"))
    fb = fps.where(F.col("id") == 2).select(F.col("fingerprints").alias("fp_b"))
    overlap = fa.crossJoin(fb).select(
        F.size(F.array_intersect("fp_a", "fp_b")).alias("n"),
        winnow_overlap(F.col("fp_a"), F.col("fp_b")).alias("score"),
    ).first()
    assert overlap["n"] >= 1
    assert 0 < overlap["score"] <= 1.0


def test_winnow_disjoint_texts_low_overlap(spark):
    df = spark.createDataFrame(
        [(1, "entirely unrelated content about databases and storage engines"),
         (2, "zqx vbn mlk poi uyt rew qas dfg hjk")],
        "id INT, text STRING",
    )
    fps = winnow_fingerprints(df).select("id", "fingerprints")
    fa = fps.where(F.col("id") == 1).select(F.col("fingerprints").alias("fp_a"))
    fb = fps.where(F.col("id") == 2).select(F.col("fingerprints").alias("fp_b"))
    score = fa.crossJoin(fb).select(winnow_overlap(F.col("fp_a"), F.col("fp_b"))).first()[0]
    assert score < 0.2


def test_subword_token_count(spark):
    rows = spark.createDataFrame(
        [
            ("Hello, world's 42 tests  done!",),
            ("",),
            ("   ",),
            ("one",),
        ],
        "text STRING",
    ).select(subword_token_count(F.col("text")).alias("n")).collect()
    # "Hello" ", " "world" "'s" " 42" " tests" " done" "!" -> 8
    assert [r["n"] for r in rows] == [8, 0, 0, 1]


def test_minhash_quality_report(spark, documents):
    """Measured precision/recall of LSH candidate generation vs exact
    Jaccard ground truth on a bounded sample: aggressive banding (many
    bands) must reach high recall; counts must be internally consistent."""
    from nbdatatools_spark.operators.dedup import minhash_quality_report

    r = minhash_quality_report(
        documents,
        num_hashes=64,
        bands=32,       # aggressive: high candidate rate -> high recall
        shingle_size=5,
        threshold=0.5,
        sample_ids=120,
    ).collect()[0]
    assert r.n_sample > 0
    assert r.n_candidates_true <= min(r.n_true_pairs, r.n_candidates)
    if r.n_true_pairs:
        assert r.recall >= 0.9
    if r.n_candidates:
        assert 0.0 <= r.precision <= 1.0
    # conservative banding (few bands) can only lower the candidate count
    r2 = minhash_quality_report(
        documents, num_hashes=64, bands=4, shingle_size=5,
        threshold=0.5, sample_ids=120,
    ).collect()[0]
    assert r2.n_candidates <= r.n_candidates
