"""Test-set decontamination (13-gram rule) and Gopher repetition metrics."""

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.functions.text import (
    dup_line_char_fraction,
    dup_line_fraction,
    top_ngram_char_fraction,
)
from nbdatatools_spark.operators.dedup import contaminated_ids, decontaminate


@pytest.fixture(scope="module")
def corpus(spark):
    shared = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    train = spark.createDataFrame(
        [
            (1, shared + " and then some extra words follow here"),
            (2, "completely unrelated content about cooking pasta with garlic and olive oil for dinner tonight friends"),
            (3, "short doc"),
            (4, "prefix words first " + shared),
        ],
        "doc_id BIGINT, text STRING",
    )
    test = spark.createDataFrame(
        [(100, shared), (101, "another benchmark question entirely different from training data set contents")],
        "doc_id BIGINT, text STRING",
    )
    return train, test


def test_contaminated_ids_flags_ngram_overlap(corpus):
    train, test = corpus
    hits = {r["id"]: r["n_hits"] for r in contaminated_ids(train, test, n=13).collect()}
    assert set(hits) == {1, 4}  # both contain a 13-gram of the shared sentence
    assert all(v >= 1 for v in hits.values())


def test_decontaminate_drops_only_contaminated(corpus):
    train, test = corpus
    kept = {r["doc_id"] for r in decontaminate(train, test, n=13).collect()}
    assert kept == {2, 3}


def test_decontaminate_no_false_positive_at_larger_n(corpus):
    train, test = corpus
    # the shared run is exactly 15 words: 15-grams still hit, 16-grams cannot
    kept15 = {r["doc_id"] for r in decontaminate(train, test, n=15).collect()}
    assert kept15 == {2, 3}
    kept16 = {r["doc_id"] for r in decontaminate(train, test, n=16).collect()}
    assert kept16 == {1, 2, 3, 4}


def test_dup_line_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "aaa\nbbb\naaa\nccc"),      # 4 lines, 1 dup pair
            (2, "x\ny\nz"),                  # no dups
            (3, ""),                         # empty
            (4, "same\nsame\nsame"),         # all dup
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: (r["dlf"], r["dlcf"])
        for r in df.select(
            "doc_id",
            dup_line_fraction(F.col("text")).alias("dlf"),
            dup_line_char_fraction(F.col("text")).alias("dlcf"),
        ).collect()
    }
    assert out[1][0] == pytest.approx(0.25)          # 4 lines, 3 distinct
    assert out[1][1] == pytest.approx(6 / 12)        # 'aaa' twice of 12 chars
    assert out[2] == (0.0, 0.0)
    assert out[3] == (0.0, 0.0)
    assert out[4][0] == pytest.approx(2 / 3)
    assert out[4][1] == pytest.approx(1.0)


def test_top_ngram_char_fraction(spark):
    df = spark.createDataFrame(
        [(1, "go go go go stop"), (2, "all words differ here now")],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", top_ngram_char_fraction(F.col("text"), 2).alias("f")
        ).collect()
    }
    # normalized text "go go go go stop" (16 chars); top 2-gram "go go" x3, len 5
    assert out[1] == pytest.approx(15 / 16)
    # all 2-grams unique -> count 1; top by lexicographic max; len/total
    assert 0.0 < out[2] < 1.0
