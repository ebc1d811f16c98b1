"""Round-10 candidate batch 5: vocabulary-richness estimators and the
HLL scale path for distinct-n diversity."""

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.analysis import (
    approx_distinct_ngrams,
    distinct_ngrams,
    vocab_richness,
)


def test_vocab_richness_hand_computed(spark):
    # tokens: a a a b b c d -> N=7, V=4, V1=2 (c,d), V2=1 (b)
    df = spark.createDataFrame(
        [("s", "a a a b"), ("s", "b c d")], "source string, text string"
    )
    row = vocab_richness(df).collect()[0]
    assert row["n_tokens"] == 7 and row["n_types"] == 4
    assert row["v1"] == 2 and row["v2"] == 1
    # chao1 = 4 + 2*1/(2*2) = 4.5
    assert abs(row["chao1"] - 4.5) < 1e-9
    assert abs(row["unseen_mass"] - 2 / 7) < 1e-6
    import math

    assert abs(row["herdan_c"] - math.log(4) / math.log(7)) < 1e-6


def test_vocab_richness_saturated_vs_open(spark):
    # saturated: the same 5 words repeated -> V1=0, unseen_mass 0
    sat = spark.createDataFrame(
        [("s", "a b c d e " * 20)], "source string, text string"
    )
    r = vocab_richness(sat).collect()[0]
    assert r["v1"] == 0 and r["unseen_mass"] == 0.0
    assert abs(r["chao1"] - r["n_types"]) < 1e-9
    # open: every token unique -> unseen_mass 1, chao1 explodes upward
    opn = spark.createDataFrame(
        [("s", " ".join(f"w{i}" for i in range(50)))],
        "source string, text string",
    )
    r2 = vocab_richness(opn).collect()[0]
    assert r2["unseen_mass"] == 1.0
    assert r2["chao1"] > r2["n_types"] * 10


def test_vocab_richness_single_token_degenerate(spark):
    df = spark.createDataFrame([("s", "only")], "source string, text string")
    row = vocab_richness(df).collect()[0]
    assert row["n_tokens"] == 1 and row["herdan_c"] is None


def test_approx_distinct_ngrams_error_bound(spark, documents):
    exact = {
        (r["source"], r["n"]): r["distinct_ngrams"]
        for r in distinct_ngrams(documents).collect()
    }
    approx = approx_distinct_ngrams(documents, precision=10).collect()
    assert {(r["source"], r["n"]) for r in approx} == set(exact)
    # HLL standard error at p=10 is ~1.04/32 = 3.3%; pin a loose 4-sigma
    for r in approx:
        ex = exact[(r["source"], r["n"])]
        assert abs(r["distinct_estimate"] - ex) / ex < 0.14, (
            r["source"], r["n"], r["distinct_estimate"], ex,
        )


def test_approx_distinct_ngrams_partition_invariant(spark, documents):
    a = approx_distinct_ngrams(documents, precision=8).collect()
    b = approx_distinct_ngrams(
        documents.repartition(13), precision=8
    ).collect()
    key = lambda r: (r["source"], r["n"])
    assert sorted(map(tuple, a), key=str) == sorted(map(tuple, b), key=str)


def test_approx_distinct_ngrams_validates(spark):
    df = spark.createDataFrame([("s", "x y")], "source string, text string")
    with pytest.raises(ValueError):
        approx_distinct_ngrams(df, precision=3)
    with pytest.raises(ValueError):
        approx_distinct_ngrams(df, ns=[0])
