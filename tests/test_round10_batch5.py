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


# -- hill tail index -------------------------------------------------------------


def test_hill_hand_computed_pareto(spark):
    import math
    import random

    rng = random.Random(23)
    # exact Pareto(alpha=2): x = (1-u)^(-1/2); Hill should recover ~2
    xs = [(1.0 - rng.random()) ** (-0.5) for _ in range(3000)]
    from nbdatatools_spark.operators.analysis import hill_tail_index

    df = spark.createDataFrame(
        [("s", float(x)) for x in xs], "source string, x double"
    )
    row = hill_tail_index(df, "x", "source", k=200).collect()[0]
    assert row["k_used"] == 200
    # pure-Python replica
    top = sorted(xs, reverse=True)[:201]
    thr = top[-1]
    ls = sum(round(math.log(x / thr), 9) for x in top[:200])
    assert abs(row["hill_alpha"] - 200 / ls) < 1e-5
    assert 1.6 < row["hill_alpha"] < 2.5


def test_hill_light_vs_heavy_tail_and_degenerate(spark):
    import random

    rng = random.Random(29)
    from nbdatatools_spark.operators.analysis import hill_tail_index

    rows = [("heavy", (1.0 - rng.random()) ** (-1.0)) for _ in range(2000)]
    rows += [("light", abs(rng.gauss(100, 5)) + 1) for _ in range(2000)]
    df = spark.createDataFrame(rows, "source string, x double")
    out = {r["source"]: r for r in hill_tail_index(df, "x", "source", k=100).collect()}
    # heavy tail (alpha ~ 1) vs near-gaussian (large effective alpha)
    assert out["heavy"]["hill_alpha"] < 2.0
    assert out["light"]["hill_alpha"] > 4.0
    # degenerate: constant values -> zero log-sum -> NULL
    const = spark.createDataFrame(
        [("c", 5.0)] * 10, "source string, x double"
    )
    row = hill_tail_index(const, "x", "source", k=3).collect()[0]
    assert row["hill_alpha"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hill_tail_index(const, "x", "source", k=0)


# -- rarity ----------------------------------------------------------------------


def test_rarity_hand_computed(spark):
    import math

    from nbdatatools_spark.operators.analysis import rarity_scores

    # 3 docs; 'common' in all, 'rare' only in doc 0
    df = spark.createDataFrame(
        [(0, "common rare"), (1, "common common"), (2, "common")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in rarity_scores(df).collect()}
    idf_common = round(math.log(4 / 4), 9)   # df=3, N=3 -> ln(1) = 0
    idf_rare = round(math.log(4 / 2), 9)     # df=1
    exp0 = (idf_common + idf_rare) / 2
    assert rows[0]["n_tokens"] == 2
    assert abs(rows[0]["rarity"] - exp0) < 1e-6
    # doc 1 repeats the universal token: rarity exactly 0
    assert rows[1]["rarity"] == 0.0
    # rarer vocabulary scores strictly higher
    assert rows[0]["rarity"] > rows[2]["rarity"]


def test_rarity_orders_boilerplate_below_specialized(spark, documents):
    from nbdatatools_spark.operators.analysis import rarity_scores

    out = rarity_scores(documents).collect()
    assert len(out) == documents.count()
    vals = [r["rarity"] for r in out]
    assert min(vals) >= 0.0 and max(vals) > min(vals)


def test_approx_distinct_ngrams_xxhash_path(spark, documents):
    from nbdatatools_spark.operators.analysis import approx_distinct_ngrams

    exact = {
        (r["source"], r["n"]): r["distinct_ngrams"]
        for r in distinct_ngrams(documents).collect()
    }
    xx = approx_distinct_ngrams(
        documents, precision=10, hash_fn="xxhash64"
    ).collect()
    for r in xx:
        ex = exact[(r["source"], r["n"])]
        assert abs(r["distinct_estimate"] - ex) / ex < 0.15
    with pytest.raises(ValueError):
        approx_distinct_ngrams(documents, hash_fn="sha1")
