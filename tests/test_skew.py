"""salted_join / two_phase_agg must be result-identical to their unsalted
equivalents, including on pathologically skewed keys."""

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.skew import salted_join, two_phase_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of key 'hot', a sprinkle of others
    big = spark.range(10_500).select(
        F.when(F.col("id") < 10_000, "hot")
        .otherwise(F.concat(F.lit("k"), F.col("id") % 50))
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(30)], "k STRING, w DOUBLE"
    )
    return big, small


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_equals_plain(skewed):
    big, small = skewed
    plain = big.join(small, ["k"], "inner").select("k", "v", "w")
    salted = salted_join(big, small, ["k"], salts=8).select("k", "v", "w")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_left_join_equals_plain(skewed):
    big, small = skewed
    plain = big.join(small, ["k"], "left").select("k", "v", "w")
    salted = salted_join(big, small, ["k"], salts=8, how="left").select("k", "v", "w")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_spreads_hot_key(skewed):
    big, small = skewed
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns], F.lit(42)), F.lit(8))
    )
    n_salts = b.where(F.col("k") == "hot").select("__salt").distinct().count()
    assert n_salts == 8  # the hot key now occupies every salt bucket


def test_salted_join_rejects_unsupported_how(skewed):
    big, small = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, ["k"], how="full")


def test_two_phase_agg_equals_plain(skewed):
    big, _ = skewed
    plain = _sorted_rows(
        big.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
        )
    )
    two = _sorted_rows(
        two_phase_agg(
            big,
            ["k"],
            partial_aggs=lambda: [
                F.count("*").alias("pn"),
                F.sum("v").alias("ps"),
                F.max("v").alias("pmx"),
            ],
            merge_aggs=lambda: [
                F.sum("pn").alias("n"),
                F.sum("ps").alias("s"),
                F.max("pmx").alias("mx"),
            ],
            salts=8,
        )
    )
    assert two == plain


def test_key_skew_stats_closed_form(spark):
    from nbdatatools_spark.operators.skew import key_skew_stats

    rows = [(k,) for k in ["a"] * 6 + ["b"] * 3 + ["c"] * 1]
    df = spark.createDataFrame(rows, "k STRING")
    out = key_skew_stats(df, "k", top_k=2).orderBy("rank").collect()
    assert [(r["rank"], r["key"], r["n"]) for r in out] == [(1, "a", 6), (2, "b", 3)]
    assert out[0]["share"] == 0.6 and out[0]["cum_share"] == 0.6
    assert out[1]["share"] == 0.3 and out[1]["cum_share"] == 0.9

    import pytest as _pytest

    with _pytest.raises(ValueError):
        key_skew_stats(df, "k", top_k=0)
    with _pytest.raises(ValueError):
        key_skew_stats(df.where("k = 'zzz'"), "k")


def test_key_skew_stats_tiebreak(spark):
    from nbdatatools_spark.operators.skew import key_skew_stats

    df = spark.createDataFrame([("y",), ("x",)], "k STRING")
    out = key_skew_stats(df, "k", top_k=2).orderBy("rank").collect()
    assert [r["key"] for r in out] == ["x", "y"]
