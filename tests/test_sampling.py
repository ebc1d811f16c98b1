"""Deterministic sampling + mixture rebalancing tests (DuckDB differential
for the portable hash rule, closed-form checks for the rate solve)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.sampling import (
    hash_sample,
    mixture_rates,
    sample_hash,
    stratified_sample,
)


@pytest.fixture()
def docs(spark):
    rows = [(i, f"src{i % 4}", 100 + i) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id BIGINT, source STRING, n_tokens BIGINT")


def test_hash_sample_deterministic_and_partition_invariant(docs):
    a = sorted(r["doc_id"] for r in hash_sample(docs, 0.3).collect())
    b = sorted(r["doc_id"] for r in hash_sample(docs.repartition(17), 0.3).collect())
    assert a == b and len(a) > 0
    # binomial(400, .3): 5 sigma ~ 46
    assert abs(len(a) - 120) < 50


def test_sample_hash_matches_duckdb(spark, docs):
    got = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", sample_hash(F.col("doc_id"), 7).alias("h")).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT i, ('0x' || substring(md5(CAST(i AS VARCHAR) || ':7'), 1, 13))::BIGINT "
            "FROM range(400) t(i)"
        ).fetchall()
    )
    assert got == want


def test_stratified_sample_rates_and_default(docs):
    out = stratified_sample(docs, {"src0": 1.0, "src1": 0.0}, default_rate=0.5)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("src0") == 100
    assert "src1" not in by_src
    # default 0.5 on the other two strata of 100 docs each: 5 sigma ~ 25
    for s in ("src2", "src3"):
        assert abs(by_src[s] - 50) < 30


def test_stratified_sample_rejects_bad_rate(docs):
    with pytest.raises(ValueError):
        stratified_sample(docs, {"src0": 1.5})
    with pytest.raises(ValueError):
        hash_sample(docs, -0.1)


def test_mixture_rates_uniform_counts(docs):
    # already uniform -> every rate is exactly 1.0
    rates = mixture_rates(docs, "source")
    assert rates == {f"src{i}": 1.0 for i in range(4)}


def test_mixture_rates_skewed_target_closed_form(docs):
    # target: src0 half the corpus, rest split evenly (1/6 each).
    # w_s = 100 each; T = min(100/0.5, 100/(1/6)) = 200
    # r_src0 = 0.5*200/100 = 1.0; others = (1/6)*200/100 = 1/3
    rates = mixture_rates(docs, "source", target={"src0": 0.5})
    assert rates["src0"] == 1.0
    for i in (1, 2, 3):
        assert rates[f"src{i}"] == pytest.approx((1 / 6) * 200 / 100, abs=0)


def test_mixture_rates_weighted_and_cap(spark):
    rows = [(i, "a" if i < 300 else "b", 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING, n_tokens BIGINT")
    # token-weighted: w_a = 3000, w_b = 1000; uniform target 0.5/0.5
    # T = min(3000/.5, 1000/.5) = 2000 -> r_a = 1/3, r_b = 1.0
    rates = mixture_rates(df, "source", weight_col="n_tokens")
    assert rates == {"a": pytest.approx(0.5 * 2000 / 3000), "b": 1.0}
    # cap halves the total: T = min(w*cap/p) = 1000 -> r_b = 0.5
    capped = mixture_rates(df, "source", cap=0.5)
    assert capped == {"a": pytest.approx(0.5 * 1000 / 3000), "b": 0.5}


def test_mixture_rates_unknown_stratum_raises(docs):
    with pytest.raises(ValueError, match="not present"):
        mixture_rates(docs, "source", target={"nope": 0.5})


def test_end_to_end_mixture_is_achieved(spark):
    # big skew: 10% target for the 90%-mass stratum; achieved mixture should
    # land near target (hash-sampling noise only)
    rows = [(i, "big" if i < 9000 else "small") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
    rates = mixture_rates(df, "source", target={"big": 0.5, "small": 0.5})
    out = stratified_sample(df, rates, key_col="doc_id")
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got["small"] == 1000  # rate 1.0 stratum keeps everything
    assert abs(got["big"] - 1000) < 160  # binomial(9000, 1/9): 5 sigma ~ 157
