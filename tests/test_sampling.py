"""Deterministic sampling + mixture rebalancing tests (DuckDB differential
for the portable hash rule, closed-form checks for the rate solve)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.sampling import (
    domain_cap,
    hash_sample,
    mixture_rates,
    sample_hash,
    stratified_sample,
    train_val_test_split,
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


def test_domain_cap_exact_counts_and_determinism(docs):
    out = domain_cap(docs, cap=30, strata_col="source", key_col="doc_id")
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {f"src{i}": 30 for i in range(4)}  # exactly cap each
    # partition-invariant survivor set
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in domain_cap(docs.repartition(13), 30, "source", "doc_id").collect()
    )
    assert a == b


def test_domain_cap_matches_duckdb_row_number(docs):
    got = sorted(r["doc_id"] for r in domain_cap(docs, 25, "source", "doc_id").collect())
    pdf = docs.toPandas()
    duckdb.register("d", pdf)
    want = sorted(
        r[0]
        for r in duckdb.sql(
            """
            WITH h AS (SELECT doc_id, source,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT AS hv
                   FROM d),
            r AS (SELECT doc_id, row_number() OVER
                   (PARTITION BY source ORDER BY hv, doc_id) AS rn FROM h)
            SELECT doc_id FROM r WHERE rn <= 25
            """
        ).fetchall()
    )
    duckdb.unregister("d")
    assert got == want


def test_domain_cap_under_cap_stratum_keeps_all(spark):
    rows = [(i, "tiny" if i < 5 else "big") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
    out = domain_cap(df, cap=20, strata_col="source", key_col="doc_id")
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"tiny": 5, "big": 20}
    # null stratum is capped too (null-safe join)
    with_null = spark.createDataFrame(
        [(i, None) for i in range(30)], "doc_id BIGINT, source STRING"
    )
    capped = domain_cap(with_null, cap=7, strata_col="source", key_col="doc_id")
    assert capped.count() == 7


def test_domain_cap_rejects_bad_cap(docs):
    with pytest.raises(ValueError):
        domain_cap(docs, 0)


def test_split_partition_invariant_and_total(docs):
    out = train_val_test_split(docs, (0.8, 0.1, 0.1), key_col="doc_id")
    assert out.count() == 400
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["split"])
        for r in train_val_test_split(
            docs.repartition(11), (0.8, 0.1, 0.1), key_col="doc_id"
        ).collect()
    )
    assert a == b
    by_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # binomial noise bounds: 5 sigma ~ 40 (train), ~ 30 (val/test)
    assert abs(by_split.get("train", 0) - 320) < 45
    assert abs(by_split.get("val", 0) - 40) < 31
    assert abs(by_split.get("test", 0) - 40) < 31


def test_split_is_pure_projection(docs):
    plan = train_val_test_split(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: per-row decidable


def test_split_validates_fractions(docs):
    with pytest.raises(ValueError):
        train_val_test_split(docs, (0.5, 0.4))  # doesn't sum to 1
    with pytest.raises(ValueError):
        train_val_test_split(docs, (0.5, 0.5, 0.0), names=("a", "b"))
    with pytest.raises(ValueError):
        train_val_test_split(docs, (1.5, -0.5))


# --- property-based differentials (Hypothesis) ---------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


def _py_hash52(key, seed):
    """Python replica of sampling.sample_hash."""
    import hashlib

    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:13], 16)


if _HAVE_HYP:

    @settings(
        max_examples=15,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        cap=st.integers(min_value=1, max_value=12),
        seed=st.integers(min_value=0, max_value=10_000),
        n=st.integers(min_value=0, max_value=60),
    )
    def test_domain_cap_matches_python_replica(spark, cap, seed, n):
        rows = [(i, f"s{i % 5}") for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
        got = sorted(
            r["doc_id"] for r in domain_cap(df, cap, "source", "doc_id", seed).collect()
        )
        by_src = {}
        for i, s in rows:
            by_src.setdefault(s, []).append((_py_hash52(i, seed), i))
        want = sorted(
            i for ranked in by_src.values() for _, i in sorted(ranked)[:cap]
        )
        assert got == want

    @settings(
        max_examples=15,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        f1=st.integers(min_value=0, max_value=100),
        f2=st.integers(min_value=0, max_value=100),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    def test_split_matches_python_replica(spark, f1, f2, seed):
        # integer-percent fractions sum exactly to 1 in double space
        fa, fb = f1 / 100.0, (100 - f1) * f2 / 10_000.0
        fc = 1.0 - fa - fb
        fractions, names = (fa, fb, fc), ("a", "b", "c")
        df = spark.createDataFrame(
            [(i,) for i in range(80)], "doc_id BIGINT"
        )
        got = {
            r["doc_id"]: r["split"]
            for r in train_val_test_split(
                df, fractions, names, "doc_id", seed
            ).collect()
        }
        space = float(1 << 52)
        for i in range(80):
            h = _py_hash52(i, seed)
            cum = 0.0
            expected = names[-1]
            for frac, name in zip(fractions[:-1], names[:-1]):
                cum += frac
                if h < cum * space:
                    expected = name
                    break
            assert got[i] == expected
