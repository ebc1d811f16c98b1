"""Round-7 batch-2 operator closed-forms: autocorrelation, Kaplan-Meier,
Benford audit, chi-square independence."""

import math
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))


def _daily_events(spark, counts):
    """counts[i] events on day 2024-01-(i+1)."""
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, datetime(2024, 1, i + 1, 12, 0, 0)))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def test_autocorrelation_closed_form(spark):
    from nbdatatools_spark.operators.temporal import autocorrelation

    counts = [4, 7, 3, 9, 5, 8, 2, 6]
    df = _daily_events(spark, counts)
    out = {r["lag"]: r for r in autocorrelation(df, max_lag=3).collect()}
    y = [float(c) for c in counts]
    mu = sum(y) / len(y)
    d = [v - mu for v in y]
    den = sum(v * v for v in d)

    assert out[0]["acf"] == pytest.approx(1.0, abs=1e-6)
    assert out[0]["n_pairs"] == len(y)
    for lag in (1, 2, 3):
        want = sum(d[t] * d[t + lag] for t in range(len(y) - lag)) / den
        assert out[lag]["acf"] == pytest.approx(want, abs=1e-5)
        assert out[lag]["n_pairs"] == len(y) - lag


def test_autocorrelation_weekly_cycle(spark):
    from nbdatatools_spark.operators.temporal import autocorrelation

    # 4 weeks of a strong period-7 pattern: lag 7 should beat lag 3
    counts = ([20, 5, 5, 5, 5, 5, 5] * 4)
    df = _daily_events(spark, counts)
    out = {r["lag"]: r["acf"] for r in autocorrelation(df, max_lag=7).collect()}
    assert out[7] > 0.5
    assert out[7] > out[3]
    with pytest.raises(ValueError):
        autocorrelation(df, max_lag=-1)


def test_autocorrelation_partition_invariant(spark, events):
    from nbdatatools_spark.operators.temporal import autocorrelation

    a = autocorrelation(events, max_lag=5).collect()
    b = autocorrelation(events.repartition(7), max_lag=5).collect()
    assert a == b


def test_kaplan_meier_closed_form(spark):
    from nbdatatools_spark.operators.temporal import kaplan_meier

    # max_ts = Jan 31. censor_days=7 -> last event after Jan 24 = censored.
    rows = []

    def user(uid, first_day, last_day):
        rows.append((uid, datetime(2024, 1, first_day, 8, 0, 0)))
        rows.append((uid, datetime(2024, 1, last_day, 20, 0, 0)))

    user(1, 1, 3)    # dur 2, observed
    user(2, 1, 3)    # dur 2, observed
    user(3, 2, 7)    # dur 5, observed
    user(4, 10, 15)  # dur 5, observed
    user(5, 20, 30)  # dur 10, censored (Jan 30 within 7d of Jan 31)
    user(6, 1, 31)   # dur 30, censored
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["duration_days"]: r
        for r in kaplan_meier(df, censor_days=7).collect()
    }
    # events at dur 2 (d=2, n=6) and dur 5 (d=2, n=4)
    assert set(out) == {2, 5}
    assert out[2]["n_at_risk"] == 6 and out[2]["n_events"] == 2
    assert out[2]["survival"] == pytest.approx(4 / 6, abs=1e-6)
    assert out[5]["n_at_risk"] == 4 and out[5]["n_events"] == 2
    assert out[5]["survival"] == pytest.approx((4 / 6) * (2 / 4), abs=1e-6)
    with pytest.raises(ValueError):
        kaplan_meier(df, censor_days=-1)


def test_kaplan_meier_total_death_floors_zero(spark):
    from nbdatatools_spark.operators.temporal import kaplan_meier

    # Everyone dies at dur 1 -> survival exactly 0.0, no ln(0)
    rows = [
        (1, datetime(2024, 1, 1)), (1, datetime(2024, 1, 2)),
        (2, datetime(2024, 1, 1)), (2, datetime(2024, 1, 2)),
        # horizon-stretcher so the above are observed, itself dur 0 at the
        # edge (censored: last event = max_ts)
        (3, datetime(2024, 1, 20)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = kaplan_meier(df, censor_days=7).collect()
    assert len(out) == 1
    assert out[0]["duration_days"] == 1
    assert out[0]["survival"] == 0.0


def test_kaplan_meier_partition_invariant(spark, events):
    from nbdatatools_spark.operators.temporal import kaplan_meier

    a = kaplan_meier(events, censor_days=3).collect()
    b = kaplan_meier(events.repartition(7), censor_days=3).collect()
    assert a == b
    # survival is non-increasing in duration
    surv = [r["survival"] for r in a]
    assert all(x >= y - 1e-9 for x, y in zip(surv, surv[1:]))


def test_benford_closed_form(spark):
    from nbdatatools_spark.operators.quality_checks import benford_audit

    df = spark.createDataFrame(
        [(1.5,), (19.0,), (2.0,), (300.0,), (0.0,), (-5.0,), (99.0,),
         (0.042,)],
        "v double",
    )
    out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert len(out) == 9
    # 0.0 and -5.0 excluded; 0.042 -> digit 4
    n = 6
    assert out[1]["n_obs"] == 2
    assert out[2]["n_obs"] == 1
    assert out[3]["n_obs"] == 1
    assert out[4]["n_obs"] == 1
    assert out[9]["n_obs"] == 1
    assert out[5]["n_obs"] == 0
    for d in range(1, 10):
        assert out[d]["p_expected"] == pytest.approx(
            math.log10(1 + 1 / d), abs=1e-8
        )
        assert out[d]["p_observed"] == pytest.approx(
            out[d]["n_obs"] / n, abs=1e-6
        )
    chi2 = sum(
        (out[d]["n_obs"] - n * out[d]["p_expected"]) ** 2
        / (n * out[d]["p_expected"])
        for d in range(1, 10)
    )
    assert out[1]["chi2"] == pytest.approx(chi2, abs=1e-4)


def test_benford_conforming_sample_scores_low(spark):
    from nbdatatools_spark.operators.quality_checks import benford_audit

    # log-uniform magnitudes conform to Benford; a constant leading
    # digit does not
    import numpy as np

    rng = np.random.RandomState(7)
    good = spark.createDataFrame(
        [(float(10 ** u),) for u in rng.uniform(0, 4, 4000)], "v double"
    )
    bad = spark.createDataFrame(
        [(float(5000 + i),) for i in range(4000)], "v double"
    )
    chi_good = benford_audit(good, "v").first()["chi2"]
    chi_bad = benford_audit(bad, "v").first()["chi2"]
    assert chi_good < 30  # ~chi2_{8dof} comfortable for a conforming draw
    assert chi_bad > 1000


def test_chi_square_independence_closed_form(spark):
    from nbdatatools_spark.operators.quality_checks import (
        chi_square_independence,
    )

    # Perfectly independent 2x2: each cell = product of marginals / n
    rows = (
        [("x", "p")] * 20 + [("x", "q")] * 20
        + [("y", "p")] * 30 + [("y", "q")] * 30
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square_independence(df, "a", "b").first()
    assert r["n"] == 100 and r["dof"] == 1
    assert r["chi2"] == pytest.approx(0.0, abs=1e-6)
    assert r["cramers_v"] == pytest.approx(0.0, abs=1e-6)

    # Perfect dependence: chi2 = n, V = 1
    rows = [("x", "p")] * 50 + [("y", "q")] * 50
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square_independence(df, "a", "b").first()
    assert r["chi2"] == pytest.approx(100.0, abs=1e-4)
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-6)


def test_chi_square_nulls_and_invariance(spark, documents):
    from nbdatatools_spark.operators.quality_checks import (
        chi_square_independence,
    )

    df = documents.withColumn(
        "lang2", F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("lang"))
    )
    a = chi_square_independence(df, "lang2", "source").collect()
    b = chi_square_independence(df.repartition(5), "lang2", "source").collect()
    assert a == b
    assert a[0]["chi2"] >= 0.0
