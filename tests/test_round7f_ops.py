"""Round-7 batch-6 operator closed-forms: cross-correlation, RFM
segmentation, filter yield curve, source dup rate."""

import math
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))


def test_cross_correlation_lead_detected(spark):
    from nbdatatools_spark.operators.temporal import cross_correlation

    # B's series equals A's shifted 2 days later: ccf peaks at lag +2
    a_counts = [5, 9, 2, 8, 3, 7, 4, 6, 5, 9, 2, 8]
    rows = []
    eid = 0
    for i, c in enumerate(a_counts):
        for _ in range(c):
            rows.append((eid, datetime(2024, 2, 1 + i), "a")); eid += 1
    for i, c in enumerate(a_counts):
        for _ in range(c):
            rows.append((eid, datetime(2024, 2, 3 + i), "b")); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["lag"]: r["ccf"] for r in
           cross_correlation(df, "a", "b", max_lag=4).collect()}
    assert len(out) == 9
    assert out[2] == pytest.approx(
        sum((c - sum(a_counts) / 12) ** 2 for c in a_counts)
        / sum((c - sum(a_counts) / 12) ** 2 for c in a_counts),
        abs=1e-6,
    )  # = 1.0: identical shifted series, same mean/denominator
    assert out[2] > max(v for k, v in out.items() if k != 2) + 0.2
    with pytest.raises(ValueError):
        cross_correlation(df, "a", "b", max_lag=-1)


def test_cross_correlation_closed_form(spark):
    from nbdatatools_spark.operators.temporal import cross_correlation

    a = [3.0, 7.0, 1.0, 9.0, 5.0]
    b = [2.0, 6.0, 8.0, 1.0, 4.0]
    rows = []
    eid = 0
    for i, c in enumerate(a):
        for _ in range(int(c)):
            rows.append((eid, datetime(2024, 2, 1 + i), "x")); eid += 1
    for i, c in enumerate(b):
        for _ in range(int(c)):
            rows.append((eid, datetime(2024, 2, 1 + i), "y")); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["lag"]: r for r in
           cross_correlation(df, "x", "y", max_lag=2).collect()}
    ma, mb = sum(a) / 5, sum(b) / 5
    da = [v - ma for v in a]
    db = [v - mb for v in b]
    dena = sum(v * v for v in da)
    denb = sum(v * v for v in db)
    for lag in (-2, -1, 0, 1, 2):
        num = sum(
            da[t] * db[t + lag]
            for t in range(5)
            if 0 <= t + lag < 5
        )
        want = num / math.sqrt(dena * denb)
        assert out[lag]["ccf"] == pytest.approx(want, abs=1e-5)
        assert out[lag]["n_pairs"] == 5 - abs(lag)


def test_cross_correlation_partition_invariant(spark, events):
    from nbdatatools_spark.operators.temporal import cross_correlation

    types = [r["event_type"] for r in
             events.select("event_type").distinct().orderBy("event_type").collect()]
    a, b = types[0], types[1]
    x = cross_correlation(events, a, b, max_lag=3).collect()
    y = cross_correlation(events.repartition(7), a, b, max_lag=3).collect()
    assert x == y


def test_rfm_segments_closed_form(spark):
    from nbdatatools_spark.operators.analysis import rfm_segments

    # 4 customers, 2 buckets: recency/freq/money all rank c1<c2<c3<c4
    rows = []
    for c, (days, n_orders, amt) in enumerate(
        [(1, 1, 10.0), (2, 2, 20.0), (3, 3, 30.0), (4, 4, 40.0)], start=1
    ):
        for i in range(n_orders):
            rows.append((c, datetime(2024, 3, 28 - days), amt))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {
        (r["r_bucket"], r["f_bucket"], r["m_bucket"]): r
        for r in rfm_segments(df, n_buckets=2).collect()
    }
    # ranks agree on every axis: c1,c2 (recent/light) -> (0,0,0);
    # c3,c4 (older/heavier) -> (1,1,1)
    assert set(out) == {(0, 0, 0), (1, 1, 1)}
    assert out[(0, 0, 0)]["n_customers"] == 2
    assert out[(1, 1, 1)]["n_customers"] == 2
    assert out[(1, 1, 1)]["avg_orders"] == pytest.approx(3.5, abs=1e-6)
    assert out[(1, 1, 1)]["avg_monetary"] == pytest.approx(125.0, abs=1e-4)
    assert out[(0, 0, 0)]["avg_recency_days"] == pytest.approx(0.5, abs=1e-6)
    assert sum(r["n_customers"] for r in out.values()) == 4
    with pytest.raises(ValueError):
        rfm_segments(df, n_buckets=1)


def test_rfm_segments_equal_population_and_invariance(spark):
    from nbdatatools_spark.operators.analysis import rfm_segments

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    a = rfm_segments(orders, n_buckets=5).collect()
    b = rfm_segments(orders.repartition(7), n_buckets=5).collect()
    assert a == b
    # every bucket on each axis holds ~n/5 customers (exact cuts)
    n = sum(r["n_customers"] for r in a)
    for axis in ("r_bucket", "f_bucket", "m_bucket"):
        per = {}
        for r in a:
            per[r[axis]] = per.get(r[axis], 0) + r["n_customers"]
        assert set(per) == set(range(5))
        assert max(per.values()) - min(per.values()) <= 1


def test_filter_yield_curve_closed_form(spark):
    from nbdatatools_spark.operators.evaluation import filter_yield_curve

    rows = [(0.1, 10), (0.4, 20), (0.6, 30), (0.9, 40)]
    df = spark.createDataFrame(rows, "score double, w long")
    out = {r["threshold"]: r for r in
           filter_yield_curve(df, "score", "w", n_steps=4).collect()}
    assert len(out) == 5
    assert out[0.0]["n_kept"] == 4 and out[0.0]["weight_yield"] == 1.0
    assert out[0.5]["n_kept"] == 2
    assert out[0.5]["weight_kept"] == 70
    assert out[0.5]["weight_yield"] == pytest.approx(0.7, abs=1e-6)
    assert out[1.0]["n_kept"] == 0 and out[1.0]["weight_yield"] == 0.0
    # monotone non-increasing in threshold
    ks = sorted(out)
    ys = [out[k]["doc_yield"] for k in ks]
    assert all(x >= y - 1e-9 for x, y in zip(ys, ys[1:]))
    with pytest.raises(ValueError):
        filter_yield_curve(df, "score", n_steps=0)


def test_source_dup_rate_closed_form(spark):
    from nbdatatools_spark.operators.dedup import source_dup_rate

    rows = [
        (1, "s1", "same text"),
        (2, "s1", "same text"),
        (3, "s1", "unique one"),
        (4, "s2", "Same   TEXT"),  # normalizes to the same digest
        (5, "s2", "other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in source_dup_rate(df).collect()}
    assert out["s1"]["n_docs"] == 3 and out["s1"]["n_dup_docs"] == 2
    assert out["s1"]["n_distinct_texts"] == 2
    assert out["s1"]["dup_rate"] == pytest.approx(2 / 3, abs=1e-6)
    # s2's copy of the s1 text counts: corpus-wide duplicate
    assert out["s2"]["n_dup_docs"] == 1
    assert out["s2"]["dup_rate"] == pytest.approx(0.5, abs=1e-6)


def test_source_dup_rate_partition_invariant(spark, documents):
    from nbdatatools_spark.operators.dedup import source_dup_rate

    a = source_dup_rate(documents).collect()
    b = source_dup_rate(documents.repartition(7)).collect()
    assert a == b
    for r in a:
        assert 0.0 <= r["dup_rate"] <= 1.0


def test_pipeline_quality_budget_step(spark, documents):
    from pyspark.sql import functions as F

    from nbdatatools_spark.functions.text import token_count
    from nbdatatools_spark.plans.pipeline import run_pipeline

    out, report = run_pipeline(
        documents, [{"op": "quality_budget", "keep_weight_frac": 0.5}]
    )
    total = documents.agg(
        F.sum(token_count(F.col("text")).cast("long"))
    ).first()[0]
    kept = out.agg(
        F.sum(token_count(F.col("text")).cast("long"))
    ).first()[0]
    # meets the budget without keeping everything (scores vary at sf0.001)
    assert kept >= 0.5 * total
    assert out.count() < documents.count()
    assert out.columns == documents.columns
    assert report[0]["op"] == "quality_budget"
    # deterministic across partitionings
    out2, _ = run_pipeline(
        documents.repartition(7),
        [{"op": "quality_budget", "keep_weight_frac": 0.5}],
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in out2.collect()
    )
    with pytest.raises(ValueError):
        run_pipeline(documents, [{"op": "quality_budget",
                                  "keep_weight_frac": 0.0}])
