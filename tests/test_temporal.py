"""As-of join (operators/temporal.py): semantics + the one-shuffle plan."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01T10:00:00"), 100.0),
            (2, "A", _ts("2024-01-01T10:00:05"), 101.0),
            (3, "A", _ts("2024-01-01T10:00:05"), 102.0),  # tie on ts
            (4, "B", _ts("2024-01-01T10:00:03"), 50.0),
        ],
        "event_id BIGINT, user_id STRING, ts TIMESTAMP, value DOUBLE",
    )
    trades = spark.createDataFrame(
        [
            (10, "A", _ts("2024-01-01T09:59:59")),  # before any quote
            (11, "A", _ts("2024-01-01T10:00:00")),  # equal ts: inclusive
            (12, "A", _ts("2024-01-01T10:00:05")),  # tie: greatest event_id
            (13, "A", _ts("2024-01-01T10:00:30")),  # long after
            (14, "B", _ts("2024-01-01T10:00:04")),
            (15, "C", _ts("2024-01-01T10:00:00")),  # key with no quotes
        ],
        "event_id BIGINT, user_id STRING, ts TIMESTAMP",
    )
    return quotes, trades


def test_asof_backward_inclusive_and_ties(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r["event_id"]: (r["matched_event_id"], r["matched_value"])
        for r in asof_join(
            trades, quotes, on="ts", by="user_id", tie="event_id",
            values=("event_id", "value"),
        ).collect()
    }
    assert out[10] == (None, None)          # nothing at-or-before
    assert out[11] == (1, 100.0)            # equal ts matches (inclusive)
    assert out[12] == (3, 102.0)            # ts tie -> greatest tie column
    assert out[13] == (3, 102.0)            # carries forward
    assert out[14] == (4, 50.0)             # per-key isolation
    assert out[15] == (None, None)          # unseen key


def test_asof_tolerance(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r["event_id"]: r["matched_event_id"]
        for r in asof_join(
            trades, quotes, on="ts", by="user_id", tie="event_id",
            values=("event_id", "value"), tolerance_seconds=10,
        ).collect()
    }
    assert out[11] == 1 and out[12] == 3
    assert out[13] is None  # 25s-old match nulled by the 10s tolerance


def test_asof_plan_single_shuffle_no_nested_loop(spark, quotes_trades):
    quotes, trades = quotes_trades
    plan = (
        asof_join(trades, quotes, on="ts", by="user_id", tie="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union-tag shape: no join operator at all, one keyed window
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning(__by") >= 1


def test_asof_preserves_left_rowcount(spark, sf_dir):
    import __spark_entry__ as e

    ev = e._t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    j = asof_join(
        purchases, ev.where(F.col("event_type") == "view"),
        on="ts", by="user_id", tie="event_id", values=("event_id",),
    )
    assert j.count() == purchases.count()
