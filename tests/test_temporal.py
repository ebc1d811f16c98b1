"""As-of join + bucketed range join (operators/temporal.py): semantics +
the scalable-plan assertions."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.temporal import asof_join, range_join


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


@pytest.fixture(scope="module")
def points_intervals(spark):
    pts = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00")),
            (2, _ts("2024-01-01T10:04:59")),
            (3, _ts("2024-01-01T10:05:00")),  # on an end boundary
            (4, _ts("2024-01-01T10:30:00")),
            (5, _ts("2024-01-01T23:00:00")),  # matches nothing
        ],
        "point_id BIGINT, ts TIMESTAMP",
    )
    iv = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:05:00")),
            (101, _ts("2024-01-01T10:05:00"), _ts("2024-01-01T10:10:00")),
            (102, _ts("2024-01-01T09:00:00"), _ts("2024-01-01T11:00:00")),  # long
        ],
        "interval_id BIGINT, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    return pts, iv


def test_range_join_half_open_membership(spark, points_intervals):
    pts, iv = points_intervals
    got = sorted(
        (r["point_id"], r["interval_id"])
        for r in range_join(pts, iv, bucket_seconds=60).collect()
    )
    # boundary point 3 belongs to 101 (start-inclusive), not 100 (end-exclusive)
    assert got == [
        (1, 100), (1, 102), (2, 100), (2, 102),
        (3, 101), (3, 102), (4, 102),
    ]


def test_range_join_bucket_size_invariance(spark, points_intervals):
    pts, iv = points_intervals
    a = sorted(
        (r["point_id"], r["interval_id"])
        for r in range_join(pts, iv, bucket_seconds=7).collect()
    )
    b = sorted(
        (r["point_id"], r["interval_id"])
        for r in range_join(pts, iv, bucket_seconds=3600).collect()
    )
    assert a == b


def test_range_join_plan_is_hash_join_not_nested_loop(spark, points_intervals):
    pts, iv = points_intervals
    plan = (
        range_join(pts, iv, bucket_seconds=60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_range_join_span_guard_raises(spark, points_intervals):
    pts, iv = points_intervals
    with pytest.raises(Exception) as exc_info:
        range_join(pts, iv, bucket_seconds=1, max_span_buckets=100).collect()
    assert "spans too many buckets" in str(exc_info.value)


def test_range_join_rejects_column_collision(spark, points_intervals):
    pts, iv = points_intervals
    with pytest.raises(ValueError, match="share column names"):
        range_join(pts.withColumnRenamed("point_id", "interval_id"), iv)


class TestGapfill:
    @pytest.fixture(scope="class")
    def series(self, spark):
        from nbdatatools_spark.operators.temporal import gapfill

        ev = spark.createDataFrame(
            [
                # user A: observations in hour-buckets 0, 0, 3 -> gaps 1, 2
                (1, "A", _ts("2024-01-01T00:10:00"), 1.0),
                (2, "A", _ts("2024-01-01T00:40:00"), 2.5),
                (3, "A", _ts("2024-01-01T03:05:00"), 4.0),
                # user B: a single observation -> single-bucket grid, no gaps
                (4, "B", _ts("2024-01-01T05:59:59"), 7.0),
            ],
            "event_id BIGINT, user_id STRING, ts TIMESTAMP, value DOUBLE",
        )
        rows = (
            gapfill(ev, key_col="user_id", bucket_seconds=3600)
            .orderBy("user_id", "bucket_ts")
            .collect()
        )
        return rows

    def test_grid_is_dense_and_locf_carries(self, series):
        a = [r for r in series if r["user_id"] == "A"]
        assert [r["bucket_ts"].hour for r in a] == [0, 1, 2, 3]
        assert [r["n_events"] for r in a] == [2, 0, 0, 1]
        assert [r["is_gap"] for r in a] == [False, True, True, False]
        assert a[0]["bucket_value"] == 3.5
        # LOCF: gap buckets carry bucket 0's value until the next observation
        assert [r["filled_value"] for r in a] == [3.5, 3.5, 3.5, 4.0]
        assert all(r["bucket_value"] is None for r in a if r["is_gap"])

    def test_single_observation_key(self, series):
        b = [r for r in series if r["user_id"] == "B"]
        assert len(b) == 1
        assert b[0]["n_events"] == 1 and not b[0]["is_gap"]
        assert b[0]["filled_value"] == 7.0

    def test_partition_invariance(self, spark):
        from nbdatatools_spark.operators.temporal import gapfill

        base = [
            (i, f"u{i % 3}", _ts("2024-01-01T00:00:00"), float(i))
            for i in range(1, 40)
        ]
        # spread events over 30 hours
        import datetime as dt

        data = [
            (e, u, t + dt.timedelta(hours=(e * 7) % 30), v)
            for e, u, t, v in base
        ]
        schema = "event_id BIGINT, user_id STRING, ts TIMESTAMP, value DOUBLE"
        one = spark.createDataFrame(data, schema).coalesce(1)
        many = spark.createDataFrame(data, schema).repartition(8)
        collect = lambda df: sorted(
            (r["user_id"], r["bucket_ts"], r["n_events"], r["filled_value"])
            for r in gapfill(df, key_col="user_id", bucket_seconds=3600).collect()
        )
        assert collect(one) == collect(many)

    def test_span_guard_raises(self, spark):
        from nbdatatools_spark.operators.temporal import gapfill

        ev = spark.createDataFrame(
            [
                (1, "A", _ts("2024-01-01T00:00:00"), 1.0),
                (2, "A", _ts("2026-01-01T00:00:00"), 2.0),  # ~17.5k hourly buckets
            ],
            "event_id BIGINT, user_id STRING, ts TIMESTAMP, value DOUBLE",
        )
        out = gapfill(ev, key_col="user_id", bucket_seconds=3600, max_span_buckets=100)
        with pytest.raises(Exception, match="spans too many buckets"):
            out.collect()


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------

def test_cohort_retention_closed_form(spark):
    from nbdatatools_spark.operators.temporal import cohort_retention

    rows = [
        # user 1: first in week of Mon 2024-01-01, active again weeks +1, +3
        (1, "2024-01-03 10:00:00"),
        (1, "2024-01-09 10:00:00"),
        (1, "2024-01-23 10:00:00"),
        # user 2: same cohort, only week 0 (two events, one distinct week)
        (2, "2024-01-05 00:00:00"),
        (2, "2024-01-07 23:59:59"),
        # user 3: cohort of Mon 2024-01-08, active week 0 and +1
        (3, "2024-01-10 12:00:00"),
        (3, "2024-01-15 12:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id BIGINT, ts STRING").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        (str(r["cohort"]), r["period_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_cohort_retention_monthly(spark):
    from nbdatatools_spark.operators.temporal import cohort_retention

    rows = [
        (1, "2024-01-31 23:00:00"),
        (1, "2024-02-01 01:00:00"),
        (1, "2024-04-15 01:00:00"),
        (2, "2024-02-10 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id BIGINT, ts STRING").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        (str(r["cohort"]), r["period_offset"]): r["n_users"]
        for r in cohort_retention(ev, period="month").collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-02-01", 0): 1,
    }


def test_cohort_retention_validation(spark):
    from nbdatatools_spark.operators.temporal import cohort_retention

    ev = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "user_id BIGINT, ts STRING")
    with pytest.raises(ValueError):
        cohort_retention(ev, period="day")


# ---------------------------------------------------------------------------
# rolling_active_users / session_paths
# ---------------------------------------------------------------------------

def test_rolling_active_users_closed_form(spark):
    from nbdatatools_spark.operators.temporal import rolling_active_users

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 11:00:00"),  # same (user, day) collapses
        (2, "2024-01-03 10:00:00"),
        (1, "2024-01-05 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id BIGINT, ts STRING").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        str(r["day"]): r["n_active"]
        for r in rolling_active_users(ev, window_days=3, end_date="2024-01-07").collect()
    }
    # user1 day1 covers 01..03; user2 day3 covers 03..05; user1 day5 covers 05..07
    assert out == {
        "2024-01-01": 1,
        "2024-01-02": 1,
        "2024-01-03": 2,
        "2024-01-04": 1,
        "2024-01-05": 2,
        "2024-01-06": 1,
        "2024-01-07": 1,
    }
    with pytest.raises(ValueError):
        rolling_active_users(ev, window_days=0)


def test_session_paths_closed_form(spark):
    from nbdatatools_spark.operators.temporal import session_paths

    rows = [
        # user 1, session 0: view > click ; session 1 (90 min later): buy
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:10:00"),
        (3, 1, "buy", "2024-01-01 11:45:00"),
        # user 2: one session view > click (same path as user 1 s0)
        (4, 2, "view", "2024-01-02 09:00:00"),
        (5, 2, "click", "2024-01-02 09:20:00"),
        # user 3: solo view
        (6, 3, "view", "2024-01-03 09:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, event_type STRING, ts STRING"
    ).select("event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    out = session_paths(ev, gap="30 minutes", top_k=10).collect()
    got = {r["path"]: (r["n_sessions"], r["rank"]) for r in out}
    assert got["view>click"] == (2, 1)
    # 'buy' and 'view' both 1 session -> path ASC tie-break
    assert got["buy"][0] == 1 and got["view"][0] == 1
    assert got["buy"][1] < got["view"][1]


def test_session_paths_tiebreak_same_ts(spark):
    from nbdatatools_spark.operators.temporal import session_paths

    rows = [
        (10, 1, "a", "2024-01-01 10:00:00"),
        (11, 1, "b", "2024-01-01 10:00:00"),  # same ts -> event_id order
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, event_type STRING, ts STRING"
    ).select("event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    out = session_paths(ev, top_k=5).collect()
    assert out[0]["path"] == "a>b"


class TestMultiTouchAttribution:
    def _events(self, spark):
        # user 1: view@t1, click@t2, purchase@t3 (100) -> linear 50/50
        # user 2: purchase@t1 with no prior touch -> direct
        # user 3: view just OUTSIDE lookback -> direct
        rows = [
            (1, 1, "2024-01-02 10:00:00", "view", 0.0),
            (2, 1, "2024-01-02 11:00:00", "click", 0.0),
            (3, 1, "2024-01-02 12:00:00", "purchase", 100.0),
            (4, 2, "2024-01-02 12:00:00", "purchase", 40.0),
            (5, 3, "2024-01-01 11:59:00", "view", 0.0),
            (6, 3, "2024-01-02 12:00:00", "purchase", 60.0),
        ]
        return spark.createDataFrame(
            [(i, u, ts, t, v) for i, u, ts, t, v in rows],
            "event_id BIGINT, user_id BIGINT, ts STRING, event_type STRING, value DOUBLE",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_linear_with_direct_fallback(self, spark):
        from nbdatatools_spark.operators.temporal import multi_touch_attribution

        out = {
            r.channel: (r.credit, r.n_touches, r.n_conversions)
            for r in multi_touch_attribution(self._events(spark)).collect()
        }
        assert out["view"] == (50.0, 1, 1)
        assert out["click"] == (50.0, 1, 1)
        assert out["direct"] == (100.0, 2, 2)  # users 2 and 3

    def test_first_and_last_models(self, spark):
        from nbdatatools_spark.operators.temporal import multi_touch_attribution

        first = {
            r.channel: r.credit
            for r in multi_touch_attribution(self._events(spark), model="first").collect()
        }
        last = {
            r.channel: r.credit
            for r in multi_touch_attribution(self._events(spark), model="last").collect()
        }
        assert first["view"] == 100.0 and "click" not in first
        assert last["click"] == 100.0 and "view" not in last

    def test_credit_conservation(self, spark, sf_dir):
        import os

        from nbdatatools_spark.operators.temporal import multi_touch_attribution

        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        total_value = (
            ev.where(F.col("event_type") == "purchase")
            .agg(F.sum(F.round("value", 9).cast("decimal(20,9)")).alias("s"))
            .collect()[0]
            .s
        )
        credit = (
            multi_touch_attribution(ev)
            .agg(F.sum(F.col("credit")).alias("s"))
            .collect()[0]
            .s
        )
        assert abs(float(credit) - float(total_value)) < 1e-3

    def test_unknown_model_raises(self, spark):
        from nbdatatools_spark.operators.temporal import multi_touch_attribution

        with pytest.raises(ValueError):
            multi_touch_attribution(self._events(spark), model="u_shaped")


class TestFunnelSteps:
    def test_closed_form_three_steps(self, spark):
        from nbdatatools_spark.operators.temporal import funnel_steps

        rows = [
            # user 1 completes all three in order
            (1, 1, "2024-01-01 10:00:00", "view"),
            (2, 1, "2024-01-01 11:00:00", "click"),
            (3, 1, "2024-01-01 12:00:00", "purchase"),
            # user 2: click BEFORE view -> stops at view
            (4, 2, "2024-01-01 09:00:00", "click"),
            (5, 2, "2024-01-01 10:00:00", "view"),
            # user 3: view+click, no purchase
            (6, 3, "2024-01-01 10:00:00", "view"),
            (7, 3, "2024-01-01 10:30:00", "click"),
            # user 4: never views
            (8, 4, "2024-01-01 10:00:00", "purchase"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, ts STRING, event_type STRING"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {r.step: (r.n_users, r.pct_of_first, r.pct_of_prev)
               for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()}
        assert out["view"] == (3, 1.0, 1.0)
        assert out["click"] == (2, round(2 / 3, 6), round(2 / 3, 6))
        assert out["purchase"] == (1, round(1 / 3, 6), 0.5)

    def test_within_bound_cuts_slow_journeys(self, spark):
        from nbdatatools_spark.operators.temporal import funnel_steps

        rows = [
            (1, 1, "2024-01-01 10:00:00", "view"),
            (2, 1, "2024-01-05 10:00:00", "click"),   # 4 days later
        ]
        ev = spark.createDataFrame(
            rows, "event_id BIGINT, user_id BIGINT, ts STRING, event_type STRING"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        fast = funnel_steps(ev, ["view", "click"], within_seconds=86400).collect()
        slow = funnel_steps(ev, ["view", "click"], within_seconds=5 * 86400).collect()
        assert {r.step: r.n_users for r in fast}["click"] == 0
        assert {r.step: r.n_users for r in slow}["click"] == 1

    def test_validation(self, spark):
        from nbdatatools_spark.operators.temporal import funnel_steps

        ev = spark.createDataFrame(
            [(1, 1, "2024-01-01", "view")],
            "event_id BIGINT, user_id BIGINT, ts STRING, event_type STRING",
        )
        with pytest.raises(ValueError):
            funnel_steps(ev, ["view"])
