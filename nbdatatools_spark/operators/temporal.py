"""Temporal joins — as-of join and bucketed range join (beyond-reference
surface, SURVEY §7.8).

The classic time-series primitive Spark lacks natively: for each left row,
attach the most recent right row of the same key at-or-before the left
row's event time (backward inclusive). A naive range-condition join
(``l.ts >= r.ts``) plans as a broadcast-nested-loop / cartesian at scale;
the scalable shape is the union-tag trick:

1. union both sides with a side tag (right=0, left=1);
2. one shuffle: partition by the join key, sort within partitions by
   (time, side, tie) — right rows sort before left rows at equal time, so
   equal timestamps match (inclusive);
3. carry the right payload forward with ``last(..., ignorenulls=True)``
   over rows unbounded-preceding..current — a running carry, no
   per-row scan;
4. keep left rows, optionally null out matches older than ``tolerance``.

Cost: ONE hash shuffle on the key + in-partition sort — the same bill as
any keyed window; no data-dependent blowup, no cross product. Skewed keys
hit the same mitigation as any keyed op (AQE / salting upstream).

Determinism: right-side ties on (key, time) resolve to the greatest
``tie`` column value (sort asc + last-carry), so results are
partition-invariant and oracle-replicable (rank by time DESC, tie DESC,
keep first).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    tie: str | None = None,
    values: tuple = ("value",),
    prefix: str = "matched_",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: every ``left`` row gains
    ``{prefix}{v}`` for each right column in ``values`` plus
    ``{prefix}{on}`` — from the latest right row with the same ``by`` key
    and right.on <= left.on; NULLs when no prior right row exists (or the
    match is older than ``tolerance_seconds``).

    ``tie`` breaks right-side timestamp ties deterministically (greatest
    value wins); required if (by, on) is not unique on the right.
    """
    lcols = left.columns
    rtypes = dict(right.dtypes)
    carried = [F.col(v).alias(f"__r_{v}") for v in values]
    tie_expr = (
        F.col(tie).cast("long") if tie is not None else F.lit(0).cast("long")
    )
    rdf = right.select(
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("__l"),
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        tie_expr.alias("__tie"),
        *carried,
    )
    ldf = left.select(
        F.struct(*lcols).alias("__l"),
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        *[F.lit(None).cast(rtypes[v]).alias(f"__r_{v}") for v in values],
    )
    u = rdf.unionByName(ldf)
    w = (
        Window.partitionBy("__by")
        .orderBy(F.col("__on").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry_on = F.last(
        F.when(F.col("__side") == 0, F.col("__on")), ignorenulls=True
    ).over(w)
    out = u.select(
        "__l",
        "__side",
        carry_on.alias(f"__m_{on}"),
        *[
            F.last(F.col(f"__r_{v}"), ignorenulls=True).over(w).alias(f"__m_{v}")
            for v in values
        ],
    ).where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        # micros-delta comparison: timezone-shift-invariant (both sides move)
        fresh = (
            F.unix_micros(F.col("__l")[on].cast("timestamp"))
            - F.unix_micros(F.col(f"__m_{on}").cast("timestamp"))
        ) <= tolerance_seconds * 1_000_000
        out = out.select(
            "__l",
            F.when(fresh, F.col(f"__m_{on}")).alias(f"__m_{on}"),
            *[F.when(fresh, F.col(f"__m_{v}")).alias(f"__m_{v}") for v in values],
        )
    return out.select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        F.col(f"__m_{on}").alias(f"{prefix}{on}"),
        *[F.col(f"__m_{v}").alias(f"{prefix}{v}") for v in values],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_seconds: int = 600,
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """Interval (range) join with NO equi key: inner-join every ``points``
    row to every ``intervals`` row with ``start <= point_ts < end``
    (half-open — back-to-back intervals never double-match a boundary
    point).

    A raw range-condition join plans as BroadcastNestedLoopJoin /
    cartesian — O(P·I) comparisons, a scale-killer. The scalable shape
    manufactures an equi key from time itself:

    1. explode each interval into the ``bucket_seconds``-wide epoch
       buckets its span covers (``sequence`` + ``explode``);
    2. bucket each point by ``floor(epoch / bucket_seconds)`` — a pure
       projection;
    3. hash equi-join on the bucket id, then re-check the exact range
       predicate.

    Each matching (point, interval) pair meets in EXACTLY one bucket (the
    point's), so no post-join dedup is needed. Cost: one hash shuffle of
    points + intervals replicated x(span/bucket) — pick ``bucket_seconds``
    near the median interval span so the replication factor stays small.
    Hot time-buckets (load spikes) are plain join skew: AQE's skew-join
    split handles them.

    Pathologically long intervals explode the replication factor, so any
    interval spanning more than ``max_span_buckets`` buckets raises at
    execution time (loud, not silent) — widen ``bucket_seconds`` or split
    such intervals upstream.

    Columns: result carries all point and interval columns; the frames
    must not share column names (raises up front).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points and intervals share column names {sorted(overlap)}; "
            "alias one side first"
        )
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    b_us = F.lit(int(bucket_seconds) * 1_000_000)
    p_bucket = F.floor(F.unix_micros(F.col(point_ts).cast("timestamp")) / b_us)
    i_first = F.floor(F.unix_micros(F.col(start).cast("timestamp")) / b_us)
    i_last = F.floor(F.unix_micros(F.col(end).cast("timestamp")) / b_us)
    span_ok = (i_last - i_first) < F.lit(int(max_span_buckets))
    guarded_last = F.when(span_ok, i_last).otherwise(
        F.raise_error(
            F.concat(
                F.lit("range_join: interval spans too many buckets (max "),
                F.lit(str(max_span_buckets)),
                F.lit("); widen bucket_seconds or split the interval"),
            )
        )
    )
    ib = intervals.withColumn("__b", F.explode(F.sequence(i_first, guarded_last)))
    pb = points.withColumn("__b", p_bucket)
    return (
        pb.join(ib, "__b")
        .where((F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end)))
        .drop("__b")
    )


def gapfill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Time-series resample + gap-fill: bucket each key's events into
    ``bucket_seconds``-wide epoch buckets, then materialize EVERY bucket
    between the key's first and last observation — missing buckets get
    ``n_events = 0``, a NULL ``bucket_value``, and a last-observation-
    carried-forward ``filled_value``. The regular-grid front-door for
    downstream window features (trailing windows, EWMA) that assume
    dense time series.

    Scale shape: raw events collapse to bucket-level partial aggregates
    in the FIRST exchange (one row per (key, bucket) per partition
    map-side); everything after — per-key bounds, the ``sequence``-
    exploded grid, the left join, the LOCF carry window — runs on
    bucket-level rows only. Grid size is bounded loudly: a key spanning
    more than ``max_span_buckets`` buckets raises at execution time
    (widen the bucket or split the key upstream), the same guard
    discipline as `range_join`.

    Engine-exact: bucket values are 6dp-DECIMAL-summed; bucket ids are
    integer floor-division of epoch micros.
    """
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    b_us = int(bucket_seconds) * 1_000_000
    bucket = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(b_us)
    ).cast("long")
    obs = df.groupBy(F.col(key_col), bucket.alias("__b")).agg(
        F.count("*").cast("int").alias("n_events"),
        F.sum(F.round(F.col(value_col), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("bucket_value"),
    )
    bounds = obs.groupBy(key_col).agg(
        F.min("__b").alias("__b0"), F.max("__b").alias("__b1")
    )
    span_ok = (F.col("__b1") - F.col("__b0")) < F.lit(int(max_span_buckets))
    guarded_b1 = F.when(span_ok, F.col("__b1")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("gapfill: key spans too many buckets (max "),
                F.lit(str(max_span_buckets)),
                F.lit("); widen bucket_seconds or split the key upstream"),
            )
        )
    )
    grid = bounds.select(
        key_col, F.explode(F.sequence(F.col("__b0"), guarded_b1)).alias("__b")
    )
    joined = grid.join(obs, [key_col, "__b"], "left")
    wc = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col(key_col),
        F.timestamp_micros(F.col("__b") * F.lit(b_us)).alias("bucket_ts"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("int").alias("n_events"),
        F.col("bucket_value"),
        F.last("bucket_value", ignorenulls=True).over(wc).alias("filled_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


def exp_decayed_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: Sequence[str],
    decay: float = 0.9,
) -> DataFrame:
    """Per-key exponentially-decayed value sum: with the key's events in
    ``order_cols`` order as v_1..v_n, returns Σ v_i · decay^(n-i) — recency
    weighting where the newest event counts fully and each step back decays
    by ``decay`` (the discrete-time EWMA numerator; time-series feature
    engineering over event streams).

    Scale shape: ONE hash shuffle on the key (row_number/count window and
    the final groupBy share the partitioning — AQE collapses them, same
    shape as the funnel gate). Engine-exact: each term is rounded to 9dp
    and DECIMAL-summed, so the per-key sum is order-independent and a SQL
    oracle reproduces it bit-for-bit; only pow/multiply run in doubles.

    Output: (key, n_events, decayed_sum DOUBLE).
    """
    if not 0.0 < decay <= 1.0:
        raise ValueError(f"decay must be in (0, 1], got {decay}")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    wk = Window.partitionBy(key_col)
    term = F.round(
        F.col(value_col)
        * F.pow(F.lit(float(decay)), F.count("*").over(wk) - F.row_number().over(w)),
        9,
    ).cast("decimal(38,9)")
    return (
        df.select(F.col(key_col), term.alias("__term"))
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("__term").cast("double").alias("decayed_sum"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix — the standard product-analytics rollup:
    assign every user to the cohort of their first-ever event period,
    then count how many of each cohort's users are active again k
    periods later. Returns ``(cohort DATE, period_offset INT,
    n_users BIGINT)``.

    Plan (all-integer, no approximation): ONE map-side-combinable
    ``groupBy(user)`` computes BOTH the first-touch cohort (min) and the
    distinct activity-period set (``collect_set`` over the truncated
    date — bounded by periods-per-user, i.e. weeks of product history,
    never event volume) in a single pass and single shuffle; exploding
    the set and counting per (cohort, offset) is the only other
    exchange. No join anywhere — the join-based formulation costs 3+
    shuffles (pinned in test_plans).

    Offset arithmetic is exact integer days/7 (both bounds are Monday
    week-starts), so every output cell is engine-exact.
    """
    if period not in ("week", "month"):
        raise ValueError(f"period must be 'week' or 'month', got {period!r}")
    per_user = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.date_trunc(period, F.min(ts_col)).cast("date").alias("__cohort"),
        F.collect_set(F.date_trunc(period, F.col(ts_col)).cast("date")).alias("__ps"),
    )
    active = per_user.select("__cohort", F.explode("__ps").alias("__p"))
    if period == "week":
        offset = (F.datediff(F.col("__p"), F.col("__cohort")) / 7).cast("int")
    else:
        offset = (
            (F.year("__p") - F.year("__cohort")) * 12
            + (F.month("__p") - F.month("__cohort"))
        ).cast("int")
    return active.groupBy(
        F.col("__cohort").alias("cohort"),
        offset.alias("period_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    end_date: str | None = None,
) -> DataFrame:
    """Rolling active-user counts — DAU/WAU/MAU: for every calendar day,
    the number of distinct users with at least one event in the trailing
    ``window_days`` days (inclusive of the day itself). Returns
    ``(day DATE, n_active BIGINT)``.

    Exact, not sketched, and never a per-day scan: the raw event stream
    collapses to the distinct (user, day) activity set first (slim integer
    pairs — the only pass over raw events), each activity day then fans
    out to the ``window_days`` report days it supports (a bounded W-fold
    amplification of the SLIM pairs, not the events), and one distinct
    count per day finishes. Days with no preceding activity simply don't
    appear. ``end_date`` (ISO) trims the trailing fan-out past the last
    day of interest; default keeps every day any window reaches.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    act = events.select(
        F.col(user_col).alias("__u"), F.to_date(ts_col).alias("__d")
    ).distinct()
    fan = act.select(
        "__u",
        F.explode(
            F.expr(f"sequence(__d, date_add(__d, {int(window_days) - 1}), interval 1 day)")
        ).alias("day"),
    )
    if end_date is not None:
        fan = fan.where(F.col("day") <= F.lit(end_date).cast("date"))
    return fan.groupBy("day").agg(F.count_distinct("__u").alias("n_active"))


def session_paths(
    events: DataFrame,
    gap: str = "30 minutes",
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Top-k session paths — the event-type sequences users actually
    follow: sessionize (gaps-and-islands, streaming/events.py semantics),
    concatenate each session's event types in exact (ts, tiebreak) order,
    and count path frequencies. Returns ``(path STRING, n_sessions
    BIGINT, rank INT)`` — the path-analysis staple behind funnels.

    Plan: ONE hash shuffle on the user key covers both sessionization
    windows and the per-session path build (sort_array over a
    collect_list confined to one session's rows — bounded by session
    length, deterministic regardless of partition order); path counts are
    a map-side-combinable groupBy; the global top-k is
    TakeOrderedAndProject. All-integer counts; ties break on path ASC.
    """
    from nbdatatools_spark.streaming.events import assign_sessions

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    sess = assign_sessions(
        events, gap=gap, ts=ts_col, user=user_col, order_tiebreak=order_tiebreak
    )
    paths = sess.groupBy(user_col, "session_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("t"),
                            F.col(order_tiebreak).alias("o"),
                            F.col(type_col).alias("e"),
                        )
                    )
                ),
                lambda s: s["e"],
            ),
            ">",
        ).alias("path")
    )
    w = Window.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


def multi_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("view", "click"),
    lookback_seconds: int = 86400,
    model: str = "linear",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch conversion attribution: split each conversion's value
    across the touchpoints that preceded it within the lookback window —
    the marketing-analytics staple behind channel ROI. Models:

    - ``linear``: value / n_touches to every touch
    - ``first`` / ``last``: all value to the first / last touch
      (ties break on (timestamp, event id) — deterministic)

    Conversions with NO touch in the window are attributed to the
    ``direct`` channel in full, so total credit always equals total
    converted value (conservation is a test invariant).

    Returns one row per channel: ``(channel, credit, n_touches,
    n_conversions)`` — credit 6dp over 9dp-rounded DECIMAL-summed terms.

    Plan: conversions and touches are two filtered projections of the same
    scan; the pairing is a user-keyed equi-join (ONE hash shuffle per side
    — time predicates can't equi-join, but the user key bounds the blowup
    to per-user activity, the funnel/session discipline) and the
    per-conversion count/rank windows reuse the same user partitioning.
    """
    if model not in ("linear", "first", "last"):
        raise ValueError(f"unknown attribution model {model!r}")
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
        F.col(id_col).alias("__cid"),
        F.col(value_col).alias("__val"),
    )
    touch = events.where(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
        F.col(id_col).alias("__tid"),
        F.col(type_col).alias("channel"),
    )
    paired = conv.join(touch, "__u", "left").where(
        F.col("__tts").isNull()
        | (
            (F.col("__tts") <= F.col("__cts"))
            & (
                F.col("__tts")
                > F.col("__cts") - F.expr(f"INTERVAL {int(lookback_seconds)} SECOND")
            )
        )
    )
    # a conversion whose joined touches ALL fail the window still needs its
    # direct row: re-attach unmatched conversions via anti-join
    matched_ids = paired.where(F.col("__tts").isNotNull()).select("__cid").distinct()
    direct = conv.join(matched_ids, "__cid", "left_anti").select(
        "__cid",
        F.col("__val"),
        F.lit("direct").alias("channel"),
        F.lit(1).alias("__n"),
        F.lit(1).alias("__rn_first"),
        F.lit(1).alias("__rn_last"),
    )
    wc = Window.partitionBy("__cid")
    wf = Window.partitionBy("__cid").orderBy(F.col("__tts").asc(), F.col("__tid").asc())
    wl = Window.partitionBy("__cid").orderBy(F.col("__tts").desc(), F.col("__tid").desc())
    attributed = (
        paired.where(F.col("__tts").isNotNull())
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .withColumn("__rn_first", F.row_number().over(wf))
        .withColumn("__rn_last", F.row_number().over(wl))
        .select("__cid", "__val", "channel", "__n", "__rn_first", "__rn_last")
        .unionByName(direct)
    )
    if model == "linear":
        credit = F.col("__val") / F.col("__n")
        rows = attributed
    elif model == "first":
        credit = F.col("__val")
        rows = attributed.where(F.col("__rn_first") == 1)
    else:
        credit = F.col("__val")
        rows = attributed.where(F.col("__rn_last") == 1)
    term = F.round(credit, 9).cast("decimal(20,9)")
    return (
        rows.groupBy("channel")
        .agg(
            F.round(F.sum(term).cast("decimal(38,9)").cast("double"), 6).alias("credit"),
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("__cid").alias("n_conversions"),
        )
        .orderBy("channel")
    )


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    within_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Generalized N-step conversion funnel: for each user, walk the step
    sequence in strict temporal order (step i+1 must occur at-or-after the
    completion of step i; ties break on event id) and report how many users
    reach each stage, with drop-off and overall conversion rates.
    ``within_seconds`` bounds the WHOLE journey (first-step time to last).

    Plan: one filtered projection per step feeds an iterated keyed min —
    every stage is a per-user aggregate on the SAME user partitioning
    (Catalyst/AQE collapse the chain to one shuffle per stage over
    user-cardinality rows, the 2-step events_funnel discipline; raw events
    shuffle once). Emits (step_index, step, n_users, pct_of_first,
    pct_of_prev) — one row per step.
    """
    step_list = list(steps)
    if len(step_list) < 2:
        raise ValueError(f"need >= 2 steps, got {step_list}")
    # stage 0: first occurrence of step[0] per user
    cur = (
        events.where(F.col(type_col) == step_list[0])
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(F.struct(F.col(ts_col).alias("t"), F.col(id_col).alias("i"))).alias("__at"))
        .select("__u", F.col("__at.t").alias("__t0"), F.col("__at.t").alias("__tprev"))
    )
    counts = [("1_" + step_list[0], None)]  # placeholder; fill after actions
    stage_counts = [cur.count()]
    for s in step_list[1:]:
        nxt = (
            events.where(F.col(type_col) == s)
            .select(
                F.col(user_col).alias("__u"),
                F.col(ts_col).alias("__ts"),
                F.col(id_col).alias("__id"),
            )
        )
        cur = (
            cur.join(nxt, "__u")
            .where(F.col("__ts") >= F.col("__tprev"))
            .groupBy("__u", "__t0")
            .agg(F.min(F.struct(F.col("__ts").alias("t"), F.col("__id").alias("i"))).alias("__at"))
            .select("__u", "__t0", F.col("__at.t").alias("__tprev"))
        )
        if within_seconds is not None:
            cur = cur.where(
                F.col("__tprev")
                <= F.col("__t0") + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
            )
        stage_counts.append(cur.count())
    spark = events.sparkSession
    rows = []
    for i, (s, n) in enumerate(zip(step_list, stage_counts)):
        first = stage_counts[0]
        prev = stage_counts[i - 1] if i else n
        rows.append(
            (
                i + 1,
                s,
                n,
                round(n / first, 6) if first else 0.0,
                round(n / prev, 6) if prev else 0.0,
            )
        )
    return spark.createDataFrame(
        rows, "step_index INT, step STRING, n_users BIGINT, pct_of_first DOUBLE, pct_of_prev DOUBLE"
    )


def seasonal_decompose(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of a daily series
    (beyond-reference surface, SURVEY §7.8): trend = centered
    ``period``-day moving average (only where the full window exists),
    seasonal = per-weekday mean of the detrended values, residual =
    value - trend - seasonal.

    Input grain: raw events; the series is the daily row count (or the
    daily sum of ``value_col``). Scale shape: one date-grain aggregate
    (map-side partial), then windows over the DATE-GRAIN series — days,
    not events — so window state is calendar-bounded. The per-weekday
    seasonal means ride a DECIMAL-exact sum (order-independent,
    oracle-replicable).

    Returns ``(day, value, trend, seasonal, residual)`` ordered by day.
    """
    daily = (
        df.groupBy(F.to_date(ts_col).alias("day"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("value")
            if value_col is None
            else F.sum(F.col(value_col)).cast("double").alias("value")
        )
    )
    half = period // 2
    w = Window.orderBy("day").rowsBetween(-half, half)
    trended = daily.select(
        "day",
        "value",
        F.when(
            F.count(F.lit(1)).over(w) == period,
            F.round(F.sum("value").over(w) / period, 6),
        ).alias("trend"),
    )
    detr = trended.withColumn(
        "detrended",
        F.round(F.col("value") - F.col("trend"), 9).cast("decimal(20,9)"),
    )
    seasonal = (
        detr.where(F.col("trend").isNotNull())
        .groupBy(F.dayofweek("day").alias("dow"))
        .agg(
            F.round(
                F.sum("detrended").cast("decimal(38,9)").cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("seasonal")
        )
    )
    return (
        trended.withColumn("dow", F.dayofweek("day"))
        .join(F.broadcast(seasonal), "dow", "left")
        .select(
            "day",
            "value",
            "trend",
            "seasonal",
            F.round(F.col("value") - F.col("trend") - F.col("seasonal"), 6).alias(
                "residual"
            ),
        )
        .orderBy("day")
    )


def cusum_changepoints(
    df: DataFrame,
    ts_col: str = "ts",
    baseline_days: int = 7,
    drift_k: float = 0.5,
    threshold_h: float = 4.0,
) -> DataFrame:
    """One-sided CUSUM change detection on the daily event-count series
    (beyond-reference surface). The textbook recursion
    ``S_t = max(0, S_{t-1} + z_t - k)`` is re-expressed CLOSED-FORM so no
    sequential state is needed:

        S_t = R_t - min(0, min_{s<=t} R_s),  R_t = cumsum(z_t - k)

    — a running sum and a running min, both plain window functions over
    the date-grain series (days, not events; window state is
    calendar-bounded). Baseline mean/std come from the first
    ``baseline_days`` days (population std, DECIMAL-exact sums).

    Returns ``(day, n_events, z, cusum_pos, is_alarm)`` ordered by day.
    """
    daily = df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    wfirst = Window.orderBy("day")
    ranked = daily.withColumn("rn", F.row_number().over(wfirst))
    base = ranked.where(F.col("rn") <= baseline_days).agg(
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("double").alias("ss"),
    )
    base = base.select(
        "mu",
        F.sqrt(
            F.greatest(
                F.lit(0.0), F.col("ss") / F.col("n") - F.col("mu") * F.col("mu")
            )
        ).alias("sigma"),
    )
    scored = ranked.crossJoin(F.broadcast(base)).select(
        "day",
        "n_events",
        F.round(
            (F.col("n_events") - F.col("mu"))
            / F.when(F.col("sigma") > 0, F.col("sigma")).otherwise(F.lit(1.0)),
            9,
        ).alias("z"),
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    # DECIMAL cumsum: windowed double sums are association-order-dependent
    # (DuckDB evaluates frames via segment trees); decimal is exact and
    # order-independent, so the running sum is oracle-replicable bit-exact.
    run = scored.withColumn(
        "r",
        F.sum(F.round(F.col("z") - drift_k, 9).cast("decimal(20,9)"))
        .over(wcum)
        .cast("decimal(38,9)")
        .cast("double"),
    )
    run = run.withColumn("rmin", F.least(F.lit(0.0), F.min("r").over(wcum)))
    return run.select(
        "day",
        "n_events",
        F.round("z", 6).alias("z"),
        F.round(F.col("r") - F.col("rmin"), 6).alias("cusum_pos"),
        (F.round(F.col("r") - F.col("rmin"), 6) > threshold_h).alias("is_alarm"),
    ).orderBy("day")


def mad_outliers(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    cutoff: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier accounting via the Median Absolute
    Deviation (beyond-reference surface): med = median(value), mad =
    median(|value - med|), outlier where |value - med| > cutoff * 1.4826
    * mad. Medians use exact linear-interpolated percentile(0.5) (matches
    DuckDB ``quantile_cont``).

    Scale shape: two keyed exact-percentile aggregates (Spark's
    percentile is a single-shuffle sort-based agg per group) and one
    map-side flag pass — no windows over raw rows, no collect. Groups are
    the unit of parallelism.

    Returns ``(key, n, med, mad, n_outliers, outlier_frac)`` per group.
    """
    med = df.groupBy(F.col(key_col).alias("key")).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    joined = df.select(F.col(key_col).alias("key"), F.col(value_col).alias("v")).join(
        F.broadcast(med), "key"
    )
    mad = joined.groupBy("key").agg(
        F.expr("percentile(abs(v - med), 0.5)").alias("mad")
    )
    flagged = joined.join(F.broadcast(mad), "key")
    return (
        flagged.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("v") - F.col("med"))
                    > cutoff * 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
        )
        .withColumn(
            "outlier_frac", F.round(F.col("n_outliers") / F.col("n"), 6)
        )
        .orderBy("key")
    )


def interval_concurrency(
    df: DataFrame,
    ts_col: str = "ts",
    duration_minutes: int = 10,
    bucket: str = "hour",
) -> DataFrame:
    """Sweep-line interval-overlap counting (beyond-reference surface):
    each event occupies ``[ts, ts + duration)``; emit +1/-1 boundary
    deltas, order by (time, delta) — ends sort before starts at the same
    instant, so touching intervals do NOT overlap — and a running sum
    gives the instantaneous concurrency. Aggregated to the max
    concurrency per ``bucket``.

    Scale shape: 2N boundary rows, ONE global time-ordered window (the
    same bill as any global sort — range-partitioned by Spark); bucket
    aggregation is map-side after the window. For keyed workloads add the
    key to the window partition and the state bounds per key.

    Returns ``(bucket_start, max_concurrent)`` ordered by bucket.
    """
    starts = df.select(F.col(ts_col).alias("t"), F.lit(1).alias("delta"))
    ends = df.select(
        (F.col(ts_col) + F.expr(f"INTERVAL {int(duration_minutes)} MINUTE")).alias(
            "t"
        ),
        F.lit(-1).alias("delta"),
    )
    bounds = starts.unionByName(ends)
    w = Window.orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
    conc = bounds.withColumn("concurrent", F.sum("delta").over(w))
    return (
        conc.where(F.col("delta") == 1)
        .groupBy(F.date_trunc(bucket, "t").alias("bucket_start"))
        .agg(F.max("concurrent").alias("max_concurrent"))
        .orderBy("bucket_start")
    )


def theil_sen(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil-Sen robust trend per group (Theil 1950 / Sen 1968): slope =
    median of all pairwise slopes, intercept = median of ``y - slope*x``
    — the outlier-resistant replacement for least squares on noisy
    volume/metric series (one bad day cannot drag the trend).

    Intended for GROUPED, date-grain series: the pairwise self-join is
    O(n^2) WITHIN each group (bounded — a year of daily points is ~66k
    pairs), keyed on the group column so groups parallelize. Medians use
    exact interpolated percentile (the mad_outliers convention,
    = DuckDB quantile_cont). Returns (group, n_points, slope, intercept)
    at 6dp.
    """
    # localCheckpoint: the series feeds both self-join sides, the count,
    # and the residual pass — without it the upstream aggregate re-executes
    # four times (11 -> 5 exchanges in the audited plan)
    s = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).localCheckpoint(eager=False)
    a, b = s.alias("a"), s.alias("b")
    slopes = a.join(
        b, (F.col("a.g") == F.col("b.g")) & (F.col("a.x") < F.col("b.x"))
    ).select(
        F.col("a.g").alias("g"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias("sl"),
    )
    med_slope = slopes.groupBy("g").agg(
        F.expr("percentile(sl, 0.5)").alias("slope")
    )
    n_pts = s.groupBy("g").agg(F.count(F.lit(1)).alias("n_points"))
    resid = s.join(F.broadcast(med_slope), "g").select(
        "g", (F.col("y") - F.col("slope") * F.col("x")).alias("r")
    )
    med_int = resid.groupBy("g").agg(
        F.expr("percentile(r, 0.5)").alias("intercept")
    )
    return (
        n_pts.join(med_slope, "g")
        .join(med_int, "g")
        .select(
            F.col("g").alias(group_col),
            "n_points",
            F.round("slope", 6).alias("slope"),
            F.round("intercept", 6).alias("intercept"),
        )
        .orderBy(group_col)
    )


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Deterministic bootstrap percentile CI for each group's mean
    (Efron 1979): ``n_boot`` with-replacement resamples whose draws are a
    pure function of (group, replicate, position, seed) via md5-uint52 —
    partition-invariant, engine-portable, no RNG state.

    Intended for grouped, BOUNDED series (date-grain metrics: the draws
    table is groups x n_boot x n rows — a year of daily points at
    B = 200 is 73k draws per group). ``order_col`` must totally order
    each group's rows (the draw index addresses rows by that order).

    Plan: per-group row index (one window over the bounded series),
    draws generated by exploding two sequences map-side, ONE equi-join
    back on (group, index), a (group, replicate) DECIMAL mean, then one
    exact-percentile aggregate per group. Returns (group, n, mean,
    ci_lo, ci_hi) at 6dp.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    w = Window.partitionBy("g").orderBy("o")
    series = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(order_col).alias("o"),
            F.col(value_col).cast("double").alias("v"),
        )
        .withColumn("idx", F.row_number().over(w) - 1)
        .localCheckpoint(eager=False)
    )
    sizes = series.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    draws = (
        sizes.select(
            "g", "n", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("b")
        )
        .select(
            "g", "n", "b",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("i"),
        )
        .select(
            "g",
            "b",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("g").cast("string"),
                                F.col("b").cast("string"),
                                F.col("i").cast("string"),
                                F.lit(str(seed)),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n")
            ).cast("int").alias("idx"),
        )
    )
    boot_means = (
        draws.join(series.select("g", "idx", "v"), ["g", "idx"])
        .groupBy("g", "b")
        .agg(
            (
                F.sum(F.round(F.col("v"), 9).cast("decimal(24,9)"))
                .cast("decimal(38,9)")
                .cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
    )
    point = series.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("v"), 9).cast("decimal(24,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean"),
    )
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    ci = boot_means.groupBy("g").agg(
        F.round(F.expr(f"percentile(m, {lo!r})"), 6).alias("ci_lo"),
        F.round(F.expr(f"percentile(m, {hi!r})"), 6).alias("ci_hi"),
    )
    return (
        point.join(ci, "g")
        .select(F.col("g").alias(group_col), "n", "mean", "ci_lo", "ci_hi")
        .orderBy(group_col)
    )


def autocorrelation(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    max_lag: int = 14,
) -> DataFrame:
    """Autocorrelation function (ACF) of the daily event series at lags
    ``0..max_lag`` (beyond-reference surface, SURVEY §7.8) — the
    periodicity probe that tells a pipeline whether its traffic has a
    weekly cycle before it commits to a seasonal model.

    Series grain: daily row count (or daily sum of ``value_col``).
    Estimator: the standard biased ACF,
    ``r(l) = sum_t (y_t - m)(y_{t+l} - m) / sum_t (y_t - m)^2``
    with the mean over the full series. Lag is measured in CALENDAR
    days (pairs join on ``datediff == l``), so gap days simply produce
    no pair — no imputation.

    Scale shape: one map-side date-grain aggregate reduces events to a
    calendar-bounded series; the lag self-join and the moment sums run
    on the DAY-grain table (365 rows/year, broadcast-sized), never on
    events. Float discipline: deviations and products round to 9dp and
    sum as DECIMAL(38,9) (order-independent, oracle-replicable);
    outputs round to 6dp.

    Returns ``(lag, n_pairs, acf)`` ordered by lag.
    """
    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0, got {max_lag}")
    # the mean, denominator and lag-pair branches all read the day-grain
    # series: checkpoint it (calendar-bounded) so events scan ONCE
    daily = (
        df.groupBy(F.to_date(ts_col).alias("day"))
        .agg(
            (
                F.count(F.lit(1)).cast("double")
                if value_col is None
                else F.sum(F.col(value_col)).cast("double")
            ).alias("value")
        )
        .localCheckpoint(eager=False)
    )
    stats = daily.agg(
        F.round(
            F.sum(F.round("value", 9).cast("decimal(25,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mu")
    )
    dev = daily.crossJoin(F.broadcast(stats)).select(
        "day", F.round(F.col("value") - F.col("mu"), 9).alias("d")
    )
    denom = dev.agg(
        F.sum(F.round(F.col("d") * F.col("d"), 9).cast("decimal(30,9)"))
        .cast("decimal(38,9)")
        .cast("double")
        .alias("den")
    )
    lags = df.sparkSession.range(0, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a, b = dev.alias("a"), dev.alias("b")
    pairs = (
        a.join(F.broadcast(lags), F.lit(True))
        .join(
            b,
            F.col("b.day") == F.date_add(F.col("a.day"), F.col("lag")),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.round(F.col("a.d") * F.col("b.d"), 9).cast("decimal(30,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            .alias("num"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(denom))
        .select(
            "lag",
            "n_pairs",
            F.when(
                F.col("den") != 0.0, F.round(F.col("num") / F.col("den"), 6)
            ).alias("acf"),
        )
        .orderBy("lag")
    )


def kaplan_meier(
    df: DataFrame,
    ts_col: str = "ts",
    subject_col: str = "user_id",
    censor_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier survival curve over subject lifetimes (beyond-
    reference surface, SURVEY §7.8) — the retention estimator that
    handles right-censoring honestly, unlike a naive "% still active at
    day t" which treats recently-arrived users as churned.

    Lifetime: ``datediff(last event, first event)`` per subject. A
    subject whose last event falls within ``censor_days`` of the
    global max timestamp is CENSORED (still alive as far as the data
    can tell); otherwise its lifetime ended (an "event" in survival
    terms). Product-limit estimator at each distinct lifetime t with
    at least one event: ``S(t) = prod_{t_i <= t} (1 - d_i / n_i)``
    where ``n_i`` counts subjects with lifetime >= t_i.

    Scale shape: one groupBy(subject) reduces events to a subject
    table; everything after runs on the LIFETIME grain (distinct
    durations — calendar-bounded, hundreds of rows). The cumulative
    product rides ``exp(cumsum(ln(factor)))`` with each ln rounded to
    9dp and DECIMAL-summed; a factor of exactly 0 (everyone at risk
    dies) forces S = 0 from that point via a running max flag instead
    of ln(0). Windows over the duration grain only.

    Returns ``(duration_days, n_at_risk, n_events, n_censored,
    survival)`` ordered by duration, one row per distinct lifetime
    with >= 1 event.
    """
    if censor_days < 0:
        raise ValueError(f"censor_days must be >= 0, got {censor_days}")
    # the horizon is derivable from the subject table (max of last
    # events == max over events), so events scan ONCE
    subj = df.groupBy(subject_col).agg(
        F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts")
    ).localCheckpoint(eager=False)
    horizon = subj.agg(F.max("last_ts").alias("max_ts"))
    life = subj.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).alias("dur"),
        (
            F.datediff(F.to_date("max_ts"), F.to_date("last_ts")) >= censor_days
        ).alias("observed"),
    )
    grain = life.groupBy("dur").agg(
        F.sum(F.col("observed").cast("long")).alias("n_events"),
        F.sum((~F.col("observed")).cast("long")).alias("n_censored"),
    )
    w_after = Window.orderBy("dur").rowsBetween(1, Window.unboundedFollowing)
    at_risk = grain.select(
        "dur",
        "n_events",
        "n_censored",
        (
            F.col("n_events")
            + F.col("n_censored")
            + F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w_after),
                F.lit(0),
            )
        ).alias("n_at_risk"),
    )
    factored = at_risk.select(
        "dur",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.round(
            F.lit(1.0) - F.col("n_events") / F.col("n_at_risk"), 9
        ).alias("factor"),
    )
    w_upto = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    curve = factored.select(
        "dur",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.max((F.col("factor") == 0.0).cast("int")).over(w_upto).alias("dead"),
        F.sum(
            F.when(F.col("factor") > 0.0, F.round(F.log("factor"), 9))
            .otherwise(F.lit(0.0))
            .cast("decimal(25,9)")
        )
        .over(w_upto)
        .cast("decimal(38,9)")
        .cast("double")
        .alias("lnsum"),
    )
    return (
        curve.where(F.col("n_events") > 0)
        .select(
            F.col("dur").alias("duration_days"),
            "n_at_risk",
            "n_events",
            "n_censored",
            F.when(F.col("dead") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp("lnsum"), 6))
            .alias("survival"),
        )
        .orderBy("duration_days")
    )


def cross_correlation(
    df: DataFrame,
    key_a: str,
    key_b: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str | None = None,
    max_lag: int = 7,
) -> DataFrame:
    """Lead-lag cross-correlation between two event types' daily series
    (beyond-reference surface, SURVEY §7.8) — "does A lead B, and by how
    many days": ``ccf(l) = sum_t da(t) db(t+l) / sqrt(den_a * den_b)``
    with full-series means and variances (the standard sample CCF).
    Positive lag = ``key_a`` leads ``key_b``.

    Scale shape: :func:`autocorrelation`'s discipline — ONE date-grain
    aggregate reduces events to two calendar-bounded day series
    (checkpointed: one events scan feeds every branch); the signed-lag
    join and the moment sums run on the DAY grain. round(9)-DECIMAL
    sums; ccf at 6dp. Returns ``(lag, n_pairs, ccf)`` for lags
    ``-max_lag..max_lag``, ordered; ccf NULL if either series has zero
    variance.
    """
    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0, got {max_lag}")
    daily = (
        df.where(F.col(key_col).isin(key_a, key_b))
        .groupBy(F.col(key_col).alias("k"), F.to_date(ts_col).alias("day"))
        .agg(
            (
                F.count(F.lit(1)).cast("double")
                if value_col is None
                else F.sum(F.col(value_col)).cast("double")
            ).alias("value")
        )
        .localCheckpoint(eager=False)
    )

    def side(key, tag):
        s = daily.where(F.col("k") == key)
        mu = s.agg(
            F.round(
                F.sum(F.round("value", 9).cast("decimal(25,9)"))
                .cast("decimal(38,9)")
                .cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias(f"mu_{tag}")
        )
        dev = s.crossJoin(F.broadcast(mu)).select(
            F.col("day").alias(f"day_{tag}"),
            F.round(F.col("value") - F.col(f"mu_{tag}"), 9).alias(
                f"d_{tag}"
            ),
        )
        den = dev.agg(
            F.sum(
                F.round(F.col(f"d_{tag}") * F.col(f"d_{tag}"), 9).cast(
                    "decimal(30,9)"
                )
            )
            .cast("decimal(38,9)")
            .cast("double")
            .alias(f"den_{tag}")
        )
        return dev, den

    dev_a, den_a = side(key_a, "a")
    dev_b, den_b = side(key_b, "b")
    lags = df.sparkSession.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    pairs = (
        dev_a.join(F.broadcast(lags), F.lit(True))
        .join(
            dev_b,
            F.col("day_b") == F.date_add(F.col("day_a"), F.col("lag")),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.round(F.col("d_a") * F.col("d_b"), 9).cast("decimal(30,9)")
            )
            .cast("decimal(38,9)")
            .cast("double")
            .alias("num"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(den_a))
        .crossJoin(F.broadcast(den_b))
        .select(
            "lag",
            "n_pairs",
            F.when(
                (F.col("den_a") != 0.0) & (F.col("den_b") != 0.0),
                F.round(
                    F.col("num")
                    / F.sqrt(F.col("den_a") * F.col("den_b")),
                    6,
                ),
            ).alias("ccf"),
        )
        .orderBy("lag")
    )


def burstiness(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_events: int = 3,
    tie_col: str | None = None,
) -> DataFrame:
    """Per-entity inter-arrival burstiness (Goh & Barabási, "Burstiness
    and memory in complex systems", EPL 81, 2008): for each entity's gap
    sequence, ``B = (sigma - mu) / (sigma + mu)`` — -1 for a perfectly
    regular clock, 0 for a Poisson process, -> 1 for extreme bursts. The
    bot-vs-human traffic audit (and, on document timestamps, the
    crawl-cadence audit).

    Exactness: gaps are INTEGER epoch-MICROsecond differences (B is
    scale-invariant; the reported mean/std divide to seconds at the
    end); mu and sigma come from integer sums (sum g, sum g^2 as
    DECIMAL — order-invariant, overflow-proof at 100-TB event counts),
    population sigma = sqrt(Sg2/n - mu^2) clamped at 0. ``mean_gap_s``
    at 6dp IS the integer-microsecond mean, so it uses the pure-integer
    half-up division ``(2*Sg + n) div (2n)`` (the rarity_scores
    INTEGER-NANO discipline): a float round(Sg/n/1e6, 6) lands the
    exact rational on a 6dp rounding TIE whenever n divides neatly,
    where Spark's BigDecimal HALF_UP and DuckDB's scaled-multiply
    disagree by an ulp (observed at sf0.1, round-10 sweep). sigma stays
    a float sqrt (irrational outputs don't sit on the rounding grid).
    One keyed lag window (per-entity, parallel across entities) + one
    keyed aggregate — no global sort. Entities with fewer than
    ``min_events`` events carry no gap statistics and are dropped.

    Returns ``(<user_col>, n_events, mean_gap_s, std_gap_s, burstiness)``
    rounded to 6dp.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tie_col).asc()] if tie_col else []
    )  # tie_col pins gap order under equal timestamps (gap^2 sums are
    # NOT telescoping, so tie order matters for engine-exact gates)
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = df.select(F.col(user_col), (us - F.lag(us).over(w)).alias("g"))
    stats = (
        gaps.groupBy(user_col)
        .agg(
            (F.count(F.lit(1))).alias("n_rows"),
            F.count("g").alias("n_gaps"),
            F.sum(F.col("g").cast("decimal(38,0)")).alias("sg"),
            F.sum(F.col("g").cast("decimal(19,0)") * F.col("g")).alias("sg2"),
        )
        .where(F.col("n_rows") >= min_events)
    )
    mu = F.col("sg").cast("double") / F.col("n_gaps")
    var = F.greatest(
        F.lit(0.0), F.col("sg2").cast("double") / F.col("n_gaps") - mu * mu
    )
    sig = F.sqrt(var)
    # pure-integer half-up micro mean: exact at the 6dp-seconds grain
    mean_micro = F.expr(
        "(2 * CAST(sg AS BIGINT) + n_gaps) div (2 * n_gaps)"
    )
    return stats.select(
        F.col(user_col),
        F.col("n_rows").alias("n_events"),
        (mean_micro.cast("double") / 1e6).alias("mean_gap_s"),
        F.round(sig / 1e6, 6).alias("std_gap_s"),
        F.when(sig + mu > 0.0, F.round((sig - mu) / (sig + mu), 6)).alias(
            "burstiness"
        ),
    )


def diff_in_diff(
    df: DataFrame,
    treat_col: str,
    value_col: str,
    ts_col: str = "ts",
    cutoff: str = "2024-01-01",
) -> DataFrame:
    """Difference-in-differences estimate over an event stream: the
    treatment effect net of the shared time trend,

        DiD = (mean_T_post - mean_T_pre) - (mean_C_post - mean_C_pre)

    — the standard quasi-experimental readout when a change rolled out
    to one cohort at a known time (the A/B report's observational
    sibling; ab_test_report assumes randomized assignment, this one
    nets out pre-existing cohort level differences instead).

    Exactness: cell means from 9dp-DECIMAL value sums over exact counts;
    ONE (treat, post) contingency aggregate (map-side partial). DiD is
    NULL unless all four cells are populated.

    Returns one row ``(n_t_pre, n_t_post, n_c_pre, n_c_post, mean_t_pre,
    mean_t_post, mean_c_pre, mean_c_post, did)`` rounded to 6dp.
    """
    cells = (
        df.select(
            F.col(treat_col).cast("boolean").alias("__t"),
            (F.col(ts_col).cast("timestamp") >= F.lit(cutoff).cast("timestamp"))
            .alias("__post"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy("__t", "__post")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.round("__v", 9).cast("decimal(30,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            .alias("__s"),
        )
    )

    def cell(t, post, col):
        return F.max(
            F.when((F.col("__t") == t) & (F.col("__post") == post), F.col(col))
        )

    wide = cells.agg(
        cell(True, False, "__n").alias("n_t_pre"),
        cell(True, True, "__n").alias("n_t_post"),
        cell(False, False, "__n").alias("n_c_pre"),
        cell(False, True, "__n").alias("n_c_post"),
        (cell(True, False, "__s") / cell(True, False, "__n")).alias("__mtpre"),
        (cell(True, True, "__s") / cell(True, True, "__n")).alias("__mtpost"),
        (cell(False, False, "__s") / cell(False, False, "__n")).alias("__mcpre"),
        (cell(False, True, "__s") / cell(False, True, "__n")).alias("__mcpost"),
    )
    return wide.select(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        F.round("__mtpre", 6).alias("mean_t_pre"),
        F.round("__mtpost", 6).alias("mean_t_post"),
        F.round("__mcpre", 6).alias("mean_c_pre"),
        F.round("__mcpost", 6).alias("mean_c_post"),
        F.round(
            (F.col("__mtpost") - F.col("__mtpre"))
            - (F.col("__mcpost") - F.col("__mcpre")),
            6,
        ).alias("did"),
    )


def page_hinkley(
    df: DataFrame,
    ts_col: str = "ts",
    delta: float = 0.5,
    lambda_: float = 10.0,
) -> DataFrame:
    """Page-Hinkley mean-shift detection on the daily event-count series
    (Page 1954; Hinkley 1971) — the sequential-analysis cousin of
    cusum_changepoints that needs NO baseline window: it tracks each
    day's deviation from the RUNNING mean, so slow drifts and late
    shifts both register.

    The textbook recursion is re-expressed closed-form (the CUSUM
    discipline — no sequential state):

        m_t  = sum_{i<=t} (x_i - xbar_i - delta),  xbar_i = mean(x_1..x_i)
        PH_t = m_t - min_{s<=t} m_s,   alarm when PH_t > lambda

    — cumulative sums, a running mean, and a running min: all plain
    window functions over the DATE-grain series (window state is
    calendar-bounded, never event-rows). DECIMAL cumsums per the repo's
    windowed-sum convention (segment-tree float evaluation is
    association-order-dependent).

    Returns ``(day, n_events, running_mean, m_t, ph, is_alarm)`` ordered
    by day, 6dp.
    """
    daily = df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    withmean = daily.select(
        "day",
        "n_events",
        (
            F.sum(F.col("n_events").cast("decimal(30,9)")).over(wcum).cast("double")
            / F.count(F.lit(1)).over(wcum)
        ).alias("__xbar"),
    )
    dev = withmean.select(
        "day",
        "n_events",
        F.col("__xbar"),
        F.round(
            F.col("n_events").cast("double") - F.col("__xbar") - F.lit(float(delta)),
            9,
        ).alias("__d"),
    )
    m = dev.select(
        "day",
        "n_events",
        "__xbar",
        F.sum(F.col("__d").cast("decimal(30,9)")).over(wcum).cast("double").alias("__m"),
    )
    ph = F.col("__m") - F.min("__m").over(wcum)
    return m.select(
        "day",
        "n_events",
        F.round("__xbar", 6).alias("running_mean"),
        F.round("__m", 6).alias("m_t"),
        (F.round(ph, 6) + 0.0).alias("ph"),
        (ph > float(lambda_)).alias("is_alarm"),
    ).orderBy("day")
