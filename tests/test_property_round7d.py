"""Property-based differentials for candidate batches 4-6: diff-in-diff,
conformal thresholds, balanced shards, histogram quantiles."""

import math
from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.tuples(
            st.booleans(), st.booleans(),
            st.floats(0, 100, allow_nan=False, width=32),
        ),
        min_size=8,
        max_size=60,
    )
)
def test_diff_in_diff_matches_python(spark, vals):
    from nbdatatools_spark.operators.temporal import diff_in_diff

    t_pre = datetime(2024, 1, 1)
    t_post = datetime(2024, 2, 1)
    rows = [
        (t, float(v), t_post if post else t_pre) for t, post, v in vals
    ]
    df = spark.createDataFrame(rows, "treat boolean, value double, ts timestamp")
    r = diff_in_diff(df, "treat", "value", cutoff="2024-01-15").collect()[0]

    def mean(pred):
        xs = [v for t, post, v in vals if pred(t, post)]
        return sum(round(float(v), 9) for v in xs) / len(xs) if xs else None

    cells = [
        mean(lambda t, p: t and not p), mean(lambda t, p: t and p),
        mean(lambda t, p: not t and not p), mean(lambda t, p: not t and p),
    ]
    if all(c is not None for c in cells):
        want = (cells[1] - cells[0]) - (cells[3] - cells[2])
        assert r["did"] == pytest.approx(want, abs=1e-5)
    else:
        assert r["did"] is None


@settings(**_SETTINGS)
@given(
    scores=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32),
        min_size=1,
        max_size=80,
    ),
    alpha=st.sampled_from([0.05, 0.1, 0.25, 0.5]),
)
def test_conformal_threshold_matches_python(spark, scores, alpha):
    from nbdatatools_spark.operators.evaluation import conformal_threshold

    df = spark.createDataFrame([(float(s),) for s in scores], "s double")
    r = conformal_threshold(df, "s", alpha=alpha).collect()[0]
    n = len(scores)
    qi = min(math.ceil((n + 1) * (1 - alpha)), n)
    want = sorted(float(s) for s in scores)[qi - 1]
    assert r["q_index"] == qi
    assert r["threshold"] == pytest.approx(round(want, 6), abs=1e-9)
    # the conformal coverage guarantee holds empirically on the data
    assert sum(s <= want for s in scores) >= qi


@settings(**_SETTINGS)
@given(
    weights=st.lists(st.integers(1, 10_000), min_size=4, max_size=120),
    n_shards=st.integers(2, 8),
)
def test_balanced_shards_properties(spark, weights, n_shards):
    from nbdatatools_spark.operators.packing import balanced_shards

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, w long"
    )
    out = balanced_shards(df, n_shards, "w").collect()
    assert len(out) == len(weights)  # a partition, nothing dropped
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["w"])
    assert set(by_shard) <= set(range(n_shards))
    # serpentine bound: every shard within max_weight of the mean total
    totals = [sum(v) for v in by_shard.values()]
    if len(totals) == n_shards:
        mean = sum(totals) / n_shards
        assert max(totals) - mean <= max(weights) + 1e-9
        assert mean - min(totals) <= max(weights) + 1e-9


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.floats(0, 100, allow_nan=False, width=32),
        min_size=5,
        max_size=100,
    ),
    p=st.sampled_from([0.1, 0.5, 0.9]),
)
def test_histogram_quantiles_one_bin_error(spark, vals, p):
    from nbdatatools_spark.operators.analysis import histogram_quantiles

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    n_bins = 20
    r = {row["p"]: row["estimate"] for row in
         histogram_quantiles(df, "v", (p,), lo=0.0, hi=100.0,
                             n_bins=n_bins).collect()}
    # the estimate sits within one bin width of SOME value at that rank:
    # compare against the exact lower/upper order statistics around p*n
    xs = sorted(float(v) for v in vals)
    k = max(min(math.ceil(p * len(xs)), len(xs)), 1)
    exact = xs[k - 1]
    width = 100.0 / n_bins
    assert abs(r[p] - exact) <= width + 1e-6
