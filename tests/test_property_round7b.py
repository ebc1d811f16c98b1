"""Property-based differentials for the round-7 batch-2 operators:
random inputs vs pure-Python replicas."""

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
    counts=st.lists(st.integers(1, 12), min_size=3, max_size=20),
    lag=st.integers(1, 4),
)
def test_autocorrelation_property(spark, counts, lag):
    from nbdatatools_spark.operators.temporal import autocorrelation

    rows = []
    eid = 0
    base = datetime(2024, 3, 1)
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + timedelta(days=i, hours=3)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["lag"]: r["acf"] for r in autocorrelation(df, max_lag=lag).collect()}

    y = [float(c) for c in counts]
    mu = sum(y) / len(y)
    d = [v - mu for v in y]
    den = sum(v * v for v in d)
    if den == 0:
        return  # constant series: acf undefined (division by zero -> null)
    want = sum(d[t] * d[t + lag] for t in range(len(y) - lag)) / den
    if lag < len(y):
        assert out[lag] == pytest.approx(want, abs=1e-5)
    assert out[0] == pytest.approx(1.0, abs=1e-6)


@settings(**_SETTINGS)
@given(
    lifetimes=st.lists(
        st.tuples(st.integers(1, 20), st.booleans()), min_size=2, max_size=15
    )
)
def test_kaplan_meier_property(spark, lifetimes):
    from nbdatatools_spark.operators.temporal import kaplan_meier

    # build events whose (duration, observed) match the drawn lifetimes:
    # observed users end >= censor_days before the horizon-stretcher user
    horizon = datetime(2024, 6, 30)
    censor = 7
    rows = [(9999, horizon), (9999, horizon - timedelta(days=1))]
    for uid, (dur, observed) in enumerate(lifetimes):
        last = horizon - timedelta(days=censor + 3 if observed else 1)
        first = last - timedelta(days=dur)
        rows += [(uid, first), (uid, last)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["duration_days"]: r
        for r in kaplan_meier(df, censor_days=censor).collect()
    }

    # reference product-limit over all subjects incl. the stretcher (dur 1,
    # censored) and the drawn ones (duration = dur+0 days as dated above)
    subj = [(1, False)] + [(d, o) for d, o in lifetimes]
    times = sorted({d for d, o in subj if o})
    s = 1.0
    for t in times:
        n_at = sum(1 for d, _ in subj if d >= t)
        d_t = sum(1 for d, o in subj if d == t and o)
        s *= 1.0 - d_t / n_at
        assert got[t]["n_at_risk"] == n_at
        assert got[t]["n_events"] == d_t
        assert got[t]["survival"] == pytest.approx(s, abs=1e-5)


@settings(**_SETTINGS)
@given(
    baskets=st.lists(
        st.lists(st.integers(0, 8), min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    )
)
def test_association_rules_property(spark, baskets):
    from nbdatatools_spark.operators.analysis import association_rules

    rows = [(b, f"i{i}") for b, items in enumerate(baskets) for i in items]
    df = spark.createDataFrame(rows, "bk long, it string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(df, "bk", "it", min_pair_count=1).collect()
    }

    sets = [set(f"i{i}" for i in items) for items in baskets]
    n_b = len(sets)
    from collections import Counter

    marg = Counter()
    pair = Counter()
    for s in sets:
        for it in s:
            marg[it] += 1
        for a in s:
            for b in s:
                if a < b:
                    pair[(a, b)] += 1
    assert set(got) == set(pair)
    for (a, b), c in pair.items():
        r = got[(a, b)]
        assert r["n_ab"] == c and r["n_a"] == marg[a] and r["n_b"] == marg[b]
        assert r["support"] == pytest.approx(c / n_b, abs=1e-6)
        assert r["lift"] == pytest.approx(
            c * n_b / (marg[a] * marg[b]), abs=1e-5
        )


@settings(**_SETTINGS)
@given(
    rates=st.lists(st.floats(0.0, 1.0), min_size=2, max_size=8),
    weights=st.lists(st.integers(1, 30), min_size=2, max_size=8),
)
def test_isotonic_property(spark, rates, weights):
    from nbdatatools_spark.operators.evaluation import isotonic_calibration

    k = min(len(rates), len(weights))
    rates, weights = rates[:k], weights[:k]
    n_bins = max(k, 2)
    rows = []
    for b in range(k):
        c = weights[b]
        npos = round(rates[b] * c)
        s = (b + 0.5) / n_bins
        rows += [(s, True)] * npos + [(s, False)] * (c - npos)
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = isotonic_calibration(df, "score", "y", n_bins=n_bins).collect()

    # reference PAV over the observed rates
    obs = [(round(rates[b] * weights[b])) / weights[b] for b in range(k)]
    blocks = [[obs[i], float(weights[i]), 1] for i in range(k)]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] > blocks[i + 1][0] + 1e-12:
            v1, w1, s1 = blocks[i]
            v2, w2, s2 = blocks[i + 1]
            blocks[i] = [(v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2, s1 + s2]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    want = []
    for v, _, s in blocks:
        want.extend([v] * s)
    got = [r["isotonic_rate"] for r in out]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-5)


@settings(**_SETTINGS)
@given(
    vocab_a=st.lists(st.integers(0, 15), min_size=1, max_size=40),
    vocab_b=st.lists(st.integers(0, 15), min_size=1, max_size=40),
)
def test_source_jsd_property(spark, vocab_a, vocab_b):
    from nbdatatools_spark.operators.analysis import source_jsd

    rows = [("a", " ".join(f"t{i}" for i in vocab_a)),
            ("b", " ".join(f"t{i}" for i in vocab_b))]
    df = spark.createDataFrame(rows, "source string, text string")
    r = source_jsd(df, vocab_size=64).first()

    from collections import Counter

    ca, cb = Counter(vocab_a), Counter(vocab_b)
    ta, tb = sum(ca.values()), sum(cb.values())
    keys = set(ca) | set(cb)
    jsd = 0.0
    for kk in keys:
        p, q = ca.get(kk, 0) / ta, cb.get(kk, 0) / tb
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log2(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log2(q / m)
    assert r["jsd_bits"] == pytest.approx(jsd, abs=1e-5)
    assert -1e-9 <= r["jsd_bits"] <= 1.0 + 1e-9
