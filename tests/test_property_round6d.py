"""Property-based differentials for the round-6 batch-5/6/7 operators:
random inputs vs pure-Python replicas (the test_property_textops
strategy)."""

import hashlib
import math

import numpy as np
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
    scores=st.lists(st.integers(0, 5), min_size=4, max_size=40),
    labels=st.lists(st.booleans(), min_size=4, max_size=40),
)
def test_ranking_auc_property(spark, scores, labels):
    from nbdatatools_spark.operators.evaluation import ranking_auc

    n = min(len(scores), len(labels))
    scores, labels = scores[:n], labels[:n]
    if not (any(labels) and not all(labels)):
        labels = [True] + labels[1:-1] + [False]
    df = spark.createDataFrame(
        [(float(s) / 5, bool(y)) for s, y in zip(scores, labels)],
        "s double, y boolean",
    )
    got = ranking_auc(df, "s", "y").first()
    # tie-averaged rank-sum reference
    s = np.array(scores, dtype=float) / 5
    y = np.array(labels)
    order = np.argsort(s, kind="stable")
    ranks = np.empty(n, dtype=float)
    i = 0
    ss = s[order]
    while i < n:
        j = i
        while j < n and ss[j] == ss[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n1, n0 = int(y.sum()), int((~y).sum())
    want = (ranks[y].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert got["auc"] == round(want, 6)
    assert (got["n_pos"], got["n_neg"]) == (n1, n0)


@settings(**_SETTINGS)
@given(
    flags=st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=2, max_size=50
    )
)
def test_filter_agreement_property(spark, flags):
    from nbdatatools_spark.operators.evaluation import filter_agreement

    df = spark.createDataFrame(flags, "a boolean, b boolean")
    got = filter_agreement(df, "a", "b").first()
    n = len(flags)
    n11 = sum(1 for a, b in flags if a and b)
    n10 = sum(1 for a, b in flags if a and not b)
    n01 = sum(1 for a, b in flags if not a and b)
    n00 = n - n11 - n10 - n01
    po = (n11 + n00) / n
    pe = ((n11 + n10) / n) * ((n11 + n01) / n) + ((n01 + n00) / n) * (
        (n10 + n00) / n
    )
    assert (got["n11"], got["n10"], got["n01"], got["n00"]) == (n11, n10, n01, n00)
    assert got["agreement"] == round(po, 6)
    if pe < 1.0:
        assert got["kappa"] == round((po - pe) / (1 - pe), 6)
    else:
        assert got["kappa"] is None


@settings(**_SETTINGS)
@given(
    series=st.lists(
        st.tuples(st.integers(0, 30), st.integers(-50, 50)),
        min_size=2,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_theil_sen_property(spark, series):
    from nbdatatools_spark.operators.temporal import theil_sen

    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in series], "g string, x double, y double"
    )
    got = theil_sen(df, "g", "x", "y").first()
    xs = np.array([x for x, _ in series], dtype=float)
    ys = np.array([y for _, y in series], dtype=float)
    slopes = [
        (ys[j] - ys[i]) / (xs[j] - xs[i])
        for i in range(len(xs))
        for j in range(len(xs))
        if xs[i] < xs[j]
    ]
    slope = float(np.percentile(slopes, 50, method="linear"))
    intercept = float(np.percentile(ys - slope * xs, 50, method="linear"))
    assert got["slope"] == round(slope, 6) or abs(got["slope"] - slope) < 1e-9
    assert (
        got["intercept"] == round(intercept, 6)
        or abs(got["intercept"] - intercept) < 1e-9
    )


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(1, 500), min_size=1, max_size=8),
    eps=st.sampled_from([0.5, 1.0, 2.0]),
)
def test_dp_counts_property(spark, counts, eps):
    from nbdatatools_spark.operators.analysis import dp_counts

    rows = [(f"g{gi}",) for gi, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "g string")
    got = {
        r["g"]: r
        for r in dp_counts(df, "g", epsilon=eps, seed=42, audit=True).collect()
    }
    for gi, c in enumerate(counts):
        g = f"g{gi}"
        h = int(hashlib.md5(f"{g}:42".encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / float(1 << 52) - 0.5
        noise = (-1.0 / eps) * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u))
        assert got[g]["true_count"] == c
        assert abs(got[g]["noisy_count"] - (c + noise)) < 1e-6
