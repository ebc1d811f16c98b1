"""Property-based differentials for round-6 operators: CUSUM closed form
vs the textbook recursion, interval-concurrency sweep line vs a brute
scan, IPF marginal improvement, Kneser-Ney vs a pure-Python replica."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(counts=st.lists(st.integers(min_value=1, max_value=30), min_size=8, max_size=20))
@settings(**_SETTINGS)
def test_cusum_closed_form_property(spark, counts):
    from nbdatatools_spark.operators.temporal import cusum_changepoints

    rows = []
    for d, n in enumerate(counts):
        for i in range(n):
            rows.append(
                (datetime.datetime(2025, 1, 1) + datetime.timedelta(days=d, minutes=i),)
            )
    df = spark.createDataFrame(rows, "ts timestamp")
    out = sorted(cusum_changepoints(df).collect(), key=lambda r: r["day"])
    s = 0.0
    for r in out:
        s = max(0.0, s + round(r["z"] - 0.5, 9))
        assert abs(r["cusum_pos"] - round(s, 6)) < 5e-6


@given(
    offsets=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=25)
)
@settings(**_SETTINGS)
def test_concurrency_matches_brute_scan(spark, offsets):
    from nbdatatools_spark.operators.temporal import interval_concurrency

    t0 = datetime.datetime(2025, 2, 1)
    rows = [(t0 + datetime.timedelta(minutes=o),) for o in offsets]
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["bucket_start"]: r["max_concurrent"] for r in
           interval_concurrency(df, duration_minutes=10).collect()}
    # brute force: at each interval start, count active intervals [s, s+10)
    starts = sorted(t0 + datetime.timedelta(minutes=o) for o in offsets)
    expect: dict = {}
    for s in starts:
        active = sum(
            1 for u in starts if u <= s < u + datetime.timedelta(minutes=10)
        )
        b = s.replace(minute=0, second=0, microsecond=0)
        expect[b] = max(expect.get(b, 0), active)
    assert out == expect


@given(
    cells=st.lists(
        st.tuples(
            st.sampled_from(["r0", "r1", "r2"]),
            st.sampled_from(["c0", "c1"]),
        ),
        min_size=6,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_ipf_last_fitted_marginal_exact(spark, cells):
    from nbdatatools_spark.operators.sampling import ipf_weights

    # ensure both marginals have at least 2 categories
    cells = cells + [("r0", "c0"), ("r1", "c1"), ("r2", "c0")]
    df = spark.createDataFrame(
        [(r, c, i) for i, (r, c) in enumerate(cells)],
        "lang string, source string, x long",
    )
    out = ipf_weights(df, row_col="lang", col_col="source", iterations=2)
    rows = out.collect()
    total = len(cells)
    n_cols = len({c for _, c in cells})
    target = total / n_cols
    col_mass: dict = {}
    for r in rows:
        col_mass[r["col_key"]] = col_mass.get(r["col_key"], 0.0) + r["n"] * r["weight"]
    # the column pass ran last -> its marginal is (near-)exactly on target
    for m in col_mass.values():
        assert abs(m - target) < 1e-4 * max(1.0, target)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=2, max_size=8),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_kneser_ney_property_differential(spark, docs):
    from collections import Counter

    from nbdatatools_spark.operators.lm import kneser_ney_bigrams

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    out = {(r["w1"], r["w2"]): r["p_kn"] for r in
           kneser_ney_bigrams(df, top_n=10**6).collect()}
    pairs = []
    for ws in docs:
        pairs += list(zip(ws, ws[1:]))
    cb = Counter(pairs)
    c1 = Counter(w1 for w1, _ in pairs)
    nf = Counter(w1 for (w1, _) in cb)
    npre = Counter(w2 for (_, w2) in cb)
    nt = len(cb)
    for (w1, w2), nb in cb.items():
        expect = round(
            max(nb - 0.75, 0.0) / c1[w1]
            + ((0.75 * nf[w1]) / c1[w1]) * (npre[w2] / float(nt)),
            9,
        )
        assert abs(out[(w1, w2)] - expect) < 1e-12
