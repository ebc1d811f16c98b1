"""Property-based differentials for the round-8 candidate operators:
random inputs vs pure-Python replicas and structural invariants."""

import math
from collections import Counter
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

_CAT = st.sampled_from(["a", "b", "c", "d"])


@settings(**_SETTINGS)
@given(rows=st.lists(st.tuples(_CAT, _CAT), min_size=2, max_size=60))
def test_mutual_information_properties(spark, rows):
    """MI >= 0, MI <= min(H_a, H_b), symmetric in its arguments, and
    matches the pure-Python computation."""
    from nbdatatools_spark.operators.quality_checks import mutual_information

    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    s = mutual_information(df, "b", "a").collect()[0]
    assert r["mi"] == s["mi"]
    assert r["h_a"] == s["h_b"] and r["h_b"] == s["h_a"]
    assert r["mi"] >= -1e-6
    assert r["mi"] <= min(r["h_a"], r["h_b"]) + 1e-6

    n = len(rows)
    ca, cb, cab = Counter(), Counter(), Counter()
    for a, b in rows:
        ca[a] += 1
        cb[b] += 1
        cab[(a, b)] += 1
    want = sum(
        (o / n) * math.log(o * n / (ca[a] * cb[b])) for (a, b), o in cab.items()
    )
    assert r["mi"] == pytest.approx(want, abs=1e-5)


@settings(**_SETTINGS)
@given(
    gaps=st.lists(st.integers(1, 10_000), min_size=2, max_size=30),
    shift_s=st.integers(0, 10_000_000),
)
def test_burstiness_shift_invariant_and_bounded(spark, gaps, shift_s):
    """B is invariant under a global time shift, bounded in [-1, 1], and
    matches the closed form on the gap list."""
    from nbdatatools_spark.operators.temporal import burstiness

    base = datetime(2024, 1, 1)
    ts = [base]
    for g in gaps:
        ts.append(ts[-1] + timedelta(seconds=g))
    rows = [(1, t) for t in ts]
    shifted = [(1, t + timedelta(seconds=shift_s)) for t in ts]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df2 = spark.createDataFrame(shifted, "user_id long, ts timestamp")
    r = burstiness(df, min_events=2).collect()[0]
    r2 = burstiness(df2, min_events=2).collect()[0]
    assert (r["burstiness"], r["mean_gap_s"], r["std_gap_s"]) == (
        r2["burstiness"], r2["mean_gap_s"], r2["std_gap_s"],
    )
    mu = sum(gaps) / len(gaps)
    sig = math.sqrt(sum(g * g for g in gaps) / len(gaps) - mu * mu)
    if sig + mu > 0:
        assert r["burstiness"] == pytest.approx((sig - mu) / (sig + mu), abs=1e-5)
        assert -1.0 <= r["burstiness"] <= 1.0


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.sampled_from(["red", "green", "blue", "cyan", "teal"]),
        min_size=1,
        max_size=80,
    ),
    power=st.sampled_from([0.5, 0.75, 1.0]),
)
def test_negative_sampling_table_property(spark, words, power):
    """Weights match count^power / Z, rows ordered by (count DESC, token),
    cumulative boundaries are monotone and end at ~1."""
    from nbdatatools_spark.operators.lm import negative_sampling_table

    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = negative_sampling_table(df, vocab_size=10, power=power).collect()
    counts = Counter(words)
    order = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r["token"], r["count"]) for r in rows] == order
    z = sum(round(c**power, 9) for _, c in order)
    for r, (w, c) in zip(rows, order):
        assert r["weight"] == pytest.approx(round(c**power, 9) / z, abs=1e-6)
    cums = [r["cum_weight"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == pytest.approx(1.0, abs=1e-6)


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=25,
    )
)
def test_label_propagation_properties(spark, edges):
    """Labels are graph node ids; row order and orientation don't matter;
    every node gets exactly one community."""
    from nbdatatools_spark.operators.graph import label_propagation

    nodes = {a for a, _ in edges} | {b for _, b in edges}
    df = spark.createDataFrame(edges, "src int, dst int")
    out = label_propagation(df, iterations=3).collect()
    assert len(out) == len(nodes)
    assert {r["node"] for r in out} == nodes
    assert {r["community"] for r in out} <= nodes
    flipped = spark.createDataFrame(
        [(b, a) for a, b in reversed(edges)], "src int, dst int"
    )
    out2 = label_propagation(flipped, iterations=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_hits_bounded_and_normalized(spark, edges):
    """Scores sit in [0, 1]; each score vector is ~L2-normalized (unless
    degenerate-zero); duplicate edges don't change anything."""
    from nbdatatools_spark.operators.graph import hits_scores

    df = spark.createDataFrame(edges, "src int, dst int")
    out = hits_scores(df, iterations=3).collect()
    a2 = sum(r["authority"] ** 2 for r in out)
    h2 = sum(r["hub"] ** 2 for r in out)
    assert all(0.0 <= r["authority"] <= 1.0 + 1e-9 for r in out)
    assert all(0.0 <= r["hub"] <= 1.0 + 1e-9 for r in out)
    assert a2 == pytest.approx(1.0, abs=1e-5)
    assert h2 == pytest.approx(1.0, abs=1e-5)
    dup = spark.createDataFrame(edges + edges, "src int, dst int")
    out2 = hits_scores(dup, iterations=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


@settings(**_SETTINGS)
@given(
    pts=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=2,
        max_size=25,
        unique=True,
    ),
    k=st.integers(2, 6),
)
def test_kcenter_greedy_properties(spark, pts, k):
    """Distinct selections, non-increasing selection distances, and the
    2-approximation witness: every point is within the last selection
    distance of SOME chosen center."""
    from nbdatatools_spark.operators.clustering import kcenter_select

    rows = [(i, [float(x), float(y)]) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sel = kcenter_select(df, k=k).collect()
    ids = [r["vec_id"] for r in sel]
    assert len(ids) == len(set(ids)) == min(k, len(pts))
    d = [r["sq_dist"] for r in sel[1:]]
    assert d == sorted(d, reverse=True)
    if len(pts) > k:
        # coverage radius: max over points of min sq dist to chosen
        chosen = [pts[i] for i in ids]
        radius = max(
            min((px - cx) ** 2 + (py - cy) ** 2 for cx, cy in chosen)
            for px, py in pts
        )
        # greedy guarantee: radius <= last selection distance
        assert radius <= d[-1] + 1e-6


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["ox", "ant", "bee", "cat", "dog", "elk"]),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=2,
        max_size=15,
    ),
    threshold=st.sampled_from([0.6, 0.8, 0.95]),
)
def test_cosine_threshold_pairs_property(spark, texts, threshold):
    """Prefix-filtered output equals the pure-Python all-pairs cosine."""
    from nbdatatools_spark.operators.dedup import cosine_threshold_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in cosine_threshold_pairs(docs, threshold).collect()}

    def vec(t):
        c = Counter(t.split())
        n = math.sqrt(sum(v * v for v in c.values()))
        return {w: v / n for w, v in c.items()}

    vs = [vec(t) for t in texts]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            cos = sum(
                round(vs[i][w] * vs[j][w], 9) for w in vs[i] if w in vs[j]
            )
            if cos >= threshold:
                want[(i, j)] = round(cos, 6)
    assert set(got) == set(want)
    for kk in want:
        assert got[kk] == pytest.approx(want[kk], abs=1e-6)
