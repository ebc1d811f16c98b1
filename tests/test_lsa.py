"""LSA topics: numpy differential + structural invariants, plus the
batch-2 additions (page_hinkley, trimmed_stats, effective_sample_size,
brier_decomposition) closed-form tests."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.lm import lsa_topics


def _tfidf_matrix(docs, min_df=2, vocab_size=64):
    """Pure-Python replica of the operator's tf-idf construction."""
    import numpy as np
    import re

    toks = {
        d: re.split(r"\s+", re.sub(r"\s+", " ", t.lower()).strip(" "))
        for d, t in docs
    }
    toks = {d: [w for w in ws if w] for d, ws in toks.items()}
    n = len(docs)
    df_ = {}
    for ws in toks.values():
        for w in set(ws):
            df_[w] = df_.get(w, 0) + 1
    vocab = sorted(
        (w for w, c in df_.items() if c >= min_df),
        key=lambda w: (-df_[w], w),
    )[:vocab_size]
    vocab = sorted(vocab)
    idx = {w: i for i, w in enumerate(vocab)}
    A = np.zeros((n, len(vocab)))
    for r, (d, _) in enumerate(docs):
        for w in toks[d]:
            if w in idx:
                A[r, idx[w]] += 1.0
    for w, i in idx.items():
        A[:, i] *= round(math.log(n / df_[w]), 9)
    return A, vocab


def test_lsa_numpy_differential(spark):
    import numpy as np

    docs = [
        (1, "cat dog cat bird"),
        (2, "dog cat dog fish"),
        (3, "stock market stock trade"),
        (4, "market trade market stock"),
        (5, "cat dog market"),
        (6, "bird fish bird cat"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = lsa_topics(
        sdf, vocab_size=16, n_topics=3, top_terms=4, min_df=2
    ).collect()
    A, vocab = _tfidf_matrix(docs, min_df=2, vocab_size=16)
    u, s, vt = np.linalg.svd(A, full_matrices=False)
    by_topic = {}
    for r in got:
        by_topic.setdefault(r["topic"], []).append(r)
    assert set(by_topic) == {0, 1, 2}
    for t, rows in by_topic.items():
        # singular values match numpy's
        assert abs(rows[0]["sv"] - s[t]) < 1e-4, (t, rows[0]["sv"], s[t])
        v = vt[t]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        expect = {vocab[i]: v[i] for i in range(len(vocab))}
        for r in rows:
            assert abs(r["loading"] - expect[r["term"]]) < 1e-3, (t, r)


def test_lsa_topic_separation(spark):
    # two disjoint vocabularies -> the top two topics separate them
    docs = [(i, "alpha beta gamma alpha beta") for i in range(5)] + [
        (i + 10, "delta epsilon zeta delta epsilon") for i in range(5)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    rows = lsa_topics(sdf, vocab_size=16, n_topics=2, top_terms=3).collect()
    t0 = {r["term"] for r in rows if r["topic"] == 0 and abs(r["loading"]) > 0.1}
    t1 = {r["term"] for r in rows if r["topic"] == 1 and abs(r["loading"]) > 0.1}
    assert not (t0 & t1), (t0, t1)
    assert t0 | t1 == {"alpha", "beta", "gamma", "delta", "epsilon", "zeta"}


def test_lsa_deterministic_across_partitionings(spark, documents):
    one = lsa_topics(
        documents.coalesce(1), vocab_size=32, n_topics=3, top_terms=5
    ).collect()
    many = lsa_topics(
        documents.repartition(13), vocab_size=32, n_topics=3, top_terms=5
    ).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_lsa_empty_corpus(spark):
    sdf = spark.createDataFrame([], "doc_id long, text string")
    assert lsa_topics(sdf).count() == 0


# ---------------------------------------------------------------------------
# batch-2 scalars
# ---------------------------------------------------------------------------


def test_page_hinkley_detects_level_shift(spark):
    from nbdatatools_spark.operators.temporal import page_hinkley

    rows = []
    eid = 0
    for day in range(1, 29):
        n = 10 if day <= 14 else 40
        for _ in range(n):
            rows.append((eid, f"2024-01-{day:02d} 12:00:00"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts_s string").select(
        "event_id", F.to_timestamp("ts_s").alias("ts")
    )
    out = page_hinkley(df, delta=0.5, lambda_=10.0).collect()
    assert len(out) == 28
    pre = [r for r in out if r["day"].day <= 14]
    post = [r for r in out if r["day"].day >= 20]
    assert not any(r["is_alarm"] for r in pre)
    assert all(r["is_alarm"] for r in post)
    # ph is nonnegative by construction
    assert all(r["ph"] >= 0.0 for r in out)


def test_page_hinkley_flat_series_never_alarms(spark):
    from nbdatatools_spark.operators.temporal import page_hinkley

    rows = [
        (d * 100 + i, f"2024-02-{d:02d} 00:00:00")
        for d in range(1, 21)
        for i in range(7)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts_s string").select(
        F.to_timestamp("ts_s").alias("ts")
    )
    out = page_hinkley(df).collect()
    assert not any(r["is_alarm"] for r in out)
    assert all(abs(r["m_t"] + 0.5 * i) < 1e-6 for i, r in enumerate(out, 1))


def test_trimmed_stats_hand_computed(spark):
    from nbdatatools_spark.operators.stats import trimmed_stats

    vals = list(range(1, 10)) + [1000]  # one huge outlier
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "g string, v double"
    )
    r = trimmed_stats(df, "g", "v", trim=0.1).collect()[0]
    # interpolated percentiles, h = p*(n-1): p10 -> 1 + 0.9 = 1.9,
    # p90 -> x[8.1] = 9 + 0.1*(1000 - 9) = 108.1
    assert abs(r["lo_cut"] - 1.9) < 1e-6
    assert abs(r["hi_cut"] - 108.1) < 1e-6
    assert abs(r["mean"] - 104.5) < 1e-6
    kept = [v for v in vals if 1.9 <= v <= 108.1]  # 2..9
    assert abs(r["trimmed_mean"] - sum(kept) / len(kept)) < 1e-6
    wins = [min(max(v, 1.9), 108.1) for v in vals]
    assert abs(r["winsorized_mean"] - sum(wins) / len(wins)) < 1e-6


def test_trimmed_stats_outlier_resistance(spark):
    from nbdatatools_spark.operators.stats import trimmed_stats

    base = [("g", float(v)) for v in range(100)]
    poisoned = base[:-1] + [("g", 1e9)]
    df_a = spark.createDataFrame(base, "g string, v double")
    df_b = spark.createDataFrame(poisoned, "g string, v double")
    a = trimmed_stats(df_a, "g", "v").collect()[0]
    b = trimmed_stats(df_b, "g", "v").collect()[0]
    assert abs(a["trimmed_mean"] - b["trimmed_mean"]) < 2.0
    assert b["mean"] > 1e6  # the plain mean is destroyed


def test_effective_sample_size_closed_forms(spark):
    from nbdatatools_spark.operators.stats import effective_sample_size

    uniform = [("u", 2.0)] * 50
    skewed = [("s", 1.0)] * 49 + [("s", 1000.0)]
    df = spark.createDataFrame(uniform + skewed, "g string, w double")
    out = {r["g"]: r for r in effective_sample_size(df, "g", "w").collect()}
    # equal weights: ESS == n exactly
    assert out["u"]["ess"] == 50.0
    assert out["u"]["design_effect"] == 1.0
    # one dominating weight: ESS collapses toward 1
    s = out["s"]
    expect = (49 + 1000.0) ** 2 / (49 + 1000.0**2)
    assert abs(s["ess"] - expect) < 1e-4
    assert s["ess"] < 2.0


def test_effective_sample_size_drops_nonpositive(spark):
    from nbdatatools_spark.operators.stats import effective_sample_size

    df = spark.createDataFrame(
        [("g", 1.0), ("g", -5.0), ("g", 0.0), ("g", None), ("g", 3.0)],
        "g string, w double",
    )
    r = effective_sample_size(df, "g", "w").collect()[0]
    assert r["n"] == 2
    assert abs(r["sum_w"] - 4.0) < 1e-9


def test_brier_decomposition_identities(spark):
    from nbdatatools_spark.operators.evaluation import brier_decomposition

    import random

    rnd = random.Random(17)
    rows = []
    for _ in range(400):
        p = round(rnd.random(), 3)
        o = 1 if rnd.random() < p else 0  # well-calibrated by construction
        rows.append((p, o))
    df = spark.createDataFrame(rows, "score double, label int")
    r = brier_decomposition(df, "score", "label", n_bins=10).collect()[0]
    # identity: brier == rel - res + unc + within_bin_var (to rounding)
    lhs = r["brier"]
    rhs = r["reliability"] - r["resolution"] + r["uncertainty"] + r["within_bin_var"]
    assert abs(lhs - rhs) < 5e-6
    assert r["reliability"] >= 0.0 and r["resolution"] >= 0.0
    # calibrated scores: reliability near 0, resolution well above it
    assert r["reliability"] < 0.02
    assert r["resolution"] > r["reliability"]
    # direct brier check
    direct = sum((p - o) ** 2 for p, o in rows) / len(rows)
    assert abs(r["brier"] - direct) < 1e-4


def test_brier_perfect_and_constant(spark):
    from nbdatatools_spark.operators.evaluation import brier_decomposition

    perfect = spark.createDataFrame(
        [(1.0, 1)] * 10 + [(0.0, 0)] * 10, "score double, label int"
    )
    r = brier_decomposition(perfect, "score", "label").collect()[0]
    assert r["brier"] == 0.0
    assert r["uncertainty"] == 0.25
    assert abs(r["resolution"] - 0.25) < 1e-9
    constant = spark.createDataFrame(
        [(0.5, 1)] * 5 + [(0.5, 0)] * 5, "score double, label int"
    )
    r = brier_decomposition(constant, "score", "label").collect()[0]
    assert r["brier"] == 0.25
    assert r["resolution"] == 0.0 and r["reliability"] == 0.0


def test_mwu_cliffs_delta_extremes(spark):
    from nbdatatools_spark.operators.stats import mann_whitney_u

    rows = [("g", "a", float(v)) for v in range(10)] + [
        ("g", "b", float(v) + 100.0) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    r = mann_whitney_u(df, "g", "c", "v").collect()[0]
    assert r["cliffs_delta"] == -1.0  # a completely below b
