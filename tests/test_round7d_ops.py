"""Round-7 batch-4 operator closed-forms: grouped AUC, isotonic (PAV)
calibration."""

import pytest
from pyspark.sql import functions as F


def _pav(values, weights):
    """Reference pool-adjacent-violators (sequential pooling); returns
    the fitted value at each original position."""
    blocks = [[v, w, 1] for v, w in zip(values, weights)]  # value, weight, size
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
    out = []
    for v, _, s in blocks:
        out.extend([v] * s)
    return out


def test_pav_reference_sanity():
    assert _pav([1, 2, 3], [1, 1, 1]) == [1, 2, 3]
    got = _pav([3, 1], [1, 1])
    assert got == [2.0, 2.0]
    got = _pav([1, 3, 2], [1, 1, 1])
    assert got == [1, 2.5, 2.5]


def test_isotonic_calibration_matches_pav(spark):
    from nbdatatools_spark.operators.evaluation import isotonic_calibration

    # craft scores with a calibration dip: bins 0..4 rates .1 .5 .3 .4 .9
    rates = [0.1, 0.5, 0.3, 0.4, 0.9]
    rows = []
    for b, r in enumerate(rates):
        c = 20
        npos = int(r * c)
        s = (b + 0.5) / 5
        rows += [(s, True)] * npos + [(s, False)] * (c - npos)
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = isotonic_calibration(df, "score", "y", n_bins=5).collect()
    want = _pav(rates, [20] * 5)
    got = [r["isotonic_rate"] for r in out]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-6)
    # monotone non-decreasing by construction
    assert all(a <= b + 1e-9 for a, b in zip(got, got[1:]))
    # raw rates preserved
    for r, want_rate in zip(out, rates):
        assert r["positive_rate"] == pytest.approx(want_rate, abs=1e-6)
        assert r["n"] == 20
    with pytest.raises(ValueError):
        isotonic_calibration(df, "score", "y", n_bins=1)
    with pytest.raises(ValueError):
        isotonic_calibration(df, "score", "y", lo=1.0, hi=0.0)


def test_isotonic_weighted_pooling(spark):
    from nbdatatools_spark.operators.evaluation import isotonic_calibration

    # unequal bin weights: bin0 (n=30, rate .6), bin1 (n=10, rate .2)
    # pooled value = (18 + 2) / 40 = 0.5 for both
    rows = (
        [(0.05, True)] * 18 + [(0.05, False)] * 12
        + [(0.15, True)] * 2 + [(0.15, False)] * 8
        + [(0.95, True)] * 10
    )
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = {r["bin"]: r for r in
           isotonic_calibration(df, "score", "y", n_bins=10).collect()}
    assert out[0]["isotonic_rate"] == pytest.approx(0.5, abs=1e-6)
    assert out[1]["isotonic_rate"] == pytest.approx(0.5, abs=1e-6)
    assert out[9]["isotonic_rate"] == pytest.approx(1.0, abs=1e-6)


def test_isotonic_already_monotone_is_identity(spark):
    from nbdatatools_spark.operators.evaluation import isotonic_calibration

    rows = (
        [(0.1, False)] * 9 + [(0.1, True)]
        + [(0.5, True)] * 5 + [(0.5, False)] * 5
        + [(0.9, True)] * 9 + [(0.9, False)]
    )
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = isotonic_calibration(df, "score", "y", n_bins=10).collect()
    for r in out:
        assert r["isotonic_rate"] == pytest.approx(
            r["positive_rate"], abs=1e-6
        )


def test_grouped_auc_matches_global_per_group(spark, documents):
    from nbdatatools_spark.operators.evaluation import (
        grouped_ranking_auc,
        ranking_auc,
    )
    from nbdatatools_spark.functions.text import quality_score

    scored = documents.select(
        "source",
        F.round(quality_score(F.col("text")), 6).alias("score"),
        (F.col("n_chars") >= 400).alias("y"),
    )
    per = {
        r["source"]: r
        for r in grouped_ranking_auc(scored, "score", "y", "source").collect()
    }
    srcs = sorted(per)[:3]
    for s in srcs:
        ref = ranking_auc(scored.where(F.col("source") == s), "score", "y").first()
        assert per[s]["n_pos"] == ref["n_pos"]
        assert per[s]["n_neg"] == ref["n_neg"]
        if ref["n_pos"] > 0 and ref["n_neg"] > 0:
            assert per[s]["auc"] == pytest.approx(ref["auc"], abs=1e-6)


def test_grouped_auc_degenerate_and_invariance(spark):
    from nbdatatools_spark.operators.evaluation import grouped_ranking_auc

    rows = (
        [("g1", 0.9, True), ("g1", 0.1, False), ("g1", 0.8, True)]
        + [("g2", 0.5, True), ("g2", 0.6, True)]  # all-positive
    )
    df = spark.createDataFrame(rows, "g string, score double, y boolean")
    out = {r["g"]: r for r in
           grouped_ranking_auc(df, "score", "y", "g").collect()}
    assert out["g1"]["auc"] == pytest.approx(1.0, abs=1e-6)
    assert out["g2"]["auc"] is None
    a = grouped_ranking_auc(df, "score", "y", "g").collect()
    b = grouped_ranking_auc(df.repartition(7), "score", "y", "g").collect()
    assert a == b
