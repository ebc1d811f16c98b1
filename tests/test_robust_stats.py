"""Round-6 batch-6 tests: Theil-Sen trend, deterministic bootstrap CI,
linear CKA."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# --- theil-sen ---------------------------------------------------------------


def test_theil_sen_exact_line_and_outlier(spark):
    from nbdatatools_spark.operators.temporal import theil_sen

    # exact line: slope/intercept recovered exactly
    rows = [("a", float(x), 3.0 * x + 7.0) for x in range(20)]
    # same line + one wild outlier: Theil-Sen shrugs, OLS would not
    rows += [("b", float(x), 3.0 * x + 7.0) for x in range(20)]
    rows += [("b", 20.0, 1000.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in theil_sen(df, "g", "x", "y").collect()}
    assert out["a"]["slope"] == 3.0 and out["a"]["intercept"] == 7.0
    assert out["b"]["slope"] == 3.0 and out["b"]["intercept"] == 7.0
    assert out["b"]["n_points"] == 21


def test_theil_sen_numpy_differential(spark):
    from nbdatatools_spark.operators.temporal import theil_sen

    rng = np.random.RandomState(11)
    xs = np.arange(30, dtype=np.float64)
    ys = 1.5 * xs + 4 + rng.randn(30) * 2
    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in zip(xs, ys)], "g string, x double, y double"
    )
    got = theil_sen(df, "g", "x", "y").first()
    slopes = [
        (ys[j] - ys[i]) / (xs[j] - xs[i])
        for i in range(30)
        for j in range(i + 1, 30)
    ]
    want_slope = float(np.percentile(slopes, 50, method="linear"))
    want_int = float(np.percentile(ys - want_slope * xs, 50, method="linear"))
    assert got["slope"] == pytest.approx(want_slope, abs=1e-6)
    assert got["intercept"] == pytest.approx(want_int, abs=1e-6)


# --- bootstrap CI -------------------------------------------------------------


def test_bootstrap_ci_brackets_mean_and_deterministic(spark):
    from nbdatatools_spark.operators.temporal import bootstrap_mean_ci

    rng = np.random.RandomState(5)
    vals = 10 + rng.randn(60)
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    r1 = bootstrap_mean_ci(df, "g", "o", "v", n_boot=100).first()
    assert r1["ci_lo"] <= r1["mean"] <= r1["ci_hi"]
    # CI roughly mean +- 2*sigma/sqrt(n)
    se = vals.std() / np.sqrt(60)
    assert (r1["ci_hi"] - r1["ci_lo"]) < 6 * se
    # partition-invariant determinism
    r2 = bootstrap_mean_ci(df.repartition(13), "g", "o", "v", n_boot=100).first()
    assert (r1["mean"], r1["ci_lo"], r1["ci_hi"]) == (r2["mean"], r2["ci_lo"], r2["ci_hi"])
    # degenerate constant series: zero-width CI at the value
    dfc = spark.createDataFrame([("c", i, 4.0) for i in range(10)], "g string, o int, v double")
    rc = bootstrap_mean_ci(dfc, "g", "o", "v", n_boot=50).first()
    assert rc["mean"] == rc["ci_lo"] == rc["ci_hi"] == 4.0
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "g", "o", "v", alpha=1.5)


def test_bootstrap_python_replica(spark):
    """The md5 draw convention replays exactly in pure Python."""
    import hashlib

    from nbdatatools_spark.operators.temporal import bootstrap_mean_ci

    vals = [float(v) for v in [3, 9, 1, 7, 5]]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, o int, v double"
    )
    got = bootstrap_mean_ci(df, "g", "o", "v", n_boot=40).first()
    means = []
    for b in range(40):
        draw = []
        for i in range(5):
            h = int(hashlib.md5(f"g:{b}:{i}:42".encode()).hexdigest()[:13], 16)
            draw.append(vals[h % 5])
        means.append(sum(draw) / 5)
    lo, hi = np.percentile(means, [2.5, 97.5], method="linear")
    assert got["ci_lo"] == pytest.approx(float(lo), abs=1e-6)
    assert got["ci_hi"] == pytest.approx(float(hi), abs=1e-6)


# --- linear CKA ----------------------------------------------------------------


def test_cka_identity_and_numpy(spark, embeddings):
    from nbdatatools_spark.operators.analysis import linear_cka

    assert linear_cka(embeddings, m=64).first()["cka"] == 1.0
    got = linear_cka(embeddings, m=8).first()
    rows = embeddings.orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Y = X[:, :8]
    Xc, Yc = X - X.mean(0), Y - Y.mean(0)
    cxy = Xc.T @ Yc / len(X)
    cxx = Xc.T @ Xc / len(X)
    cyy = Yc.T @ Yc / len(X)
    want = (cxy ** 2).sum() / np.sqrt((cxx ** 2).sum() * (cyy ** 2).sum())
    assert got["cka"] == pytest.approx(float(want), abs=1e-4)
    assert (got["d"], got["m"], got["n"]) == (64, 8, len(X))


def test_cka_validation(spark, embeddings):
    from nbdatatools_spark.operators.analysis import linear_cka

    with pytest.raises(ValueError):
        linear_cka(embeddings, m=0)
    with pytest.raises(ValueError):
        linear_cka(embeddings, m=65)
