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
    with pytest.raises(ValueError):
        linear_cka(embeddings, m=8, impl="nope")


def test_cka_gemm_matches_expr_exactly(spark, embeddings):
    """VERDICT r6 #3: the gemm default must be BIT-identical to the
    dim-pair expr path (the oracle contract) — the int64-scaled product
    sums replay the DECIMAL discipline exactly, not approximately."""
    from nbdatatools_spark.operators.analysis import linear_cka

    for m in (3, 8, 64):
        g = linear_cka(embeddings, m=m, impl="gemm").first()
        e = linear_cka(embeddings, m=m, impl="expr").first()
        assert tuple(g) == tuple(e)
    # auto routes d=64 through gemm (no n*d^2 Catalyst self-join)
    plan = (
        linear_cka(embeddings, m=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan and "Generate" not in plan


# --- dp counts / rollup (batch 7) ---------------------------------------------


def test_dp_counts_mechanism(spark):
    import hashlib
    import math

    from nbdatatools_spark.operators.analysis import dp_counts

    df = spark.createDataFrame(
        [(i, "a" if i < 70 else "b") for i in range(100)], "i long, g string"
    )
    out = {
        r["g"]: r
        for r in dp_counts(df, "g", epsilon=1.0, seed=42, audit=True).collect()
    }
    assert out["a"]["true_count"] == 70 and out["b"]["true_count"] == 30
    # replay the deterministic Laplace draw in pure python
    for g, n in (("a", 70), ("b", 30)):
        h = int(hashlib.md5(f"{g}:42".encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / float(1 << 52) - 0.5
        noise = -1.0 * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u))
        assert out[g]["noisy_count"] == pytest.approx(n + noise, abs=1e-6)
        assert out[g]["abs_error"] == pytest.approx(abs(noise), abs=1e-6)
    # determinism across partitionings (same explicit seed)
    out2 = {
        r["g"]: r["noisy_count"]
        for r in dp_counts(df.repartition(7), "g", seed=42).collect()
    }
    assert out2 == {g: r["noisy_count"] for g, r in out.items()}
    with pytest.raises(ValueError):
        dp_counts(df, "g", epsilon=0)


def test_dp_counts_release_shape_and_secret_seed(spark):
    """ADVICE r6: the default output is the release shape — noisy_count
    only, with a fresh secret seed per release (two default-seed calls
    must not reproduce each other's noise)."""
    from nbdatatools_spark.operators.analysis import dp_counts

    df = spark.createDataFrame(
        [(i, "a" if i < 70 else "b") for i in range(100)], "i long, g string"
    )
    rel = dp_counts(df, "g", epsilon=0.5)
    assert rel.columns == ["g", "noisy_count"]
    r1 = {r["g"]: r["noisy_count"] for r in rel.collect()}
    r2 = {r["g"]: r["noisy_count"] for r in dp_counts(df, "g", epsilon=0.5).collect()}
    assert r1 != r2  # fresh urandom seed each release (P[collision] ~ 2^-64)


def test_dp_counts_error_scales_with_epsilon(spark):
    from nbdatatools_spark.operators.analysis import dp_counts

    df = spark.createDataFrame([(i, f"g{i%20}") for i in range(200)], "i long, g string")
    e1 = sum(
        r["abs_error"]
        for r in dp_counts(df, "g", epsilon=1.0, seed=42, audit=True).collect()
    )
    e10 = sum(
        r["abs_error"]
        for r in dp_counts(df, "g", epsilon=10.0, seed=42, audit=True).collect()
    )
    assert e10 == pytest.approx(e1 / 10.0, rel=1e-6)  # error ~ 1/eps exactly


def test_rollup_revenue_consistency(spark, sf_dir):
    import __spark_entry__ as e

    out = e.orders_rollup_revenue(spark, sf_dir).collect()
    detail = [r for r in out if r["gid"] == 0]
    subtotal = {r["o_orderpriority"]: r for r in out if r["gid"] == 1}
    grand = [r for r in out if r["gid"] == 3]
    assert len(grand) == 1
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in detail)
    for p, s in subtotal.items():
        rows = [r for r in detail if r["o_orderpriority"] == p]
        assert s["n_orders"] == sum(r["n_orders"] for r in rows)
        assert s["revenue"] == pytest.approx(sum(r["revenue"] for r in rows), abs=0.01)


# --- privacy gates (batch 7b) --------------------------------------------------


def test_k_anonymity_risky_groups(spark):
    from nbdatatools_spark.operators.quality_checks import k_anonymity

    rows = [("a", 1)] * 10 + [("a", 2)] * 3 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "g string, v int")
    out = {(r["g"], r["v"]): r["n"] for r in k_anonymity(df, ["g", "v"], k=5).collect()}
    assert out == {("a", 2): 3, ("b", 1): 1}
    # k-anonymous release -> empty result
    assert k_anonymity(df.where("g = 'a' and v = 1"), ["g", "v"], k=5).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_anonymity(df, ["g"], k=1)


def test_pii_redaction_and_counts(spark):
    from nbdatatools_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (0, "mail me at a.b+c@test.org or x@y.io thanks"),
            (1, "server 10.0.0.1 and 255.255.255.255 up"),
            (2, "call 555-123-4567 or (044) 1234-5678"),
            (3, "plain text, no pii at all"),
            (4, "ip 192.168.1.1 is not a phone"),
        ],
        "i long, t string",
    )
    rows = {
        r["i"]: r
        for r in df.select(
            "i", pii_counts(F.col("t")).alias("c"), redact_pii(F.col("t")).alias("red")
        )
        .select("i", "c.*", "red")
        .collect()
    }
    assert rows[0]["n_emails"] == 2 and "[EMAIL]" in rows[0]["red"]
    assert "@" not in rows[0]["red"]
    assert rows[1]["n_ips"] == 2 and rows[1]["n_phones"] == 0
    assert rows[2]["n_phones"] == 2 and "[PHONE]" in rows[2]["red"]
    assert rows[3]["n_emails"] == rows[3]["n_phones"] == rows[3]["n_ips"] == 0
    assert rows[3]["red"] == "plain text, no pii at all"
    # the IP-before-phone ordering: dotted quad never counted as phone
    assert rows[4]["n_ips"] == 1 and rows[4]["n_phones"] == 0
