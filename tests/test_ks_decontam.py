"""Round-8 batch 5: two-sample KS differential and semantic
decontamination tests."""

import bisect
import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.stats import ks_two_sample


def _ref_ks(a, b):
    xs = sorted(set(a + b))
    sa, sb = sorted(a), sorted(b)
    d = max(
        abs(
            bisect.bisect_right(sa, x) / len(a)
            - bisect.bisect_right(sb, x) / len(b)
        )
        for x in xs
    )
    lam = d * math.sqrt(len(a) * len(b) / (len(a) + len(b)))
    p = 2 * sum(
        (-1) ** (k - 1) * math.exp(-2 * k * k * lam * lam)
        for k in range(1, 101)
    )
    return d, min(max(p, 0.0), 1.0)


def test_ks_two_sample_differential(spark):
    import random

    rnd = random.Random(5)
    a = [rnd.gauss(0, 1) for _ in range(300)]
    b = [rnd.gauss(0.5, 1.2) for _ in range(250)]
    rows = [("g", "a", v) for v in a] + [("g", "b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    r = ks_two_sample(df, "g", "c", "v").collect()[0]
    d, p = _ref_ks(a, b)
    assert abs(r["d_stat"] - round(d, 6)) < 1e-9
    assert abs(r["p_value"] - round(p, 4)) < 1e-9
    assert (r["n_a"], r["n_b"]) == (300, 250)


def test_ks_two_sample_with_heavy_ties(spark):
    import random

    rnd = random.Random(9)
    a = [float(rnd.randint(0, 8)) for _ in range(200)]
    b = [float(rnd.randint(2, 10)) for _ in range(180)]
    rows = [("g", "a", v) for v in a] + [("g", "b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    r = ks_two_sample(df, "g", "c", "v").collect()[0]
    d, p = _ref_ks(a, b)
    assert abs(r["d_stat"] - round(d, 6)) < 1e-9
    assert abs(r["p_value"] - round(p, 4)) < 1e-9


def test_ks_identical_samples(spark):
    vals = [float(v % 17) for v in range(200)]
    rows = [("g", "a", v) for v in vals] + [("g", "b", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    r = ks_two_sample(df, "g", "c", "v").collect()[0]
    assert r["d_stat"] == 0.0
    assert r["p_value"] == 1.0


def test_ks_partition_invariant(spark):
    import random

    rnd = random.Random(3)
    rows = [
        (f"g{i % 3}", "ab"[i % 2], float(rnd.randint(0, 30)))
        for i in range(900)
    ]
    df = spark.createDataFrame(rows, "g string, c string, v double")
    one = [tuple(r) for r in ks_two_sample(df.coalesce(1), "g", "c", "v").collect()]
    many = [tuple(r) for r in ks_two_sample(df.repartition(17), "g", "c", "v").collect()]
    assert one == many


def test_semantic_decontaminate_planted(spark, embeddings):
    from nbdatatools_spark.operators.dedup import semantic_decontaminate

    train = embeddings.where(F.col("vec_id") < 200)
    leaked = train.where(F.col("vec_id") % 5 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(900000)
    )
    got = semantic_decontaminate(train, leaked, threshold=0.999).collect()
    # every planted copy is found against its source with cosine 1.0
    exact = {
        (r["train_id"], r["test_id"])
        for r in got
        if r["cosine_sim"] >= 0.999999
    }
    expect = {
        (i, i + 900000)
        for i in range(0, 200, 5)
    }
    assert expect <= exact


def test_semantic_decontaminate_no_leakage_empty(spark):
    from nbdatatools_spark.operators.dedup import semantic_decontaminate

    tr = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    te = spark.createDataFrame(
        [(10, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    assert semantic_decontaminate(tr, te, threshold=0.9).count() == 0


def test_semantic_decontaminate_lsh_agrees_on_plants(spark, embeddings):
    from nbdatatools_spark.operators.dedup import semantic_decontaminate

    train = embeddings.where(F.col("vec_id") < 100)
    leaked = train.where(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(900000)
    )
    bc = semantic_decontaminate(train, leaked, threshold=0.999)
    lsh = semantic_decontaminate(train, leaked, threshold=0.999, method="lsh")
    bset = {(r["train_id"], r["test_id"]) for r in bc.collect()}
    lset = {(int(r["train_id"]), int(r["test_id"])) for r in lsh.collect()}
    # LSH is a recall-<=1 blocking of the exact result; identical copies
    # collide in every hyperplane table, so the planted pairs all appear
    expect = {(i, i + 900000) for i in range(0, 100, 10)}
    assert expect <= lset
    assert lset <= bset


def test_mcnemar_differential(spark):
    from nbdatatools_spark.operators.evaluation import mcnemar_test

    import random

    rnd = random.Random(41)
    rows = [(rnd.random() < 0.5, rnd.random() < 0.4) for _ in range(300)]
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = mcnemar_test(df, "a", "b").collect()[0]
    b = sum(1 for x, y in rows if x and not y)
    c = sum(1 for x, y in rows if not x and y)
    chi2 = (abs(b - c) - 1) ** 2 / (b + c)
    assert (r["n10"], r["n01"]) == (b, c)
    assert abs(r["chi2"] - chi2) < 1e-6
    # p via erf identity
    p = 1 - math.erf(math.sqrt(chi2 / 2))
    assert abs(r["p_value"] - p) < 5e-4


def test_mcnemar_no_disagreement_null(spark):
    from nbdatatools_spark.operators.evaluation import mcnemar_test

    df = spark.createDataFrame(
        [(True, True)] * 5 + [(False, False)] * 5, "a boolean, b boolean"
    )
    r = mcnemar_test(df, "a", "b").collect()[0]
    assert r["chi2"] is None and r["p_value"] is None


def test_spearman_fisher_ci(spark):
    from nbdatatools_spark.operators.stats import spearman_corr

    import random

    rnd = random.Random(43)
    rows = [("g", float(i), float(i) + rnd.gauss(0, 20)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = spearman_corr(df, "g", "x", "y").collect()[0]
    assert r["ci_lo"] < r["rho"] < r["ci_hi"]
    z = math.atanh(r["rho"])
    se = 1.959964 / math.sqrt(100 - 3)
    assert abs(r["ci_lo"] - math.tanh(z - se)) < 5e-4
    assert abs(r["ci_hi"] - math.tanh(z + se)) < 5e-4
    # perfect correlation: CI undefined (|rho| = 1)
    rows = [("g", float(i), float(2 * i)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = spearman_corr(df, "g", "x", "y").collect()[0]
    assert r["rho"] == 1.0 and r["ci_lo"] is None and r["ci_hi"] is None


def test_concordance_ccc_closed_forms(spark):
    from nbdatatools_spark.operators.stats import concordance_ccc

    # identical scorers: CCC = r = 1, Cb = 1
    rows = [("g", float(i), float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = concordance_ccc(df, "g", "x", "y").collect()[0]
    assert r["ccc"] == 1.0 and r["r"] == 1.0 and r["c_b"] == 1.0
    # perfectly correlated but biased: r = 1, CCC < 1
    rows = [("g", float(i), float(i) + 10.0) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = concordance_ccc(df, "g", "x", "y").collect()[0]
    assert r["r"] == 1.0 and r["ccc"] < 0.5
    assert abs(r["c_b"] - r["ccc"]) < 1e-9  # Cb = CCC/r with r = 1


def test_concordance_ccc_numpy_differential(spark):
    import numpy as np
    from nbdatatools_spark.operators.stats import concordance_ccc

    rng = np.random.RandomState(19)
    x = rng.rand(200)
    y = 0.8 * x + 0.1 + rng.rand(200) * 0.05
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(x, y)],
        "g string, x double, y double",
    )
    r = concordance_ccc(df, "g", "x", "y").collect()[0]
    vx, vy = x.var(), y.var()
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    ccc = 2 * cxy / (vx + vy + (x.mean() - y.mean()) ** 2)
    assert abs(r["ccc"] - ccc) < 1e-5
    assert abs(r["r"] - cxy / math.sqrt(vx * vy)) < 1e-5


def test_agreement_limits_closed_forms(spark):
    from nbdatatools_spark.operators.stats import agreement_limits

    import statistics

    diffs = [0.1, -0.2, 0.3, 0.0, 0.15, -0.05]
    rows = [("g", float(i), float(i) + d) for i, d in enumerate(diffs)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = agreement_limits(df, "g", "x", "y").collect()[0]
    bias = sum(diffs) / len(diffs)
    sd = statistics.pstdev(diffs)
    assert abs(r["bias"] - bias) < 1e-6
    assert abs(r["sd_diff"] - sd) < 1e-6
    assert abs(r["loa_lo"] - (bias - 1.959964 * sd)) < 1e-5
    assert abs(r["loa_hi"] - (bias + 1.959964 * sd)) < 1e-5
    # single row: sd-dependent columns NULL
    one = spark.createDataFrame([("g", 1.0, 2.0)], "g string, x double, y double")
    r = agreement_limits(one, "g", "x", "y").collect()[0]
    assert r["bias"] == 1.0 and r["sd_diff"] is None and r["loa_lo"] is None
