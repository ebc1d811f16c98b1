"""Tests for the full model-extraction pipeline (A4): special functions vs
closed forms, candidate selection on synthetic data of known distribution,
composite/multimodal detection, empirical fallback, Q-Q correlation."""

import math

import numpy as np
import pytest

from nbdatatools_spark.operators.fitting import (
    _betainc,
    _detect_modes,
    _fit_candidate,
    _gammainc_lower,
    _norm_cdf,
    _student_t_cdf,
    fit_model,
)

RNG = np.random.default_rng(42)


# --- special functions ----------------------------------------------------

def test_gammainc_known_values():
    # P(1, x) = 1 - e^-x
    for x in [0.1, 1.0, 2.5, 10.0]:
        assert _gammainc_lower(1.0, x) == pytest.approx(1 - math.exp(-x), abs=1e-10)
    # P(a, 0) = 0; P large-x -> 1
    assert _gammainc_lower(3.0, 0.0) == 0.0
    assert _gammainc_lower(3.0, 100.0) == pytest.approx(1.0, abs=1e-12)
    # chi-square(k=2) median: P(1, 0.6931) = 0.5
    assert _gammainc_lower(1.0, math.log(2)) == pytest.approx(0.5, abs=1e-10)


def test_betainc_known_values():
    # I_x(1,1) = x (uniform)
    for x in [0.0, 0.25, 0.5, 0.9, 1.0]:
        assert _betainc(1.0, 1.0, x) == pytest.approx(x, abs=1e-12)
    # symmetry: I_x(a,b) = 1 - I_{1-x}(b,a)
    assert _betainc(2.0, 5.0, 0.3) == pytest.approx(1 - _betainc(5.0, 2.0, 0.7), abs=1e-12)
    # I_0.5(a,a) = 0.5 by symmetry
    assert _betainc(3.7, 3.7, 0.5) == pytest.approx(0.5, abs=1e-12)


def test_student_t_cdf_limits():
    # t with large df -> normal
    assert _student_t_cdf(1.96, 1e6) == pytest.approx(_norm_cdf(1.96), abs=1e-4)
    assert _student_t_cdf(0.0, 5.0) == pytest.approx(0.5, abs=1e-12)
    # t(df=1) is Cauchy: CDF(1) = 3/4
    assert _student_t_cdf(1.0, 1.0) == pytest.approx(0.75, abs=1e-9)


# --- candidate gating -----------------------------------------------------

def test_candidate_support_constraints():
    stats = {"mean": -1.0, "variance": 1.0, "min": -5.0, "max": 2.0, "kurtosis": 0.5}
    assert _fit_candidate("gamma", stats) is None  # negative support
    assert _fit_candidate("inverse_gamma", stats) is None
    assert _fit_candidate("beta_prime", stats) is None
    assert _fit_candidate("uniform", stats) is not None
    assert _fit_candidate("normal", stats) is not None


def test_mode_detection_unimodal_vs_bimodal():
    ps = np.linspace(0, 1, 512)
    uni = np.quantile(RNG.normal(0, 1, 20000), ps)
    bi = np.quantile(
        np.concatenate([RNG.normal(-4, 0.5, 10000), RNG.normal(4, 0.5, 10000)]), ps
    )
    assert _detect_modes(uni, ps) == 1
    assert _detect_modes(bi, ps) >= 2


# --- end-to-end selection on Spark ---------------------------------------

def _vec_df(spark, cols):
    """cols: list of 1-d numpy arrays, one per dimension (equal length)."""
    mat = np.stack(cols, axis=1)
    rows = [(i, [float(v) for v in mat[i]]) for i in range(mat.shape[0])]
    return spark.createDataFrame(rows, "ordinal BIGINT, vector ARRAY<DOUBLE>")


def test_fit_model_selects_known_distributions(spark):
    n = 8000
    df = _vec_df(
        spark,
        [
            RNG.normal(5.0, 2.0, n),  # dim 0: normal
            RNG.uniform(-1.0, 1.0, n),  # dim 1: uniform
            RNG.gamma(2.0, 3.0, n),  # dim 2: gamma-ish (right-skewed)
        ],
    )
    rows = {r["dim"]: r for r in fit_model(df).collect()}
    assert rows[0]["best_fit"] == "normal" and rows[0]["fit_grade"] == "strong"
    assert rows[1]["best_fit"] == "uniform" and rows[1]["fit_grade"] == "strong"
    # right-skewed positive data must pick a gamma-family candidate, strongly
    assert rows[2]["best_fit"] in ("gamma", "beta", "beta_prime")
    assert rows[2]["ks_stat"] <= 0.03
    for d in (0, 1, 2):
        assert rows[d]["model_type"] == "parametric"
        assert rows[d]["qq_correlation"] > 0.99


def test_fit_model_composite_on_bimodal(spark):
    n = 6000
    bimodal = np.concatenate([RNG.normal(-6, 0.7, n // 2), RNG.normal(6, 0.7, n // 2)])
    RNG.shuffle(bimodal)
    df = _vec_df(spark, [bimodal])
    row = fit_model(df).collect()[0]
    assert row["n_modes"] >= 2
    assert row["model_type"] == "composite"
    assert row["ks_stat"] <= 0.10
    # component means near -6 and +6
    import json

    comps = sorted(json.loads(row["params"])["components"], key=lambda c: c["mean"])
    assert comps[0]["mean"] == pytest.approx(-6, abs=1.0)
    assert comps[-1]["mean"] == pytest.approx(6, abs=1.0)


def test_fit_model_empirical_fallback(spark):
    # adversarial: discrete 4-atom distribution with unequal gaps — no
    # smooth parametric or 3-Gaussian composite clears 0.10
    atoms = np.array([0.0, 0.001, 7.0, 7.002, 50.0, 50.001, 51.0, 90.0])
    data = np.tile(atoms, 1000) + RNG.normal(0, 1e-6, 8000)
    df = _vec_df(spark, [data])
    row = fit_model(df).collect()[0]
    assert row["model_type"] in ("empirical", "composite")
    if row["model_type"] == "empirical":
        assert row["best_fit"] == "empirical"


def test_fit_model_student_t_heavy_tails(spark):
    data = RNG.standard_t(5.0, 12000)
    df = _vec_df(spark, [data])
    row = fit_model(df).collect()[0]
    # heavy-tailed symmetric: student_t must beat normal on K-S
    assert row["ks_student_t"] is not None
    assert row["ks_student_t"] < row["ks_normal"]
    assert row["fit_grade"] in ("strong", "acceptable")
