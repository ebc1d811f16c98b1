"""TPE sampler conformance (TpeSamplerTest.java, TpeSamplerCornerCaseTest.java)
and the Spark-conf tuning harness."""

import math

import pytest

from nbdatatools_spark.tuning import TpeSampler, default_gamma, default_weights, tune_spark_conf


def test_default_gamma_matches_optuna_formula():
    # min(ceil(0.1 n), 25) — TpeSamplerTest.defaultGamma_matchesOptunaFormula
    assert [default_gamma(n) for n in (1, 5, 10, 11, 100, 250, 260, 1000)] == [
        1, 1, 1, 2, 10, 25, 25, 25,
    ]


def test_default_gamma_ceil_boundary():
    assert default_gamma(10) == 1 and default_gamma(11) == 2
    assert default_gamma(20) == 2 and default_gamma(21) == 3


def test_default_weights_shapes():
    assert default_weights(0) == []
    for n in (1, 10, 24):
        assert default_weights(n) == [1.0] * n
    # n=25 -> rampLen=0: all ones
    assert default_weights(25) == [1.0] * 25
    # n=26 -> rampLen=1: single ramp entry 1/26
    w = default_weights(26)
    assert w[0] == pytest.approx(1 / 26) and w[1:] == [1.0] * 25


@pytest.mark.parametrize("n,ramp_len", [(30, 5), (50, 25)])
def test_default_weights_ramp_matches_linspace(n, ramp_len):
    w = default_weights(n)
    assert len(w) == n
    start, step = 1.0 / n, (1.0 - 1.0 / n) / (ramp_len - 1)
    for i in range(ramp_len):
        assert w[i] == pytest.approx(start + i * step, abs=1e-12)
    assert w[ramp_len:] == [1.0] * 25
    assert all(b > a for a, b in zip(w[:ramp_len], w[1:ramp_len]))


def test_startup_random_within_space_and_deterministic():
    space = {"a": ["1", "2", "3"], "b": ["x", "y"]}
    s1 = TpeSampler(space, seed=7)
    s2 = TpeSampler(space, seed=7)
    s3 = TpeSampler(space, seed=8)
    seq1 = [s1.suggest() for _ in range(5)]
    seq2 = [s2.suggest() for _ in range(5)]
    seq3 = [s3.suggest() for _ in range(5)]
    for cand in seq1:
        assert cand["a"] in space["a"] and cand["b"] in space["b"]
    assert seq1 == seq2
    assert seq1 != seq3  # overwhelmingly likely for 5 draws over 6 configs


def test_duplicate_avoidance_and_exhaustion():
    space = {"a": ["1", "2"], "b": ["x", "y"]}
    s = TpeSampler(space, n_startup_trials=2, seed=3)
    seen = []
    for _ in range(4):
        c = s.suggest()
        assert c is not None and c not in seen
        seen.append(c)
        s.add_trial(c, 0.0)
    assert s.suggest() is None  # space of 4 fully explored
    assert s.space_size() == 4


def test_best_and_sorted_trials():
    s = TpeSampler({"a": ["1", "2", "3"]})
    assert s.best_trial() is None
    s.add_trial({"a": "1"}, 0.5)
    s.add_trial({"a": "2"}, 0.9)
    s.add_trial({"a": "3"}, 0.1)
    assert s.best_trial().params == {"a": "2"}
    assert [t.score for t in s.all_trials_sorted()] == [0.9, 0.5, 0.1]
    assert [t.params["a"] for t in s.trials_in_order()] == ["1", "2", "3"]
    assert s.trial_count() == 3


def test_tpe_convergence_prefers_high_scoring_region():
    """TpeSamplerTest.tpeConvergence_multiParam_findsOptimumRegion: after
    startup, suggestions should concentrate on the best value."""
    # space big enough (4*2*6=48) that duplicate avoidance doesn't exhaust it
    space = {"x": ["A", "B", "C", "D"], "y": ["p", "q"], "z": [str(i) for i in range(6)]}
    score = {"A": 0.1, "B": 0.2, "C": 0.9, "D": 0.15}
    s = TpeSampler(space, n_startup_trials=8, seed=42)
    for _ in range(40):
        c = s.suggest()
        if c is None:
            break
        s.add_trial(c, score[c["x"]] + (0.05 if c["y"] == "q" else 0.0))
    # once modeled, "C" should be over-sampled vs the uniform share (1/4) —
    # duplicate avoidance caps outright domination (only 12 configs have x=C)
    post = [t for t in s.trials_in_order()[8:]]
    counts = {v: sum(1 for t in post if t.params["x"] == v) for v in space["x"]}
    frac_c = counts["C"] / max(len(post), 1)
    assert frac_c >= 0.3, f"TPE did not concentrate on optimum: {counts}"
    assert counts["C"] == max(counts.values())
    assert s.best_trial().params["x"] == "C"


def test_tpe_outperforms_random_search():
    """TpeSamplerTest.tpeConvergence_outperformsRandomSearch (relaxed to a
    deterministic seed pair): mean post-startup score beats pure random."""
    import random as _random

    space = {"x": [str(i) for i in range(10)], "y": [str(i) for i in range(10)]}

    def score(c):
        return -(abs(int(c["x"]) - 7) + abs(int(c["y"]) - 3)) / 10.0  # optimum (7,3)

    s = TpeSampler(space, n_startup_trials=5, seed=11)
    tpe_scores = []
    for _ in range(30):
        c = s.suggest()
        if c is None:
            break
        v = score(c)
        s.add_trial(c, v)
        tpe_scores.append(v)

    rng = _random.Random(11)
    rnd_scores = [
        score({"x": str(rng.randrange(10)), "y": str(rng.randrange(10))})
        for _ in range(len(tpe_scores))
    ]
    assert sum(tpe_scores[5:]) / len(tpe_scores[5:]) > sum(rnd_scores[5:]) / len(rnd_scores[5:])


def test_kernel_prior_mixture_normalized():
    s = TpeSampler({"a": ["1", "2", "3"]}, prior_weight=1.0)
    s.add_trial({"a": "1"}, 1.0)
    s.add_trial({"a": "1"}, 0.9)
    s.add_trial({"a": "3"}, 0.1)
    kernels = s._kernels(s.trials_in_order(), "a", ["1", "2", "3"])
    assert len(kernels) == 4  # 3 obs + prior
    for row in kernels:
        assert math.isclose(sum(row), 1.0, abs_tol=1e-12)
    # observed category dominates its kernel row
    assert kernels[0][0] > kernels[0][1] and kernels[2][2] > kernels[2][0]
    # prior row is uniform
    assert kernels[3][0] == kernels[3][1] == kernels[3][2]


def test_tune_spark_conf_restores_and_returns_best(spark):
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    best, trials = tune_spark_conf(
        spark,
        lambda: spark.range(1000).selectExpr("id % 7 k").groupBy("k").count().count(),
        {"spark.sql.shuffle.partitions": ["4", "8"]},
        n_trials=2,
        seed=1,
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prior
    assert best["spark.sql.shuffle.partitions"] in ("4", "8")
    assert len(trials) == 2 and all(t.score <= 0 for t in trials)
