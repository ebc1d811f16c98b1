"""TPE sampler for categorical parameter spaces + Spark-conf auto-tuning.

Re-expresses the reference's benchmark optimizer
(datatools-benchutils/src/main/java/io/nosqlbench/datatools/optimizers/
TpeSampler.java:57-372, JmhTpeOptimizer.java) — itself a faithful port of
Optuna's categorical TPE defaults (Akiba et al. 2019, arXiv:1907.10902;
Bergstra et al. 2011):

- adaptive gamma ``min(ceil(0.1 n), 25)`` for the "good" split
- recency-weighted trials: uniform under 25, then a linear ramp from
  ``1/n`` to 1.0 over the oldest ``n - 25``
- per-observation categorical kernels (+1 on the observed category) mixed
  with a uniform prior kernel of weight ``prior_weight``
- candidates sampled from l(x), scored by ``log l(x) - log g(x)``

The engine-side application is :func:`tune_spark_conf`: search over
categorical Spark conf knobs (shuffle partitions, broadcast threshold, ...)
by timing a caller-supplied query runner — the reference tunes JMH fixture
knobs the same way.
"""

from __future__ import annotations

import math
import random
import time
from dataclasses import dataclass
from typing import Callable, Optional


@dataclass(frozen=True)
class Trial:
    params: dict[str, str]
    score: float


def default_gamma(n: int) -> int:
    """Optuna default: min(ceil(0.1 n), 25) (TpeSampler.java:107-109)."""
    return min(math.ceil(0.1 * n), 25)


def default_weights(n: int) -> list[float]:
    """Uniform below 25 trials; else a linear ramp 1/n → 1.0 over the oldest
    n-25, full weight for the newest 25 (TpeSampler.java:117-139)."""
    if n == 0:
        return []
    if n < 25:
        return [1.0] * n
    ramp_len = n - 25
    if ramp_len == 1:
        w = [1.0 / n]
    else:
        start = 1.0 / n
        step = (1.0 - start) / (ramp_len - 1)
        w = [start + i * step for i in range(ramp_len)]
    return w + [1.0] * 25


class TpeSampler:
    """Categorical TPE (TpeSampler.java:57+). Maximizes the score."""

    def __init__(
        self,
        param_space: dict[str, list[str]],
        gamma_fn: Callable[[int], int] = default_gamma,
        weights_fn: Callable[[int], list[float]] = default_weights,
        prior_weight: float = 1.0,
        n_startup_trials: int = 10,
        n_candidates: int = 24,
        seed: int = 42,
    ):
        self.param_space = {k: list(v) for k, v in param_space.items()}
        self.gamma_fn = gamma_fn
        self.weights_fn = weights_fn
        self.prior_weight = prior_weight
        self.n_startup_trials = n_startup_trials
        self.n_candidates = n_candidates
        self.rng = random.Random(seed)
        self.history: list[Trial] = []

    # --- bookkeeping ------------------------------------------------------
    def add_trial(self, params: dict[str, str], score: float) -> None:
        self.history.append(Trial(dict(params), float(score)))

    def best_trial(self) -> Optional[Trial]:
        return max(self.history, key=lambda t: t.score, default=None)

    def all_trials_sorted(self) -> list[Trial]:
        return sorted(self.history, key=lambda t: t.score, reverse=True)

    def trials_in_order(self) -> list[Trial]:
        return list(self.history)

    def trial_count(self) -> int:
        return len(self.history)

    def space_size(self) -> int:
        size = 1
        for values in self.param_space.values():
            size *= len(values)
        return size

    # --- suggestion -------------------------------------------------------
    def suggest(self) -> Optional[dict[str, str]]:
        """Next configuration to evaluate; None once the space is exhausted
        (TpeSampler.java:156-168: 100 retries then give up)."""
        for _ in range(100):
            candidate = (
                self._random_sample()
                if len(self.history) < self.n_startup_trials
                else self._tpe_sample()
            )
            if not self._is_duplicate(candidate):
                return candidate
        return None

    def _random_sample(self) -> dict[str, str]:
        return {
            k: values[self.rng.randrange(len(values))]
            for k, values in self.param_space.items()
        }

    def _tpe_sample(self) -> dict[str, str]:
        if not self.history:
            return self._random_sample()
        sorted_trials = sorted(self.history, key=lambda t: t.score, reverse=True)
        n = len(sorted_trials)
        n_below = max(1, min(self.gamma_fn(n), n - 1))
        below, above = sorted_trials[:n_below], sorted_trials[n_below:]

        below_mix = self._mixture_weights(self.weights_fn(n_below))
        above_mix = self._mixture_weights(self.weights_fn(n - n_below))

        names = list(self.param_space)
        below_kernels = [self._kernels(below, p, self.param_space[p]) for p in names]
        above_kernels = [self._kernels(above, p, self.param_space[p]) for p in names]

        best, best_log_ratio = None, float("-inf")
        for _ in range(self.n_candidates):
            candidate: dict[str, str] = {}
            log_ratio = 0.0
            for p, param in enumerate(names):
                values = self.param_space[param]
                idx = self._sample_mixture(below_kernels[p], below_mix)
                candidate[param] = values[idx]
                log_ratio += self._mixture_log_pdf(
                    below_kernels[p], below_mix, idx
                ) - self._mixture_log_pdf(above_kernels[p], above_mix, idx)
            if not self._is_duplicate(candidate) and log_ratio > best_log_ratio:
                best, best_log_ratio = candidate, log_ratio
        return best if best is not None else self._random_sample()

    def _kernels(self, trials: list[Trial], param: str, values: list[str]) -> list[list[float]]:
        """n_obs+1 row-normalized categorical kernels: prior fill
        prior_weight/n_kernels everywhere, +1 on each trial's observed
        category; last row is the pure prior (TpeSampler.java:278-315)."""
        n_kernels = len(trials) + 1
        fill = self.prior_weight / n_kernels
        kernels = [[fill] * len(values) for _ in range(n_kernels)]
        for i, t in enumerate(trials):
            val = t.params.get(param)
            if val in values:
                kernels[i][values.index(val)] += 1.0
        for row in kernels:
            s = sum(row)
            if s > 0:
                for j in range(len(row)):
                    row[j] /= s
        return kernels

    def _mixture_weights(self, trial_weights: list[float]) -> list[float]:
        mix = list(trial_weights) + [self.prior_weight]
        s = sum(mix)
        return [w / s for w in mix]

    def _sample_mixture(self, kernels: list[list[float]], mix: list[float]) -> int:
        return self._sample_categorical(kernels[self._sample_categorical(mix)])

    @staticmethod
    def _mixture_log_pdf(kernels: list[list[float]], mix: list[float], idx: int) -> float:
        pdf = sum(w * k[idx] for w, k in zip(mix, kernels))
        return math.log(max(pdf, 1e-300))

    def _sample_categorical(self, probs: list[float]) -> int:
        r = self.rng.random()
        cumulative = 0.0
        for i, p in enumerate(probs):
            cumulative += p
            if r <= cumulative:
                return i
        return len(probs) - 1

    def _is_duplicate(self, candidate: dict[str, str]) -> bool:
        return any(t.params == candidate for t in self.history)


def tune_spark_conf(
    spark,
    run_query: Callable[[], None],
    param_space: dict[str, list[str]],
    n_trials: int = 20,
    seed: int = 42,
    repeats: int = 1,
) -> tuple[dict[str, str], list[Trial]]:
    """Search Spark conf knobs with TPE, timing ``run_query`` under each
    configuration (the engine analogue of JmhTpeOptimizer tuning JMH fixture
    knobs). Score = negative median wall seconds, so best = fastest.

    Only session-settable confs belong in ``param_space`` (e.g.
    ``spark.sql.shuffle.partitions``, ``spark.sql.autoBroadcastJoinThreshold``,
    ``spark.sql.files.maxPartitionBytes``); prior values are restored after
    the search.
    """
    sampler = TpeSampler(param_space, seed=seed)
    saved = {k: spark.conf.get(k, None) for k in param_space}
    try:
        for _ in range(min(n_trials, sampler.space_size())):
            params = sampler.suggest()
            if params is None:
                break
            for k, v in params.items():
                spark.conf.set(k, v)
            times = []
            for _ in range(repeats):
                t0 = time.time()
                run_query()
                times.append(time.time() - t0)
            times.sort()
            sampler.add_trial(params, -times[len(times) // 2])
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    best = sampler.best_trial()
    return (best.params if best else {}), sampler.trials_in_order()
