"""Distance kernels as native Catalyst column expressions.

Semantics follow the reference's ``DistanceFunction`` enum
(datatools-testdata-apis/.../types/DistanceFunction.java:22-33 for the metric
set; :220-248 cosine, :281-305 euclidean, :307-329 manhattan, :197-218
dot-product). Implementations are pure ``pyspark.sql.functions`` higher-order
expressions — they run JVM-side inside whole-stage codegen, never a Python UDF.

Divergence (documented, SURVEY §7 "What's hard"): the reference THROWS on
zero-magnitude cosine inputs (DistanceFunction.java:239-241). Throwing inside a
distributed expression is hostile (kills the whole job on one bad row), so the
engine returns NULL for zero-magnitude cosine and exposes a validation helper
(`operators.analysis.count_zero_vectors`) to flag them up front.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fsum(col: Column) -> Column:
    """Sum an array<double> column left-to-right, JVM-side."""
    return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)


def _d(x: Column) -> Column:
    """Widen a component to double BEFORE arithmetic — keeps results
    bit-comparable with double-precision oracles and avoids float32
    rounding in intermediate products."""
    return x.cast("double")


def dot_product(a: Column, b: Column) -> Column:
    """dot(a, b) — DistanceFunction.java:197-218."""
    return _fsum(F.zip_with(a, b, lambda x, y: _d(x) * _d(y)))


def l2_norm(a: Column) -> Column:
    """Euclidean norm of one vector."""
    return F.sqrt(_fsum(F.zip_with(a, a, lambda x, y: _d(x) * _d(y))))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(|a||b|); NULL when either magnitude is zero.

    Reference: DistanceFunction.java:220-248 (throws on zero magnitude; we
    return NULL — see module docstring).
    """
    na, nb = l2_norm(a), l2_norm(b)
    denom = na * nb
    return F.when(denom != 0.0, dot_product(a, b) / denom)


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cosine_similarity — DistanceFunction.java:220-248."""
    return F.lit(1.0) - cosine_similarity(a, b)


def euclidean_distance(a: Column, b: Column) -> Column:
    """sqrt(sum((a_i-b_i)^2)) — DistanceFunction.java:281-305 (alias L2)."""
    return F.sqrt(_fsum(F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y)))))


def manhattan_distance(a: Column, b: Column) -> Column:
    """sum(|a_i-b_i|) — DistanceFunction.java:307-329 (alias L1)."""
    return _fsum(F.zip_with(a, b, lambda x, y: F.abs(_d(x) - _d(y))))


def dot_product_distance(a: Column, b: Column) -> Column:
    """-dot(a, b): lower is better — DistanceFunction.java:26,197-218."""
    return -dot_product(a, b)


METRICS = {
    "cosine": cosine_distance,
    "euclidean": euclidean_distance,
    "l2": euclidean_distance,
    "manhattan": manhattan_distance,
    "l1": manhattan_distance,
    "dot_product": dot_product_distance,
}


def distance_expr(metric: str, a: Column, b: Column) -> Column:
    """Metric dispatch by name — mirrors DistanceFunction.java:39-53 enum
    dispatch (aliases L2->euclidean, L1->manhattan kept)."""
    key = metric.strip().lower()
    if key not in METRICS:
        raise ValueError(f"unknown distance metric {metric!r}; one of {sorted(METRICS)}")
    return METRICS[key](a, b)
