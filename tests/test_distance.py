"""Distance kernels vs numpy oracle (reference test shape:
DistanceFunctionTest.java:70-127)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.functions.distance import (
    cosine_distance,
    distance_expr,
    dot_product,
    euclidean_distance,
    l2_norm,
    manhattan_distance,
)

VECS = [
    ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
    ([0.5, -0.5, 2.25], [-1.0, 3.0, 0.0]),
    ([1e-3, 1e3, -1e-3], [1e3, 1e-3, 1e3]),
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(VECS)],
        "id INT, a ARRAY<FLOAT>, b ARRAY<FLOAT>",
    )


def _np_pairs():
    return [(np.array(a, np.float32), np.array(b, np.float32)) for a, b in VECS]


def collect_metric(df, expr):
    return [r[0] for r in df.select(expr).orderBy("id").collect()]


def test_cosine_matches_numpy(pairs_df):
    got = collect_metric(pairs_df, cosine_distance(F.col("a"), F.col("b")))
    for (a, b), g in zip(_np_pairs(), got):
        a, b = a.astype(np.float64), b.astype(np.float64)
        want = 1 - float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert math.isclose(g, want, rel_tol=1e-12)


def test_euclidean_matches_numpy(pairs_df):
    got = collect_metric(pairs_df, euclidean_distance(F.col("a"), F.col("b")))
    for (a, b), g in zip(_np_pairs(), got):
        want = float(np.linalg.norm(a.astype(np.float64) - b.astype(np.float64)))
        assert math.isclose(g, want, rel_tol=1e-12)


def test_manhattan_matches_numpy(pairs_df):
    got = collect_metric(pairs_df, manhattan_distance(F.col("a"), F.col("b")))
    for (a, b), g in zip(_np_pairs(), got):
        want = float(np.abs(a.astype(np.float64) - b.astype(np.float64)).sum())
        assert math.isclose(g, want, rel_tol=1e-12)


def test_dot_product_distance_sign(pairs_df):
    dots = collect_metric(pairs_df, dot_product(F.col("a"), F.col("b")))
    negs = collect_metric(pairs_df, distance_expr("dot_product", F.col("a"), F.col("b")))
    assert all(math.isclose(d, -n, rel_tol=1e-12) for d, n in zip(dots, negs))


def test_zero_magnitude_cosine_is_null(spark):
    """Engine policy: NULL instead of throw (divergence from
    DistanceFunction.java:239-241, documented in functions/distance.py)."""
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a ARRAY<FLOAT>, b ARRAY<FLOAT>"
    )
    assert df.select(cosine_distance(F.col("a"), F.col("b"))).collect()[0][0] is None


def test_metric_aliases():
    import pyspark.sql.functions as F

    for alias in ("l2", "L2", "euclidean"):
        assert distance_expr(alias, F.lit(None), F.lit(None)) is not None
    with pytest.raises(ValueError):
        distance_expr("chebyshev", F.lit(None), F.lit(None))


def test_l2_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "v ARRAY<FLOAT>")
    assert df.select(l2_norm(F.col("v"))).collect()[0][0] == pytest.approx(5.0)


def test_nan_propagates(spark):
    df = spark.createDataFrame(
        [([float("nan"), 1.0], [1.0, 1.0])], "a ARRAY<FLOAT>, b ARRAY<FLOAT>"
    )
    v = df.select(euclidean_distance(F.col("a"), F.col("b"))).collect()[0][0]
    assert math.isnan(v)
