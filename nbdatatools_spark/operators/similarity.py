"""Similarity search over embedding columns (SURVEY §7.8 extension).

- ``brute_force_topk``: exact cosine/euclidean top-k — the correctness
  baseline. Same physical shape as operators.knn (broadcast query side,
  per-partition partial top-k).
- ``random_hyperplane_signature`` + ``lsh_topk``: cosine LSH — bucket both
  sides by an n-bit random-hyperplane signature and search only within the
  bucket (multi-probe optional). Hyperplanes are generated deterministically
  from a seed on the driver (tiny: n_bits x dim floats) and inlined as literal
  arrays, so the bucketing is a pure Catalyst expression.
- ``ivf_topk``: IVF-style partition search — KMeans centroids (MLlib, trained
  on a sample), each base vector assigned to its nearest centroid once
  (precomputable / materializable), queries probe the ``nprobe`` nearest
  centroids. At 100TB the assignment table is bucketed by centroid id so each
  query touches ~nprobe/k_centroids of the data.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nbdatatools_spark.functions.distance import distance_expr
from nbdatatools_spark.operators.knn import exact_knn


def brute_force_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    metric: str = "cosine",
    query_id: str = "vec_id",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "gemm",
) -> DataFrame:
    """Exact top-k neighbor pairs (query_id, rank, base_id, distance).

    Default ``impl="gemm"`` — per-batch partial top-k, the scale path;
    pass ``impl="expr"`` only for bit-exact SQL-oracle comparisons (see
    exact_knn docstring)."""
    nn = exact_knn(
        queries,
        base,
        k,
        metric,
        query_ordinal=query_id,
        base_ordinal=base_id,
        query_vec=vec_col,
        base_vec=vec_col,
        impl=impl,
    )
    return nn.select(
        F.col("ordinal").alias("query_id"),
        F.posexplode(F.arrays_zip("indices", "distances")).alias("pos", "pair"),
    ).select(
        "query_id",
        (F.col("pos") + 1).alias("rank"),
        F.col("pair.indices").alias("base_id"),
        F.col("pair.distances").alias("distance"),
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def random_hyperplane_signature(
    vec, dim: int, n_bits: int = 16, seed: int = 42
) -> "F.Column":
    """n-bit cosine-LSH signature as a BIGINT: bit j = sign(dot(v, h_j))."""
    planes = _hyperplanes(dim, n_bits, seed)
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, h, lambda a, b: a.cast("double") * b), F.lit(0.0), lambda acc, x: acc + x
        )
        sig = sig + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    dim: int,
    n_bits: int = 12,
    seed: int = 42,
    query_id: str = "vec_id",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: candidates share the LSH bucket.

    Recall improves with fewer bits (bigger buckets); cost grows. The bucket
    join shuffles on the signature — uniform by construction.
    """
    qsig = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qvec"),
        random_hyperplane_signature(F.col(vec_col), dim, n_bits, seed).alias("sig"),
    )
    bsig = base.select(
        F.col(base_id).alias("bid"),
        F.col(vec_col).alias("bvec"),
        random_hyperplane_signature(F.col(vec_col), dim, n_bits, seed).alias("sig"),
    )
    pairs = bsig.join(F.broadcast(qsig), "sig").select(
        "qid",
        "bid",
        distance_expr("cosine", F.col("qvec"), F.col("bvec")).alias("distance"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("distance").asc_nulls_last(), F.col("bid").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), "rank", F.col("bid").alias("base_id"), "distance")
    )


def ivf_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    query_id: str = "vec_id",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
) -> DataFrame:
    """IVF: KMeans-partitioned approximate search.

    Train centroids on a (deterministic) sample, assign base vectors to
    nearest centroid, probe the nprobe nearest centroids per query. The
    centroid table is tiny -> broadcast on both sides; the only large shuffle
    keys on centroid id.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    train = base.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    if sample_fraction < 1.0:
        train = train.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(train)
    centroids = [list(c) for c in model.clusterCenters()]

    # Shuffle-free assignment (VERDICT r1 #4): the centroid table is tiny by
    # construction, so inline it as a literal array of (cdist, centroid_id)
    # structs and take the per-row argmin with array_min — struct comparison
    # is field-order lexicographic, i.e. exactly the (cdist ASC, centroid_id
    # ASC) tie-break. The old plan crossJoined base x centroids and ranked
    # with a Window.partitionBy(bid): a full B*n_centroids shuffle just to
    # compute a per-row minimum.
    def _cent_struct_array(vec):
        return F.array(
            *[
                F.struct(
                    distance_expr(
                        "euclidean", vec, F.array(*[F.lit(float(x)) for x in c])
                    ).alias("cdist"),
                    F.lit(i).alias("centroid_id"),
                )
                for i, c in enumerate(centroids)
            ]
        )

    bass = base.select(
        F.col(base_id).alias("bid"),
        F.col(vec_col).alias("bvec"),
        F.array_min(_cent_struct_array(F.col(vec_col)))["centroid_id"].alias("centroid_id"),
    )
    # query side: nprobe nearest centroids = first nprobe of the sorted
    # struct array — same projection trick, then explode (queries are small)
    qprobe = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            F.transform(
                F.slice(F.array_sort(_cent_struct_array(F.col(vec_col))), 1, nprobe),
                lambda s: s["centroid_id"],
            )
        ).alias("centroid_id"),
    )
    pairs = bass.join(F.broadcast(qprobe), "centroid_id").select(
        "qid",
        "bid",
        distance_expr("cosine", F.col("qvec"), F.col("bvec")).alias("distance"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("distance").asc_nulls_last(), F.col("bid").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), "rank", F.col("bid").alias("base_id"), "distance")
    )
