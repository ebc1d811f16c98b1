"""Capture .explain("formatted") output for named queries into
plans/r10/<query>_<tag>.txt (the optimization-round evidence files).

Usage: python scripts/capture_plans.py <tag> <query> [query ...]
       python scripts/capture_plans.py <tag> --top N   (top-N by wall
       from plans/r10/BENCH_before.json)

Plan construction only — no execution (cheap enough to run while other
jobs own the box). Bench-side impl overrides (gemm/numpy splits) are
reproduced here so the captured plan is the one the bench times.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from nbdatatools_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
)


def bench_overrides(spark, sf_dir):
    """The gate/bench impl splits from bench.py, reproduced 1:1."""
    from pyspark.sql import functions as F

    qs = {}

    def knn_cosine_topk(spark, sf_dir):
        from nbdatatools_spark.operators.similarity import brute_force_topk

        emb = entrymod._t(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") < 20)
        pairs = brute_force_topk(q, emb, k=10, metric="cosine", impl="gemm")
        return pairs.select(
            "query_id", "rank", "base_id", F.round("distance", 6).alias("distance")
        )

    qs["knn_cosine_topk"] = knn_cosine_topk

    def minhash_candidate_pairs(spark, sf_dir):
        from nbdatatools_spark.operators.dedup import minhash_lsh_candidates

        docs = entrymod._t(spark, sf_dir, "documents")
        return minhash_lsh_candidates(docs, num_hashes=32, bands=8, shingle_size=5)

    qs["minhash_candidate_pairs"] = minhash_candidate_pairs

    def doc_minhash_calibration(spark, sf_dir):
        from nbdatatools_spark.operators.dedup import minhash_calibration

        docs = entrymod._t(spark, sf_dir, "documents")
        return minhash_calibration(
            docs, num_hashes=32, bands=8, shingle_size=5, impl="numpy",
            max_pairs=20_000,
        )

    qs["doc_minhash_calibration"] = doc_minhash_calibration

    def embedding_semantic_dedup(spark, sf_dir):
        from nbdatatools_spark.operators.clustering import semantic_dedup

        emb = entrymod._emb_with_injected_dups(spark, sf_dir)
        out = semantic_dedup(
            emb, threshold=0.95, id_col="vec_id", vec_col="embedding",
            centroids=entrymod._semdedup_centroids(), assign_impl="gemm",
        )
        return out.select("vec_id", "centroid_id")

    qs["embedding_semantic_dedup"] = embedding_semantic_dedup

    def embedding_intrinsic_dim(spark, sf_dir):
        from nbdatatools_spark.operators.analysis import intrinsic_dimension

        emb = entrymod._t(spark, sf_dir, "embeddings")
        return intrinsic_dimension(emb, dims=32, impl="gemm")

    qs["embedding_intrinsic_dim"] = embedding_intrinsic_dim

    return qs


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if names[:1] == ["--top"]:
        n = int(names[1])
        bench = json.load(open(os.path.join(REPO, "plans", "r10", "BENCH_before.json")))
        names = [
            k for k, _ in sorted(
                bench["queries"].items(), key=lambda kv: kv[1], reverse=True
            )[:n]
        ]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.queries())
    qs.update(entrymod.candidate_queries())
    qs.update(bench_overrides(spark, sf_dir))
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure, keep sweeping
            txt = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
