"""Pin for the round-8 two-phase-index AQE defect.

global_row_index (and every inlined copy of its two-phase
partition-offset pattern) tags rows with spark_partition_id after a
repartitionByRange, then derives a P-row offset table from the SAME
frame. Pre-fix, the two consumers only shared a ReusedExchange; in
larger plans AQE was free to re-plan them with different coalesced
partition boundaries, so the offset table no longer described the row
branch's partitions and the "global index" came out duplicated/gapped.

Observed (round-8 sf0.1 oracle sweep, shuffle_partitions=8 — the exact
config this suite runs): doc_perplexity_buckets produced tier sizes
[1599, 1761, 1640] instead of the equal-count [1667, 1667, 1666], while
the same code was green at sf0.001/sf0.01 and at 32 partitions. The fix
pins the pid-tagged frame with localCheckpoint(eager=False) so both
branches read one materialized partitioning (applied to windows.py,
evaluation.py ranking_auc, stats.py grouped_avg_ranks, sampling.py
token_budget, packing.py pack_sequences/bucketed, analysis.py
vocab_growth).

The defect is plan-shape- and data-size-dependent (synthetic replicas
at the same row counts pass even pre-fix), so this pin runs the REAL
failing artifact: sf0.1 documents through the full perplexity_buckets
gate plan.
"""

import os

import pytest
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"


@pytest.mark.skipif(not os.path.exists(SF01), reason="sf0.1 testdata absent")
def test_perplexity_tiers_equal_count_at_sf01(spark):
    from nbdatatools_spark.operators.lm import perplexity_buckets

    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    out = (
        perplexity_buckets(docs, n_buckets=3)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
        .collect()
    )
    sizes = {r["bucket"]: r["n"] for r in out}
    n = sum(sizes.values())
    scored = sum(v for k, v in sizes.items() if k is not None)
    # equal-count cut: bucket sizes may differ by at most 1
    per = [v for k, v in sorted(sizes.items(), key=lambda kv: (kv[0] is None, kv[0])) if k is not None]
    assert max(per) - min(per) <= 1, f"tiers not equal-count: {sizes}"
    assert scored == n or None in sizes


@pytest.mark.skipif(not os.path.exists(SF01), reason="sf0.1 testdata absent")
def test_global_row_index_permutation_in_composite_plan(spark):
    """Indexes must be a permutation of 0..n-1 even when the indexed frame
    is consumed by a union + global sort downstream (the gate shape that
    broke pre-fix)."""
    from nbdatatools_spark.operators.windows import global_row_index

    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    base = docs.select("doc_id", F.length("text").alias("len"))
    r = global_row_index(
        base, [F.col("len").asc(), F.col("doc_id").asc()], out="__idx"
    )
    shaped = (
        r.select("doc_id", "__idx")
        .unionByName(
            base.where(F.lit(False)).select(
                "doc_id", F.lit(None).cast("bigint").alias("__idx")
            )
        )
        .orderBy("doc_id")
    )
    agg = shaped.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("__idx").alias("d"),
        F.min("__idx").alias("lo"),
        F.max("__idx").alias("hi"),
    ).collect()[0]
    assert agg["d"] == agg["n"], "duplicate indexes"
    assert agg["lo"] == 0 and agg["hi"] == agg["n"] - 1, "gapped indexes"
