"""Session-lifetime cache hygiene (VERDICT r5/r6 'persist leak' class).

Operators may reuse an intermediate frame across several actions, but the
repo policy is ``localCheckpoint(eager=False)`` — RDD-level blocks that the
ContextCleaner releases when the frame is garbage-collected — NOT
``DataFrame.persist()``, whose CacheManager entry survives until an explicit
``unpersist()`` the caller of a lazy returned frame can never safely issue.

The test pins the class functionally: after running every operator that
historically shipped the leak (bigram LM, Kneser-Ney, perplexity buckets,
PMI collocations — lm.py r6; rake/source_overlap fixed earlier), the
session CacheManager must be exactly as empty as it started.
"""

import pytest
from pyspark.sql import functions as F


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


@pytest.fixture()
def tiny_docs(spark):
    rows = [
        (i, f"the quick brown fox {i} jumps over the lazy dog " * 3)
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def test_lm_operators_leave_no_cachemanager_entries(spark, tiny_docs):
    from nbdatatools_spark.operators.lm import (
        bigram_lm_score,
        kneser_ney_bigrams,
        perplexity_buckets,
        pmi_bigrams,
    )

    spark.catalog.clearCache()
    assert _cache_manager(spark).isEmpty()

    bigram_lm_score(tiny_docs).collect()
    kneser_ney_bigrams(tiny_docs, top_n=10).collect()
    perplexity_buckets(tiny_docs, n_buckets=3).collect()
    pmi_bigrams(tiny_docs, min_count=1, top_k=10).collect()

    # localCheckpoint blocks are RDD-level (GC-released); the CacheManager —
    # the session-lifetime store DataFrame.persist() writes to — must have
    # gained nothing.
    assert _cache_manager(spark).isEmpty()


def test_rake_and_overlap_leave_no_cachemanager_entries(spark, tiny_docs):
    from nbdatatools_spark.operators.analysis import rake_keyphrases
    from nbdatatools_spark.operators.dedup import source_overlap_matrix

    spark.catalog.clearCache()
    docs = tiny_docs.withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b")
    )
    rake_keyphrases(docs, top_n=5).collect()
    source_overlap_matrix(docs, group_col="source", n=3).collect()
    assert _cache_manager(spark).isEmpty()


def test_round7_operators_leave_no_cachemanager_entries(spark, tiny_docs):
    """Round-7 batch-2+ operators checkpoint day/subject/position-grain
    frames (autocorrelation, kaplan_meier, cross_correlation, textrank,
    length_batching, rfm, isotropy) — all via localCheckpoint, never
    persist(): the CacheManager must stay empty."""
    from datetime import datetime

    from nbdatatools_spark.operators.analysis import (
        embedding_isotropy,
        rfm_segments,
        textrank_keywords,
    )
    from nbdatatools_spark.operators.packing import length_batching_audit
    from nbdatatools_spark.operators.temporal import (
        autocorrelation,
        cross_correlation,
        kaplan_meier,
    )

    spark.catalog.clearCache()
    assert _cache_manager(spark).isEmpty()

    ev = spark.createDataFrame(
        [
            (i, datetime(2024, 1, 1 + i % 9), "a" if i % 2 else "b")
            for i in range(40)
        ],
        "user_id long, ts timestamp, event_type string",
    )
    autocorrelation(ev, max_lag=3).collect()
    kaplan_meier(ev, censor_days=1).collect()
    cross_correlation(ev, "a", "b", max_lag=2).collect()
    textrank_keywords(tiny_docs, min_count=2, topk=5, id_col="doc_id").collect()
    length_batching_audit(tiny_docs, batch_size=4).collect()
    orders = spark.createDataFrame(
        [(i % 7, datetime(2024, 1, 1 + i % 20), 10.0 * (i + 1))
         for i in range(40)],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    rfm_segments(orders, n_buckets=3).collect()
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    embedding_isotropy(emb, sample_size=4).collect()

    assert _cache_manager(spark).isEmpty()


def test_minhash_quality_report_leaves_no_cachemanager_entries(spark, tiny_docs):
    """VERDICT r7 hygiene #1: minhash_quality_report's sample frame is a
    localCheckpoint (reused by the count AND the lazy returned frame's
    candidate/truth joins), never a persist() the lazy caller can't
    unpersist safely."""
    from nbdatatools_spark.operators.dedup import minhash_quality_report

    spark.catalog.clearCache()
    assert _cache_manager(spark).isEmpty()

    out = minhash_quality_report(
        tiny_docs,
        sample_ids=16,
        num_hashes=8,
        bands=4,
        shingle_size=5,
        threshold=0.5,
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_sample"] > 0
    assert _cache_manager(spark).isEmpty()


def test_round10_operators_leave_no_cachemanager_entries(spark, tiny_docs):
    """lof_from_knn / link_prediction / sinkhorn_distance all lazily
    checkpoint intermediates — pin that none of them writes a
    session-lifetime CacheManager entry."""
    from nbdatatools_spark.operators.analysis import sinkhorn_distance
    from nbdatatools_spark.operators.graph import link_prediction
    from nbdatatools_spark.operators.knn import lof_scores

    spark.catalog.clearCache()
    assert _cache_manager(spark).isEmpty()

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "src long, dst long"
    )
    link_prediction(edges, max_z_degree=10).collect()

    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    lof_scores(emb, k=3).collect()

    vals = tiny_docs.select(
        F.length("text").cast("double").alias("v"),
        (F.col("doc_id") % 2).cast("string").alias("grp"),
    )
    sinkhorn_distance(
        vals, "v", "grp", "0", "1", n_bins=4, lo=0.0, hi=400.0,
        iterations=3,
    ).collect()

    assert _cache_manager(spark).isEmpty()
