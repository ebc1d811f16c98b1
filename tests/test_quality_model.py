"""Model-based quality filter: planted-signal recovery + plan checks."""

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.quality_model import (
    quality_filter,
    score_quality,
    train_quality_filter,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # planted signal: "good" docs share a marker vocabulary, "bad" docs
    # another; held-out docs use fresh combinations of the same markers
    good = [(i, f"insight rigor clarity depth sample{i % 7}") for i in range(60)]
    bad = [(1000 + i, f"spam noise clickbait junk sample{i % 7}") for i in range(60)]
    return spark.createDataFrame(good + bad, "doc_id long, text string")


def test_quality_filter_recovers_planted_signal(spark, corpus):
    pos = corpus.where((F.col("doc_id") < 1000) & (F.col("doc_id") % 2 == 0))
    neg = corpus.where((F.col("doc_id") >= 1000) & (F.col("doc_id") % 2 == 0))
    model = train_quality_filter(pos, neg, num_features=1 << 12)
    held_out = corpus.where(F.col("doc_id") % 2 == 1)
    scored = score_quality(held_out, model).collect()
    for r in scored:
        if r.doc_id < 1000:
            assert r.quality_prob > 0.5, (r.doc_id, r.quality_prob)
        else:
            assert r.quality_prob < 0.5, (r.doc_id, r.quality_prob)
    kept = quality_filter(held_out, model).select("doc_id").collect()
    assert {r.doc_id for r in kept} == {
        r.doc_id for r in held_out.collect() if r.doc_id < 1000
    }


def test_score_quality_is_jvm_map_only(spark, corpus, documents):
    pos = corpus.where(F.col("doc_id") < 1000)
    neg = corpus.where(F.col("doc_id") >= 1000)
    model = train_quality_filter(pos, neg, num_features=1 << 12)
    plan = (
        score_quality(documents, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # scoring is a pure projection
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
