"""Round-5 corpus-statistics operators: PMI collocations (lm.py),
Zipf rank-frequency fit (analysis.py), winnowing candidate pairs
(dedup.py). Closed-form tiny-corpus checks plus scale-shape plan
properties (no doc x doc product, fingerprint equi-join only)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.analysis import zipf_fit
from nbdatatools_spark.operators.dedup import winnow_candidate_pairs
from nbdatatools_spark.operators.lm import pmi_bigrams


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "single"),
        (4, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_pmi_closed_form(tiny):
    # tokens: the x2, cat x2, sat, ran, single -> N = 7
    # adjacent positions: doc1 2, doc2 2, doc3 0 -> P = 4
    # pairs: (the,cat) x2, (cat,sat), (cat,ran)
    out = pmi_bigrams(tiny, min_count=1, top_k=10).collect()
    by_pair = {(r["left"], r["right"]): r for r in out}
    n, p = 7.0, 4.0
    exp = {
        ("the", "cat"): round(math.log((2 / p) / ((2 / n) * (2 / n))), 6),
        ("cat", "sat"): round(math.log((1 / p) / ((2 / n) * (1 / n))), 6),
        ("cat", "ran"): round(math.log((1 / p) / ((2 / n) * (1 / n))), 6),
    }
    assert len(out) == 3
    for k, v in exp.items():
        assert by_pair[k]["pmi"] == pytest.approx(v, abs=1e-9)
    # ranks are dense 1..3, ordered by (pmi desc, left, right)
    ordered = sorted(out, key=lambda r: r["rank"])
    assert [r["rank"] for r in ordered] == [1, 2, 3]
    keys = [(r["left"], r["right"]) for r in ordered]
    assert keys == sorted(keys, key=lambda t: (-by_pair[t]["pmi"], t[0], t[1]))


def test_pmi_min_count_prunes_tail(tiny):
    out = pmi_bigrams(tiny, min_count=2, top_k=10).collect()
    assert [(r["left"], r["right"]) for r in out] == [("the", "cat")]


def test_pmi_empty_corpus(spark):
    empty = spark.createDataFrame([(1, "  ")], "doc_id BIGINT, text STRING")
    assert pmi_bigrams(empty, min_count=1).count() == 0


def test_zipf_closed_form(spark):
    # counts: a x8, b x4, c x2 -> ranks 1,2,3
    words = ["a"] * 8 + ["b"] * 4 + ["c"] * 2
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id BIGINT, text STRING")
    row = zipf_fit(df, top_v=10, min_count=2).first()
    x = np.round(np.log(np.array([1.0, 2.0, 3.0])), 9)
    y = np.round(np.log(np.array([8.0, 4.0, 2.0])), 9)
    v = 3.0
    sx, sy = x.sum(), y.sum()
    sxx, sxy, syy = (x * x).sum(), (x * y).sum(), (y * y).sum()
    slope = (v * sxy - sx * sy) / (v * sxx - sx * sx)
    intercept = (sy - slope * sx) / v
    corr = (v * sxy - sx * sy) / (
        math.sqrt(v * sxx - sx * sx) * math.sqrt(v * syy - sy * sy)
    )
    assert row["n_ranks"] == 3
    assert row["slope"] == pytest.approx(round(slope, 6), abs=1e-6)
    assert row["intercept"] == pytest.approx(round(intercept, 6), abs=1e-6)
    assert row["r_squared"] == pytest.approx(round(corr * corr, 6), abs=1e-6)
    assert 0.9 < row["r_squared"] <= 1.0


def test_zipf_top_v_caps_ranks(documents):
    row = zipf_fit(documents, top_v=20, min_count=1).first()
    assert row["n_ranks"] == 20  # sf0.001 vocab is 31 words; cap binds
    assert row["slope"] < 0  # frequency decreases with rank


def test_winnow_pairs_detect_shared_passage(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, shared + " alpha tail one"),
        (2, "prefix words here " + shared),
        (3, "completely unrelated content about spark plans and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = winnow_candidate_pairs(df, k=5, w=4, min_shared=2).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    # shared fingerprint count is symmetric-canonical: id_a < id_b always
    assert all(r["id_a"] < r["id_b"] for r in out)


def test_winnow_hot_bucket_cap(spark):
    # one boilerplate sentence in every doc; max_bucket below the doc
    # count drops those fingerprints, leaving no candidate pairs
    boiler = "all rights reserved copyright notice terms of service apply"
    rows = [(i, boiler) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    assert winnow_candidate_pairs(df, k=5, w=4, min_shared=1, max_bucket=5).count() == 0
    # with a permissive cap the identical docs all pair up: C(7,2) = 21
    assert (
        winnow_candidate_pairs(df, k=5, w=4, min_shared=1, max_bucket=100).count() == 21
    )


def test_winnow_plan_is_fingerprint_equijoin(spark):
    df = spark.createDataFrame(
        [(1, "some text body here"), (2, "some text body here")],
        "doc_id BIGINT, text STRING",
    )
    plan = winnow_candidate_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_inferred_hof_filter_at_scan(spark):
    """Regression: Catalyst's InferFiltersFromGenerate used to synthesize
    size(<generator>) > 0 under the inner explode and push the WHOLE
    nested HOF chain into an interpreted per-row scan filter (292s -> 3.5s
    at sf0.01 on doc_winnow_pairs). With explode_outer none of these
    corpus operators may have a size(<computed array>) filter anywhere."""
    import re

    from nbdatatools_spark.operators.dedup import remove_duplicate_spans
    from nbdatatools_spark.operators.lm import pmi_bigrams

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], "doc_id BIGINT, text STRING"
    )
    for out in (
        winnow_candidate_pairs(df),
        remove_duplicate_spans(df, k=2),
        pmi_bigrams(df, min_count=1, top_k=5),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        # size(...) applied to a computed expression (a call, not a plain
        # attribute reference like fingerprints#10) inside any Filter
        hits = re.findall(r"Filter [^\n]*size\([a-z_]+\(", plan)
        assert not hits, hits


def test_winnow_verify_containment_catch(spark):
    """A short doc embedded verbatim in a long one: Jaccard dilutes but
    the overlap coefficient reads high — the containment case winnow
    verify exists for."""
    from nbdatatools_spark.operators.dedup import winnow_verify

    short = "this exact passage is copied wholesale into the longer file"
    long = (
        "padding sentence one with plenty of original words here. "
        + short
        + " trailing filler content extending the document much further on and on"
    )
    rows = [(1, short), (2, long), (3, "entirely unrelated text about nothing")]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = winnow_verify(df, k=5, w=4, min_shared=2, min_overlap=0.6).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs
    assert pairs[(1, 2)].overlap >= 0.6
    assert all(3 not in p for p in pairs)
    # permissive floor keeps everything the candidate stage emits
    loose = winnow_verify(df, k=5, w=4, min_shared=2, min_overlap=0.0).count()
    assert loose >= len(out)
