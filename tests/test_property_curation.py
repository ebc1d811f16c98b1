"""Property-based differentials for the round-5 curation operators:
random corpora vs pure-Python replicas / algebraic invariants (the
test_property_textops strategy)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nbdatatools_spark.operators.dedup import (
    remove_duplicate_spans,
    source_overlap_matrix,
)
from nbdatatools_spark.operators.sampling import token_budget_select

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_words = st.lists(
    st.sampled_from(["aa", "b", "ccc", "dd", "e", "ff"]), min_size=0, max_size=10
)


def _remove_ref(texts, k, min_occ):
    """Pure-Python ExactSubstr replica: count every positional k-gram
    across the corpus, cut covered positions, re-join."""
    toks = {i: t.split() for i, t in texts.items()}
    counts: dict[tuple, int] = {}
    for t in toks.values():
        for p in range(len(t) - k + 1):
            g = tuple(t[p:p + k])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for i, t in toks.items():
        covered = set()
        for p in range(len(t) - k + 1):
            if counts[tuple(t[p:p + k])] >= min_occ:
                covered.update(range(p, p + k))
        kept = [w for j, w in enumerate(t) if j not in covered]
        out[i] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


@settings(**_SETTINGS)
@given(
    corpus=st.lists(_words, min_size=1, max_size=8),
    k=st.integers(1, 4),
)
def test_remove_dup_spans_matches_python_replica(spark, corpus, k):
    texts = {i: " ".join(ws) for i, ws in enumerate(corpus)}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id BIGINT, text STRING"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in remove_duplicate_spans(df, k=k, min_occurrences=2).collect()
    }
    assert got == _remove_ref(texts, k, 2)


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.integers(0, 20), min_size=1, max_size=12),
    budget=st.integers(0, 80),
)
def test_token_budget_prefix_and_monotonicity(spark, toks, budget):
    rows = [(i, float((i * 7) % 5) / 10.0, n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, quality DOUBLE, n_tokens BIGINT")
    kept = {
        r.doc_id
        for r in token_budget_select(
            df, budget, quality_col="quality", token_col="n_tokens"
        ).collect()
    }
    # python replica: greedy whole-doc prefix over (quality desc, id)
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    start, want = 0, set()
    for i, _, n in order:
        if start + n <= budget:
            want.add(i)
        start += n
    assert kept == want
    # monotone in budget
    bigger = {
        r.doc_id
        for r in token_budget_select(
            df, budget + 10, quality_col="quality", token_col="n_tokens"
        ).collect()
    }
    assert kept <= bigger


@settings(**_SETTINGS)
@given(corpus=st.lists(st.tuples(_words, st.sampled_from(["s1", "s2", "s3"])),
                       min_size=1, max_size=8))
def test_source_overlap_bounds(spark, corpus):
    rows = [(i, " ".join(ws), src) for i, (ws, src) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")
    for r in source_overlap_matrix(df, n=2).collect():
        assert r.slice_a < r.slice_b
        assert 1 <= r.n_shared <= min(r.n_a, r.n_b)
        assert 0.0 < r.jaccard <= 1.0
