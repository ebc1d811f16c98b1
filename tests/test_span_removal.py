"""Round-5 curation operators: ExactSubstr span removal, cross-slice
contamination matrix (dedup.py), CCNet perplexity buckets (lm.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.dedup import (
    remove_duplicate_spans,
    source_overlap_matrix,
)
from nbdatatools_spark.operators.lm import perplexity_buckets


def test_remove_dup_spans_closed_form(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "x y z a b c d q"),
        (3, "totally unique words here only once ok fine"),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, k=4, min_occurrences=2).collect()
    }
    # "a b c d" occurs in docs 1 and 2: covers pos 1-4 in doc 1, 4-7 in doc 2
    assert out[1]["clean_text"] == "e f g h" and out[1]["n_removed"] == 4
    assert out[2]["clean_text"] == "x y z q" and out[2]["n_removed"] == 4
    assert out[3]["n_removed"] == 0 and out[3]["clean_text"].startswith("totally")
    assert out[4]["clean_text"] == "" and out[4]["n_tokens"] == 0


def test_remove_dup_spans_intra_doc_repeat(spark):
    # the duplicated trigram occurs twice WITHIN one doc: both occurrences cut
    df = spark.createDataFrame(
        [(1, "p q r zz p q r ww")], "doc_id BIGINT, text STRING"
    )
    row = remove_duplicate_spans(df, k=3, min_occurrences=2).first()
    assert row["clean_text"] == "zz ww"
    assert row["n_removed"] == 6


def test_remove_dup_spans_overlapping_windows_merge(spark):
    # two docs share a 5-token run; with k=4 the two overlapping dup
    # windows cover the union of positions, not double-count
    df = spark.createDataFrame(
        [(1, "m n o p q tail1 only"), (2, "head2 m n o p q other")],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, k=4, min_occurrences=2).collect()
    }
    assert out[1]["clean_text"] == "tail1 only" and out[1]["n_removed"] == 5
    assert out[2]["clean_text"] == "head2 other" and out[2]["n_removed"] == 5


def test_remove_dup_spans_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError):
        remove_duplicate_spans(df, k=0)
    with pytest.raises(ValueError):
        remove_duplicate_spans(df, min_occurrences=1)


def test_source_overlap_closed_form(spark):
    rows = [
        (1, "alpha beta gamma delta", "s1"),
        (2, "alpha beta gamma other", "s2"),
        (3, "nothing in common here", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")
    out = source_overlap_matrix(df, n=2).collect()
    pairs = {(r["slice_a"], r["slice_b"]): r for r in out}
    # s1 2-grams: {alpha beta, beta gamma, gamma delta}; s2: {alpha beta,
    # beta gamma, gamma other}; shared = 2, union = 4
    assert set(pairs) == {("s1", "s2")}
    r = pairs[("s1", "s2")]
    assert r["n_shared"] == 2 and r["n_a"] == 3 and r["n_b"] == 3
    assert r["jaccard"] == pytest.approx(0.5, abs=1e-9)


def test_source_overlap_dedups_within_slice(spark):
    # the same gram in two docs of ONE slice counts once for that slice
    rows = [
        (1, "dup gram here", "s1"),
        (2, "dup gram there", "s1"),
        (3, "dup gram echo", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")
    r = source_overlap_matrix(df, n=2).first()
    assert (r["slice_a"], r["slice_b"], r["n_shared"]) == ("s1", "s2", 1)


def test_perplexity_buckets_cut_points(spark):
    # 6 scorable docs -> with 3 buckets, exactly 2 per tier; bucket is
    # (3 * rank) DIV 6 on the (lm_score, doc_id) total order
    rows = [(i, f"w{i} w{i} common common w{i}") for i in range(6)] + [(9, "one")]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = perplexity_buckets(df, n_buckets=3).collect()
    scored = sorted(
        (r for r in out if r["bucket"] is not None),
        key=lambda r: (r["lm_score"], r["doc_id"]),
    )
    assert [r["bucket"] for r in scored] == [0, 0, 1, 1, 2, 2]
    assert [r["bucket_label"] for r in scored] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ]
    unscored = [r for r in out if r["bucket"] is None]
    assert len(unscored) == 1 and unscored[0]["bucket_label"] == "unscored"


def test_perplexity_buckets_validation_and_labels(spark, documents):
    with pytest.raises(ValueError):
        perplexity_buckets(documents, n_buckets=1)
    out = perplexity_buckets(documents.limit(50), n_buckets=4)
    labels = {r["bucket_label"] for r in out.collect()}
    assert labels <= {"b0", "b1", "b2", "b3", "unscored"}


def test_span_removal_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id BIGINT, text STRING"
    )
    plan = (
        remove_duplicate_spans(df, k=2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_dedup_cluster_sizes_closed_form(spark):
    from nbdatatools_spark.operators.dedup import dedup_cluster_sizes

    dup = "the exact same duplicated document body text here repeated verbatim"
    rows = [
        (1, dup),
        (2, dup),
        (3, dup),
        (4, "a completely different and unrelated document about catalysts"),
        (5, "yet another unique text with nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {
        r["cluster_size"]: r["n_clusters"]
        for r in dedup_cluster_sizes(
            df, num_hashes=16, bands=8, threshold=0.5, impl="md5"
        ).collect()
    }
    # one 3-clique of identical docs + two singletons
    assert out == {1: 2, 3: 1}
    # mass conservation: sum(size * count) == corpus size
    assert sum(s * n for s, n in out.items()) == 5


def test_token_budget_select_prefix_semantics(spark):
    from nbdatatools_spark.operators.sampling import token_budget_select

    rows = [
        (1, 0.9, 40),
        (2, 0.8, 50),
        (3, 0.7, 30),  # start 90: 90+30 > 100 -> out
        (4, 0.6, 5),   # start 120 even though it would "fit" a knapsack
        (5, 0.9, 0),   # zero-token doc inside the prefix
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, quality DOUBLE, n_tokens BIGINT")
    out = {
        r["doc_id"]: r["start_tok"]
        for r in token_budget_select(
            df, 100, quality_col="quality", token_col="n_tokens"
        ).collect()
    }
    # order: (0.9,1) (0.9,5) (0.8,2) (0.7,3) (0.6,4)
    assert out == {1: 0, 5: 40, 2: 40}
    part = {
        r["doc_id"]
        for r in token_budget_select(
            df, 100, quality_col="quality", token_col="n_tokens", keep_partial=True
        ).collect()
    }
    assert part == {1, 5, 2, 3}  # the straddler (start 90 < 100) joins
    with pytest.raises(ValueError):
        token_budget_select(df, -1, quality_col="quality", token_col="n_tokens")


def test_token_budget_select_matches_window_replica(spark, documents):
    from nbdatatools_spark.functions.text import quality_score, token_count
    from nbdatatools_spark.operators.sampling import token_budget_select
    from pyspark.sql import Window

    docs = documents.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    got = token_budget_select(docs, 3000, quality_col="quality", token_col="n_tokens")
    w = (
        Window.orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = (
        docs.withColumn("start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .where(F.col("start_tok") + F.col("n_tokens") <= 3000)
    )
    a = sorted((r.doc_id, r.start_tok) for r in got.collect())
    b = sorted((r.doc_id, r.start_tok) for r in ref.collect())
    assert a == b and len(a) > 0


def test_pagerank_closed_form_and_invariants(spark):
    import math

    from nbdatatools_spark.operators.graph import pagerank

    # two-node cycle with equal weights: symmetric -> both ranks equal 1/2
    e = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "src STRING, dst STRING, w BIGINT"
    )
    out = {r.node: r.rank for r in pagerank(e, weight="w", iterations=10).collect()}
    assert out["a"] == out["b"] == pytest.approx(0.5, abs=1e-9)

    # star a->b, a->c with weights 3 and 1: b gets 3x c's inflow term
    e2 = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "src STRING, dst STRING, w BIGINT"
    )
    out2 = {r.node: r.rank for r in pagerank(e2, weight="w", iterations=1).collect()}
    third = 1.0 / 3.0
    tele = 0.15 / 3.0
    assert out2["a"] == pytest.approx(tele, abs=1e-9)  # no in-edges
    assert out2["b"] == pytest.approx(
        round(tele + 0.85 * round(third * 3.0 / 4.0, 9), 9), abs=1e-9
    )
    assert out2["c"] == pytest.approx(
        round(tele + 0.85 * round(third * 1.0 / 4.0, 9), 9), abs=1e-9
    )
    # python power-iteration replica agrees on a small random-ish graph
    edges = [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("a", "c", 1), ("c", "b", 2)]
    e3 = spark.createDataFrame(edges, "src STRING, dst STRING, w BIGINT")
    got = {r.node: r.rank for r in pagerank(e3, weight="w", iterations=10).collect()}
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + float(w)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(10):
        inc = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            inc[d] += round(r[s] * float(w) / outw[s], 9)
        r = {v: round((1.0 - 0.85) / n + 0.85 * inc[v], 9) for v in nodes}
    for v in nodes:
        assert got[v] == pytest.approx(r[v], abs=1e-8), v

    with pytest.raises(ValueError):
        pagerank(e, damping=1.5)
    with pytest.raises(ValueError):
        pagerank(e, iterations=0)


def test_tfidf_topterms_closed_form(spark):
    import math

    from nbdatatools_spark.operators.analysis import tfidf_top_terms

    rows = [
        (1, "apple apple banana common"),
        (2, "banana cherry common"),
        (3, "cherry cherry common"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = tfidf_top_terms(df, top_k=2, min_df=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    idf = lambda df_t: round(math.log(3.0 / df_t), 9)
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5); common 0
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [(r.token, r.tf, r.df) for r in d1] == [("apple", 2, 1), ("banana", 1, 2)]
    assert d1[0].score == pytest.approx(round(2 * idf(1), 6), abs=1e-9)
    assert d1[1].score == pytest.approx(round(1 * idf(2), 6), abs=1e-9)
    # common appears in all docs -> idf 0 -> score 0, only surfaces last
    d3 = sorted(by_doc[3], key=lambda r: r.rank)
    assert d3[0].token == "cherry" and d3[1].token == "common"
    assert d3[1].score == pytest.approx(0.0, abs=1e-12)
    with pytest.raises(ValueError):
        tfidf_top_terms(df, top_k=0)
    with pytest.raises(ValueError):
        tfidf_top_terms(df, min_df=0)


def test_curriculum_interleave_round_robin(spark):
    from nbdatatools_spark.operators.sampling import curriculum_interleave

    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")]
    df = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING")
    out = sorted(
        curriculum_interleave(df, tier_col="lang").collect(),
        key=lambda r: r.training_pos,
    )
    # round-robin a,b,c then a,b (c exhausted) then a
    assert [r.lang for r in out] == ["a", "b", "c", "a", "b", "a"]
    assert [r.doc_id for r in out] == [1, 4, 6, 2, 5, 3]
    assert [r.training_pos for r in out] == list(range(6))
    # per-tier ranks are dense 0-based
    a_ranks = [r.rank_in_tier for r in out if r.lang == "a"]
    assert sorted(a_ranks) == [0, 1, 2]
    # balanced prefix: any window of n_tiers positions while all tiers
    # live contains distinct tiers
    assert len({r.lang for r in out[:3]}) == 3


def test_detect_lang_closed_form(spark):
    from nbdatatools_spark.functions.text import detect_lang

    rows = [
        (1, "the cat and the dog ran to the house"),          # en
        (2, "der hund und die katze ist nicht da"),           # de
        (3, "le chat est dans la maison pour une nuit"),      # fr
        (4, "xyzzy qwerty plugh"),                            # nothing scores
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {
        r.doc_id: r.p
        for r in df.select("doc_id", detect_lang(F.col("text")).alias("p")).collect()
    }
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}
