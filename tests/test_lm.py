"""Bigram LM fluency scoring (operators/lm.py): closed-form checks on a
tiny corpus, DuckDB differential for the full smoothed model, and the
no-string-shuffle plan property."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.lm import bigram_lm_score


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "single"),
        (4, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_closed_form_tiny_corpus(tiny):
    # corpus tokens: the x2, cat x2, sat, ran, single -> V = 5
    # bigrams: "the cat" x2, "cat sat", "cat ran"
    # k = 0.5, kV = 2.5
    # p(cat|the) = (2+.5)/(2+2.5) = 5/9
    # p(sat|cat) = (1+.5)/(2+2.5) = 1/3 ; p(ran|cat) same
    out = {r["doc_id"]: r for r in bigram_lm_score(tiny, add_k=0.5).collect()}
    t1 = round(-math.log(2.5 / 4.5), 9)
    t2 = round(-math.log(1.5 / 4.5), 9)
    assert out[1]["n_bigrams"] == 2
    assert out[1]["lm_score"] == pytest.approx(round((t1 + t2) / 2, 6), abs=1e-9)
    assert out[2]["lm_score"] == out[1]["lm_score"]  # symmetric corpus
    assert out[3]["n_bigrams"] == 0 and out[3]["lm_score"] is None
    assert out[4]["n_bigrams"] == 0 and out[4]["lm_score"] is None


def test_unseen_bigrams_get_smoothed_floor(spark, tiny):
    new = spark.createDataFrame(
        [(10, "cat the"), (11, "zebra qux")], "doc_id BIGINT, text STRING"
    )
    out = {
        r["doc_id"]: r
        for r in bigram_lm_score(new, add_k=0.5, lm_corpus=tiny).collect()
    }
    # "cat the": c2=0, c(cat)=2 -> p = .5/4.5; "zebra qux": c2=0, c1=0 -> p = .5/2.5
    assert out[10]["lm_score"] == pytest.approx(
        round(round(-math.log(0.5 / 4.5), 9), 6), abs=1e-9
    )
    assert out[11]["lm_score"] == pytest.approx(
        round(round(-math.log(0.5 / 2.5), 9), 6), abs=1e-9
    )


def test_matches_duckdb_on_real_docs(spark, sf_dir):
    import __spark_entry__ as e

    docs = e._t(spark, sf_dir, "documents").limit(150).cache()
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in bigram_lm_score(docs, add_k=0.5).collect()
    }
    pdf = docs.select("doc_id", "text").toPandas()
    duckdb.register("docs", pdf)
    want = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(
            """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
                FROM docs),
            uni AS (
                SELECT u.w AS w, count(*) AS n1
                FROM toks, unnest(t) AS u(w) GROUP BY u.w),
            v AS (SELECT count(*) AS vs FROM uni),
            bg AS (
                SELECT doc_id, b.bg AS bg, split_part(b.bg, ' ', 1) AS w1
                FROM toks,
                     unnest(list_transform(generate_series(2, len(t)),
                                           i -> t[i-1] || ' ' || t[i])) AS b(bg)),
            c2 AS (SELECT bg, count(*) AS n2 FROM bg GROUP BY bg),
            terms AS (
                SELECT doc_id,
                       CAST(round(-ln((n2 + 0.5) / (n1 + 0.5 * vs)), 9)
                            AS DECIMAL(20,9)) AS term
                FROM bg JOIN c2 USING (bg) JOIN uni ON bg.w1 = uni.w, v),
            per AS (SELECT doc_id, count(*) AS nb,
                           CAST(sum(term) AS DECIMAL(38,9)) AS s
                    FROM terms GROUP BY doc_id)
            SELECT d.doc_id, CAST(coalesce(nb, 0) AS INT),
                   round(CAST(s AS DOUBLE) / nb, 6)
            FROM (SELECT DISTINCT doc_id FROM docs) d
            LEFT JOIN per USING (doc_id)
            """
        ).fetchall()
    }
    duckdb.unregister("docs")
    assert got == want


def test_no_token_string_shuffle(tiny):
    # every exchange key is a 32-hex digest or the doc id — raw token /
    # bigram strings never cross a shuffle boundary
    plan = (
        bigram_lm_score(tiny)._jdf.queryExecution().executedPlan().toString()
    )
    for key in ("__w", "__p.bg", "__p.w1"):
        assert f"hashpartitioning({key}" not in plan


def test_rejects_bad_k(tiny):
    with pytest.raises(ValueError):
        bigram_lm_score(tiny, add_k=0.0)


def test_bm25_closed_form(spark):
    import math
    from nbdatatools_spark.operators.lm import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple cherry"),
            (3, "durian elderberry fig"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: (r["score"], r["rank"])
           for r in bm25_topk(df, ["apple", "banana"], top_k=3).collect()}
    # N=3, avgdl=8/3; df(apple)=2, df(banana)=1
    avgdl = 8 / 3
    idf_a = round(math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5)), 9)
    idf_b = round(math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5)), 9)

    def c(idf, tf, dl):
        return round(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 9)

    s1 = round(c(idf_a, 2, 3) + c(idf_b, 1, 3), 6)
    s2 = round(c(idf_a, 1, 2), 6)
    assert out[1] == (pytest.approx(s1, abs=1e-9), 1)
    assert out[2] == (pytest.approx(s2, abs=1e-9), 2)
    assert 3 not in out  # no query terms -> unscored, not rank 3


def test_bm25_case_insensitive_and_validation(spark):
    from nbdatatools_spark.operators.lm import bm25_topk

    df = spark.createDataFrame([(1, "Apple APPLE")], "doc_id BIGINT, text STRING")
    assert bm25_topk(df, ["aPpLe"], top_k=1).collect()[0]["doc_id"] == 1
    with pytest.raises(ValueError):
        bm25_topk(df, [])
    with pytest.raises(ValueError):
        bm25_topk(df, ["x"], top_k=0)


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ranked_lists(spark):
    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id BIGINT, rank INT"
    )
    dense = spark.createDataFrame(
        [(11, 1), (10, 2), (13, 3)], "doc_id BIGINT, rank INT"
    )
    return lex, dense


def test_rrf_closed_form(ranked_lists):
    from nbdatatools_spark.operators.lm import rrf_fuse

    lex, dense = ranked_lists
    out = {r["doc_id"]: r for r in rrf_fuse([lex, dense], k0=60, top_k=10).collect()}

    def term(rank):
        return round(1.0 / (60 + rank), 9)

    # doc 10: ranks 1 (lex) + 2 (dense); doc 11: 2 + 1 -> identical scores,
    # tie breaks on doc_id
    s_both = round(term(1) + term(2), 6)
    assert out[10]["rrf_score"] == pytest.approx(s_both, abs=1e-9)
    assert out[11]["rrf_score"] == pytest.approx(s_both, abs=1e-9)
    assert out[10]["rank"] == 1 and out[11]["rank"] == 2  # id tie-break
    assert out[10]["n_lists"] == 2
    # single-list docs contribute one term only
    assert out[12]["n_lists"] == 1
    assert out[12]["rrf_score"] == pytest.approx(round(term(3), 6), abs=1e-9)
    assert out[13]["rrf_score"] == pytest.approx(round(term(3), 6), abs=1e-9)
    # 12 vs 13 same score -> id order
    assert out[12]["rank"] < out[13]["rank"]


def test_rrf_top_k_and_three_lists(ranked_lists, spark):
    from nbdatatools_spark.operators.lm import rrf_fuse

    lex, dense = ranked_lists
    third = spark.createDataFrame([(12, 1)], "doc_id BIGINT, rank INT")
    out = rrf_fuse([lex, dense, third], k0=60, top_k=3).collect()
    assert len(out) == 3
    assert [r["rank"] for r in out] == [1, 2, 3]
    # docs 10/11 (1/61 + 1/62 each) still beat doc 12's 1/61 + 1/63;
    # doc 12's second contribution lifts it past solo doc 13
    assert [r["doc_id"] for r in out] == [10, 11, 12]
    assert out[2]["n_lists"] == 2


def test_rrf_validation(ranked_lists):
    from nbdatatools_spark.operators.lm import rrf_fuse

    lex, _ = ranked_lists
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([lex], k0=0)
    with pytest.raises(ValueError):
        rrf_fuse([lex], top_k=0)


# ---------------------------------------------------------------------------
# posting_lists
# ---------------------------------------------------------------------------

def test_posting_lists_closed_form(spark):
    from nbdatatools_spark.operators.lm import posting_lists

    rows = [
        (3, "apple banana apple"),   # dup token within doc collapses
        (1, "apple cherry"),
        (2, "apple"),
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r["token"]: r for r in posting_lists(docs).collect()}
    assert out["apple"]["df"] == 3
    assert out["apple"]["postings"] == [1, 2, 3]  # sorted, not arrival order
    assert out["banana"]["df"] == 1 and out["banana"]["postings"] == [3]


def test_posting_lists_cap_and_min_df(spark):
    from nbdatatools_spark.operators.lm import posting_lists

    rows = [(i, "stopword plus%d" % (i % 3)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r["token"]: r for r in posting_lists(docs, max_postings=4, min_df=4).collect()}
    # stopword in all 10 docs: df reports 10, postings capped to lowest 4 ids
    assert out["stopword"]["df"] == 10
    assert out["stopword"]["postings"] == [0, 1, 2, 3]
    # plus0 appears in docs 0,3,6,9 (df=4); plus1/plus2 have df=3 -> pruned
    assert set(out) == {"stopword", "plus0"}

    with pytest.raises(ValueError):
        posting_lists(docs, min_df=0)
    with pytest.raises(ValueError):
        posting_lists(docs, max_postings=0)
