"""Round-6 batch-2 operator tests: ZCA whitening, JL projection,
point-in-time SCD2 join, contrastive pair mining, n-gram novelty,
vocabulary growth."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# --- ZCA whitening ----------------------------------------------------------


def test_zca_whiten_identity_covariance(spark, embeddings):
    from nbdatatools_spark.operators.analysis import zca_whiten

    wdf, evals = zca_whiten(embeddings, "embedding", dims=8, eps=1e-9)
    aggs = []
    for j in range(8):
        aggs += [F.var_pop(f"w{j}").alias(f"v{j}"), F.avg(f"w{j}").alias(f"m{j}")]
    aggs += [F.covar_pop("w0", "w3").alias("c03"), F.covar_pop("w1", "w7").alias("c17")]
    st = wdf.agg(*aggs).first()
    for j in range(8):
        assert abs(st[f"v{j}"] - 1.0) < 1e-3, (j, st[f"v{j}"])
        assert abs(st[f"m{j}"]) < 1e-9
    assert abs(st["c03"]) < 1e-6 and abs(st["c17"]) < 1e-6
    assert all(v > 0 for v in evals)


def test_zca_whiten_numpy_differential(spark, embeddings):
    from nbdatatools_spark.operators.analysis import zca_whiten

    wdf, _ = zca_whiten(embeddings, "embedding", dims=4, eps=1e-9)
    rows = wdf.orderBy("vec_id").limit(20).collect()
    raw = embeddings.orderBy("vec_id").collect()
    x = np.array([r["embedding"][:4] for r in raw], dtype=np.float64)
    # replicate: population covariance from the engine's rounded path is
    # close to numpy's; whitening then matches to small tolerance
    mu = x.mean(0)
    cov = np.cov(x.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    w = vecs @ np.diag(1.0 / np.sqrt(vals + 1e-9)) @ vecs.T
    y = (x - mu) @ w
    for i, r in enumerate(rows):
        got = np.array([r[f"w{j}"] for j in range(4)])
        assert np.allclose(got, y[i], atol=1e-3), i


# --- JL projection ----------------------------------------------------------


def test_jl_matrix_deterministic_and_gaussianish(spark):
    from nbdatatools_spark.operators.analysis import jl_matrix

    a = jl_matrix(32, 8, seed=7)
    b = jl_matrix(32, 8, seed=7)
    assert a == b
    flat = [v for row in a for v in row]
    m = sum(flat) / len(flat)
    var = sum((v - m) ** 2 for v in flat) / len(flat)
    assert abs(m) < 0.2 and 0.6 < var < 1.5  # 256 samples of N(0,1)


def test_jl_projection_preserves_distances(spark, embeddings):
    from nbdatatools_spark.operators.analysis import jl_project

    proj = jl_project(embeddings, out_dim=16, dims=64, seed=42)
    rows = proj.orderBy("vec_id").limit(40).collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    y = np.array([r["projected"] for r in rows])
    ratios = []
    for i in range(0, 38, 2):
        od = np.linalg.norm(x[i] - x[i + 1])
        pd = np.linalg.norm(y[i] - y[i + 1])
        if od > 0:
            ratios.append(pd / od)
    # JL with k=16: distortion concentrated around 1 (loose tolerance)
    assert ratios and 0.4 < min(ratios) and max(ratios) < 1.8
    assert abs(np.mean(ratios) - 1.0) < 0.3


# --- PIT join ---------------------------------------------------------------


def test_pit_join_matches_interval_semantics(spark):
    dim = spark.createDataFrame(
        [
            (1, "a", 10, 20),
            (1, "b", 20, 30),
            (1, "c", 30, None),
            (2, "x", 15, None),
        ],
        "k int, attr string, valid_from int, valid_to int",
    )
    facts = spark.createDataFrame(
        [(1, 9), (1, 10), (1, 20), (1, 29), (1, 30), (1, 99), (2, 14), (2, 15)],
        "k int, t int",
    )
    from nbdatatools_spark.operators.cdc import pit_join

    out = {
        (r["k"], r["t"]): r["dim_attr"]
        for r in pit_join(
            facts, dim, keys=["k"], time_col="t", values=("attr",)
        ).collect()
    }
    assert out[(1, 9)] is None          # before first version
    assert out[(1, 10)] == "a"          # valid_from inclusive
    assert out[(1, 20)] == "b"          # boundary -> new version
    assert out[(1, 29)] == "b"
    assert out[(1, 30)] == "c"          # open current version
    assert out[(1, 99)] == "c"
    assert out[(2, 14)] is None
    assert out[(2, 15)] == "x"


def test_pit_join_composite_keys(spark):
    dim = spark.createDataFrame(
        [(1, "eu", "v1", 0, 5), (1, "eu", "v2", 5, None), (1, "us", "w", 0, None)],
        "k int, region string, attr string, valid_from int, valid_to int",
    )
    facts = spark.createDataFrame(
        [(1, "eu", 4), (1, "eu", 7), (1, "us", 1)], "k int, region string, t int"
    )
    from nbdatatools_spark.operators.cdc import pit_join

    out = {
        (r["k"], r["region"], r["t"]): r["dim_attr"]
        for r in pit_join(
            facts, dim, keys=["k", "region"], time_col="t", values=("attr",)
        ).collect()
    }
    assert out[(1, "eu", 4)] == "v1"
    assert out[(1, "eu", 7)] == "v2"
    assert out[(1, "us", 1)] == "w"


# --- Contrastive pairs ------------------------------------------------------


def test_contrastive_pairs_structure(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(10))),   # 3 chunks of 4
            (2, " ".join(f"b{i}" for i in range(5))),    # 2 chunks
            (3, "short"),                                # 1 chunk -> no pairs
        ],
        "doc_id long, text string",
    )
    from nbdatatools_spark.operators.packing import contrastive_chunk_pairs

    out = contrastive_chunk_pairs(docs, chunk_size=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}  # doc 3 contributes nothing
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 1
    for r in out:
        assert r["negative_doc"] != r["doc_id"]
        assert r["chunk_b"] == r["chunk_a"] + 1
        assert r["anchor"] != r["positive"]
    # doc 2's negative comes from doc 3 (next chunked doc), doc 1's from 2
    assert by_doc[1][0]["negative_doc"] == 2
    assert by_doc[2][0]["negative_doc"] == 3


def test_contrastive_pairs_wraparound(spark, documents):
    from nbdatatools_spark.operators.packing import contrastive_chunk_pairs

    out = contrastive_chunk_pairs(documents, chunk_size=32)
    assert out.where(F.col("negative").isNull()).count() == 0
    assert out.where(F.col("negative_doc") == F.col("doc_id")).count() == 0


def test_contrastive_pairs_single_doc_corpus_nulls_negative(spark):
    """ADVICE r6: with ONE chunk-bearing document the lead() wrap would
    point at the anchor's own doc — the pair must ship a NULL negative,
    never a same-document one."""
    from nbdatatools_spark.operators.packing import contrastive_chunk_pairs

    docs = spark.createDataFrame(
        [(7, " ".join(f"w{i}" for i in range(10))), (8, "")],
        "doc_id long, text string",
    )
    out = contrastive_chunk_pairs(docs, chunk_size=4).collect()
    assert len(out) == 2  # doc 7: 3 chunks -> 2 adjacent pairs
    for r in out:
        assert r["doc_id"] == 7
        assert r["negative_doc"] is None and r["negative"] is None


# --- N-gram novelty ---------------------------------------------------------


def test_ngram_novelty_differential(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine"),
            (2, "one two three four five six seven eight nine"),  # exact dup
            (3, "totally different words appear here in this new doc"),
        ],
        "doc_id long, text string",
    )
    from nbdatatools_spark.operators.dedup import ngram_novelty

    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=8).collect()}
    assert out[1]["novel_frac"] == 1.0   # first doc: everything novel
    assert out[2]["novel_frac"] == 0.0   # exact dup: nothing novel
    assert out[3]["novel_frac"] == 1.0
    assert out[1]["n_grams"] == 2  # 9 tokens -> two 8-grams


def test_ngram_novelty_monotone_under_duplication(spark, documents):
    from nbdatatools_spark.operators.dedup import ngram_novelty

    out = ngram_novelty(documents, n=8)
    assert out.where((F.col("novel_frac") < 0) | (F.col("novel_frac") > 1)).count() == 0
    # the first document by id is always fully novel
    first = out.orderBy("doc_id").first()
    assert first["novel_frac"] == 1.0


# --- Vocab growth -----------------------------------------------------------


def test_vocab_growth_monotone_and_bounded(spark, documents):
    from nbdatatools_spark.operators.analysis import vocab_growth

    rows = vocab_growth(documents, n_buckets=10).collect()
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    toks, vocab = 0, 0
    for r in rows:
        assert r["cum_tokens"] >= toks and r["cum_vocab"] >= vocab
        toks, vocab = r["cum_tokens"], r["cum_vocab"]
        assert r["cum_vocab"] <= r["cum_tokens"]
    # sub-linear growth: vocab/token ratio decreases from first to last
    assert rows[-1]["vocab_per_token"] <= rows[0]["vocab_per_token"]


def test_vocab_growth_totals_match_direct_counts(spark, documents):
    from nbdatatools_spark.functions.text import tokens
    from nbdatatools_spark.operators.analysis import vocab_growth

    rows = vocab_growth(documents, n_buckets=5).collect()
    tok = (
        documents.select(F.explode_outer(tokens(F.lower("text"))).alias("w"))
        .where(F.col("w").isNotNull() & (F.length("w") > 0))
    )
    assert rows[-1]["cum_tokens"] == tok.count()
    assert rows[-1]["cum_vocab"] == tok.distinct().count()


def test_vocab_growth_buckets_match_sql_ntile(spark):
    """ADVICE r6: bucketing moved off the single-reducer ntile window onto
    the two-phase global index; the integer arithmetic must still equal
    SQL NTILE exactly — including the non-divisible remainder split."""
    from nbdatatools_spark.operators.analysis import vocab_growth

    docs = spark.createDataFrame(
        [(i, f"tok{i} shared") for i in range(23)], "doc_id long, text string"
    )
    rows = vocab_growth(docs, n_buckets=10).collect()
    # 23 docs / 10 buckets: NTILE gives 3,3,3,2,2,2,2,2,2,2 docs per bucket;
    # each doc contributes 2 tokens.
    sizes = [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]
    cum = 0
    for r, s in zip(rows, sizes):
        cum += 2 * s
        assert r["cum_tokens"] == cum
    # vocab: tok{i} unique per doc + 1 shared token first seen in bucket 1
    assert rows[0]["cum_vocab"] == 4 and rows[-1]["cum_vocab"] == 24


def test_vocab_growth_plan_has_no_unpartitioned_data_window(spark, documents):
    from nbdatatools_spark.operators.analysis import vocab_growth

    plan = vocab_growth(documents, n_buckets=10)._jdf.queryExecution().executedPlan().toString()
    # the only window may run over the P-row partition-count table /
    # n_buckets-row bucket table — never a Window directly above the scan
    assert "ntile" not in plan.lower()
