"""Round-7 batch-5 operator closed-forms: intrinsic dimension, TextRank,
length-batching audit."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


def _pr_reference(mat):
    c = np.cov(np.asarray(mat).T, bias=True)
    tr = np.trace(c)
    fr = (c * c).sum()
    return tr * tr / fr


def test_intrinsic_dim_isotropic_vs_rank1(spark):
    from nbdatatools_spark.operators.analysis import intrinsic_dimension

    rng = np.random.RandomState(3)
    iso = rng.randn(300, 8)
    r = intrinsic_dimension(_emb_df(spark, iso), impl="expr").first()
    assert r["d"] == 8 and r["n"] == 300
    assert r["intrinsic_dim"] == pytest.approx(_pr_reference(iso), abs=0.05)
    assert r["intrinsic_dim"] > 6.0  # isotropic: close to d

    direction = rng.randn(8)
    rank1 = np.outer(rng.randn(300), direction) + 0.01 * rng.randn(300, 8)
    r1 = intrinsic_dimension(_emb_df(spark, rank1), impl="expr").first()
    assert r1["intrinsic_dim"] < 1.2  # one dominant direction

    with pytest.raises(ValueError):
        intrinsic_dimension(_emb_df(spark, iso), dims=0)
    with pytest.raises(ValueError):
        intrinsic_dimension(_emb_df(spark, iso), impl="nope")


def test_intrinsic_dim_gemm_matches_expr(spark):
    from nbdatatools_spark.operators.analysis import intrinsic_dimension

    rng = np.random.RandomState(11)
    mat = rng.randn(200, 12) * [1, 1, 1, 2, 2, 3, 1, 1, 0.5, 0.2, 4, 1]
    df = _emb_df(spark, mat)
    e = intrinsic_dimension(df, impl="expr").first()
    g = intrinsic_dimension(df, impl="gemm").first()
    assert e == g  # bit-equal by the shared rounding chain
    # auto routes d=12 <= 16 to expr, d>16 to gemm
    a = intrinsic_dimension(df, impl="auto").first()
    assert a == e


def test_intrinsic_dim_partition_invariant(spark, embeddings):
    from nbdatatools_spark.operators.analysis import intrinsic_dimension

    a = intrinsic_dimension(embeddings, dims=16, impl="expr").first()
    b = intrinsic_dimension(
        embeddings.repartition(7), dims=16, impl="expr"
    ).first()
    assert a == b


def test_textrank_bridging_term_wins(spark):
    from nbdatatools_spark.operators.analysis import textrank_keywords

    # "hub" co-occurs with every topic word; "alpha" only with itself
    docs = []
    for i in range(10):
        docs.append((i, f"hub topic{i} hub topic{i}"))
    docs += [(100 + i, "alpha alpha alpha alpha") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textrank_keywords(
        df, min_count=2, topk=5, id_col="doc_id"
    ).collect()
    assert out[0]["token"] == "hub"
    toks = [r["token"] for r in out]
    # alpha has no edges (self-pairs excluded) -> not in the graph
    assert "alpha" not in toks
    with pytest.raises(ValueError):
        textrank_keywords(df, window=0)
    with pytest.raises(ValueError):
        textrank_keywords(df, min_count=0)


def test_textrank_deterministic_and_invariant(spark, documents):
    from nbdatatools_spark.operators.analysis import textrank_keywords

    a = textrank_keywords(
        documents, min_count=10, topk=10, id_col="doc_id"
    ).collect()
    b = textrank_keywords(
        documents.repartition(7), min_count=10, topk=10, id_col="doc_id"
    ).collect()
    assert a == b
    assert len(a) == 10
    ranks = [r["rank"] for r in a]
    assert ranks == sorted(ranks, reverse=True)


def test_length_batching_audit_closed_form(spark):
    from nbdatatools_spark.operators.packing import length_batching_audit

    # lengths by id order: 10, 1, 10, 1 -> arrival batches (B=2):
    # [10,1] pad 9, [10,1] pad 9 => 18; sorted: [1,1] pad 0, [10,10] pad 0
    rows = [
        (1, " ".join(["w"] * 10)),
        (2, "w"),
        (3, " ".join(["w"] * 10)),
        (4, "w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["strategy"]: r for r in
           length_batching_audit(df, batch_size=2).collect()}
    arr, srt = out["arrival"], out["sorted"]
    assert arr["n_docs"] == 4 and arr["n_batches"] == 2
    assert arr["total_tokens"] == 22
    assert arr["padded_tokens"] == 18
    assert arr["waste_ratio"] == pytest.approx(18 / 40, abs=1e-6)
    assert srt["padded_tokens"] == 0
    assert srt["waste_ratio"] == 0.0
    with pytest.raises(ValueError):
        length_batching_audit(df, batch_size=0)


def test_length_batching_partial_batch_and_invariance(spark, documents):
    from nbdatatools_spark.operators.packing import length_batching_audit

    a = length_batching_audit(documents, batch_size=32).collect()
    b = length_batching_audit(
        documents.repartition(7), batch_size=32
    ).collect()
    assert a == b
    out = {r["strategy"]: r for r in a}
    # sorted batching never pads more than arrival
    assert (
        out["sorted"]["padded_tokens"] <= out["arrival"]["padded_tokens"]
    )
    n = out["arrival"]["n_docs"]
    assert out["arrival"]["n_batches"] == math.ceil(n / 32)
