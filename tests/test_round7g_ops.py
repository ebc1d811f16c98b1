"""Round-7 batch-7 operator closed-forms: source concentration (Gini),
embedding isotropy sample."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _gini(weights):
    ws = sorted(weights)
    n = len(ws)
    tot = sum(ws)
    return sum((2 * (i + 1) - n - 1) * w for i, w in enumerate(ws)) / (n * tot)


def test_source_concentration_closed_form(spark):
    from nbdatatools_spark.operators.analysis import source_concentration

    # source weights 10, 30, 60 tokens
    rows = (
        [("a", " ".join(["w"] * 10))]
        + [("b", " ".join(["w"] * 30))]
        + [("c", " ".join(["w"] * 60))]
    )
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_concentration(df).collect()
    assert [r["source"] for r in out] == ["a", "b", "c"]  # ascending mass
    assert [r["weight"] for r in out] == [10, 30, 60]
    assert out[0]["share"] == pytest.approx(0.1, abs=1e-6)
    assert out[1]["cum_share"] == pytest.approx(0.4, abs=1e-6)
    assert out[2]["cum_share"] == pytest.approx(1.0, abs=1e-6)
    want = _gini([10, 30, 60])
    assert out[0]["gini"] == pytest.approx(want, abs=1e-6)
    assert len({r["gini"] for r in out}) == 1


def test_source_concentration_extremes(spark):
    from nbdatatools_spark.operators.analysis import source_concentration

    even = spark.createDataFrame(
        [(f"s{i}", "w w w w") for i in range(8)], "source string, text string"
    )
    assert source_concentration(even).first()["gini"] == pytest.approx(
        0.0, abs=1e-6
    )
    skew = spark.createDataFrame(
        [("big", " ".join(["w"] * 1000))]
        + [(f"s{i}", "w") for i in range(9)],
        "source string, text string",
    )
    g = source_concentration(skew).first()["gini"]
    assert g > 0.85


def test_source_concentration_partition_invariant(spark, documents):
    from nbdatatools_spark.operators.analysis import source_concentration

    a = source_concentration(documents).collect()
    b = source_concentration(documents.repartition(7)).collect()
    assert a == b
    cs = [r["cum_share"] for r in a]
    assert cs == sorted(cs)


def test_embedding_isotropy_closed_form(spark):
    from nbdatatools_spark.operators.analysis import embedding_isotropy

    # 6 vectors, sample 4 by smallest md5(id): replicate selection + stats
    vecs = {
        i: [float(x) for x in np.random.RandomState(i).randn(8)]
        for i in range(6)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    out = embedding_isotropy(df, sample_size=4).first()
    sel = sorted(range(6), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:4]
    cos = []
    for x in range(len(sel)):
        for y in range(x + 1, len(sel)):
            a_id, b_id = sorted((sel[x], sel[y]))
            va, vb = np.array(vecs[a_id]), np.array(vecs[b_id])
            cos.append(
                float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            )
    assert out["n_sampled"] == 4 and out["n_pairs"] == 6
    assert out["mean_cos"] == pytest.approx(np.mean(cos), abs=1e-5)
    assert out["mean_abs_cos"] == pytest.approx(
        np.mean(np.abs(cos)), abs=1e-5
    )
    assert out["max_abs_cos"] == pytest.approx(np.max(np.abs(cos)), abs=1e-5)
    with pytest.raises(ValueError):
        embedding_isotropy(df, sample_size=1)


def test_embedding_isotropy_detects_anisotropy(spark):
    from nbdatatools_spark.operators.analysis import embedding_isotropy

    rng = np.random.RandomState(0)
    # narrow cone: common direction + small noise
    base = rng.randn(16)
    aniso = [
        (i, [float(x) for x in base + 0.1 * rng.randn(16)])
        for i in range(100)
    ]
    iso = [(i, [float(x) for x in rng.randn(16)]) for i in range(100)]
    schema = "vec_id long, embedding array<double>"
    r_aniso = embedding_isotropy(
        spark.createDataFrame(aniso, schema), sample_size=32
    ).first()
    r_iso = embedding_isotropy(
        spark.createDataFrame(iso, schema), sample_size=32
    ).first()
    assert r_aniso["mean_cos"] > 0.9
    assert abs(r_iso["mean_cos"]) < 0.3


def test_embedding_isotropy_partition_invariant(spark, embeddings):
    from nbdatatools_spark.operators.analysis import embedding_isotropy

    a = embedding_isotropy(embeddings, sample_size=32).collect()
    b = embedding_isotropy(embeddings.repartition(7), sample_size=32).collect()
    assert a == b
    assert a[0]["n_pairs"] == 32 * 31 // 2


def test_score_quantile_align_closed_form(spark):
    from nbdatatools_spark.operators.evaluation import score_quantile_align

    rows = [
        ("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 30.0), ("a", 40.0),
        ("b", 1.0),
    ]
    df = spark.createDataFrame(rows, "source string, score double")
    out = score_quantile_align(df, "score", "source").collect()
    got = sorted((r["source"], r["score"], r["score_pct"]) for r in out)
    # group a (n=5, n-1=4): ranks 1, (2+3)/2=2.5, 2.5, 4, 5 ->
    # pct (r-1)/4 = 0, .375, .375, .75, 1.0; single-row group b -> 0.5
    want = [
        ("a", 10.0, 0.0),
        ("a", 20.0, 0.375),
        ("a", 20.0, 0.375),
        ("a", 30.0, 0.75),
        ("a", 40.0, 1.0),
        ("b", 1.0, 0.5),
    ]
    for (gs, ss, ps), (gw, sw, pw) in zip(got, want):
        assert (gs, ss) == (gw, sw)
        assert ps == pytest.approx(pw, abs=1e-6)


def test_score_quantile_align_preserves_auc_and_rows(spark, documents):
    from pyspark.sql import functions as F

    from nbdatatools_spark.functions.text import quality_score
    from nbdatatools_spark.operators.evaluation import (
        grouped_ranking_auc,
        score_quantile_align,
    )

    scored = documents.select(
        "source",
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("score"),
        (F.col("n_chars") >= 400).alias("y"),
    )
    aligned = score_quantile_align(scored, "score", "source")
    assert aligned.count() == scored.count()
    # percent-rank is a monotone within-slice transform: per-slice AUC
    # is invariant
    a = {r["source"]: r["auc"] for r in
         grouped_ranking_auc(scored, "score", "y", "source").collect()}
    b = {r["source"]: r["auc"] for r in
         grouped_ranking_auc(aligned, "score_pct", "y", "source").collect()}
    for s in a:
        if a[s] is not None:
            assert b[s] == pytest.approx(a[s], abs=1e-6)
    # partition invariance
    x = sorted(map(tuple, score_quantile_align(
        scored, "score", "source").collect()))
    yy = sorted(map(tuple, score_quantile_align(
        scored.repartition(7), "score", "source").collect()))
    assert x == yy


def test_ppmi_word_vectors_topic_geometry(spark):
    from nbdatatools_spark.operators.lm import ppmi_word_vectors

    # rotations make within-topic co-occurrence symmetric, so every
    # within-topic pair shares the same context profile
    animal_rots = ["cat dog pet", "dog pet cat", "pet cat dog"]
    car_rots = ["car road drive", "road drive car", "drive car road"]
    docs = [(i, animal_rots[i % 3]) for i in range(21)] + [
        (100 + i, car_rots[i % 3]) for i in range(21)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["token"]: np.array(r["vector"]) for r in
           ppmi_word_vectors(df, vocab_size=16, dim=2).collect()}
    assert set(out) == {"cat", "dog", "pet", "car", "road", "drive"}

    def cos(a, b):
        return float(out[a] @ out[b]) / (
            np.linalg.norm(out[a]) * np.linalg.norm(out[b])
        )

    within = min(cos("cat", "dog"), cos("cat", "pet"), cos("car", "road"))
    across = max(cos("cat", "car"), cos("dog", "road"), cos("pet", "drive"))
    assert within > across + 0.3

    with pytest.raises(ValueError):
        ppmi_word_vectors(df, window=0)
    with pytest.raises(ValueError):
        ppmi_word_vectors(df, dim=0)


def test_ppmi_word_vectors_deterministic(spark, documents):
    from nbdatatools_spark.operators.lm import ppmi_word_vectors

    # sf0.001 documents hold 31 distinct tokens (the HLL gate's
    # exact_distinct), so a 16-token vocab is always fully populated
    a = ppmi_word_vectors(documents, vocab_size=16, dim=8).collect()
    b = ppmi_word_vectors(
        documents.repartition(7), vocab_size=16, dim=8
    ).collect()
    assert a == b
    assert len(a) == 16
    freqs = [r["freq"] for r in a]
    assert freqs == sorted(freqs, reverse=True)
    assert all(len(r["vector"]) == 8 for r in a)
