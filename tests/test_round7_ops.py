"""Round-7 operator closed-forms: sentence dedup, temperature mixture,
containment pairs."""

import pytest
from pyspark.sql import functions as F


def test_sentence_dedup_closed_form(spark):
    from nbdatatools_spark.operators.dedup import sentence_dedup

    boiler = "Subscribe to our newsletter today."
    docs = spark.createDataFrame(
        [
            (1, f"Alpha beta gamma. {boiler} Unique one here."),
            (2, f"{boiler} Another unique sentence."),
            (3, "Nothing shared at all."),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in sentence_dedup(docs, min_docs=2).collect()}
    assert out[1]["n_sentences"] == 3 and out[1]["n_removed"] == 1
    assert out[1]["text_dedup"] == "Alpha beta gamma. Unique one here."
    assert out[2]["n_sentences"] == 2 and out[2]["n_removed"] == 1
    assert out[2]["text_dedup"] == "Another unique sentence."
    assert out[3]["n_removed"] == 0
    assert out[4]["n_sentences"] == 0 and out[4]["text_dedup"] == ""
    with pytest.raises(ValueError):
        sentence_dedup(docs, min_docs=1)


def test_sentence_dedup_partition_invariant(spark, documents):
    from nbdatatools_spark.operators.dedup import sentence_dedup

    a = sentence_dedup(documents).collect()
    b = sentence_dedup(documents.repartition(7)).collect()
    assert a == b


def test_temperature_mixture_closed_form(spark):
    from nbdatatools_spark.operators.sampling import temperature_mixture_rates

    df = spark.createDataFrame(
        [("a",)] * 90 + [("b",)] * 10, "source string"
    )
    # T=1: natural distribution already matches the target -> keep all
    t1 = {r["stratum"]: r for r in temperature_mixture_rates(df, temperature=1.0).collect()}
    assert t1["a"]["rate"] == pytest.approx(1.0, abs=1e-6)
    assert t1["b"]["rate"] == pytest.approx(1.0, abs=1e-6)
    # T=2: p ∝ sqrt(w) -> the rare stratum keeps everything, the big one
    # downsamples to 90 * (sqrt(90)/90 * 10/sqrt(10)) = sqrt(900) * ...
    t2 = {r["stratum"]: r for r in temperature_mixture_rates(df, temperature=2.0).collect()}
    assert t2["b"]["rate"] == pytest.approx(1.0, abs=1e-6)
    want_a = (90 ** 0.5 / 90) * (10 / 10 ** 0.5)
    assert t2["a"]["rate"] == pytest.approx(want_a, abs=1e-6)
    # expected weights realize the target proportions p ∝ sqrt(w)
    ea, eb = t2["a"]["expected_weight"], t2["b"]["expected_weight"]
    assert ea / eb == pytest.approx((90 / 10) ** 0.5, rel=1e-4)
    with pytest.raises(ValueError):
        temperature_mixture_rates(df, temperature=0)
    with pytest.raises(ValueError):
        temperature_mixture_rates(df, cap=0)


def test_containment_asymmetric_pairs(spark):
    from nbdatatools_spark.operators.dedup import containment_verify

    long_text = "the quick brown fox jumps over the lazy dog " * 6
    short_text = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, "completely different words")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = {(r["id_a"], r["id_b"]): r for r in containment_verify(
        cand, docs, threshold=0.5
    ).collect()}
    # short doc fully embedded: containment ~1 even though Jaccard is low
    assert (1, 2) in out and out[(1, 2)]["c_ba"] >= 0.95
    assert out[(1, 2)]["c_ab"] < 0.95  # asymmetry: long side not contained
    assert (1, 3) not in out


def test_containment_max_pairs_deterministic(spark, documents):
    from nbdatatools_spark.operators.dedup import (
        containment_verify,
        minhash_lsh_candidates,
    )

    cand = minhash_lsh_candidates(
        documents, num_hashes=16, bands=4, shingle_size=5, impl="md5"
    )
    full = {
        (r["id_a"], r["id_b"])
        for r in containment_verify(cand, documents, threshold=0.2).collect()
    }
    a = containment_verify(cand, documents, threshold=0.2, max_pairs=10).collect()
    b = containment_verify(
        cand.repartition(7), documents, threshold=0.2, max_pairs=10
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # content-stable sample
    assert {(r["id_a"], r["id_b"]) for r in a} <= full


def test_temperature_mixture_zero_weight_strata_dropped(spark):
    from pyspark.sql import functions as F

    from nbdatatools_spark.operators.sampling import temperature_mixture_rates

    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 0), ("b", 0), ("c", 10)],
        "source string, tok int",
    )
    rows = temperature_mixture_rates(df, weight_col="tok", temperature=2.0).collect()
    strata = {r["stratum"] for r in rows}
    assert strata == {"a", "c"}  # zero-mass stratum dropped, not NaN-poisoned
    assert all(r["rate"] == r["rate"] for r in rows)  # no NaN


def test_unigram_empty_corpus_raises(spark):
    import pytest

    from nbdatatools_spark.operators.unigram import unigram_train

    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        unigram_train(df)
