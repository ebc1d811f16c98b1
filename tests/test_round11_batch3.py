"""Round-11 candidate batch 3: filter funnel, per-slice KN perplexity,
per-group centroid drift."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.analysis import centroid_drift
from nbdatatools_spark.operators.lm import (
    kn_perplexity_by_slice,
    kn_perplexity_score,
)
from nbdatatools_spark.plans.pipeline import filter_funnel


# -- filter_funnel -----------------------------------------------------------


def _docs(spark):
    rows = [
        # (doc_id, text, lang, n_chars): tokens = whitespace count
        (0, "a b c d", "en", 200),
        (1, "a b", "en", 50),          # dies at len stage
        (2, "x y z", "fr", 300),       # dies at lang stage
        (3, "p q r s t", "en", 400),
        (4, "", "en", 0),              # 0 tokens; dies at len stage
        (5, "m n", None, 150),         # NULL lang drops (WHERE semantics)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )


def _stages():
    return [
        ("lang_en", F.col("lang") == "en"),
        ("len_100_400", F.col("n_chars").between(100, 400)),
        ("min_3_tokens", F.length(F.trim("text")) > 0),
    ]


def test_funnel_hand_computed(spark):
    out = filter_funnel(_docs(spark), _stages()).collect()
    by_stage = {r["stage"]: r for r in out}
    assert [r["name"] for r in out] == [
        "input", "lang_en", "len_100_400", "min_3_tokens",
    ]
    # input: 6 docs, tokens 4+2+3+5+0+2 = 16
    assert (by_stage[0]["docs"], by_stage[0]["tokens"]) == (6, 16)
    assert by_stage[0]["pct_docs"] == 1.0 and by_stage[0]["drop_docs"] == 0
    # lang_en keeps ids 0,1,3,4 (fr and NULL drop): 4 docs, 11 tokens
    assert (by_stage[1]["docs"], by_stage[1]["tokens"]) == (4, 11)
    assert by_stage[1]["drop_docs"] == 2 and by_stage[1]["drop_tokens"] == 5
    # + len filter keeps 0,3: 2 docs, 9 tokens
    assert (by_stage[2]["docs"], by_stage[2]["tokens"]) == (2, 9)
    # + nonempty text keeps both
    assert (by_stage[3]["docs"], by_stage[3]["tokens"]) == (2, 9)
    # integer half-up pct: 2/6 = 0.333333..3 -> (2*2*1e6 + 6) div 12 = 333333
    assert by_stage[2]["pct_docs"] == 0.333333
    # 11/16 = 0.6875 exactly on-grid
    assert by_stage[1]["pct_tokens"] == 0.6875


def test_funnel_halfup_tie(spark):
    # 1/8 = 0.125 exact; 1/3 -> 0.333333; 5/8 = 0.625; a true .5 tie:
    # docs ratio 1/1600000? simpler: tokens 3 of 8 = 0.375 exact, and
    # 7/8 at stage names differ — construct d0=1600000-free tie via
    # 1/16 = 0.0625 (on-grid) and 1/6 (rounds up at 6dp half-up:
    # 0.1666665 -> .166667? exact rational .1666666... -> floor to
    # 166666.6 -> half-up integer mean gives 166667).
    rows = [(i, "t", "en", 10) for i in range(6)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    out = filter_funnel(
        df, [("one", F.col("doc_id") == 0)]
    ).collect()
    assert out[1]["pct_docs"] == 0.166667  # half-up of 1/6


def test_funnel_empty_input_and_validation(spark):
    empty = _docs(spark).where(F.lit(False))
    out = filter_funnel(empty, _stages()).collect()
    assert all(r["docs"] == 0 and r["pct_docs"] is None for r in out)
    with pytest.raises(ValueError, match="non-empty"):
        filter_funnel(_docs(spark), [])
    with pytest.raises(ValueError, match="duplicate"):
        filter_funnel(
            _docs(spark), [("a", F.lit(True)), ("a", F.lit(False))]
        )


def test_funnel_token_col_passthrough(spark):
    df = _docs(spark).withColumn("nt", F.lit(10).cast("long"))
    out = filter_funnel(df, _stages(), token_col="nt").collect()
    assert out[0]["tokens"] == 60  # 6 docs x 10


# -- kn_perplexity_by_slice --------------------------------------------------


def test_slice_perplexity_matches_per_doc_aggregation(spark, sf_dir):
    """Slice means must equal the integer half-up mean of the per-doc
    micro means that kn_perplexity_score reports (shared term stream)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.where(F.col("doc_id") % 3 != 0)
    score = docs.where(F.col("doc_id") % 3 == 0)
    per_doc = kn_perplexity_score(train, score).collect()
    src = {
        r["doc_id"]: r["source"]
        for r in docs.select("doc_id", "source").collect()
    }
    agg = {}
    for r in per_doc:
        micro = round(-r["mean_logp"] * 1e6)
        g = src[r["doc_id"]]
        agg.setdefault(g, []).append(micro)
    out = kn_perplexity_by_slice(train, score).collect()
    assert len(out) == len(agg)
    for r in out:
        micros = agg[r["source"]]
        n = len(micros)
        expect = (2 * sum(micros) + n) // (2 * n)
        assert r["n_docs"] == n
        assert math.isclose(r["mean_logp"], -expect / 1e6, abs_tol=1e-12)
        assert r["perplexity"] == round(math.exp(expect / 1e6), 6)


def test_slice_perplexity_tiers(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = kn_perplexity_by_slice(
        docs.where(F.col("doc_id") % 3 != 0),
        docs.where(F.col("doc_id") % 3 == 0),
    ).collect()
    # rows ordered best (lowest ppl) first; tiers are contiguous terciles
    ppl = [r["perplexity"] for r in out]
    assert ppl == sorted(ppl)
    tiers = [r["tier"] for r in out]
    n = len(tiers)
    k = -(-n // 3)  # ntile: first ceil groups get the extra row
    assert set(tiers[:1]) == {"head"} and tiers[-1] == "tail"
    assert tiers == sorted(tiers, key=["head", "middle", "tail"].index)


# -- centroid_drift ----------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(rows, "label int, embedding array<float>")


def test_centroid_drift_hand_computed(spark):
    a = _emb(spark, [(0, [1.0, 0.0]), (0, [1.0, 0.0]), (1, [0.0, 2.0])])
    b = _emb(spark, [(0, [0.0, 1.0]), (1, [0.0, 4.0])])
    out = {r["label"]: r for r in centroid_drift(a, b).collect()}
    # label 0: centroids (1,0) vs (0,1): cosine 0, l2 sqrt(2)
    assert out[0]["n_a"] == 2 and out[0]["n_b"] == 1
    assert out[0]["cosine"] == 0.0
    assert out[0]["l2"] == round(math.sqrt(2.0), 6)
    # label 1: (0,2) vs (0,4): cosine 1, l2 2
    assert out[1]["cosine"] == 1.0 and out[1]["l2"] == 2.0


def test_centroid_drift_identical_snapshots(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = centroid_drift(emb, emb).collect()
    assert len(out) > 0
    for r in out:
        assert r["cosine"] == 1.0 and r["l2"] == 0.0 and r["n_a"] == r["n_b"]


def test_centroid_drift_one_sided_group(spark):
    a = _emb(spark, [(0, [1.0, 0.0]), (7, [3.0, 4.0])])
    b = _emb(spark, [(0, [1.0, 0.0])])
    out = {r["label"]: r for r in centroid_drift(a, b).collect()}
    assert out[7]["n_a"] == 1 and out[7]["n_b"] is None
    assert out[7]["cosine"] is None and out[7]["l2"] is None


# -- dedup_savings -----------------------------------------------------------


def test_dedup_savings_consistent_with_cluster_sizes(spark, sf_dir):
    from nbdatatools_spark.operators.dedup import (
        dedup_cluster_sizes,
        dedup_savings,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kw = dict(num_hashes=32, bands=8, shingle_size=5, threshold=0.5, impl="md5")
    hist = {
        r["cluster_size"]: r["n_clusters"]
        for r in dedup_cluster_sizes(docs, **kw).collect()
    }
    sav = dedup_savings(docs, **kw).collect()
    assert {r["cluster_size"]: r["n_clusters"] for r in sav} == hist
    for r in sav:
        assert r["docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["docs_removed"] == (r["cluster_size"] - 1) * r["n_clusters"]
        if r["cluster_size"] == 1:
            assert r["tokens_removed"] == 0
        else:
            assert 0 <= r["tokens_removed"] < r["tokens"]
    # total docs reconcile with the corpus
    assert sum(r["docs"] for r in sav) == docs.count()


def test_dedup_savings_min_id_survivor(spark):
    from nbdatatools_spark.operators.dedup import dedup_savings

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (10, base + " tail one"),   # near-dup pair: min id 10 survives
        (20, base + " tail two!"),
        (30, "completely different text with nothing shared here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["cluster_size"]: r for r in dedup_savings(df).collect()}
    assert out[2]["n_clusters"] == 1 and out[1]["n_clusters"] == 1
    # survivor = doc 10 (13 tokens); removed = doc 20's 13 tokens
    nt10, nt20 = len(rows[0][1].split()), len(rows[1][1].split())
    assert out[2]["tokens"] == nt10 + nt20
    assert out[2]["tokens_removed"] == nt20


# -- contamination_by_slice --------------------------------------------------


def test_source_contamination_consistent_with_frac(spark, sf_dir):
    from nbdatatools_spark.operators.dedup import (
        contamination_by_slice,
        contamination_fraction,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.where(F.col("doc_id") % 101 != 0)
    test = docs.where(F.col("doc_id") % 101 == 0)
    frac = contamination_fraction(train, test, n=13).collect()
    src = {
        r["doc_id"]: r["source"]
        for r in docs.select("doc_id", "source").collect()
    }
    hit_by_src = {}
    for r in frac:
        if r["n_contaminated"] > 0:
            g = src[r["id"]]
            hit_by_src[g] = hit_by_src.get(g, 0) + 1
    out = contamination_by_slice(train, test, n=13).collect()
    for r in out:
        assert r["n_contaminated"] == hit_by_src.get(r["source"], 0)
        if r["n_docs"]:
            expect = (2 * r["n_contaminated"] * 10**6 + r["n_docs"]) // (
                2 * r["n_docs"]
            )
            assert r["doc_rate"] == expect / 1e6


def test_source_contamination_hand_built(spark):
    from nbdatatools_spark.operators.dedup import contamination_by_slice

    gram = " ".join(f"w{i}" for i in range(13))
    train = spark.createDataFrame(
        [
            (1, "src_a", gram + " trailing tokens here"),
            (2, "src_a", "totally clean text " + " ".join(f"c{i}" for i in range(13))),
            (3, "src_b", "also clean " + " ".join(f"d{i}" for i in range(13))),
        ],
        "doc_id long, source string, text string",
    )
    test = spark.createDataFrame(
        [(100, "bench", gram)], "doc_id long, source string, text string"
    )
    out = {r["source"]: r for r in contamination_by_slice(train, test).collect()}
    assert out["src_a"]["n_contaminated"] == 1 and out["src_a"]["n_docs"] == 2
    assert out["src_a"]["doc_rate"] == 0.5
    assert out["src_a"]["tokens_contaminated"] == 16  # 13-gram + 3 trailing
    assert out["src_b"]["n_contaminated"] == 0
    assert out["src_b"]["doc_rate"] == 0.0 and out["src_b"]["token_rate"] == 0.0
