"""Round-10 candidate operators: deterministic reservoir / stratified
reservoir sampling (bottom-k sketch), BPE fertility-vs-vocab sweep, and
the FineWeb composite filter (flags + pipeline step)."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.functions.text import fineweb_flags, gopher_quality_flags
from nbdatatools_spark.operators.bpe import fertility_sweep
from nbdatatools_spark.operators.sampling import (
    reservoir_sample,
    sample_hash,
    stratified_reservoir,
)


# -- reservoir ----------------------------------------------------------------


def test_reservoir_exact_k_and_hash_order(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = reservoir_sample(df, k=10).collect()
    assert len(out) == 10
    # the survivors ARE the 10 smallest hashes — replay in python
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", sample_hash(F.col("doc_id")).alias("h")).collect()
    }
    want = sorted(hashes, key=lambda d: (hashes[d], d))[:10]
    assert sorted(r["doc_id"] for r in out) == sorted(want)


def test_reservoir_partition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = sorted(r["doc_id"] for r in reservoir_sample(df, k=25).collect())
    b = sorted(
        r["doc_id"]
        for r in reservoir_sample(df.repartition(13), k=25).collect()
    )
    assert a == b


def test_reservoir_incremental_stability(spark):
    # appending rows only displaces survivors with smaller hashes — the
    # kept set of the union is the bottom-25 of the union of hash orders
    base = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    more = spark.createDataFrame([(i,) for i in range(300, 400)], "doc_id long")
    k_base = set(r["doc_id"] for r in reservoir_sample(base, k=25).collect())
    k_all = set(
        r["doc_id"] for r in reservoir_sample(base.unionAll(more), k=25).collect()
    )
    # every union survivor from the base range was already a base survivor
    assert (k_all & set(range(300))) <= k_base


def test_reservoir_k_larger_than_n(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    assert reservoir_sample(df, k=50).count() == 5
    with pytest.raises(ValueError):
        reservoir_sample(df, k=0)


def test_stratified_reservoir_exact_k_per_stratum(spark):
    rows = [(i, "s%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_reservoir(df, k=7).groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in out} == {
        "s0": 7, "s1": 7, "s2": 7
    }
    # partition invariance
    a = sorted(
        (r["source"], r["doc_id"])
        for r in stratified_reservoir(df, k=7).collect()
    )
    b = sorted(
        (r["source"], r["doc_id"])
        for r in stratified_reservoir(df.repartition(11), k=7).collect()
    )
    assert a == b


def test_stratified_reservoir_small_stratum_kept_whole(spark):
    rows = [(1, "tiny"), (2, "tiny")] + [(10 + i, "big") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_reservoir(df, k=5).groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in out} == {"tiny": 2, "big": 5}


def test_reservoir_uniformity_smoke(spark):
    # content-keyed hashing should not favor low ids: mean of a 100-of-
    # 2000 sample stays within 4 sigma of the population mean
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    got = [r["doc_id"] for r in reservoir_sample(df, k=100).collect()]
    mu, n = 999.5, len(got)
    sigma = 2000 / math.sqrt(12 * n)  # se of the mean of a uniform sample
    assert abs(sum(got) / n - mu) < 4 * sigma


# -- fertility sweep ----------------------------------------------------------


def test_fertility_sweep_monotone_and_checkpoint0(spark):
    texts = [
        "aa ab aa ab abab",
        "the cat the mat",
        "aa aa aa bb bb",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = fertility_sweep(df, checkpoints=(0, 1, 2, 4)).orderBy("n_merges").collect()
    # checkpoint 0 = char segmentation: fertility == weighted mean word len
    words = [w for t in texts for w in t.split()]
    assert rows[0]["total_words"] == len(words)
    assert rows[0]["total_tokens"] == sum(len(w) for w in words)
    assert rows[0]["avg_fertility"] == round(
        sum(len(w) for w in words) / len(words), 6
    )
    ferts = [r["avg_fertility"] for r in rows]
    toks = [r["total_tokens"] for r in rows]
    vs = [r["vocab_size"] for r in rows]
    assert all(ferts[i] >= ferts[i + 1] for i in range(len(ferts) - 1))
    assert all(toks[i] >= toks[i + 1] for i in range(len(toks) - 1))
    assert all(vs[i] <= vs[i + 1] for i in range(len(vs) - 1))
    assert all(f >= 1.0 for f in ferts)


def test_fertility_sweep_each_merge_saves_its_pair_count(spark):
    from nbdatatools_spark.operators.bpe import learn_bpe_merges

    texts = ["aa ab aa ab abab", "the cat the mat"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = learn_bpe_merges(df, n_merges=3, min_count=1)
    rows = (
        fertility_sweep(df, checkpoints=tuple(range(len(merges) + 1)), min_count=1)
        .orderBy("n_merges")
        .collect()
    )
    for i, (_, _, _, cnt) in enumerate(merges):
        # merge i collapses exactly pair_count adjacent pairs into one
        assert rows[i]["total_tokens"] - rows[i + 1]["total_tokens"] == cnt


def test_fertility_sweep_validates_checkpoints(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError):
        fertility_sweep(df, checkpoints=(-1, 2))


# -- fineweb ------------------------------------------------------------------


GOOD_DOC = "\n".join(
    ["The quick brown fox jumps over the lazy dog near %d houses." % i
     for i in range(12)]
)


def test_fineweb_flags_good_doc_keeps(spark):
    df = spark.createDataFrame([(GOOD_DOC,)], "text string")
    r = df.select(fineweb_flags(F.col("text")).alias("f")).select("f.*").collect()[0]
    assert r["keep"] is True
    assert r["punct_line_frac"] == 1.0
    assert r["dup_line_frac"] == 0.0
    assert r["n_lines"] == 12


def test_fineweb_flags_rules_fire(spark):
    dup = "\n".join(["same line here."] * 10 + ["a unique line appears once."])
    shorty = "\n".join(["tiny."] * 9 + ["a sufficiently long line to balance it."])
    nopunct = "\n".join(["line without terminal punctuation %d" % i for i in range(10)])
    lorem = GOOD_DOC + "\nlorem ipsum dolor sit amet."
    rows = (
        spark.createDataFrame(
            [(1, dup), (2, shorty), (3, nopunct), (4, lorem)], "i int, text string"
        )
        .select("i", fineweb_flags(F.col("text")).alias("f"))
        .select("i", "f.*")
        .collect()
    )
    by = {r["i"]: r for r in rows}
    assert by[1]["ok_dup_lines"] is False and by[1]["ok_dup_chars"] is False
    assert by[2]["ok_short_lines"] is False
    assert by[3]["ok_punct_lines"] is False
    assert by[4]["ok_placeholder"] is False
    assert all(not by[i]["keep"] for i in (1, 2, 3, 4))


def test_fineweb_flags_empty_doc(spark):
    df = spark.createDataFrame([("",), ("   \n  ",)], "text string")
    rows = df.select(fineweb_flags(F.col("text")).alias("f")).select("f.*").collect()
    for r in rows:
        assert r["n_lines"] == 0
        # vacuous line rules pass; punct_frac 0 < 0.12 fails -> dropped
        assert r["ok_punct_lines"] is False


def test_fineweb_pipeline_step(spark):
    from nbdatatools_spark.plans.pipeline import run_pipeline

    good_words = " ".join(
        "word%d several common the and of to in %d." % (i, i) for i in range(20)
    )
    good = "\n".join(
        ["The quick brown fox jumps over the lazy dog by door %d." % i
         for i in range(10)]
    ) + "\n" + good_words
    bad = "\n".join(["dup dup dup."] * 20)
    df = spark.createDataFrame(
        [(1, good, "en"), (2, bad, "en"), (3, good, "fr")],
        "doc_id int, text string, lang string",
    )
    out, _report = run_pipeline(df, [{"op": "fineweb_filter", "langs": ["en"]}])
    ids = sorted(r["doc_id"] for r in out.collect())
    assert 2 not in ids and 3 not in ids
    # the good english doc survives iff gopher also passes; check directly
    gk = (
        df.where(F.col("doc_id") == 1)
        .select(gopher_quality_flags(F.col("text"))["keep"].alias("k"))
        .collect()[0]["k"]
    )
    assert (1 in ids) == bool(gk)
