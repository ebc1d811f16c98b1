"""Tests for the round-4 session-2 additions: sliding-window chunking,
Efraimidis–Spirtes weighted sampling, markup stripping, distributed BPE
merge learning, and the exponentially-decayed sum."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.functions.text import strip_markup
from nbdatatools_spark.operators.bpe import bpe_segment, learn_bpe_merges
from nbdatatools_spark.operators.packing import chunk_documents
from nbdatatools_spark.operators.sampling import weighted_sample
from nbdatatools_spark.operators.temporal import exp_decayed_sum


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------

def _chunk_ref(text, chunk_size, stride):
    toks = " ".join(text.lower().split()).split()
    if not toks or toks == [""]:
        return []
    out = []
    cid = 0
    for start in range(0, len(toks), stride):
        out.append(
            (cid, start, min(chunk_size, len(toks) - start),
             " ".join(toks[start:start + chunk_size]))
        )
        cid += 1
    return out


def test_chunk_documents_matches_python_reference(spark, documents):
    rows = (
        chunk_documents(documents.limit(40), 16, 8)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    texts = {r.doc_id: r.text for r in documents.limit(40).collect()}
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.start_token, r.n_chunk_tokens, r.chunk_text)
        )
    for doc_id, text in texts.items():
        assert got.get(doc_id, []) == _chunk_ref(text, 16, 8), doc_id


def test_chunk_documents_disjoint_covers_every_token(spark):
    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    rows = chunk_documents(df, 3, 3).orderBy("chunk_id").collect()
    assert [r.chunk_text for r in rows] == ["a b c", "d e f", "g"]
    assert [r.n_chunk_tokens for r in rows] == [3, 3, 1]
    assert sum(r.n_chunk_tokens for r in rows) == 7


def test_chunk_documents_empty_and_validation(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "x")], "doc_id long, text string")
    rows = chunk_documents(df, 4, 2).collect()
    assert [(r.doc_id, r.chunk_text) for r in rows] == [(3, "x")]
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 4, 5)  # stride > chunk_size


def test_chunk_documents_no_shuffle_plan(spark, documents):
    plan = (
        chunk_documents(documents, 64, 32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------

def test_weighted_sample_matches_python_replica(spark, documents):
    import hashlib

    docs = documents.select("doc_id", "n_chars").collect()
    scored = []
    for r in docs:
        if r.n_chars is None or r.n_chars <= 0:
            continue
        h = int(hashlib.md5(f"{r.doc_id}:42".encode()).hexdigest()[:13], 16)
        u = (h + 1) / float(1 << 52)
        scored.append((round(math.log(u) / r.n_chars, 9), -r.doc_id, r.doc_id))
    expect = [d for _, _, d in sorted(scored, key=lambda t: (-t[0], t[2]))][:20]
    got = [
        r.doc_id
        for r in weighted_sample(documents, 20, "n_chars")
        .select("doc_id")
        .collect()
    ]
    assert got == expect


def test_weighted_sample_prefers_heavy_rows(spark):
    # one row with overwhelming weight is (near-)always selected at k=1
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(100)] + [(1000, 1e9)], "id long, w double"
    )
    top = weighted_sample(df, 1, "w", key_col="id").select("id").first().id
    assert top == 1000


def test_weighted_sample_excludes_nonpositive_and_validates(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, None), (4, 2.0)], "id long, w double"
    )
    rows = weighted_sample(df, 10, "w", key_col="id").collect()
    assert [r.id for r in rows] == [4]
    with pytest.raises(ValueError):
        weighted_sample(df, 0, "w")


# ---------------------------------------------------------------------------
# strip_markup
# ---------------------------------------------------------------------------

def test_strip_markup_cases(spark):
    cases = [
        ("<p>Hi &amp; <b>bye</b></p>", "Hi & bye"),
        ("<script>if (1 < 2) x();</script>after", "after"),
        ("<SCRIPT\ntype='t'>multi\nline</script >tail", "tail"),
        ("<style>.a{color:red}</style>text<!-- note -->", "text"),
        ("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;b", "a <tag> \"q\" 's' b"),
        ("plain   text", "plain text"),
        ("", ""),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], "i long, s string")
    got = {r.i: r.o for r in df.select("i", strip_markup(F.col("s")).alias("o")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------

def _bpe_ref(word_counts, n_merges, min_count):
    """Pure-Python Sennrich-style BPE over a word-frequency dict."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(n_merges):
        pairs = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = pairs.get((sym[i], sym[i + 1]), 0) + c
        if not pairs:
            break
        # deterministic argmax: count DESC then (left, right) ASC
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((step, a, b, cnt))
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_merges_match_python_reference(spark, documents):
    docs = documents.limit(50)
    merges = learn_bpe_merges(docs, n_merges=6, min_count=2)
    counts = {}
    for r in docs.collect():
        for w in " ".join((r.text or "").lower().split()).split():
            if w:
                counts[w] = counts.get(w, 0) + 1
    assert merges == _bpe_ref(counts, 6, 2)


def test_bpe_leftmost_greedy_run_semantics(spark):
    # 'aaa' x3: pair (a,a) count = 2*3 = 6 -> merged as [aa, a], not [a, aa]
    df = spark.createDataFrame([(1, "aaa aaa aaa bb")], "doc_id long, text string")
    merges = learn_bpe_merges(df, n_merges=1, min_count=2)
    assert merges == [(0, "a", "a", 6)]
    seg = bpe_segment(df, merges).select("bpe_tokens").first().bpe_tokens
    assert seg == ["aa", "a", "aa", "a", "aa", "a", "b", "b"]


def test_bpe_min_count_stops_early(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once; min_count=2 -> no merges
    assert learn_bpe_merges(df, n_merges=5, min_count=2) == []


# ---------------------------------------------------------------------------
# exp_decayed_sum
# ---------------------------------------------------------------------------

def test_exp_decayed_sum_closed_form(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)],
        "k long, t long, v double",
    )
    rows = {
        r.k: (r.n_events, r.decayed_sum)
        for r in exp_decayed_sum(df, "k", "v", ["t"], decay=0.5).collect()
    }
    # key 1: 10*0.25 + 20*0.5 + 30*1 = 42.5 ; key 2: 5
    assert rows[1] == (3, 42.5)
    assert rows[2] == (1, 5.0)
    with pytest.raises(ValueError):
        exp_decayed_sum(df, "k", "v", ["t"], decay=0.0)


def test_exp_decayed_sum_partition_invariant(spark):
    import random

    rng = random.Random(7)
    data = [(i % 5, i, rng.uniform(-10, 10)) for i in range(200)]
    df1 = spark.createDataFrame(data, "k long, t long, v double").repartition(1)
    df32 = spark.createDataFrame(data, "k long, t long, v double").repartition(32)
    r1 = sorted(exp_decayed_sum(df1, "k", "v", ["t"]).collect())
    r32 = sorted(exp_decayed_sum(df32, "k", "v", ["t"]).collect())
    assert r1 == r32


# ---------------------------------------------------------------------------
# incremental_dedup
# ---------------------------------------------------------------------------

def test_incremental_dedup_removes_recrawls_and_batch_dups(spark):
    from nbdatatools_spark.operators.dedup import incremental_dedup

    existing = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [
            (10, "Alpha   beta"),   # dup of existing #1 after normalization
            (11, "fresh content"),
            (12, "fresh content"),  # within-batch dup of #11
            (13, "entirely new"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in incremental_dedup(incoming, existing).collect()
    )
    assert kept == [11, 13]


def test_incremental_dedup_no_forced_broadcast(spark, documents):
    from nbdatatools_spark.operators.dedup import incremental_dedup

    out = incremental_dedup(documents, documents)
    logical = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical  # join strategy left to AQE


# ---------------------------------------------------------------------------
# exact_dedup_keep_best / bpe_encode
# ---------------------------------------------------------------------------

def test_keep_best_prefers_quality_then_id(spark):
    from nbdatatools_spark.operators.dedup import exact_dedup_keep_best

    df = spark.createDataFrame(
        [
            (1, "same text", 5),
            (2, "same  TEXT", 9),   # same fingerprint, higher quality -> wins
            (3, "same text", 9),    # quality tie with #2 -> higher id wins
            (4, "unique", 1),
        ],
        "doc_id long, text string, q long",
    )
    rows = {r.doc_id: r for r in exact_dedup_keep_best(df, "q").collect()}
    assert set(rows) == {3, 4}
    assert rows[3].n_dups == 3
    assert rows[4].n_dups == 1


def test_keep_best_is_single_aggregate_no_window(spark, documents):
    from nbdatatools_spark.operators.dedup import exact_dedup_keep_best

    df = documents.withColumn("q", F.col("doc_id") % 7)
    plan = exact_dedup_keep_best(df, "q")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1  # one hash agg shuffle, partials map-side


def test_bpe_encode_round_trips_vocab_ids(spark):
    from nbdatatools_spark.operators.bpe import (
        bpe_encode,
        bpe_vocab,
        corpus_base_chars,
        learn_bpe_merges,
    )

    df = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "low low")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(df, n_merges=3, min_count=2)
    chars = corpus_base_chars(df)
    assert chars == sorted(set("lowerst"))
    vocab = bpe_vocab(merges, chars)
    # base chars take ids [0, len) in sorted order; merges append after
    assert vocab["e"] < vocab[merges[0][1] + merges[0][2]]
    enc = {r.doc_id: r.token_ids for r in bpe_encode(df, merges, vocab).collect()}
    inv = {i: t for t, i in vocab.items()}
    decoded = "".join(inv[i] for i in enc[2])
    assert decoded == "lowlow"
    assert all(i is not None for ids in enc.values() for i in ids)
