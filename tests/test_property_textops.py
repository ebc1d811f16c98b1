"""Property-based differentials for the session-2 operators: random inputs
vs pure-Python replicas (the same randomized-against-ground-truth strategy
as test_property_predicates)."""

import hashlib
import math
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nbdatatools_spark.operators.dedup import exact_dedup_keep_best
from nbdatatools_spark.operators.packing import chunk_documents
from nbdatatools_spark.operators.sampling import weighted_sample
from nbdatatools_spark.operators.temporal import exp_decayed_sum

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,  # driver reruns replay exactly the validated examples
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_words = st.lists(
    st.sampled_from(["aa", "b", "ccc", "dd", "e"]), min_size=0, max_size=12
)


def _chunk_ref(text, chunk_size, stride):
    toks = " ".join(text.lower().split()).split()
    if not toks:
        return []
    out = []
    for cid, start in enumerate(range(0, len(toks), stride)):
        out.append(
            (cid, start, min(chunk_size, len(toks) - start),
             " ".join(toks[start:start + chunk_size]))
        )
    return out


@settings(**_SETTINGS)
@given(
    texts=st.lists(_words, min_size=1, max_size=6),
    chunk_size=st.integers(1, 8),
    stride_frac=st.integers(1, 8),
)
def test_chunk_documents_property(spark, texts, chunk_size, stride_frac):
    stride = max(1, min(chunk_size, stride_frac))
    df = spark.createDataFrame(
        [(i, "  ".join(w)) for i, w in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk_size, stride).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.start_token, r.n_chunk_tokens, r.chunk_text)
        )
        assert got[r.doc_id] == sorted(got[r.doc_id])  # emitted in order
    for i, w in enumerate(texts):
        assert got.get(i, []) == _chunk_ref("  ".join(w), chunk_size, stride)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),                      # key
            st.integers(0, 50),                     # order
            st.integers(-40, 40),                   # value quarters
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_exp_decayed_sum_property(spark, rows):
    # decay 0.5 and quarter-valued inputs keep every term an exact dyadic
    # rational: the double math is exact, so the replica needs no rounding
    # emulation and the comparison is bit-exact.
    data = [(k, t, q / 4.0) for k, t, q in rows]
    df = spark.createDataFrame(data, "k long, t long, v double")
    got = {
        r.k: (r.n_events, r.decayed_sum)
        for r in exp_decayed_sum(df, "k", "v", ["t"], decay=0.5).collect()
    }
    by_key = {}
    for k, t, v in data:
        by_key.setdefault(k, []).append((t, v))
    for k, evs in by_key.items():
        evs.sort()
        n = len(evs)
        want = sum(
            Decimal(str(round(v * 0.5 ** (n - i), 9)))
            for i, (_, v) in enumerate(evs, start=1)
        )
        assert got[k][0] == n
        assert got[k][1] == float(want), (k, got[k], want)


@settings(**_SETTINGS)
@given(
    weights=st.lists(st.integers(1, 10_000), min_size=1, max_size=25),
    k=st.integers(1, 10),
)
def test_weighted_sample_property(spark, weights, k):
    df = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], "doc_id long, w double"
    )
    got = [r.doc_id for r in weighted_sample(df, k, "w").select("doc_id").collect()]
    scored = []
    for i, w in enumerate(weights):
        h = int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:13], 16)
        u = (h + 1) / float(1 << 52)
        scored.append((round(math.log(u) / w, 9), i))
    expect = [i for _, i in sorted(scored, key=lambda t: (-t[0], t[1]))][:k]
    assert got == expect


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["x y", "X  y", "z", "w w w", ""]),  # text pool
            st.integers(0, 9),                                    # quality
        ),
        min_size=1,
        max_size=20,
    )
)
def test_keep_best_property(spark, rows):
    data = [(i, t, q) for i, (t, q) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, text string, q long")
    got = {r.fingerprint: (r.n_dups, r.doc_id, r.q)
           for r in exact_dedup_keep_best(df, "q").collect()}
    by_fp = {}
    for i, t, q in data:
        fp = hashlib.md5(" ".join(t.lower().split()).encode()).hexdigest()
        by_fp.setdefault(fp, []).append((q, i))
    assert set(got) == set(by_fp)
    for fp, cands in by_fp.items():
        q, i = max(cands)
        assert got[fp] == (len(cands), i, q), fp


# --- session-3: token_entropy and gopher_quality_flags vs python replicas --

_docs = st.lists(
    st.text(
        alphabet="ab c#.123-\n",  # words, digits, symbols, bullets, newlines
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=6,
)


def _engine_tokens(text):
    r"""Replica of functions.text.tokens: SQL trim strips SPACES only, and
    the \s+ split keeps empty boundary fields for other edge whitespace."""
    import re

    t = text.strip(" ")
    if not t:
        return []
    return re.split(r"\s+", t)


@settings(**_SETTINGS)
@given(texts=_docs)
def test_token_entropy_property(spark, texts):
    from collections import Counter

    from nbdatatools_spark.operators.lm import token_entropy

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id BIGINT, text STRING"
    )
    got = {r.doc_id: r for r in token_entropy(df).collect()}
    for i, t in enumerate(texts):
        toks = _engine_tokens(t.lower())
        r = got[i]
        assert r.n_tokens == len(toks)
        assert r.n_distinct == len(set(toks))
        if not toks:
            assert r.entropy is None
        else:
            n = len(toks)
            s = sum(
                Decimal(str(round(c * math.log(c), 9))) for c in Counter(toks).values()
            )
            expect = round(math.log(n) - float(s) / n, 6)
            assert r.entropy == expect


def _gopher_ref(text):
    toks = _engine_tokens(text)
    n = len(toks)
    mean_wl = (sum(len(t) for t in toks) / n) if n else 0.0
    alpha = (sum(1 for t in toks if any(c.isalpha() and c.isascii() for c in t)) / n) if n else 0.0
    n_hash = text.count("#")
    n_ell = (len(text) - len(text.replace("...", ""))) / 3
    sym = ((n_hash + n_ell) / n) if n else 0.0
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    nl = len(lines)
    bullet = (sum(1 for l in lines if l.startswith(("-", "*", "•"))) / nl) if nl else 0.0
    ell = (sum(1 for l in lines if l.endswith("...")) / nl) if nl else 0.0
    return n, round(mean_wl, 6), round(sym, 6), round(alpha, 6), bullet, ell


@settings(**_SETTINGS)
@given(texts=_docs)
def test_gopher_flags_property(spark, texts):
    from pyspark.sql import functions as F

    from nbdatatools_spark.functions.text import gopher_quality_flags

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id BIGINT, text STRING")
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id", gopher_quality_flags(F.col("text")).alias("g")
        ).select("doc_id", "g.*").collect()
    }
    for i, t in enumerate(texts):
        n, mean_wl, sym, alpha, bullet, ell = _gopher_ref(t)
        r = got[i]
        assert r.n_words == n
        assert r.mean_word_len == mean_wl
        assert r.symbol_ratio == sym
        assert r.alpha_frac == alpha
        assert r.ok_bullet == (bullet <= 0.9)
        assert r.ok_ellipsis == (ell <= 0.3)
