"""Property-based differentials for the round-7 operators: random inputs
vs pure-Python replicas (the test_property_textops strategy)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_SENTENCE_POOL = [
    "Alpha beta gamma delta.",
    "The quick brown fox jumps.",
    "Subscribe to our newsletter.",
    "Completely unique phrasing here.",
    "Cookies are used on this site.",
    "Final thoughts follow below.",
]


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.integers(0, len(_SENTENCE_POOL) - 1), min_size=0, max_size=5),
        min_size=1,
        max_size=8,
    )
)
def test_sentence_dedup_property(spark, docs):
    from nbdatatools_spark.operators.dedup import sentence_dedup

    rows = [(i, " ".join(_SENTENCE_POOL[j] for j in idxs)) for i, idxs in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in sentence_dedup(df, min_docs=2).collect()}

    # python replica: sentence -> set of docs containing it
    per_doc = [[_SENTENCE_POOL[j] for j in idxs] for idxs in docs]
    containing = {}
    for i, sents in enumerate(per_doc):
        for s in sents:
            containing.setdefault(s, set()).add(i)
    dup = {s for s, d in containing.items() if len(d) >= 2}
    for i, sents in enumerate(per_doc):
        kept = [s for s in sents if s not in dup]
        assert got[i]["n_sentences"] == len(sents)
        assert got[i]["n_removed"] == len(sents) - len(kept)
        assert got[i]["text_dedup"] == " ".join(kept)


@settings(**_SETTINGS)
@given(
    weights=st.lists(st.integers(1, 10000), min_size=1, max_size=8),
    temp=st.sampled_from([1.0, 2.0, 3.7, 100.0]),
)
def test_temperature_mixture_property(spark, weights, temp):
    from nbdatatools_spark.operators.sampling import temperature_mixture_rates

    rows = [(f"s{gi}",) for gi, w in enumerate(weights) for _ in range(w % 50 + 1)]
    df = spark.createDataFrame(rows, "source string")
    got = {r["stratum"]: r for r in temperature_mixture_rates(df, temperature=temp).collect()}
    counts = {f"s{gi}": w % 50 + 1 for gi, w in enumerate(weights)}
    # replica: q = round9(w^(1/T)); rate = (q/w) * min(w/q)
    q = {s: round(math.exp(math.log(w) / temp), 9) for s, w in counts.items()}
    minr = min(counts[s] / q[s] for s in counts)
    for s, w in counts.items():
        want = round(1.0 * q[s] / w * minr, 6)
        assert got[s]["rate"] == pytest.approx(want, abs=2e-6)
        assert got[s]["rate"] <= 1.0 + 1e-9
        assert got[s]["weight"] == w
    # the binding stratum keeps everything
    assert any(abs(r["rate"] - 1.0) < 1e-6 for r in got.values())
    # expected weights realize p ∝ w^(1/T): ratios match q ratios
    es = [got[s]["expected_weight"] for s in sorted(counts)]
    qs = [q[s] for s in sorted(counts)]
    for i in range(len(es) - 1):
        assert es[i] / es[i + 1] == pytest.approx(qs[i] / qs[i + 1], rel=1e-4)


@settings(**_SETTINGS)
@given(
    base=st.text(alphabet="abcd ", min_size=20, max_size=60),
    frac=st.integers(2, 5),
)
def test_containment_self_prefix_property(spark, base, frac):
    from nbdatatools_spark.operators.dedup import containment_verify

    long_text = (base + " ") * 4
    short_text = long_text[: max(len(long_text) // frac, 8)]
    df = spark.createDataFrame(
        [(1, long_text), (2, short_text)], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    rows = containment_verify(cand, df, threshold=0.0001).collect()
    if not rows:
        return  # degenerate normalization (all-space text)
    r = rows[0]
    # a prefix's shingle set is (nearly) contained in the full text's
    assert r["c_ba"] >= 0.9
    assert 0.0 <= r["c_ab"] <= 1.0 and 0.0 <= r["c_ba"] <= 1.0
    # python replica of both ratios over distinct 5-gram shingles
    def shingles(t):
        norm = " ".join(t.lower().split())
        n = len(norm)
        return {norm[i : i + 5] for i in range(max(n - 4, 1))}

    sa, sb = shingles(long_text), shingles(short_text)
    inter = len(sa & sb)
    assert r["c_ab"] == pytest.approx(round(inter / len(sa), 6), abs=1e-9)
    assert r["c_ba"] == pytest.approx(round(inter / len(sb), 6), abs=1e-9)


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8), min_size=1, max_size=12
    )
)
def test_unigram_seed_counts_property(spark, words):
    from nbdatatools_spark.operators.unigram import seed_vocabulary

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r["piece"]: r["freq"] for r in seed_vocabulary(df, seed_size=10000).collect()}
    # replica: substrings len 2..6 + single chars, weighted by occurrences
    want = {}
    for w in words:
        for ch in w:
            want[ch] = want.get(ch, 0) + 1
        for i in range(len(w)):
            for l in range(2, 7):
                if i + l <= len(w):
                    want[w[i : i + l]] = want.get(w[i : i + l], 0) + 1
    assert got == want
