"""Property-based differentials for the round-6 batch-3/4 text operators:
random unicode-ish inputs vs pure-Python replicas (the
test_property_textops strategy)."""

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# fragments spanning every script class, damage markers, and whitespace
_FRAGMENTS = [
    "hello", "WORLD", "it's", "42", "x9y",
    "привет", "Ϟϡ", "你好", "مرحبا", "한국",
    "Ã©", "â€™", "�", "\x07", "\t", "\n", "  ", ".",
]
_texts = st.lists(
    st.sampled_from(_FRAGMENTS), min_size=0, max_size=14
).map(lambda xs: " ".join(xs))


def _script_counts_ref(t):
    ranges = {
        "latin": ("A", "Z", "a", "z"),
    }
    counts = {
        "latin": sum(1 for c in t if "A" <= c <= "Z" or "a" <= c <= "z"),
        "digit": sum(1 for c in t if "0" <= c <= "9"),
        "cyrillic": sum(1 for c in t if "Ѐ" <= c <= "ӿ"),
        "greek": sum(1 for c in t if "Ͱ" <= c <= "Ͽ"),
        "cjk": sum(1 for c in t if "一" <= c <= "鿿"),
        "arabic": sum(1 for c in t if "؀" <= c <= "ۿ"),
        "hangul": sum(1 for c in t if "가" <= c <= "힯"),
    }
    return counts


@settings(**_SETTINGS)
@given(texts=st.lists(_texts, min_size=1, max_size=5))
def test_script_profile_property(spark, texts):
    from nbdatatools_spark.functions.text import script_profile

    df = spark.createDataFrame(
        list(enumerate(texts)), "i long, t string"
    )
    rows = {
        r["i"]: r
        for r in df.select("i", script_profile(F.col("t")).alias("s"))
        .select("i", "s.*")
        .collect()
    }
    order = ["latin", "digit", "cyrillic", "greek", "cjk", "arabic", "hangul"]
    for i, t in enumerate(texts):
        want = _script_counts_ref(t)
        got = rows[i]
        for k, v in want.items():
            assert got[f"n_{k}"] == v, (t, k)
        best = max(want.values())
        if best == 0:
            assert got["dominant"] == "none"
        else:
            assert got["dominant"] == next(k for k in order if want[k] == best)


def _encoding_ref(t):
    n_repl = t.count("�")
    n_ctrl = sum(
        1
        for c in t
        if (c <= "\x08" or c in "\x0b\x0c" or "\x0e" <= c <= "\x1f" or c == "\x7f")
    )
    n_moji = len(re.findall("Ã[©¨¤¶¼± ]|â€[™œ”“–—]|Â[ °£]", t))
    n_na = sum(1 for c in t if ord(c) > 127)
    return n_repl, n_ctrl, n_moji, n_na


@settings(**_SETTINGS)
@given(texts=st.lists(_texts, min_size=1, max_size=5))
def test_encoding_quality_property(spark, texts):
    from nbdatatools_spark.functions.text import encoding_quality

    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    rows = {
        r["i"]: r
        for r in df.select("i", encoding_quality(F.col("t")).alias("e"))
        .select("i", "e.*")
        .collect()
    }
    for i, t in enumerate(texts):
        nr, nc, nm, na = _encoding_ref(t)
        got = rows[i]
        assert got["n_replacement"] == nr, t
        assert got["n_control"] == nc, t
        assert got["n_mojibake"] == nm, t
        assert got["n_non_ascii"] == na, t
        assert got["is_clean"] == (nr == 0 and nc == 0 and nm == 0)


@settings(**_SETTINGS)
@given(texts=st.lists(_texts, min_size=1, max_size=5))
def test_fertility_property(spark, texts):
    from nbdatatools_spark.functions.text import fertility_stats

    bpe = re.compile(
        r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
    )
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    rows = {
        r["i"]: r
        for r in df.select("i", fertility_stats(F.col("t")).alias("f"))
        .select("i", "f.*")
        .collect()
    }
    for i, t in enumerate(texts):
        got = rows[i]
        assert got["n_bytes"] == len(t.encode("utf-8")), t
        assert got["n_chars"] == len(t)
        # whitespace tokens via the engine's trim-then-split semantics:
        # trim strips ASCII spaces only
        stripped = t.strip(" ")
        want_ws = 0 if not stripped else len(re.split(r"\s+", stripped))
        assert got["n_ws_tokens"] == want_ws, repr(t)
        want_sub = sum(
            1 for m in bpe.findall(t) if re.search(r"\S", m)
        )
        assert got["n_subword_tokens"] == want_sub, repr(t)


def _bloom_ref(grams, test_grams, m, k):
    def positions(g):
        hx = hashlib.md5(g.encode("utf-8")).hexdigest()
        h1, h2 = int(hx[:13], 16), int(hx[13:26], 16)
        return [(h1 + i * (2 * h2 + 1)) % m for i in range(k)]

    bits = set()
    for g in test_grams:
        bits.update(positions(g))
    return sum(1 for g in grams if all(p in bits for p in positions(g)))


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]),
                 min_size=3, max_size=9),
        min_size=2, max_size=6,
    )
)
def test_bloom_hits_property(spark, data):
    """Engine bloom-hit counts equal the pure-Python filter replica on
    tiny 3-gram corpora (small m forces collisions)."""
    from nbdatatools_spark.operators.dedup import bloom_decontaminate

    rows = [(i, " ".join(ws)) for i, ws in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    test = df.where(F.col("doc_id") == 0)
    train = df.where(F.col("doc_id") != 0)
    out = {
        r["id"]: r
        for r in bloom_decontaminate(train, test, n=3, m_bits=64, k=2).collect()
    }

    def grams(ws):
        toks = " ".join(" ".join(ws).lower().split()).split()
        n = 3
        return {
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))
        }

    tg = grams(data[0])
    for i, ws in enumerate(data):
        if i == 0:
            continue
        g = grams(ws)
        r = out[i]
        assert r["n_grams"] == len(g)
        assert r["n_bloom_hits"] == _bloom_ref(sorted(g), sorted(tg), 64, 2)
        assert r["n_exact_hits"] == len(g & tg)
        assert r["n_bloom_hits"] >= r["n_exact_hits"]
