"""Byte-level BPE (bpe.py GPT-2 lineage) vs a pure-Python reference:
pre-tokenizer, bytes_to_unicode mapping, merge table, and segmentation
must all match the classic sequential implementation exactly."""

import re

import pytest

from nbdatatools_spark.operators.bpe import (
    GPT2_SPLIT_PATTERN,
    RE2_SPLIT_PATTERN,
    byte_level_vocabulary,
    bytelevel_segment,
    bytes_to_unicode,
    learn_bytelevel_bpe,
)


# Python `re` has no \p{L}/\p{N}; these are the exact ASCII-corpus
# translations of the two engine patterns (naive string replacement would
# nest brackets inside the negated class and silently truncate it).
_PY_RE2 = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
_PY_GPT2 = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"
    r"|\s+(?!\S)|\s+"
)
_PY_PATTERNS = {RE2_SPLIT_PATTERN: _PY_RE2, GPT2_SPLIT_PATTERN: _PY_GPT2}


def _ref_pretokenize(text, pattern=RE2_SPLIT_PATTERN):
    return re.findall(_PY_PATTERNS[pattern], text)


def _ref_symbols(word):
    b2u = bytes_to_unicode()
    return [b2u[b] for b in word.encode("utf-8")]


def _ref_bytelevel_bpe(texts, n_merges, min_count):
    """Sequential reference: pre-token frequency dict -> Sennrich merge
    loop with leftmost-greedy single-pass rewriting."""
    counts = {}
    for t in texts:
        for w in _ref_pretokenize(t):
            counts[w] = counts.get(w, 0) + 1
    vocab = {}
    for w, c in counts.items():
        key = tuple(_ref_symbols(w))
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for step in range(n_merges):
        pairs = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = pairs.get((sym[i], sym[i + 1]), 0) + c
        if not pairs:
            break
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


def _ref_segment(text, merges):
    out = []
    for w in _ref_pretokenize(text):
        sym = _ref_symbols(w)
        for _, a, b, _ in merges:
            res, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            sym = res
        out.extend(sym)
    return out


def test_bytes_to_unicode_is_gpt2_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    # printable latin-1 bytes map to themselves
    assert m[ord("a")] == "a" and m[ord("!")] == "!"
    # bytes 0x00-0x20 are the first 33 non-printables -> offsets 256..288
    assert m[0x00] == chr(256) and m[0x20] == chr(288)


def test_bytes_to_unicode_space_is_gbreve():
    # GPT-2's canonical fact: byte 0x20 (space) maps to 'Ġ' (U+0120)
    assert bytes_to_unicode()[0x20] == "Ġ"
    assert bytes_to_unicode()[0x0A] == "Ċ"  # newline -> 'Ċ'


def test_bytelevel_merges_match_python_reference(spark, documents):
    docs = documents.limit(40)
    texts = [r.text or "" for r in docs.collect()]
    got = learn_bytelevel_bpe(docs, n_merges=6, min_count=2)
    assert got == _ref_bytelevel_bpe(texts, 6, 2)


def test_bytelevel_segment_matches_reference_and_roundtrips(spark):
    text = "Hello world!  It's 42 degrees... hello WORLD"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = learn_bytelevel_bpe(df, n_merges=5, min_count=2)
    seg = bytelevel_segment(df, merges).select("bpe_tokens").first().bpe_tokens
    assert seg == _ref_segment(text, merges)
    # byte-level invariant: concatenating tokens and inverting the byte
    # map recovers the original text EXACTLY (no normalization loss)
    inv = {c: b for b, c in bytes_to_unicode().items()}
    assert bytes(inv[c] for c in "".join(seg)).decode("utf-8") == text


def test_bytelevel_pretokens_never_cross_merges(spark):
    # "ab ab ab": the space belongs to the following pre-token (' ab'),
    # so the top merge is within-pretoken; no token may span 'b'+' '
    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    merges = learn_bytelevel_bpe(df, n_merges=3, min_count=2)
    seg = bytelevel_segment(df, merges).select("bpe_tokens").first().bpe_tokens
    inv = {c: b for b, c in bytes_to_unicode().items()}
    assert bytes(inv[c] for c in "".join(seg)).decode() == "ab ab ab"
    # every token decodes to a substring that never mixes 'b' with the
    # space of the NEXT pre-token
    for tok in seg:
        raw = bytes(inv[c] for c in tok).decode()
        assert not (raw.startswith("b") and " " in raw)


def test_bytelevel_vocabulary_raw_text_no_normalization(spark):
    # case preserved, punctuation kept as its own pre-token class
    df = spark.createDataFrame([(1, "Ab AB ab!")], "doc_id long, text string")
    words = sorted(
        r.word for r in byte_level_vocabulary(df).select("word").collect()
    )
    assert words == [" AB", " ab", "!", "Ab"]


def test_gpt2_pattern_differs_only_on_multispace():
    # single-space text: both patterns pre-tokenize identically
    t = "the quick brown fox, isn't it 99 red balloons?"
    assert _ref_pretokenize(t, GPT2_SPLIT_PATTERN) == _ref_pretokenize(
        t, RE2_SPLIT_PATTERN
    )
    # the documented divergence: a multi-space run before a word
    assert _ref_pretokenize("a   b", GPT2_SPLIT_PATTERN) == ["a", "  ", " b"]
    assert _ref_pretokenize("a   b", RE2_SPLIT_PATTERN) == ["a", "   ", "b"]
