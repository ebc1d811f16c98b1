"""WordPiece trainer + greedy ## segmenter: differential vs a pure-Python
reference (HF-tokenizers-style score = pair/(left*right) merge loop and
the BERT greedy longest-match-first matcher), plus structural invariants
and the corpus gate's plumbing."""

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.wordpiece import (
    _greedy_pieces,
    learn_wordpiece,
    wordpiece_base_symbols,
    wordpiece_segment,
    wordpiece_vocab,
    wordpiece_vocabulary,
    wordpiece_word_pieces,
)


# -- pure-Python reference ---------------------------------------------------


def _py_vocab(texts):
    """word -> (count, symbols) with ## continuation prefixes."""
    import re

    words = {}
    for t in texts:
        norm = re.sub(r"\s+", " ", (t or "").lower()).strip()
        for w in norm.split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    return {
        w: (c, [w[0]] + ["##" + ch for ch in w[1:]]) for w, c in words.items()
    }


def _py_learn(texts, n_merges, min_count=2):
    vocab = _py_vocab(texts)
    merges = []
    for step in range(n_merges):
        pair_counts = {}
        sym_counts = {}
        for _, (c, syms) in vocab.items():
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + c
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        scored = [
            (cnt / (sym_counts[a] * sym_counts[b]), a, b, cnt)
            for (a, b), cnt in pair_counts.items()
            if cnt >= min_count  # floor filters candidates (HF semantics)
        ]
        if not scored:
            break
        # score DESC, then (left, right) ASC
        scored.sort(key=lambda x: (-x[0], x[1], x[2]))
        score, left, right, cnt = scored[0]
        merges.append((step, left, right, cnt, score))
        merged = left + (right[2:] if right.startswith("##") else right)
        new_vocab = {}
        for w, (c, syms) in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            new_vocab[w] = (c, out)
        vocab = new_vocab
    return merges


CORPUS = [
    "the cat sat on the mat",
    "the hat and the bat",
    "cats hats mats bats",
    "the the the unhappy unhinged",
    "matter batter hatter",
    "un und unden",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


def test_learn_wordpiece_matches_python_reference(corpus_df):
    got = learn_wordpiece(corpus_df, n_merges=10, min_count=2)
    want = _py_learn(CORPUS, 10, min_count=2)
    assert [(s, l, r, c) for s, l, r, c, _ in got] == [
        (s, l, r, c) for s, l, r, c, _ in want
    ]
    for (_, _, _, _, gs), (_, _, _, _, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-12


def test_scores_bounded_and_counts_floor(corpus_df):
    merges = learn_wordpiece(corpus_df, n_merges=8, min_count=2)
    assert merges, "corpus must yield at least one merge"
    for _, _, _, cnt, score in merges:
        assert cnt >= 2
        assert 0.0 < score <= 1.0


def test_vocabulary_symbol_shape(corpus_df):
    rows = wordpiece_vocabulary(corpus_df).where(F.col("word") == "cat").collect()
    assert rows[0]["symbols"] == ["c", "##a", "##t"]


def test_greedy_matcher_bert_semantics():
    vocab = frozenset(["un", "##happy", "##hinged", "h", "##a", "##t", "hat"])
    assert _greedy_pieces("unhappy", vocab, "[UNK]") == ["un", "##happy"]
    assert _greedy_pieces("unhinged", vocab, "[UNK]") == ["un", "##hinged"]
    # longest-match-first: "hat" wins over h + ##a + ##t
    assert _greedy_pieces("hat", vocab, "[UNK]") == ["hat"]
    # any unmatched position -> whole word is [UNK] (BERT contract)
    assert _greedy_pieces("xyz", vocab, "[UNK]") == ["[UNK]"]
    assert _greedy_pieces("hax", vocab, "[UNK]") == ["[UNK]"]


def test_segment_roundtrip_on_vocab_words(corpus_df):
    merges = learn_wordpiece(corpus_df, n_merges=10, min_count=2)
    base = wordpiece_base_symbols(corpus_df)
    vocab = wordpiece_vocab(merges, base)
    words = wordpiece_vocabulary(corpus_df).select("word")
    segged = wordpiece_word_pieces(words, vocab)
    for r in segged.collect():
        pieces = r["pieces"]
        assert pieces != ["[UNK]"], f"base symbols must cover {r['word']!r}"
        rebuilt = "".join(
            p[2:] if p.startswith("##") else p for p in pieces
        )
        assert rebuilt == r["word"]
        # continuation discipline: first piece bare, rest ##-prefixed
        assert not pieces[0].startswith("##")
        assert all(p.startswith("##") for p in pieces[1:])


def test_segment_corpus_grain(corpus_df):
    merges = learn_wordpiece(corpus_df, n_merges=6, min_count=2)
    vocab = wordpiece_vocab(merges, wordpiece_base_symbols(corpus_df))
    out = wordpiece_segment(corpus_df, vocab).collect()
    assert len(out) == len(CORPUS)
    by_text = {r["text"]: r["wp_tokens"] for r in out}
    toks = by_text["the cat sat on the mat"]
    rebuilt = []
    cur = ""
    for p in toks:
        if p.startswith("##"):
            cur += p[2:]
        else:
            if cur:
                rebuilt.append(cur)
            cur = p
    rebuilt.append(cur)
    assert rebuilt == ["the", "cat", "sat", "on", "the", "mat"]


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([("",), (None,), ("  ",)], "text string")
    vocab = {"[UNK]": 0, "a": 1}
    out = wordpiece_segment(df, vocab).collect()
    assert all(r["wp_tokens"] == [] for r in out)
    with pytest.raises(ValueError):
        learn_wordpiece(df, n_merges=0)
