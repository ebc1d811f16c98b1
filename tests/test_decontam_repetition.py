"""Test-set decontamination (13-gram rule) and Gopher repetition metrics."""

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.functions.text import (
    dup_line_char_fraction,
    dup_line_fraction,
    top_ngram_char_fraction,
)
from nbdatatools_spark.operators.dedup import contaminated_ids, decontaminate


@pytest.fixture(scope="module")
def corpus(spark):
    shared = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    train = spark.createDataFrame(
        [
            (1, shared + " and then some extra words follow here"),
            (2, "completely unrelated content about cooking pasta with garlic and olive oil for dinner tonight friends"),
            (3, "short doc"),
            (4, "prefix words first " + shared),
        ],
        "doc_id BIGINT, text STRING",
    )
    test = spark.createDataFrame(
        [(100, shared), (101, "another benchmark question entirely different from training data set contents")],
        "doc_id BIGINT, text STRING",
    )
    return train, test


def test_contaminated_ids_flags_ngram_overlap(corpus):
    train, test = corpus
    hits = {r["id"]: r["n_hits"] for r in contaminated_ids(train, test, n=13).collect()}
    assert set(hits) == {1, 4}  # both contain a 13-gram of the shared sentence
    assert all(v >= 1 for v in hits.values())


def test_decontaminate_drops_only_contaminated(corpus):
    train, test = corpus
    kept = {r["doc_id"] for r in decontaminate(train, test, n=13).collect()}
    assert kept == {2, 3}


def test_decontaminate_no_false_positive_at_larger_n(corpus):
    train, test = corpus
    # the shared run is exactly 15 words: 15-grams still hit, 16-grams cannot
    kept15 = {r["doc_id"] for r in decontaminate(train, test, n=15).collect()}
    assert kept15 == {2, 3}
    kept16 = {r["doc_id"] for r in decontaminate(train, test, n=16).collect()}
    assert kept16 == {1, 2, 3, 4}


def test_dup_line_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "aaa\nbbb\naaa\nccc"),      # 4 lines, 1 dup pair
            (2, "x\ny\nz"),                  # no dups
            (3, ""),                         # empty
            (4, "same\nsame\nsame"),         # all dup
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: (r["dlf"], r["dlcf"])
        for r in df.select(
            "doc_id",
            dup_line_fraction(F.col("text")).alias("dlf"),
            dup_line_char_fraction(F.col("text")).alias("dlcf"),
        ).collect()
    }
    assert out[1][0] == pytest.approx(0.25)          # 4 lines, 3 distinct
    assert out[1][1] == pytest.approx(6 / 12)        # 'aaa' twice of 12 chars
    assert out[2] == (0.0, 0.0)
    assert out[3] == (0.0, 0.0)
    assert out[4][0] == pytest.approx(2 / 3)
    assert out[4][1] == pytest.approx(1.0)


def test_top_ngram_char_fraction(spark):
    df = spark.createDataFrame(
        [(1, "go go go go stop"), (2, "all words differ here now")],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", top_ngram_char_fraction(F.col("text"), 2).alias("f")
        ).collect()
    }
    # normalized text "go go go go stop" (16 chars); top 2-gram "go go" x3, len 5
    assert out[1] == pytest.approx(15 / 16)
    # all 2-grams unique -> count 1; top by lexicographic max; len/total
    assert 0.0 < out[2] < 1.0


def test_paragraph_dedup_removes_cross_doc_boilerplate(spark):
    from nbdatatools_spark.operators.dedup import paragraph_dedup

    boiler = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, f"unique alpha text\n{boiler}\nmore alpha"),
            (2, f"{boiler}\nunique beta text"),
            (3, "entirely original gamma"),
            (4, f"Subscribe   To our NEWSLETTER\nunique delta"),  # normalized match
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r["text"] for r in paragraph_dedup(df, min_dup_docs=2).collect()}
    assert out[1] == "unique alpha text\nmore alpha"
    assert out[2] == "unique beta text"
    assert out[3] == "entirely original gamma"
    assert out[4] == "unique delta"


def test_paragraph_dedup_all_boilerplate_and_threshold(spark):
    from nbdatatools_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same\nextra")],
        "doc_id BIGINT, text STRING",
    )
    out3 = {r["doc_id"]: r["text"] for r in paragraph_dedup(df, min_dup_docs=3).collect()}
    assert out3 == {1: "", 2: "", 3: "extra"}
    # higher threshold: nothing removed
    out4 = {r["doc_id"]: r["text"] for r in paragraph_dedup(df, min_dup_docs=4).collect()}
    assert out4 == {1: "same", 2: "same", 3: "same\nextra"}


def test_redact_pii_and_counts(spark):
    from nbdatatools_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@example.co.uk or call 555-123-4567."),
            (2, "server at 192.168.1.254 and 8.8.8.8; version 1.2.3.999 is not an IP... but 999 octet invalid"),
            (3, "clean text with no personal data, pi=3.14159"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r["r"] for r in df.select("doc_id", redact_pii(F.col("text")).alias("r")).collect()}
    assert "[EMAIL]" in out[1] and "jane" not in out[1]
    assert "[PHONE]" in out[1] and "555-123-4567" not in out[1]
    assert out[2].count("[IP]") == 2 and "1.2.3.999" in out[2]
    assert out[3] == "clean text with no personal data, pi=3.14159"

    counts = {
        r["doc_id"]: r["c"].asDict()
        for r in df.select("doc_id", pii_counts(F.col("text")).alias("c")).collect()
    }
    assert counts[1] == {"n_emails": 1, "n_phones": 1, "n_ips": 0}
    assert counts[2]["n_ips"] == 2
    assert counts[3] == {"n_emails": 0, "n_phones": 0, "n_ips": 0}


# --- C4 heuristic cleaning -------------------------------------------------

def test_c4_line_and_page_rules(spark):
    from nbdatatools_spark.functions.text import (
        c4_clean_lines,
        c4_keep_line,
        c4_page_keep,
    )

    text = "\n".join([
        "A good sentence with enough words.",   # kept
        "Too short.",                            # < 3 words
        "No terminal punctuation at all",        # no punct
        "Please enable javascript to continue.", # js boilerplate
        'He said "stop right there."',           # kept (quote ok? ends .)
        "Another proper sentence right here!",   # kept
        "And one more to clear the bar?",        # kept
    ])
    df = spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")
    kept = df.select(
        F.filter(F.split("text", "\n"), lambda l: c4_keep_line(l)).alias("k")
    ).collect()[0]["k"]
    assert len(kept) == 4 and kept[0].startswith("A good")

    cleaned = df.select(c4_clean_lines(F.col("text")).alias("c")).collect()[0]["c"]
    assert "javascript" not in cleaned and "Too short." not in cleaned
    assert df.select(c4_page_keep(c4_clean_lines(F.col("text"))).alias("p")).collect()[0]["p"]

    # page drops: lorem ipsum, code braces, too few sentences
    for bad in ("Lorem ipsum dolor sit amet.", "function f() { return 1; }."):
        d2 = spark.createDataFrame([(1, bad + "\n" + text)], "doc_id BIGINT, text STRING")
        assert not d2.select(
            c4_page_keep(c4_clean_lines(F.col("text"))).alias("p")
        ).collect()[0]["p"]
    short = spark.createDataFrame(
        [(1, "Just one proper sentence here.")], "doc_id BIGINT, text STRING"
    )
    assert not short.select(
        c4_page_keep(c4_clean_lines(F.col("text"))).alias("p")
    ).collect()[0]["p"]


def test_c4_keep_line_arity_trap_documented(spark):
    """REGRESSION PIN: F.filter calls a bare two-parameter callable as
    (element, index) — passing c4_keep_line directly binds the line number
    to min_words and silently drops lines whose word count < their index.
    The engine's call sites must always wrap in a single-arg lambda; this
    test pins the trap so the behavior change is loud if PySpark fixes it."""
    from nbdatatools_spark.functions.text import c4_keep_line

    lines = ["w%d " % i * 7 for i in range(12)]  # 7 words each
    lines = [l.strip() + "." for l in lines]
    df = spark.createDataFrame([("\n".join(lines),)], "t STRING")
    wrapped = df.select(
        F.size(F.filter(F.split("t", "\n"), lambda l: c4_keep_line(l))).alias("n")
    ).collect()[0]["n"]
    bare = df.select(
        F.size(F.filter(F.split("t", "\n"), c4_keep_line)).alias("n")
    ).collect()[0]["n"]
    assert wrapped == 12
    assert bare == 8  # lines 8..11 dropped: index > 7 words — the trap


def test_duplicate_span_stats_tiny(spark):
    from nbdatatools_spark.operators.dedup import duplicate_span_stats

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),      # shares "a b c" with doc 2
            (2, "a b c x y"),
            (3, "p q r s t"),      # unique
            (4, ""),               # empty -> no spans
            (5, "a b"),            # short: single sub-k span
            (6, "a b"),            # exact duplicate of 5 -> dup span
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_span_ratio"])
        for r in duplicate_span_stats(df, span_tokens=3).collect()
    }
    # doc1 spans: "a b c","b c d","c d e" -> 1 dup; doc2: "a b c","b c x","c x y"
    assert out[1] == (3, 1, round(1 / 3, 6))
    assert out[2] == (3, 1, round(1 / 3, 6))
    assert out[3] == (3, 0, 0.0)
    assert out[4] == (0, 0, None)
    assert out[5] == (1, 1, 1.0)
    assert out[6] == (1, 1, 1.0)


def test_duplicate_span_stats_multiplicity_within_doc_not_dup(spark):
    from nbdatatools_spark.operators.dedup import duplicate_span_stats

    # span repeats WITHIN one doc only -> not cross-doc duplicated
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "z z z z")], "doc_id BIGINT, text STRING"
    )
    out = {r["doc_id"]: r["n_dup_spans"] for r in
           duplicate_span_stats(df, span_tokens=3, min_dup_docs=2).collect()}
    assert out[1] == 0 and out[2] == 0


def test_duplicate_span_stats_validates_args(spark):
    from nbdatatools_spark.operators.dedup import duplicate_span_stats

    df = spark.createDataFrame([(1, "x")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError):
        duplicate_span_stats(df, span_tokens=0)
    with pytest.raises(ValueError):
        duplicate_span_stats(df, min_dup_docs=1)


def test_contamination_fraction_grades_overlap(corpus):
    from nbdatatools_spark.operators.dedup import contamination_fraction

    train, test = corpus
    rows = {
        r["id"]: r
        for r in contamination_fraction(train, test, n=13).collect()
    }
    # every training doc reports, contaminated or not
    assert set(rows) == {1, 2, 3, 4}
    # docs 1 and 4 contain 13-grams of the shared sentence; 2 shares none
    assert rows[1]["n_contaminated"] >= 1
    assert rows[4]["n_contaminated"] >= 1
    assert rows[2]["n_contaminated"] == 0
    assert rows[2]["contamination_frac"] == 0.0
    # doc 3 is 2 words: one short gram, never in the test set
    assert rows[3]["n_grams"] == 1
    assert rows[3]["contamination_frac"] == 0.0
    for r in rows.values():
        assert 0.0 <= r["contamination_frac"] <= 1.0
        assert r["n_contaminated"] <= r["n_grams"]


def test_contamination_fraction_python_replica(corpus):
    """Differential vs a direct python set computation of the same rule."""
    from nbdatatools_spark.operators.dedup import contamination_fraction

    train, test = corpus
    n = 13

    def grams(text):
        w = " ".join(text.lower().split()).split(" ")
        if not any(w):
            return set()
        out = set()
        for i in range(max(len(w) - n + 1, 1)):
            out.add(" ".join(w[i : i + n]))
        return out

    test_g = set()
    for r in test.collect():
        test_g |= grams(r["text"])
    expected = {}
    for r in train.collect():
        g = grams(r["text"])
        hit = len(g & test_g)
        frac = round(hit / len(g), 6) if g else 0.0
        expected[r["doc_id"]] = (len(g), hit, frac)
    got = {
        r["id"]: (r["n_grams"], r["n_contaminated"], r["contamination_frac"])
        for r in contamination_fraction(train, test, n=n).collect()
    }
    assert got == expected
