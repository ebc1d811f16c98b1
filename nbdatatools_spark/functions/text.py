"""Text-analysis column expressions for the training-data pipeline extensions.

Beyond-reference surface (SURVEY §7.8): language-ID heuristics, quality
scoring, token counting, fingerprinting, shingling for MinHash. All pure
Catalyst expressions (split/regexp/transform/filter) — no Python UDFs — so they
stay inside whole-stage codegen at 100TB scale.

Fingerprints use md5 (not xxhash64) deliberately: md5 exists identically in
Spark, DuckDB, and most warehouses, so fingerprints are portable and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small deterministic English stopword list (order matters for nothing; the
# list is part of the engine contract so oracles can replicate it).
STOPWORDS = (
    "the a an and or of to in is are was were for on with as by at it this that be from".split()
)

_PUNCT_CLASS = r"[^a-zA-Z0-9\s]"


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace, trim — canonical form for dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


# GPT-2-style pre-tokenizer pattern (the public BPE pre-split regex),
# adapted to Java regex: contractions, letter runs, digit runs, other
# non-space runs, trailing spaces.
_BPE_SPLIT = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


def subword_tokens(col: Column) -> Column:
    """BPE-ish pre-tokenization pieces: the GPT-2 pre-split regex via
    regexp_extract_all — a JVM-side approximation of LLM tokenizer input
    (real BPE would further merge/split each piece; this tracks LLM token
    counts to first order and is fully codegen-able)."""
    return F.regexp_extract_all(col, F.lit(_BPE_SPLIT), F.lit(0))


def subword_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (whitespace runs excluded)."""
    return F.size(F.filter(subword_tokens(col), lambda t: t.rlike(r"\S")))


def kgram_hashes(norm: Column, k: int = 5, portable: bool = False) -> Column:
    """Rolling k-gram hash array of an ALREADY-NORMALIZED text column.
    ``portable=True`` uses md5-prefix arithmetic (reproducible in DuckDB)
    instead of xxhash64."""
    grams = char_ngrams_of_norm(norm, k)
    if portable:
        return F.transform(
            grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        )
    return F.transform(grams, lambda g: F.xxhash64(g))


def winnow_select(hashes: Column, w: int = 4) -> Column:
    """Winnowing selection (Schleimer/Wilkerson/Aiken, SIGMOD'03): slide a
    window of ``w`` over the k-gram hash array, keep each window's minimum,
    return the distinct selected set. Guarantees any shared substring of
    length >= k + w - 1 produces at least one shared fingerprint.

    PERF: ``hashes`` MUST be a materialized column (a plain attribute from
    a prior .select), never an inline kgram_hashes(...) expression — an
    expression captured by the window lambda is re-evaluated per window,
    turning O(n*w) into O(n^2) hashing (measured ~20x on 2KB docs; the
    same trap as char_ngrams_of_norm).
    """
    starts = F.sequence(F.lit(1), F.greatest(F.size(hashes) - (w - 1), F.lit(1)))
    mins = F.transform(starts, lambda i: F.array_min(F.slice(hashes, i, F.lit(w))))
    return F.array_distinct(mins)


def winnow_fingerprints(df, text_col: str = "text", k: int = 5, w: int = 4,
                        portable: bool = False, out: str = "fingerprints"):
    """Winnowing fingerprints as a DataFrame transform: adds ``out`` column
    (array<bigint>) to ``df``. Stages normalize -> k-gram hashes -> window
    minima through separate projections so each layer is evaluated once
    per row (see winnow_select PERF note)."""
    others = [c for c in df.columns]
    s1 = df.select(*others, normalize_text(F.col(text_col)).alias("__winnow_norm"))
    s2 = s1.select(
        *others, kgram_hashes(F.col("__winnow_norm"), k, portable).alias("__winnow_kh")
    )
    return s2.select(*others, winnow_select(F.col("__winnow_kh"), w).alias(out))


def winnow_overlap(fp_a: Column, fp_b: Column) -> Column:
    """Fingerprint-set overlap coefficient |A∩B| / min(|A|,|B|) — the
    winnowing similarity score for partial-duplicate detection."""
    inter = F.size(F.array_intersect(fp_a, fp_b)).cast("double")
    denom = F.least(F.size(fp_a), F.size(fp_b))
    return F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text; empty text -> empty array.

    Engine note: ``F.trim`` strips ASCII SPACES only (SQL semantics), so
    text that starts/ends with other whitespace (\n, \t) yields empty
    leading/trailing tokens from the split — the DuckDB oracles
    (``trim``/``regexp_split_to_array``) share the identical behavior, so
    the two engines always agree. Normalize with ``normalize_text`` first
    when strict word semantics matter."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def punct_ratio(col: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters; 0 for empty text."""
    n = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def stopword_ratio(col: Column) -> Column:
    """Fraction of tokens that are common-English stopwords (lowercased)."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(n == 0, F.lit(0.0)).otherwise(sw.cast("double") / n)


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards moderate length and
    stopword presence, penalizes punctuation soup. Deterministic closed form
    so the DuckDB oracle can replicate it exactly."""
    n = F.length(col).cast("double")
    length_term = F.least(n / F.lit(500.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5.0)
    return (length_term * 0.4 + sw_term * 0.3 + punct_pen * 0.3)


def doc_fingerprint(col: Column) -> Column:
    """Portable content fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def char_ngrams_of_norm(norm: Column, n: int = 5) -> Column:
    """Character n-grams of an ALREADY-NORMALIZED string column.

    PERF: pass a materialized column (from a prior .select), never an inline
    normalize_text(...) expression — an expression referenced inside the
    transform lambda is re-evaluated per array element (measured 100x
    slowdown on the MinHash path). A projection boundary under a Generate
    node keeps it evaluated once per row.
    """
    ln = F.length(norm)
    starts = F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1)))
    return F.transform(starts, lambda i: norm.substr(i, F.lit(n)))


def char_ngrams(col: Column, n: int = 5) -> Column:
    """All character n-gram shingles of normalized text, as array<string>.

    Implemented as sequence(1, len-n+1) -> substring — JVM-side, no UDF.
    Texts shorter than n yield a single shingle (the whole text). For hot
    paths prefer a two-stage select with char_ngrams_of_norm (see its PERF
    note)."""
    return char_ngrams_of_norm(normalize_text(col), n)


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (arrays of n consecutive tokens joined by space).

    The token array is let-bound so the normalize+split expression runs
    ONCE per row — without the binding, Catalyst inlines it into the
    transform lambda and re-runs the regex per shingle (the _let trap;
    measured ~12x slower on duplicate_span_stats at sf0.1)."""

    def body(toks):
        cnt = F.size(toks)
        starts = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
        return F.when(cnt == 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                starts,
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )

    return _let(tokens(normalize_text(col)), body)


# --- language ID (n-gram heuristic) -------------------------------------
# Tiny per-language marker-word lists; score = matching token fraction.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "que", "pour", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
}


def lang_scores(col: Column) -> Column:
    """Struct of per-language marker-token fractions."""
    toks = tokens(F.lower(col))
    n = F.greatest(F.size(toks), F.lit(1))
    fields = [
        (F.size(F.filter(toks, lambda t: t.isin(*words))).cast("double") / n).alias(lang)
        for lang, words in _LANG_MARKERS.items()
    ]
    return F.struct(*fields)


def detect_lang(col: Column, min_score: float = 0.05) -> Column:
    """Best-scoring language code, or 'und' when nothing clears min_score."""
    s = lang_scores(col)
    langs = list(_LANG_MARKERS)
    pairs = F.array(
        *[F.struct(s[lang].alias("score"), F.lit(lang).alias("lang")) for lang in langs]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] >= min_score, best["lang"]).otherwise(F.lit("und"))


# --- repetition metrics (Gopher-style quality rules) -----------------------
# Rae et al. 2021 ("Scaling Language Models: ... Gopher"), Table A1: filter
# documents whose content is dominated by repeated lines or n-grams. All
# closed-form Catalyst expressions (per-row array math, no UDF, no shuffle)
# so a SQL oracle can replicate them and 100TB scan cost is pure map-side.

def lines_of(col: Column) -> Column:
    """Non-empty trimmed lines of the document."""
    return F.filter(
        F.transform(F.split(col, r"\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )


def dup_line_fraction_of(ls: Column) -> Column:
    """dup-line fraction over a MATERIALIZED lines array (see the PERF note
    on char_ngrams_of_norm: inline expressions re-evaluate per lambda
    element — pass a column from a prior .select)."""
    n = F.size(ls)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(ls))).cast("double") / n
    )


def dup_line_fraction(col: Column) -> Column:
    """Fraction of lines that are repeats of an earlier line
    (1 - distinct/total); 0 for empty docs."""
    return dup_line_fraction_of(lines_of(col))


def _let(value: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``value`` ONCE and refer
    to it via a lambda variable. transform over a single-element array is the
    only Catalyst construct that binds a name — without it, optimizer rules
    (CollapseProject, PushPredicateThroughNonJoin) substitute attribute
    references with their defining expressions, and an expression referenced
    inside a higher-order-function lambda is then re-evaluated PER ELEMENT
    (measured: the training-pipeline filter went 87s -> 2s at sf0.001)."""
    return F.transform(F.array(value), body)[0]


def dup_line_char_fraction_of(ls: Column) -> Column:
    """dup-line char fraction over a lines array (let-bound: safe even when
    the optimizer inlines the array expression into a filter).
    O(L^2) in lines-per-doc — bounded per row, embarrassingly parallel."""

    def body(l_s):
        total = F.aggregate(l_s, F.lit(0), lambda acc, l: acc + F.length(l))
        dup_chars = F.aggregate(
            l_s,
            F.lit(0),
            lambda acc, l: acc
            + F.when(F.size(F.filter(l_s, lambda x: x == l)) > 1, F.length(l)).otherwise(0),
        )
        return F.when(total == 0, F.lit(0.0)).otherwise(dup_chars.cast("double") / total)

    return _let(ls, body)


def dup_line_char_fraction(col: Column) -> Column:
    """Fraction of line characters inside lines that occur more than once."""
    return dup_line_char_fraction_of(lines_of(col))


def top_ngram_char_fraction_of(grams: Column, total: Column) -> Column:
    """top-n-gram char fraction over a grams array + normalized length.
    Let-bound (see _let): the grams expression evaluates once per row no
    matter where the optimizer inlines this."""

    def body(g):
        top = F.array_max(
            F.transform(
                g,
                lambda x: F.struct(
                    F.size(F.filter(g, lambda y: y == x)).alias("cnt"),
                    x.alias("gram"),
                ),
            )
        )
        frac = (top["cnt"] * F.length(top["gram"])).cast("double") / total
        return F.when((F.size(g) == 0) | (total == 0), F.lit(0.0)).otherwise(frac)

    return _let(grams, body)


def top_ngram_char_fraction(col: Column, n: int = 2) -> Column:
    """Fraction of normalized characters covered by the single most frequent
    word n-gram: count(top) * len(top) / total_chars (Gopher A1 rows
    'top n-gram character fraction'). Count ties break toward the
    lexicographically GREATEST gram (struct array_max order) — deterministic
    and mirrorable in the SQL oracle. For hot paths materialize the grams
    and use top_ngram_char_fraction_of."""
    return top_ngram_char_fraction_of(word_shingles(col, n), F.length(normalize_text(col)))


# --- PII redaction ---------------------------------------------------------

# deliberately conservative public patterns; ORDER MATTERS: emails first
# (an address contains dot-runs a later rule could clip), IPs before phones
# (the dotted-quad prefix "192.168" would otherwise match the phone rule)
_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|1?\d?\d)\b", "[IP]"),
    (r"\b(?:\+?\d{1,3}[-. ])?(?:\(\d{2,4}\)[-. ]?)?\d{3,4}[-. ]\d{3,4}(?:[-. ]\d{2,4})?\b", "[PHONE]"),
)


def redact_pii(col: Column) -> Column:
    """Replace emails, phone numbers, and IPv4 addresses with typed
    placeholders — chained regexp_replace, pure codegen (the standard
    pre-training scrub step). Patterns are intentionally high-precision:
    a corpus pass must not mangle code or prose."""
    out = col
    for pattern, token in _PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> Column:
    """(n_emails, n_phones, n_ips) struct — audit companion to redact_pii.
    Counts apply each pattern to the SAME un-redacted text, but in redaction
    order: later patterns count on the already-redacted form so a dotted
    quad is never double-counted as a phone number."""
    by_token = {}
    stage = col
    for pattern, token in _PII_PATTERNS:
        by_token[token] = F.size(F.regexp_extract_all(stage, F.lit(pattern), F.lit(0)))
        stage = F.regexp_replace(stage, pattern, token)
    return F.struct(
        by_token["[EMAIL]"].alias("n_emails"),
        by_token["[PHONE]"].alias("n_phones"),
        by_token["[IP]"].alias("n_ips"),
    )


# --- C4 / FineWeb heuristic cleaning ---------------------------------------

def c4_keep_line(line: Column, min_words: int = 3) -> Column:
    """C4 line-retention rule (Raffel et al. 2020, arXiv:1910.10683 §2.2):
    keep a line iff it ends in terminal punctuation, has at least
    ``min_words`` whitespace words, and does not mention javascript (the
    cookie/JS-warning boilerplate rule). Pure codegen predicates.

    NEVER pass this function to ``F.filter``/``F.transform`` directly —
    wrap it: ``F.filter(arr, lambda l: c4_keep_line(l))``. The HOF helpers
    inspect callable arity and invoke two-parameter functions as
    ``(element, index)``, so a direct pass silently binds the ELEMENT INDEX
    to ``min_words`` (observed: per-line thresholds equal to the line
    number). Keyword-only args are rejected by PySpark's HOF validation,
    so the API cannot enforce this shape itself."""
    t = F.trim(line)
    return (
        F.substring(t, -1, 1).isin(".", "!", "?", '"')
        & (F.size(F.split(t, r"\s+")) >= min_words)
        & ~F.lower(t).contains("javascript")
    )


def c4_clean_lines(col: Column, min_words: int = 3) -> Column:
    """Text with only the C4-retained lines, newline-rejoined in original
    order (filter preserves array order)."""
    return F.concat_ws(
        "\n", F.filter(F.split(col, "\n"), lambda l: c4_keep_line(l, min_words))
    )


def c4_page_keep(cleaned: Column, min_sentences: int = 3) -> Column:
    """C4 page-retention rule over the line-cleaned text: no lorem-ipsum
    placeholder, no curly brace (code), and at least ``min_sentences``
    sentence terminators."""
    low = F.lower(cleaned)
    return (
        ~low.contains("lorem ipsum")
        & ~low.contains("{")
        & (F.regexp_count(cleaned, F.lit(r"[.!?]")) >= min_sentences)
    )


# HTML entities a markup stripper must decode (the named set that appears
# in web-crawl text; numeric entities are left alone — decoding arbitrary
# &#NNNN; needs a codepoint function and is out of scope for a cleaner).
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: earlier decodes must not create new & to re-decode
)


def strip_markup(col: Column) -> Column:
    """Strip HTML/XML markup from crawl text: drop <script>/<style> blocks
    wholesale, replace remaining tags and comments with a space, decode the
    common named entities, collapse whitespace.

    The C4/web-crawl cleaning front-door (Raffel et al. 2020 §2.2 strips
    markup before line rules). Pure codegen regexp_replace/replace chain —
    map-side only, no UDF; patterns are shared Java-regex/RE2 syntax (no
    backreferences — RE2 lacks them) so a SQL oracle replicates them
    verbatim.
    """
    out = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def gopher_quality_flags(col: Column) -> Column:
    """Full Gopher page-level quality rule set (Rae et al. 2021,
    arXiv:2112.11446 Table A1) — the rules decidable from raw text without a
    tokenizer, as a struct of per-rule booleans plus the conjunction:

    - ``ok_word_count``: 50 <= words <= 100_000
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_symbol_ratio``: ('#' + '...') occurrences / words <= 0.1
    - ``ok_bullet``: fraction of lines starting with a bullet <= 0.9
    - ``ok_ellipsis``: fraction of lines ending with '...' <= 0.3
    - ``ok_alpha``: fraction of words containing a letter >= 0.8
    - ``ok_stopwords``: at least 2 distinct common stopwords present
    - ``keep``: AND of all seven

    Pure Catalyst (split/filter/aggregate higher-order functions), map-side
    only; every ratio is one integer/integer division so a SQL oracle
    reproduces the doubles bit-for-bit. Complements ``quality_score``
    (heuristic scalar) and the repetition metrics (``dup_line_fraction``
    etc.) — together they form the full Gopher filter. The token and line
    arrays are let-bound (``_let``): without it the optimizer inlines the
    split into every higher-order lambda and re-tokenizes per element.
    """

    def over_lines(toks, ls):
        n = F.size(toks)
        total_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        mean_wl = F.when(n == 0, F.lit(0.0)).otherwise(total_chars.cast("double") / n)
        alpha_frac = F.when(n == 0, F.lit(0.0)).otherwise(
            F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))).cast("double") / n
        )
        n_hash = F.length(col) - F.length(F.replace(col, F.lit("#"), F.lit("")))
        n_ellipsis = (
            F.length(col) - F.length(F.replace(col, F.lit("..."), F.lit("")))
        ) / F.lit(3)
        sym_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
            (n_hash + n_ellipsis).cast("double") / n
        )
        n_lines = F.size(ls)
        bullet_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
            F.size(
                F.filter(
                    ls,
                    lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•"),
                )
            ).cast("double")
            / n_lines
        )
        ellipsis_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
            F.size(F.filter(ls, lambda l: l.endswith("..."))).cast("double") / n_lines
        )
        sw_lits = F.array(*[F.lit(w) for w in STOPWORDS])
        # lowering commutes with whitespace tokenization, so the stopword
        # scan reuses the bound token array instead of a second split
        sw_present = F.size(
            F.array_intersect(F.array_distinct(F.transform(toks, F.lower)), sw_lits)
        )
        flags = {
            "ok_word_count": (n >= 50) & (n <= 100000),
            "ok_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
            "ok_symbol_ratio": sym_ratio <= 0.1,
            "ok_bullet": bullet_frac <= 0.9,
            "ok_ellipsis": ellipsis_frac <= 0.3,
            "ok_alpha": alpha_frac >= 0.8,
            "ok_stopwords": sw_present >= 2,
        }
        keep = None
        for c in flags.values():
            keep = c if keep is None else (keep & c)
        return F.struct(
            *[c.alias(name) for name, c in flags.items()],
            keep.alias("keep"),
            F.round(mean_wl, 6).alias("mean_word_len"),
            F.round(sym_ratio, 6).alias("symbol_ratio"),
            F.round(alpha_frac, 6).alias("alpha_frac"),
            n.alias("n_words"),
        )

    return _let(tokens(col), lambda toks: _let(lines_of(col), lambda ls: over_lines(toks, ls)))


def fineweb_flags(
    col: Column,
    punct_min: float = 0.12,
    short_len: int = 30,
    short_max: float = 0.67,
    dup_line_max: float = 0.3,
    dup_char_max: float = 0.1,
) -> Column:
    """FineWeb-style line-shape + repetition quality rules (Penedo et al.
    2024, arXiv:2406.17557 §3.1/3.6 — the three heuristics FineWeb added
    on top of the MassiveText/Gopher and C4 stacks, plus the repetition
    and placeholder rules it retains), as a struct of per-rule booleans,
    the 6dp fractions behind them, and the conjunction:

    - ``ok_punct_lines``: fraction of lines ending in terminal
      punctuation (., !, ?, ") >= ``punct_min`` (0.12)
    - ``ok_short_lines``: fraction of lines shorter than ``short_len``
      (30) chars <= ``short_max`` (0.67)
    - ``ok_dup_lines``: duplicate-line fraction <= ``dup_line_max``
      (0.3, the Gopher repetition rule)
    - ``ok_dup_chars``: fraction of characters inside duplicated lines
      <= ``dup_char_max`` (0.1 — FineWeb tightened Gopher's 0.2)
    - ``ok_placeholder``: no lorem-ipsum placeholder, no curly brace
      (the C4 page rules FineWeb keeps)
    - ``keep``: AND of all five.

    The full FineWeb composite ANDs this with ``gopher_quality_flags``
    (page-level quality) and a language gate — see the
    ``doc_fineweb_filter`` gate / the ``fineweb_filter`` pipeline step.
    Pure Catalyst (split/filter/aggregate), map-side only; every ratio is
    one int/int division so a SQL oracle reproduces the doubles exactly.
    Line metrics are let-bound (``_let``) like gopher's.
    """

    def over_lines(ls):
        n_lines = F.size(ls)
        punct_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
            F.size(
                F.filter(ls, lambda l: F.substring(l, -1, 1).isin(".", "!", "?", '"'))
            ).cast("double")
            / n_lines
        )
        short_frac = F.when(n_lines == 0, F.lit(0.0)).otherwise(
            F.size(F.filter(ls, lambda l: F.length(l) < short_len)).cast("double")
            / n_lines
        )
        dlf = dup_line_fraction_of(ls)
        dcf = dup_line_char_fraction_of(ls)
        low = F.lower(col)
        flags = {
            "ok_punct_lines": punct_frac >= punct_min,
            "ok_short_lines": short_frac <= short_max,
            "ok_dup_lines": dlf <= dup_line_max,
            "ok_dup_chars": dcf <= dup_char_max,
            "ok_placeholder": ~low.contains("lorem ipsum") & ~low.contains("{"),
        }
        keep = None
        for c in flags.values():
            keep = c if keep is None else (keep & c)
        return F.struct(
            *[c.alias(name) for name, c in flags.items()],
            keep.alias("keep"),
            F.round(punct_frac, 6).alias("punct_line_frac"),
            F.round(short_frac, 6).alias("short_line_frac"),
            F.round(dlf, 6).alias("dup_line_frac"),
            F.round(dcf, 6).alias("dup_char_frac"),
            n_lines.alias("n_lines"),
        )

    return _let(lines_of(col), over_lines)


def sentences_of(col: Column) -> Column:
    """Sentence segmentation by terminal punctuation. Portable formulation:
    mark each "[.!?] + whitespace" boundary with a \x01 sentinel via a
    group-reference replacement, then split on the sentinel — RE2 (DuckDB)
    has no lookbehind, but group references in REPLACEMENTS work in both
    engines, so a SQL oracle replicates this mechanically (unlike Spark's
    locale-aware ``F.sentences``). Empty text -> empty array; text without
    terminal punctuation is one sentence; boundary-only segments drop."""
    t = F.trim(col)
    marked = F.regexp_replace(t, r"([.!?])\s+", "$1\x01")
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.filter(
            F.transform(F.split(marked, "\x01"), F.trim),
            lambda s: F.length(s) > 0,
        )
    )


def sentence_stats(col: Column) -> Column:
    """Per-document sentence statistics as a struct: sentence count, mean
    words per sentence (one int/int division), and the fraction of
    sentences ending in terminal punctuation — the document-structure
    quality signals C4/Gopher consult beyond raw token counts. Let-bound
    sentence array; pure Catalyst."""

    def over(ss):
        n = F.size(ss)
        words = F.aggregate(
            ss, F.lit(0), lambda acc, s: acc + F.size(F.split(F.trim(s), r"\s+"))
        )
        terminal = F.size(F.filter(ss, lambda s: s.rlike("[.!?]$")))
        return F.struct(
            n.alias("n_sentences"),
            F.round(
                F.when(n == 0, F.lit(0.0)).otherwise(words.cast("double") / n), 6
            ).alias("mean_words_per_sentence"),
            F.round(
                F.when(n == 0, F.lit(0.0)).otherwise(terminal.cast("double") / n), 6
            ).alias("terminal_frac"),
        )

    return _let(sentences_of(col), over)


def readability_stats(col: Column) -> Column:
    """Flesch-Kincaid readability from portable counts: words (whitespace
    tokens), sentences (sentinel split), and a vowel-group syllable
    heuristic (runs of [aeiouy]+ per lowercased word — the standard
    dictionary-free approximation). Emits a struct of the raw counts plus

        grade  = 0.39*(words/sentences) + 11.8*(syllables/words) - 15.59
        ease   = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)

    Empty documents emit zero counts and NULL scores. All-integer counts,
    two divisions and a linear combination — engine-exact at 6dp, so a SQL
    oracle replicates it bit-for-bit."""

    def over(toks, ss):
        n_words = F.size(toks)
        n_sents = F.greatest(F.size(ss), F.lit(1))
        syl = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.greatest(
                F.size(F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), F.lit(0))),
                F.lit(1),
            ),
        )
        wps = n_words.cast("double") / n_sents
        spw = syl.cast("double") / n_words
        grade = F.round(0.39 * wps + 11.8 * spw - 15.59, 6)
        ease = F.round(206.835 - 1.015 * wps - 84.6 * spw, 6)
        empty = n_words == 0
        return F.struct(
            n_words.alias("n_words"),
            F.size(ss).alias("n_sentences"),
            F.when(empty, F.lit(0)).otherwise(syl).alias("n_syllables"),
            F.when(empty, F.lit(None).cast("double")).otherwise(grade).alias("fk_grade"),
            F.when(empty, F.lit(None).cast("double")).otherwise(ease).alias("fk_ease"),
        )

    return _let(
        tokens(col), lambda toks: _let(sentences_of(col), lambda ss: over(toks, ss))
    )


def fertility_stats(col: Column) -> Column:
    """Tokenizer-fertility profile of a document: byte/char/token counts
    under both tokenizations (whitespace words and the GPT-2-style
    pre-split of ``subword_tokens``) plus the two derived ratios LLM
    curation reports use:

        fertility         = subword_tokens / whitespace_tokens
        bytes_per_subword = utf8_bytes / subword_tokens

    (cf. the tokenizer-fertility metric of Rust et al. 2021, ACL — how
    many model tokens a word costs; compression ratio bytes/token is the
    standard BPE-efficiency readout.) Empty inputs yield NULL ratios.
    Pure codegen — counts and two divisions, rounded to 6dp, so a DuckDB
    oracle replicates it bit-for-bit. Map-side only at any scale."""

    def over(nb, nc, nw, ns):
        fert = F.when(nw > 0, F.round(ns.cast("double") / nw, 6))
        bps = F.when(ns > 0, F.round(nb.cast("double") / ns, 6))
        return F.struct(
            nb.alias("n_bytes"),
            nc.alias("n_chars"),
            nw.alias("n_ws_tokens"),
            ns.alias("n_subword_tokens"),
            fert.alias("fertility"),
            bps.alias("bytes_per_subword"),
        )

    return over(
        F.octet_length(col),
        F.length(col),
        token_count(col),
        subword_token_count(col),
    )


# Mojibake markers: UTF-8 bytes of common Latin-1/Windows-1252 characters
# re-decoded as Latin-1 — the classic double-encoding signatures ("Ã©" for
# é, "â€™" for a right quote). Literal alternation: portable across Java
# regex and RE2.
_MOJIBAKE_RE = (
    "Ã[©¨¤¶¼± ]"
    "|â€[™œ”“–—]"
    "|Â[ °£]"
)

# C0 controls except \t \n \r, plus DEL. Keep-only counting: strip the
# complement, count what remains.
_CONTROL_KEEP = "[^\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def encoding_quality(col: Column) -> Column:
    """Encoding-sanity QC flags for a text column: U+FFFD replacement
    characters (decoder damage), stray C0/DEL control characters,
    mojibake double-encoding markers, and the non-ASCII character ratio.
    ``is_clean`` = no damage markers at all. The standard pre-training
    hygiene pass (cf. the UTF-8 fixing step of CCNet / ftfy's taxonomy),
    expressed as four keep-only regex counts — pure codegen, map-side
    only, replicated bit-for-bit by the DuckDB oracle."""
    n = F.length(col)
    n_repl = n - F.length(F.regexp_replace(col, "�", ""))
    n_ctrl = F.length(F.regexp_replace(col, _CONTROL_KEEP, ""))
    n_moji = F.size(F.regexp_extract_all(col, F.lit(_MOJIBAKE_RE), F.lit(0)))
    n_nonascii = F.length(F.regexp_replace(col, "[\x00-\x7f]", ""))
    ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(n_nonascii.cast("double") / n, 6)
    )
    return F.struct(
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        n_moji.alias("n_mojibake"),
        n_nonascii.alias("n_non_ascii"),
        ratio.alias("non_ascii_ratio"),
        ((n_repl == 0) & (n_ctrl == 0) & (n_moji == 0)).alias("is_clean"),
    )


# Script classes as literal codepoint ranges (the chars below are the
# actual range endpoints, so the same pattern string works in Java regex
# and RE2 — no \p{Script} dependency). Priority order breaks count ties.
_SCRIPT_CLASSES = [
    ("latin", "A-Za-z"),
    ("digit", "0-9"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("cjk", "一-鿿"),
    ("arabic", "؀-ۿ"),
    ("hangul", "가-힯"),
]


def script_profile(col: Column) -> Column:
    """Per-document writing-script census: character counts per script
    class (latin/digit/cyrillic/greek/cjk/arabic/hangul — literal
    codepoint ranges, no \\p{Script} so the DuckDB oracle matches), the
    dominant script (max count, ties broken by the fixed class order,
    'none' when no class matches), and the dominant ratio over all
    characters. The language-ID pre-filter of multilingual curation
    (script mix flags translation artifacts and mixed-corpus bleed).
    Keep-only regex counts — pure codegen, map-side only."""
    n = F.length(col)
    counts = [
        (name, F.length(F.regexp_replace(col, f"[^{rng}]", "")))
        for name, rng in _SCRIPT_CLASSES
    ]
    best = F.greatest(*[c for _, c in counts])
    dominant = F.lit("none")
    for name, c in reversed(counts):
        dominant = F.when((best > 0) & (c == best), F.lit(name)).otherwise(dominant)
    fields = [c.alias(f"n_{name}") for name, c in counts]
    fields.append(dominant.alias("dominant"))
    fields.append(
        F.when(n == 0, F.lit(0.0))
        .otherwise(F.round(best.cast("double") / n, 6))
        .alias("dominant_ratio")
    )
    return F.struct(*fields)


def compression_ratio(col: Column, level: int = 6) -> Column:
    """DEFLATE compression ratio of the UTF-8 text —
    ``len(zlib.compress(bytes)) / len(bytes)`` — the classic
    duplication/templating quality signal (low ratio = repetitive or
    boilerplate text; used as a page filter in Dolma and RedPajama-v2
    style pipelines). Empty text -> NULL.

    Implementation note: DEFLATE is not expressible in Catalyst, so this
    is the module's one Arrow-batched pandas UDF (vectorized batches,
    never row-at-a-time Python). Output is deterministic for a fixed
    zlib build (the CPython bundled zlib here), but NOT replayable by a
    SQL oracle — downstream gates are rows-only / pytest-differential by
    design.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    def _ratio_batch(texts):
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return texts.map(one)

    return pandas_udf(_ratio_batch, "double")(col)
