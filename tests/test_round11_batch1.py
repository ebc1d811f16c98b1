"""Round-11 candidate batch 1: KN perplexity apply-at-scale, per-slice
score PSI drift, dataset-card snapshot diff, LSH recall/cost tradeoff."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.analysis import dataset_card_diff
from nbdatatools_spark.operators.evaluation import score_psi
from nbdatatools_spark.operators.lm import kn_perplexity_score
from nbdatatools_spark.operators.similarity import (
    _hyperplanes,
    lsh_tradeoff_report,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- kn perplexity ---------------------------------------------------------


def _kn_python(train_texts, score_items, d=0.75, floor=1e-9):
    """Pure-Python interpolated-KN bigram scorer (the operator's exact
    arithmetic: 9dp -ln p nano terms, integer half-up micro mean)."""
    pairs = []
    for t in train_texts:
        ws = t.lower().split()
        pairs += list(zip(ws, ws[1:]))
    from collections import Counter

    nb = Counter(pairs)
    c1 = Counter(w1 for w1, _ in pairs)
    nf = Counter(w1 for w1, _ in nb)
    np_ = Counter(w2 for _, w2 in nb)
    nt = float(len(nb))
    out = {}
    for doc_id, text in score_items:
        ws = text.lower().split()
        bs = list(zip(ws, ws[1:]))
        if not bs:
            continue
        terms, unseen = [], 0
        for w1, w2 in bs:
            pc = np_.get(w2, 0) / nt
            if w1 in c1:
                p = max(nb.get((w1, w2), 0) - d, 0.0) / c1[w1] + (
                    (d * nf[w1]) / c1[w1]
                ) * pc
            else:
                p = pc
            if (w1, w2) not in nb:
                unseen += 1
            p = p if p > 0.0 else floor
            terms.append(int(round(round(-math.log(p), 9) * 1e9)))
        n = len(terms)
        micro = (sum(terms) + 500 * n) // (1000 * n)
        out[doc_id] = (
            n,
            unseen,
            -(micro / 1e6),
            round(math.exp(micro / 1e6), 6),
        )
    return out


def test_kn_perplexity_python_differential(spark):
    train = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
        "the cat and the dog sat",
    ]
    score_items = [
        (0, "the cat sat on the rug"),     # all-known bigrams
        (1, "the zebra sat on a mat"),     # unseen bigrams, known words
        (2, "quux zorp the cat"),          # unseen w1 AND double-unseen
    ]
    tr = _docs(spark, [(100 + i, t) for i, t in enumerate(train)])
    sc = _docs(spark, score_items)
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["n_unseen"],
            r["mean_logp"],
            r["perplexity"],
        )
        for r in kn_perplexity_score(tr, sc).collect()
    }
    exp = _kn_python(train, score_items)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == exp[k][1]
        assert abs(got[k][2] - exp[k][2]) < 1e-9
        assert abs(got[k][3] - exp[k][3]) < 1e-6
    # the in-domain doc is more fluent than the novel-word docs
    assert got[0][3] < got[1][3]
    # doc 2 hits unseen bigrams; its count is positive
    assert got[2][1] >= 2


def test_kn_perplexity_floor_and_validation(spark):
    tr = _docs(spark, [(1, "aa bb aa bb")])
    # w1 'zz' unseen and w2 'yy' unseen -> pcont = 0 -> floor path
    sc = _docs(spark, [(2, "zz yy")])
    r = kn_perplexity_score(tr, sc, floor=1e-9).collect()[0]
    assert r["n_bigrams"] == 1 and r["n_unseen"] == 1
    # -ln(1e-9) = 20.723266 -> perplexity = exp(20.723266)
    assert abs(r["mean_logp"] + 20.723266) < 1e-6
    with pytest.raises(ValueError):
        kn_perplexity_score(tr, sc, discount=1.5)
    with pytest.raises(ValueError):
        kn_perplexity_score(tr, sc, floor=0.0)
    # docs with < 2 tokens are absent
    assert kn_perplexity_score(tr, _docs(spark, [(3, "solo")])).count() == 0


# -- score psi -------------------------------------------------------------


def _scored(spark, rows):
    return spark.createDataFrame(rows, "g string, score double")


def test_score_psi_identical_is_near_zero_and_shift_is_large(spark):
    base = [("a", 0.05 + 0.1 * (i % 10)) for i in range(200)]
    same = _scored(spark, base)
    shifted = _scored(
        spark, [("a", min(s + 0.4, 0.999)) for _, s in base]
    )
    psi_same = score_psi(same, same, "score", "g").collect()[0]
    psi_shift = score_psi(same, shifted, "score", "g").collect()[0]
    assert psi_same["psi"] < 1e-6
    assert psi_shift["psi"] > 0.25
    assert psi_same["n_baseline"] == psi_same["n_current"] == 200


def test_score_psi_one_sided_group_and_nulls(spark):
    base = _scored(spark, [("a", 0.2), ("a", 0.4)])
    cur = spark.createDataFrame(
        [("a", 0.3), ("b", 0.9), ("a", None)], "g string, score double"
    )
    rows = {r["g"]: r for r in score_psi(base, cur, "score", "g").collect()}
    assert set(rows) == {"a", "b"}
    # NULL score dropped: current a = 1 row
    assert rows["a"]["n_baseline"] == 2 and rows["a"]["n_current"] == 1
    assert rows["b"]["n_baseline"] == 0 and rows["b"]["n_current"] == 1
    assert rows["b"]["psi"] is not None
    with pytest.raises(ValueError):
        score_psi(base, cur, "score", "g", n_bins=1)
    with pytest.raises(ValueError):
        score_psi(base, cur, "score", "g", lo=1.0, hi=0.0)


def test_score_psi_python_differential(spark):
    import random

    rng = random.Random(3)
    base = [("x", round(rng.random(), 6)) for _ in range(60)]
    cur = [("x", round(rng.random() ** 2, 6)) for _ in range(40)]
    got = score_psi(
        _scored(spark, base), _scored(spark, cur), "score", "g"
    ).collect()[0]
    nb, nc = len(base), len(cur)
    cb = [0] * 10
    cc = [0] * 10
    for _, s in base:
        cb[min(max(int(s // 0.1), 0), 9)] += 1
    for _, s in cur:
        cc[min(max(int(s // 0.1), 0), 9)] += 1
    psi = 0.0
    for i in range(10):
        p = (cb[i] + 1) / (nb + 10)
        q = (cc[i] + 1) / (nc + 10)
        psi += round((p - q) * math.log(p / q), 9)
    assert abs(got["psi"] - round(psi, 6)) < 1e-9
    assert got["n_baseline"] == nb and got["n_current"] == nc


# -- dataset card diff -----------------------------------------------------


def test_card_diff_statuses_and_deltas(spark):
    schema = "doc_id long, source string, lang string, text string"
    old = spark.createDataFrame(
        [
            (1, "keep", "en", "alpha beta gamma"),
            (2, "keep", "en", "alpha beta"),
            (3, "gone", "de", "delta epsilon"),
            (4, "same", "fr", "zeta eta theta iota"),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (5, "keep", "en", "alpha beta gamma delta"),
            (6, "born", "es", "kappa"),
            (7, "same", "fr", "zeta eta theta iota"),
        ],
        schema,
    )
    rows = {r["slice"]: r for r in dataset_card_diff(old, new).collect()}
    assert set(rows) == {"keep", "gone", "born", "same"}
    assert rows["gone"]["status"] == "removed"
    assert rows["gone"]["n_docs_new"] is None
    assert rows["gone"]["d_n_docs"] is None
    assert rows["born"]["status"] == "added"
    assert rows["born"]["n_docs_old"] is None
    assert rows["keep"]["status"] == "changed"
    assert rows["keep"]["d_n_docs"] == -1.0
    assert rows["keep"]["d_total_tokens"] == -1.0  # 5 -> 4 tokens
    assert rows["same"]["status"] == "unchanged"
    for c in rows["same"].asDict():
        if c.startswith("d_"):
            assert rows["same"][c] == 0.0


# -- lsh tradeoff ----------------------------------------------------------


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_lsh_tradeoff_python_differential(spark):
    import random

    rng = random.Random(11)
    dim, k = 8, 3
    vecs = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(30)]
    df = _emb(spark, vecs)
    q = df.where(F.col("vec_id") < 5)
    got = {
        r["n_bits"]: r
        for r in lsh_tradeoff_report(
            q, df, k=k, dim=dim, bits_list=(2, 4), seed=7
        ).collect()
    }

    def sig(v, n_bits):
        planes = _hyperplanes(dim, n_bits, 7)
        s = 0
        for j, p in enumerate(planes):
            if sum(a * b for a, b in zip(v, p)) > 0:
                s += 1 << j
        return s

    def cos_dist(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return 1 - dot / (na * nb)

    truth = {}
    for qi in range(5):
        ranked = sorted(
            ((cos_dist(vecs[qi], vecs[b]), b) for b in range(30))
        )[:k]
        truth[qi] = {b for _, b in ranked}
    for n_bits in (2, 4):
        sigs = [sig(v, n_bits) for v in vecs]
        cands = total_match = 0
        for qi in range(5):
            bucket = [b for b in range(30) if sigs[b] == sigs[qi]]
            cands += len(bucket)
            top = sorted((cos_dist(vecs[qi], vecs[b]), b) for b in bucket)[
                :k
            ]
            total_match += len({b for _, b in top} & truth[qi])
        r = got[n_bits]
        assert r["n_queries"] == 5
        assert abs(r["recall_at_k"] - round(total_match / (k * 5), 6)) < 1e-9
        assert abs(r["mean_candidates"] - round(cands / 5, 6)) < 1e-9


def test_lsh_tradeoff_candidates_monotone_nonincreasing(spark):
    # planes(b) is a PREFIX of planes(b') for b < b' (same seeded RNG),
    # so buckets only refine and candidate counts cannot grow
    import random

    rng = random.Random(5)
    vecs = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(60)]
    df = _emb(spark, vecs)
    rows = lsh_tradeoff_report(
        df.where(F.col("vec_id") < 8), df, k=5, dim=16,
        bits_list=(2, 6, 10), seed=42,
    ).collect()
    cands = [r["mean_candidates"] for r in sorted(rows, key=lambda r: r["n_bits"])]
    assert cands[0] >= cands[1] >= cands[2]
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
    with pytest.raises(ValueError):
        lsh_tradeoff_report(df, df, k=0, dim=16)
    with pytest.raises(ValueError):
        lsh_tradeoff_report(df, df, k=5, dim=16, bits_list=())
