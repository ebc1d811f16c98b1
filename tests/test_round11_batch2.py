"""Round-11 candidate batch 2: Gwet's AC1, DeLong AUC CI, Min-K% Prob."""

import math

import pytest

from nbdatatools_spark.operators.evaluation import (
    auc_delong_ci,
    fleiss_kappa,
    gwet_ac1,
)
from nbdatatools_spark.operators.lm import mink_prob_score


# -- gwet ac1 ----------------------------------------------------------------


def _panel(spark, rows):
    return spark.createDataFrame(rows, "i string, r string, c string")


def _ac1_python(rows):
    from collections import defaultdict

    ic = defaultdict(lambda: defaultdict(int))
    for i, r, c in rows:
        ic[i][c] += 1
    kept = {i: cats for i, cats in ic.items() if sum(cats.values()) >= 2}
    n_items = len(kept)
    pa = sum(
        round(
            sum(n * (n - 1) for n in cats.values())
            / (sum(cats.values()) * (sum(cats.values()) - 1.0)),
            9,
        )
        for cats in kept.values()
    ) / n_items
    allc = sorted({c for cats in kept.values() for c in cats})
    pi = {
        c: sum(
            round(cats.get(c, 0) / sum(cats.values()), 9)
            for cats in kept.values()
        )
        / n_items
        for c in allc
    }
    C = len(allc)
    pe = sum(round(p * (1 - p), 9) for p in pi.values()) / (C - 1)
    return pa, pe, (pa - pe) / (1 - pe)


def test_gwet_hand_computed_and_python_differential(spark):
    rows = [
        ("i1", "a", "y"), ("i1", "b", "y"), ("i1", "c", "y"),
        ("i2", "a", "y"), ("i2", "b", "n"), ("i2", "c", "y"),
        ("i3", "a", "n"), ("i3", "b", "n"),             # ragged: 2 raters
        ("i4", "a", "y"), ("i4", "b", "y"), ("i4", "c", "n"),
    ]
    out = gwet_ac1(_panel(spark, rows), "i", "r", "c").collect()[0]
    pa, pe, ac1 = _ac1_python([tuple(r) for r in rows])
    assert out["n_items"] == 4 and out["n_items_dropped"] == 0
    assert out["n_categories"] == 2
    assert abs(out["pa"] - round(pa, 6)) < 1e-9
    assert abs(out["pe"] - round(pe, 6)) < 1e-9
    assert abs(out["ac1"] - round(ac1, 6)) < 1e-9


def test_gwet_prevalence_stability_vs_fleiss(spark):
    # the kappa paradox: 2 raters agree on 19/20 items of a 19:1 split
    rows = []
    for i in range(19):
        rows += [(f"p{i}", "a", "pos"), (f"p{i}", "b", "pos")]
    rows += [("q0", "a", "pos"), ("q0", "b", "neg")]
    ac1 = gwet_ac1(_panel(spark, rows), "i", "r", "c").collect()[0]["ac1"]
    kap = fleiss_kappa(_panel(spark, rows), "i", "r", "c").collect()[0][
        "kappa"
    ]
    # observed agreement is 95%, yet kappa collapses; AC1 stays high
    assert kap < 0.1
    assert ac1 > 0.85


def test_gwet_drops_and_degenerate(spark):
    # i2 has rater a twice (masking a missing one) and i3 is single-rated
    rows = [
        ("i1", "a", "y"), ("i1", "b", "y"),
        ("i2", "a", "y"), ("i2", "a", "n"),
        ("i3", "a", "y"),
    ]
    out = gwet_ac1(_panel(spark, rows), "i", "r", "c").collect()[0]
    assert out["n_items"] == 1 and out["n_items_dropped"] == 2
    # single surviving unanimous item over ONE category: pa=1, pe/ac1 NULL
    assert out["pa"] == 1.0
    assert out["n_categories"] == 1
    assert out["pe"] is None and out["ac1"] is None


# -- delong auc ci -----------------------------------------------------------


def _delong_python(pairs):
    # pairs: (score, y)
    import statistics

    pos = sorted(s for s, y in pairs if y == 1)
    neg = sorted(s for s, y in pairs if y == 0)
    n1, n0 = len(pos), len(neg)

    def midrank(xs, sample):
        # tie-averaged rank of value x within sample
        out = []
        for x in xs:
            below = sum(1 for v in sample if v < x)
            ties = sum(1 for v in sample if v == x)
            out.append(below + (ties + 1) / 2.0)
        return out

    allv = sorted(s for s, _ in pairs)
    v10 = [
        round((ra - rp) / n0, 9)
        for ra, rp in zip(midrank(pos, allv), midrank(pos, pos))
    ]
    v01 = [
        round(1.0 - (ra - rn) / n1, 9)
        for ra, rn in zip(midrank(neg, allv), midrank(neg, neg))
    ]
    auc = sum(v10) / n1
    s10 = statistics.variance(v10) if n1 > 1 else None
    s01 = statistics.variance(v01) if n0 > 1 else None
    se = math.sqrt(s10 / n1 + s01 / n0)
    return auc, se


def test_delong_python_differential(spark):
    import random

    rng = random.Random(9)
    pairs = [(round(rng.random(), 2), 1) for _ in range(40)] + [
        (round(rng.random() * 0.8, 2), 0) for _ in range(60)
    ]
    df = spark.createDataFrame(pairs, "score double, y int")
    out = auc_delong_ci(df, "score", "y").collect()[0]
    auc, se = _delong_python(pairs)
    assert out["n_pos"] == 40 and out["n_neg"] == 60
    assert abs(out["auc"] - round(auc, 6)) < 2e-6
    assert abs(out["se"] - round(se, 6)) < 2e-6
    assert abs(out["ci_lo"] - round(auc - 1.959963984540054 * se, 6)) < 4e-6
    assert abs(out["ci_hi"] - round(auc + 1.959963984540054 * se, 6)) < 4e-6
    assert out["ci_lo"] < out["auc"] < out["ci_hi"]


def test_delong_perfect_separation_and_guards(spark):
    perfect = [(1.0, 1)] * 5 + [(0.0, 0)] * 7
    out = auc_delong_ci(
        spark.createDataFrame(perfect, "score double, y int"), "score", "y"
    ).collect()[0]
    assert out["auc"] == 1.0 and out["se"] == 0.0
    assert out["ci_lo"] == 1.0 and out["ci_hi"] == 1.0
    # single positive: variance undefined -> NULL se/ci, auc still set
    one_pos = [(0.9, 1), (0.1, 0), (0.2, 0)]
    out2 = auc_delong_ci(
        spark.createDataFrame(one_pos, "score double, y int"), "score", "y"
    ).collect()[0]
    assert out2["auc"] == 1.0
    assert out2["se"] is None and out2["ci_lo"] is None
    # single class: NULL auc
    one_cls = [(0.9, 1), (0.8, 1)]
    out3 = auc_delong_ci(
        spark.createDataFrame(one_cls, "score double, y int"), "score", "y"
    ).collect()[0]
    assert out3["auc"] is None


# -- min-k% prob -------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mink_python_differential(spark):
    from tests.test_round11_batch1 import _kn_python

    train = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog sat here",
    ]
    score_items = [
        (0, "the cat sat on the mat"),          # memorized
        (1, "a zebra ran under the bridge now"), # novel
    ]
    got = {
        r["doc_id"]: r
        for r in mink_prob_score(
            _docs(spark, [(100 + i, t) for i, t in enumerate(train)]),
            _docs(spark, score_items),
            k_pct=0.4,
        ).collect()
    }
    # python replica: per-bigram neg-log nano terms, keep the largest
    # max(1, floor(0.4*n)), integer half-up micro mean
    import math as m
    from collections import Counter

    pairs = []
    for t in train:
        ws = t.lower().split()
        pairs += list(zip(ws, ws[1:]))
    nb = Counter(pairs)
    c1 = Counter(w1 for w1, _ in pairs)
    nf = Counter(w1 for w1, _ in nb)
    np_ = Counter(w2 for _, w2 in nb)
    nt = float(len(nb))
    for doc_id, text in score_items:
        ws = text.lower().split()
        terms = []
        for w1, w2 in zip(ws, ws[1:]):
            pc = np_.get(w2, 0) / nt
            if w1 in c1:
                p = max(nb.get((w1, w2), 0) - 0.75, 0.0) / c1[w1] + (
                    (0.75 * nf[w1]) / c1[w1]
                ) * pc
            else:
                p = pc
            p = p if p > 0.0 else 1e-9
            terms.append(int(round(round(-m.log(p), 9) * 1e9)))
        n = len(terms)
        k = max(1, int(0.4 * n))
        kept = sorted(terms, reverse=True)[:k]
        micro = (sum(kept) + 500 * k) // (1000 * k)
        r = got[doc_id]
        assert r["n_bigrams"] == n and r["k_used"] == k
        assert abs(r["mink_logp"] + micro / 1e6) < 1e-9
    # the memorized doc's worst spans are far less surprising
    assert got[0]["mink_logp"] > got[1]["mink_logp"]


def test_mink_validation_and_k_floor(spark):
    tr = _docs(spark, [(1, "aa bb cc dd ee")])
    sc = _docs(spark, [(2, "aa bb cc")])  # 2 bigrams, k = max(1, 0) = 1
    r = mink_prob_score(tr, sc, k_pct=0.2).collect()[0]
    assert r["k_used"] == 1
    with pytest.raises(ValueError):
        mink_prob_score(tr, sc, k_pct=0.0)
    with pytest.raises(ValueError):
        mink_prob_score(tr, sc, k_pct=1.5)


# -- sliced ece --------------------------------------------------------------


def test_sliced_ece_matches_global_on_single_group(spark):
    from nbdatatools_spark.operators.evaluation import (
        expected_calibration_error,
    )

    rows = [(0.1 * (i % 10) + 0.05, int(i % 3 == 0)) for i in range(90)]
    df = spark.createDataFrame(rows, "score double, y int")
    g = expected_calibration_error(df, "score", "y").collect()[0]
    sliced = expected_calibration_error(
        df.selectExpr("'only' AS src", "score", "y"),
        "score",
        "y",
        group_col="src",
    ).collect()
    assert len(sliced) == 1
    s = sliced[0]
    assert s["src"] == "only"
    assert (s["n"], s["n_bins_occupied"], s["ece"], s["mce"]) == (
        g["n"], g["n_bins_occupied"], g["ece"], g["mce"],
    )


def test_sliced_ece_exposes_slice_miscalibration(spark):
    from nbdatatools_spark.operators.evaluation import (
        expected_calibration_error,
    )

    # slice "good": labels match scores (calibrated); slice "bad":
    # same scores, all labels 0 (badly over-confident)
    good = [("good", 0.05 + 0.1 * (i % 10), int((i * 7) % 10 < (i % 10)))
            for i in range(200)]
    bad = [("bad", 0.05 + 0.1 * (i % 10), 0) for i in range(200)]
    df = spark.createDataFrame(
        good + bad, "src string, score double, y int"
    )
    rows = {r["src"]: r for r in expected_calibration_error(
        df, "score", "y", group_col="src"
    ).collect()}
    assert rows["bad"]["ece"] > rows["good"]["ece"]
    assert rows["bad"]["ece"] > 0.3
