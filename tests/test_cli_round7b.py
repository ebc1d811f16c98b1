"""Round-7 batch-2+ CLI wiring: events acf/survival, analyze
benford/chi2/assoc/intrinsic-dim, corpus hll/jsd/textrank/
batching_audit/isotonic/sliced_auc."""

import json
import os

from nbdatatools_spark.__main__ import main

SF = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF, "documents.parquet")
EVENTS = os.path.join(SF, "events.parquet")
ORDERS = os.path.join(SF, "orders.parquet")
LINEITEM = os.path.join(SF, "lineitem.parquet")
EMB = os.path.join(SF, "embeddings.parquet")


def _lines(capsys):
    return [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]


def test_events_acf_cli(spark, capsys):
    assert main(["events", "acf", "--input", EVENTS, "--max-lag", "3"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 4
    assert rows[0]["lag"] == 0 and rows[0]["acf"] == 1.0
    assert all(-1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9 for r in rows)


def test_events_survival_cli(spark, capsys):
    assert main(
        ["events", "survival", "--input", EVENTS, "--censor-days", "1"]
    ) == 0
    rows = _lines(capsys)
    assert rows
    surv = [r["survival"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    assert all(r["n_events"] > 0 for r in rows)


def test_analyze_benford_cli(spark, capsys):
    assert main(
        ["analyze", "benford", "--input", ORDERS, "--value-col",
         "o_totalprice"]
    ) == 0
    rows = _lines(capsys)
    assert len(rows) == 9
    assert abs(sum(r["p_expected"] for r in rows) - 1.0) < 1e-6
    assert len({r["chi2"] for r in rows}) == 1


def test_analyze_chi2_cli(spark, capsys):
    assert main(
        ["analyze", "chi2", "--input", DOCS, "--col-a", "lang", "--col-b",
         "source"]
    ) == 0
    (row,) = _lines(capsys)
    assert row["dof"] == (row["levels_a"] - 1) * (row["levels_b"] - 1)
    assert row["chi2"] >= 0.0 and 0.0 <= row["cramers_v"] <= 1.0


def test_analyze_assoc_cli(spark, capsys):
    assert main(
        ["analyze", "assoc", "--input", LINEITEM, "--basket-col",
         "l_orderkey", "--item-col", "l_suppkey", "--min-pairs", "2",
         "--limit", "5"]
    ) == 0
    rows = _lines(capsys)
    assert 0 < len(rows) <= 5
    for r in rows:
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert 0 < r["conf_a_to_b"] <= 1.0


def test_analyze_intrinsic_dim_cli(spark, capsys):
    assert main(
        ["analyze", "intrinsic-dim", "--input", EMB, "--dims", "16"]
    ) == 0
    (row,) = _lines(capsys)
    assert row["d"] == 16
    assert 1.0 <= row["intrinsic_dim"] <= 16.0


def test_corpus_hll_cli(spark, capsys):
    assert main(["corpus", "hll", "--input", DOCS]) == 0
    (row,) = _lines(capsys)
    assert row["registers"] == 256
    assert row["exact_distinct"] > 0
    assert abs(row["rel_error"]) < 0.5


def test_corpus_jsd_cli(spark, capsys):
    assert main(["corpus", "jsd", "--input", DOCS, "--vocab", "64"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 190  # 20 sources -> C(20,2) pairs
    assert all(-1e-9 <= r["jsd_bits"] <= 1.0 + 1e-9 for r in rows)


def test_corpus_textrank_cli(spark, capsys):
    assert main(
        ["corpus", "textrank", "--input", DOCS, "--top", "5"]
    ) == 0
    rows = _lines(capsys)
    assert len(rows) == 5
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_corpus_batching_audit_cli(spark, capsys):
    assert main(["corpus", "batching_audit", "--input", DOCS]) == 0
    rows = {r["strategy"]: r for r in _lines(capsys)}
    assert set(rows) == {"arrival", "sorted"}
    assert rows["sorted"]["padded_tokens"] <= rows["arrival"]["padded_tokens"]


def test_corpus_isotonic_cli(spark, capsys):
    assert main(
        ["corpus", "isotonic", "--input", DOCS, "--score-expr",
         "least(n_chars / 2000.0, 1.0)", "--label-expr", "lang = 'en'"]
    ) == 0
    rows = _lines(capsys)
    iso = [r["isotonic_rate"] for r in rows]
    assert iso == sorted(iso)


def test_corpus_sliced_auc_cli(spark, capsys):
    assert main(
        ["corpus", "sliced_auc", "--input", DOCS, "--score-expr",
         "n_chars / 1000.0", "--label-expr", "lang = 'en'"]
    ) == 0
    rows = _lines(capsys)
    assert len(rows) == 20
    for r in rows:
        if r["auc"] is not None:
            assert 0.0 <= r["auc"] <= 1.0


def test_events_ccf_cli(spark, capsys):
    assert main(
        ["events", "ccf", "--input", EVENTS, "--key-a", "click",
         "--key-b", "purchase", "--max-lag", "3"]
    ) == 0
    rows = _lines(capsys)
    assert len(rows) == 7
    assert {r["lag"] for r in rows} == set(range(-3, 4))
    assert all(
        r["ccf"] is None or -1.0 - 1e-9 <= r["ccf"] <= 1.0 + 1e-9
        for r in rows
    )


def test_analyze_rfm_cli(spark, capsys):
    assert main(["analyze", "rfm", "--input", ORDERS, "--buckets", "4"]) == 0
    rows = _lines(capsys)
    assert rows
    for r in rows:
        assert 0 <= r["r_bucket"] < 4
        assert r["n_customers"] > 0


def test_corpus_yield_curve_cli(spark, capsys):
    assert main(
        ["corpus", "yield_curve", "--input", DOCS, "--score-expr",
         "least(n_chars / 2000.0, 1.0)", "--weight-expr", "n_chars",
         "--steps", "10"]
    ) == 0
    rows = _lines(capsys)
    assert len(rows) == 11
    ys = [r["doc_yield"] for r in rows]
    assert ys == sorted(ys, reverse=True)


def test_corpus_dup_rate_cli(spark, capsys):
    assert main(["corpus", "dup_rate", "--input", DOCS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert r["n_distinct_texts"] <= r["n_docs"]


def test_corpus_gini_cli(spark, capsys):
    assert main(["corpus", "gini", "--input", DOCS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 20
    cs = [r["cum_share"] for r in rows]
    assert cs == sorted(cs)
    assert len({r["gini"] for r in rows}) == 1
    assert 0.0 <= rows[0]["gini"] <= 1.0


def test_analyze_isotropy_cli(spark, capsys):
    assert main(
        ["analyze", "isotropy", "--input", EMB, "--sample", "16"]
    ) == 0
    (row,) = _lines(capsys)
    assert row["n_sampled"] == 16 and row["n_pairs"] == 120
    assert -1.0 <= row["mean_cos"] <= 1.0
    assert row["mean_abs_cos"] <= row["max_abs_cos"] + 1e-9
