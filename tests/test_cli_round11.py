"""Round-11 batch-1 CLI wiring: corpus kn_perplexity / score_psi /
card_diff, analyze lsh-tradeoff."""

import json
import os

from nbdatatools_spark.__main__ import main

SF = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF, "documents.parquet")
EMB = os.path.join(SF, "embeddings.parquet")


def _lines(capsys):
    return [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]


def test_kn_perplexity_cli(spark, capsys, tmp_path):
    train = str(tmp_path / "train.parquet")
    held = str(tmp_path / "held.parquet")
    docs = spark.read.parquet(DOCS)
    docs.where("doc_id % 3 != 0").write.parquet(train)
    docs.where("doc_id % 3 = 0").write.parquet(held)
    assert main(["corpus", "kn_perplexity", "--train", train,
                 "--input", held, "--limit", "5"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5
    assert all(r["perplexity"] > 0 for r in rows)
    assert all(r["n_bigrams"] >= 1 for r in rows)


def test_score_psi_cli(spark, capsys, tmp_path):
    base = str(tmp_path / "base.parquet")
    cur = str(tmp_path / "cur.parquet")
    scored = spark.read.parquet(DOCS).selectExpr(
        "source", "round(n_chars / 2000.0, 6) AS score"
    )
    scored.where("score <= 0.5").write.parquet(base)
    scored.where("score > 0.5").write.parquet(cur)
    assert main(["corpus", "score_psi", "--baseline", base,
                 "--current", cur]) == 0
    rows = _lines(capsys)
    assert rows and all("psi" in r for r in rows)
    # disjoint halves of the score range must read as a big shift
    assert max(r["psi"] for r in rows) > 0.25


def test_card_diff_cli(spark, capsys, tmp_path):
    old = str(tmp_path / "old.parquet")
    new = str(tmp_path / "new.parquet")
    docs = spark.read.parquet(DOCS)
    docs.where("doc_id % 2 = 0").write.parquet(old)
    docs.where("doc_id % 2 = 1").write.parquet(new)
    assert main(["corpus", "card_diff", "--old", old, "--new", new]) == 0
    rows = _lines(capsys)
    assert rows
    assert all(
        r["status"] in ("added", "removed", "changed", "unchanged")
        for r in rows
    )


def test_lsh_tradeoff_cli(spark, capsys):
    assert main(["analyze", "lsh-tradeoff", "--input", EMB,
                 "--n-queries", "5", "--k", "5", "--bits", "4,8"]) == 0
    rows = _lines(capsys)
    assert [r["n_bits"] for r in rows] == [4, 8]
    assert all(0.0 <= r["recall_at_k"] <= 1.0 for r in rows)
    assert rows[0]["mean_candidates"] >= rows[1]["mean_candidates"]


def test_mink_prob_cli(spark, capsys, tmp_path):
    train = str(tmp_path / "mtrain.parquet")
    held = str(tmp_path / "mheld.parquet")
    docs = spark.read.parquet(DOCS)
    docs.where("doc_id % 3 != 0").write.parquet(train)
    docs.where("doc_id % 3 = 0").write.parquet(held)
    assert main(["corpus", "mink_prob", "--train", train,
                 "--input", held, "--limit", "5"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5
    assert all(r["mink_logp"] <= 0 for r in rows)
    assert all(r["k_used"] >= 1 for r in rows)


def test_gwet_cli(spark, capsys, tmp_path):
    panel = str(tmp_path / "panel.parquet")
    spark.read.parquet(DOCS).selectExpr(
        "doc_id AS item", "'len' AS rater",
        "CAST(n_chars >= 400 AS STRING) AS category"
    ).unionAll(
        spark.read.parquet(DOCS).selectExpr(
            "doc_id", "'lang'", "CAST(lang = 'en' AS STRING)"
        )
    ).write.parquet(panel)
    assert main(["analyze", "gwet", "--input", panel]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    assert rows[0]["n_items"] > 0
    assert -1.0 <= rows[0]["ac1"] <= 1.0


def test_auc_ci_cli(spark, capsys, tmp_path):
    scored = str(tmp_path / "scored.parquet")
    spark.read.parquet(DOCS).selectExpr(
        "round(n_chars / 2000.0, 6) AS score",
        "CAST(n_chars >= 400 AS INT) AS label",
    ).write.parquet(scored)
    assert main(["analyze", "auc-ci", "--input", scored]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    r = rows[0]
    assert r["ci_lo"] <= r["auc"] <= r["ci_hi"]


def test_funnel_cli(capsys):
    stages = json.dumps([
        {"name": "lang_en", "expr": "lang = 'en'"},
        {"name": "long_docs", "expr": "n_chars >= 200"},
    ])
    assert main(["corpus", "funnel", "--input", DOCS,
                 "--stages", stages]) == 0
    rows = _lines(capsys)
    assert [r["stage"] for r in rows] == [0, 1, 2]
    assert rows[0]["name"] == "input" and rows[0]["pct_docs"] == 1.0
    assert rows[1]["docs"] <= rows[0]["docs"]
    assert rows[2]["docs"] <= rows[1]["docs"]


def test_slice_perplexity_cli(spark, capsys, tmp_path):
    train = str(tmp_path / "sp_train.parquet")
    held = str(tmp_path / "sp_held.parquet")
    docs = spark.read.parquet(DOCS)
    docs.where("doc_id % 3 != 0").write.parquet(train)
    docs.where("doc_id % 3 = 0").write.parquet(held)
    assert main(["corpus", "slice_perplexity", "--train", train,
                 "--input", held]) == 0
    rows = _lines(capsys)
    assert rows and {r["tier"] for r in rows} == {"head", "middle", "tail"}
    ppl = [r["perplexity"] for r in rows]
    assert ppl == sorted(ppl)


def test_centroid_drift_cli(spark, capsys, tmp_path):
    a = str(tmp_path / "emb_a.parquet")
    b = str(tmp_path / "emb_b.parquet")
    emb = spark.read.parquet(EMB)
    emb.where("vec_id % 2 = 0").write.parquet(a)
    emb.where("vec_id % 2 = 1").write.parquet(b)
    assert main(["analyze", "centroid-drift", "--baseline", a,
                 "--current", b]) == 0
    rows = _lines(capsys)
    assert rows and all(-1.0 <= r["cosine"] <= 1.0 for r in rows)
    assert all(r["l2"] >= 0.0 for r in rows)


def test_dedup_savings_cli(capsys):
    assert main(["corpus", "dedup_savings", "--input", DOCS]) == 0
    rows = _lines(capsys)
    assert rows and rows[0]["cluster_size"] == 1
    assert all(r["docs"] == r["cluster_size"] * r["n_clusters"] for r in rows)


def test_source_contamination_cli(spark, capsys, tmp_path):
    train = str(tmp_path / "ct_train.parquet")
    test = str(tmp_path / "ct_test.parquet")
    docs = spark.read.parquet(DOCS)
    docs.where("doc_id % 101 != 0").write.parquet(train)
    docs.where("doc_id % 101 = 0").write.parquet(test)
    assert main(["corpus", "source_contamination", "--input", train,
                 "--test", test]) == 0
    rows = _lines(capsys)
    assert rows and all(0.0 <= r["doc_rate"] <= 1.0 for r in rows)
    assert all(r["n_contaminated"] <= r["n_docs"] for r in rows)
