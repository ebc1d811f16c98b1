"""Round-6 CLI wiring: corpus card/keyphrases/kneser_ney/
calibrate_minhash/balance, compute kmeans, analyze sq8-error, and the
events group (seasonal/cusum/mad/concurrency/triangles)."""

import json
import os

from nbdatatools_spark.__main__ import main

SF = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF, "documents.parquet")
EMB = os.path.join(SF, "embeddings.parquet")
EVENTS = os.path.join(SF, "events.parquet")


def _lines(capsys):
    return [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]


def test_corpus_card_cli(spark, capsys):
    assert main(["corpus", "card", "--input", DOCS]) == 0
    rows = _lines(capsys)
    assert rows and {"slice", "n_docs", "total_tokens", "dup_rate"} <= set(rows[0])


def test_corpus_keyphrases_cli(spark, capsys):
    assert main(["corpus", "keyphrases", "--input", DOCS, "--top", "5"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5 and all(r["score"] > 0 for r in rows)


def test_corpus_kneser_ney_cli(spark, capsys):
    assert main(["corpus", "kneser_ney", "--input", DOCS, "--top", "7"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 7 and all(0 < r["p_kn"] <= 1 for r in rows)


def test_corpus_calibrate_minhash_cli(spark, capsys):
    assert main(["corpus", "calibrate_minhash", "--input", DOCS, "--top", "3"]) == 0
    rows = _lines(capsys)
    assert rows[0]["n_pairs"] >= 0 and "mean_abs_err" in rows[0]


def test_corpus_balance_cli(spark, capsys):
    assert main(["corpus", "balance", "--input", DOCS]) == 0
    rows = _lines(capsys)
    assert rows and all(r["weight"] > 0 for r in rows)


def test_compute_kmeans_cli(spark, capsys):
    assert main(["compute", "kmeans", "--input", EMB, "-k", "4"]) == 0
    rows = _lines(capsys)
    assert [r["centroid_id"] for r in rows] == sorted(r["centroid_id"] for r in rows)
    assert sum(r["n_assigned"] for r in rows) > 0


def test_analyze_sq8_error_cli(spark, capsys):
    assert main(["analyze", "sq8-error", "--input", EMB]) == 0
    rows = _lines(capsys)
    assert rows and all(r["within_bound"] for r in rows)


def test_events_cli_group(spark, capsys):
    assert main(["events", "seasonal", "--input", EVENTS]) == 0
    seas = _lines(capsys)
    assert seas and "residual" in seas[0]

    assert main(["events", "cusum", "--input", EVENTS]) == 0
    cus = _lines(capsys)
    assert cus and "cusum_pos" in cus[0]

    assert main(["events", "mad", "--input", EVENTS]) == 0
    mad = _lines(capsys)
    assert mad and all(r["n_outliers"] <= r["n"] for r in mad)

    assert main(["events", "concurrency", "--input", EVENTS]) == 0
    conc = _lines(capsys)
    assert conc and all(r["max_concurrent"] >= 1 for r in conc)

    assert main(["events", "triangles", "--input", EVENTS]) == 0
    tri = _lines(capsys)
    assert len(tri) == 1 and tri[0]["n_triangles"] >= 0
