"""Round-10 batch-3 CLI wiring: analyze calinski-harabasz / hopkins /
lof / link-prediction / distinct-ngrams / temperature."""

import json
import os

from nbdatatools_spark.__main__ import main

SF = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF, "documents.parquet")
EMB = os.path.join(SF, "embeddings.parquet")


def _lines(capsys):
    return [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]


def test_calinski_harabasz_cli(spark, capsys, tmp_path):
    clustered = str(tmp_path / "clustered.parquet")
    df = spark.read.parquet(EMB).selectExpr(
        "CAST(vec_id % 4 AS INT) AS cluster", "embedding"
    )
    df.write.parquet(clustered)
    assert main(["analyze", "calinski-harabasz", "--input", clustered,
                 "--group-col", "cluster"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    assert rows[0]["k"] == 4 and rows[0]["ch_index"] is not None


def test_hopkins_cli(spark, capsys):
    assert main(["analyze", "hopkins", "--input", EMB, "--m", "10"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    assert 0.0 < rows[0]["hopkins"] < 1.0
    assert rows[0]["m"] == 10


def test_lof_cli(spark, capsys, tmp_path):
    small = str(tmp_path / "small.parquet")
    spark.read.parquet(EMB).where("vec_id < 60").write.parquet(small)
    assert main(["analyze", "lof", "--input", small, "--k", "4",
                 "--limit", "8"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 8
    # sorted by lof descending
    lofs = [r["lof"] for r in rows if r["lof"] is not None]
    assert lofs == sorted(lofs, reverse=True)


def test_link_prediction_cli(spark, capsys, tmp_path):
    edges = str(tmp_path / "edges.parquet")
    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    ).write.parquet(edges)
    assert main(["analyze", "link-prediction", "--input", edges,
                 "--top-n", "5"]) == 0
    rows = _lines(capsys)
    assert {(r["node_a"], r["node_b"]) for r in rows} == {(1, 3), (2, 4)}


def test_distinct_ngrams_cli(spark, capsys):
    assert main(["analyze", "distinct-ngrams", "--input", DOCS,
                 "--n", "1", "--n", "2"]) == 0
    rows = _lines(capsys)
    assert {r["n"] for r in rows} == {1, 2}
    assert all(0.0 < r["distinct_ratio"] <= 1.0 for r in rows)


def test_temperature_cli(spark, capsys, tmp_path):
    scored = str(tmp_path / "scored.parquet")
    spark.read.parquet(DOCS).selectExpr(
        "round(least(greatest(n_chars / 1000.0, 0.01), 0.99), 6) AS score",
        "CAST(n_chars >= 400 AS INT) AS y",
    ).write.parquet(scored)
    assert main(["analyze", "temperature", "--input", scored,
                 "--score-col", "score", "--label-col", "y"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    assert rows[0]["temperature"] is not None
    assert rows[0]["nll_after"] <= rows[0]["nll_before"] + 1e-9


def test_train_sentencepiece_cli(spark, capsys):
    assert main(["corpus", "train_sentencepiece", "--input", DOCS,
                 "--merges", "5"]) == 0
    rows = _lines(capsys)
    head, merges = rows[0], rows[1:]
    assert head["n_merges"] == len(merges) <= 5
    for i, m in enumerate(merges):
        assert m["step"] == i and m["pair_count"] >= 2


def test_ece_cli(spark, capsys, tmp_path):
    scored = str(tmp_path / "scored.parquet")
    spark.read.parquet(DOCS).selectExpr(
        "round(least(greatest(n_chars / 1000.0, 0.01), 0.99), 6) AS score",
        "CAST(n_chars >= 400 AS INT) AS y",
    ).write.parquet(scored)
    assert main(["analyze", "ece", "--input", scored,
                 "--score-col", "score", "--label-col", "y"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    assert 0.0 <= rows[0]["ece"] <= rows[0]["mce"] <= 1.0


def test_sinkhorn_cli(spark, capsys, tmp_path):
    vals = str(tmp_path / "vals.parquet")
    spark.read.parquet(DOCS).selectExpr(
        "CAST(n_chars AS DOUBLE) AS v",
        "CAST(doc_id % 2 AS STRING) AS grp",
    ).write.parquet(vals)
    assert main(["analyze", "sinkhorn", "--input", vals,
                 "--value-col", "v", "--group-col", "grp",
                 "--group-a", "0", "--group-b", "1",
                 "--lo", "0", "--hi", "2000"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    assert rows[0]["cost"] >= 0.0 and rows[0]["marginal_err"] < 0.01


def test_pack_audit_cli(spark, capsys):
    assert main(["corpus", "pack_audit", "--input", DOCS,
                 "--max-tokens", "2048", "--token-col", "n_chars"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    assert rows[0]["n_seqs"] > 0
    assert 0.0 <= rows[0]["split_frac"] <= 1.0


def test_richness_and_approx_distinct_cli(spark, capsys):
    assert main(["corpus", "richness", "--input", DOCS]) == 0
    rows = _lines(capsys)
    assert all(r["chao1"] >= r["n_types"] for r in rows)
    assert main(["analyze", "distinct-ngrams", "--input", DOCS,
                 "--n", "2", "--approx", "--precision", "8"]) == 0
    rows = _lines(capsys)
    assert all(r["distinct_estimate"] > 0 for r in rows)


def test_hill_and_rarity_cli(spark, capsys):
    assert main(["analyze", "hill", "--input", DOCS,
                 "--value-col", "n_chars", "--k", "10"]) == 0
    rows = _lines(capsys)
    assert all(r["k_used"] <= 10 for r in rows)
    assert main(["corpus", "rarity", "--input", DOCS, "--limit", "5"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5
    assert rows[0]["rarity"] >= rows[-1]["rarity"]
