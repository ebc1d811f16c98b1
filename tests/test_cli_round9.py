"""Round-9 CLI wiring: corpus train_wordpiece / fertility_sweep /
fineweb / reservoir."""

import json
import os

from nbdatatools_spark.__main__ import main

SF = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF, "documents.parquet")


def _lines(capsys):
    return [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]


def test_train_wordpiece_cli(spark, capsys):
    assert main(["corpus", "train_wordpiece", "--input", DOCS,
                 "--merges", "5"]) == 0
    rows = _lines(capsys)
    head, merges = rows[0], rows[1:]
    assert head["n_merges"] == len(merges) <= 5
    assert head["vocab_size"] > head["n_merges"]
    for i, m in enumerate(merges):
        assert m["step"] == i
        assert m["pair_count"] >= 2
        assert 0.0 < m["score"] <= 1.0
        assert m["right"].startswith("##")


def test_fertility_sweep_cli(spark, capsys):
    assert main(["corpus", "fertility_sweep", "--input", DOCS,
                 "--checkpoints", "0,2,4"]) == 0
    rows = _lines(capsys)
    assert [r["n_merges"] for r in rows] == [0, 2, 4]
    ferts = [r["avg_fertility"] for r in rows]
    assert all(ferts[i] >= ferts[i + 1] for i in range(len(ferts) - 1))


def test_fineweb_cli(spark, capsys):
    assert main(["corpus", "fineweb", "--input", DOCS, "--limit", "10"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 10
    for r in rows:
        assert {"doc_id", "keep", "composite_keep", "punct_line_frac",
                "n_lines"} <= set(r)
        # composite is at least as strict as the fineweb conjunction
        assert not (r["composite_keep"] and not r["keep"])


def test_reservoir_cli(spark, capsys):
    assert main(["corpus", "reservoir", "--input", DOCS, "--k", "12"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 12
    assert main(["corpus", "reservoir", "--input", DOCS, "--k", "3",
                 "--per-stratum"]) == 0
    rows = _lines(capsys)
    # 20 sources x 3 per stratum in the driver testdata
    assert len(rows) % 3 == 0 and len(rows) >= 3


def test_unimax_and_group_split_cli(spark, capsys, tmp_path):
    assert main(["corpus", "unimax", "--input", DOCS, "--budget", "100000",
                 "--weight-col", "n_chars"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 20
    assert all(0.0 < r["rate"] <= 1.0 for r in rows)
    assert main(["corpus", "group_split", "--input", DOCS,
                 "--group-col", "source", "--fractions", "0.6,0.2,0.2",
                 "--names", "tr,va,te"]) == 0
    rows = _lines(capsys)
    assert sum(r["n_groups"] for r in rows) == 20


def test_krippendorff_and_db_cli(spark, capsys, tmp_path):
    docs = spark.read.parquet(DOCS)
    from pyspark.sql import functions as F

    ratings = docs.select(
        F.col("doc_id").alias("unit"),
        (F.col("n_chars") >= 400).cast("string").alias("category"),
    ).unionByName(
        docs.where(F.col("doc_id") % 2 == 0).select(
            F.col("doc_id").alias("unit"),
            (F.col("lang") == "en").cast("string").alias("category"),
        )
    )
    p = str(tmp_path / "ratings.parquet")
    ratings.write.parquet(p)
    assert main(["analyze", "krippendorff", "--input", p]) == 0
    rows = _lines(capsys)
    assert rows[0]["n_units"] > 0 and -1.0 <= rows[0]["alpha"] <= 1.0

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        (F.col("vec_id") % 4).cast("int").alias("cl"), "embedding"
    )
    p2 = str(tmp_path / "emb.parquet")
    emb.write.parquet(p2)
    assert main(["analyze", "davies-bouldin", "--input", p2,
                 "--group-col", "cl"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 4
    assert all(r["r_max"] is None or r["r_max"] > 0 for r in rows)
