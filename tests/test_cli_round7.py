"""Round-7 CLI wiring: corpus train_unigram, media hash/near_dups/stats."""

import json
import os

import numpy as np

from nbdatatools_spark.__main__ import main

SF = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF, "documents.parquet")


def _lines(capsys):
    return [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]


def test_corpus_train_unigram_cli(spark, capsys):
    assert main(
        ["corpus", "train_unigram", "--input", DOCS, "--vocab-size", "128",
         "--seed-size", "300", "--iters", "2", "--top", "10"]
    ) == 0
    rows = _lines(capsys)
    meta, pieces = rows[0], rows[1:]
    assert meta["n_pieces"] <= 128 + 64
    assert len(meta["ll_history"]) == 2
    assert meta["ll_history"][1] >= meta["ll_history"][0] - 1e-6
    assert len(pieces) == 10
    assert all(p["prob"] > 0 for p in pieces)
    # sorted by prob desc
    probs = [p["prob"] for p in pieces]
    assert probs == sorted(probs, reverse=True)


def _media_parquet(spark, tmp_path):
    from nbdatatools_spark.functions.media_codecs import encode_bmp
    from nbdatatools_spark.operators.multimodal import MEDIA_SCHEMA

    rng = np.random.Generator(np.random.Philox(key=3))
    img1 = rng.integers(0, 256, size=(32, 36), dtype=np.int64).astype(np.uint8)
    img2 = rng.integers(0, 256, size=(32, 36), dtype=np.int64).astype(np.uint8)
    rows = [
        (1, "image/bmp", encode_bmp(img1), None),
        (2, "image/bmp", encode_bmp(img1), None),  # exact dup of 1
        (3, "image/bmp", encode_bmp(img2), None),
    ]
    path = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, MEDIA_SCHEMA).write.mode("overwrite").parquet(path)
    return path


def test_media_cli(spark, capsys, tmp_path):
    path = _media_parquet(spark, tmp_path)
    assert main(["media", "hash", "--input", path]) == 0
    rows = _lines(capsys)
    h = {r["media_id"]: r["dhash"] for r in rows}
    assert h[1] == h[2] and h[1] != h[3]

    assert main(["media", "near_dups", "--input", path]) == 0
    rows = _lines(capsys)
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in rows] == [(1, 2, 0)]

    assert main(["media", "stats", "--input", path]) == 0
    rows = _lines(capsys)
    assert rows[0]["kind"] == "image/bmp" and rows[0]["n"] == 3


def test_corpus_sentence_dedup_cli(spark, capsys):
    assert main(["corpus", "sentence_dedup", "--input", DOCS, "--limit", "20"]) == 0
    rows = _lines(capsys)
    assert rows and {"doc_id", "n_sentences", "n_removed", "text_dedup"} <= set(rows[0])
    assert all(r["n_removed"] <= r["n_sentences"] for r in rows)


def test_corpus_temperature_mix_cli(spark, capsys):
    assert main(
        ["corpus", "temperature_mix", "--input", DOCS, "--temperature", "2.0"]
    ) == 0
    rows = _lines(capsys)
    assert rows and all(0.0 < r["rate"] <= 1.0 + 1e-9 for r in rows)
    assert any(abs(r["rate"] - 1.0) < 1e-6 for r in rows)  # argmin stratum keeps all


def test_corpus_containment_cli(spark, capsys):
    assert main(
        ["corpus", "containment", "--input", DOCS, "--threshold", "0.2",
         "--max-pairs", "50", "--limit", "10"]
    ) == 0
    rows = _lines(capsys)
    for r in rows:
        assert r["containment"] >= 0.2 and r["id_a"] < r["id_b"]


EMB = os.path.join(SF, "embeddings.parquet")


def test_analyze_cluster_purity_cli(spark, capsys):
    assert main(["analyze", "cluster_purity", "--input", EMB, "-k", "4"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    r = rows[0]
    assert 0.0 < r["purity"] <= 1.0
    assert r["nmi"] is None or -1e-9 <= r["nmi"] <= 1.0 + 1e-9


def test_analyze_knn_accuracy_cli(spark, capsys):
    assert main(["analyze", "knn_accuracy", "--input", EMB, "-k", "1"]) == 0
    rows = _lines(capsys)
    total = [r for r in rows if r["gid"] == 1]
    assert total and 0.0 <= total[0]["accuracy"] <= 1.0
    assert sum(r["n"] for r in rows if r["gid"] == 0) == total[0]["n"]
