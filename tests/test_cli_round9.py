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
