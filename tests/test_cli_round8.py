"""Round-8 batch-1 CLI wiring: events mwu/kruskal/levene/spearman/trend,
graph assortativity/kcore, corpus diversity/fleiss/fdr, analyze
two-sample."""

import json

from pyspark.sql import functions as F
import os

import pytest

from nbdatatools_spark.__main__ import main

SF = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF, "documents.parquet")
EVENTS = os.path.join(SF, "events.parquet")
EMB = os.path.join(SF, "embeddings.parquet")


def _lines(capsys):
    return [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]


def test_events_mwu_cli(spark, capsys):
    assert main(["events", "mwu", "--input", EVENTS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5
    assert all(
        set(r) == {"event_type", "class_a", "class_b", "n_a", "n_b",
                   "u_a", "cliffs_delta", "z", "p_value"}
        for r in rows
    )
    assert all(0.0 <= r["p_value"] <= 1.0 for r in rows)


def test_events_kruskal_and_levene_cli(spark, capsys):
    expr = "'v' || CAST(user_id % 3 AS STRING)"
    assert main(["events", "kruskal", "--input", EVENTS,
                 "--class-expr", expr]) == 0
    rows = _lines(capsys)
    assert all(r["k_classes"] == 3 and r["dof"] == 2 for r in rows)
    assert main(["events", "levene", "--input", EVENTS,
                 "--class-expr", expr]) == 0
    rows = _lines(capsys)
    assert all(r["df1"] == 2 and r["f_stat"] >= 0.0 for r in rows)


def test_events_spearman_and_trend_cli(spark, capsys):
    assert main(["events", "spearman", "--input", EVENTS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5 and all(-1.0 <= r["rho"] <= 1.0 for r in rows)
    assert main(["events", "trend", "--input", EVENTS]) == 0
    rows = _lines(capsys)
    assert all(
        r["trend"] in ("increasing", "decreasing", "no_trend") for r in rows
    )


@pytest.fixture(scope="module")
def edges_pq(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("graph8") / "edges.parquet")
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    spark.createDataFrame(
        [(str(a), str(b)) for a, b in clique] + [("3", "9"), ("9", "8")],
        "src string, dst string",
    ).write.mode("overwrite").parquet(p)
    return p


def test_graph_assortativity_cli(spark, capsys, edges_pq):
    assert main(["graph", "assortativity", "--edges", edges_pq]) == 0
    (row,) = _lines(capsys)
    assert row["n_nodes"] == 6 and row["n_edges"] == 8
    assert -1.0 <= row["assortativity"] <= 1.0


def test_graph_kcore_cli(spark, capsys, edges_pq):
    assert main(["graph", "kcore", "--edges", edges_pq, "-k", "3"]) == 0
    rows = _lines(capsys)
    assert {r["node"] for r in rows} == {"0", "1", "2", "3"}
    assert all(r["degree"] == 3 for r in rows)


def test_corpus_diversity_cli(spark, capsys):
    assert main(["corpus", "diversity", "--input", DOCS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 20
    assert all(r["n_types"] <= r["n_tokens"] for r in rows)
    assert all(0.0 <= r["hapax_ratio"] <= 1.0 for r in rows)


def test_corpus_fleiss_cli(spark, capsys, tmp_path):
    p = str(tmp_path / "verdicts.parquet")
    rows = [(i, f"r{j}", str((i + j) % 2 == 0)) for i in range(20) for j in range(3)]
    spark.createDataFrame(
        rows, "doc_id long, rater string, verdict string"
    ).write.mode("overwrite").parquet(p)
    assert main(["corpus", "fleiss", "--input", p]) == 0
    (row,) = _lines(capsys)
    assert row["n_items"] == 20 and row["n_raters"] == 3
    assert -1.0 <= row["kappa"] <= 1.0


def test_corpus_fdr_cli(spark, capsys):
    assert main(["corpus", "fdr", "--input", DOCS,
                 "--flag-expr", "n_chars >= 400"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 20
    adj = sorted((r["p_rank"], r["p_adj"]) for r in rows)
    assert [a for _, a in adj] == sorted(a for _, a in adj)  # step-up monotone
    assert all(r["p_adj"] >= r["p_value"] - 1e-9 for r in rows)


def test_analyze_two_sample_cli(spark, capsys):
    assert main(["analyze", "two-sample", "--input", EMB,
                 "--split-expr", "label < 5", "--sample-size", "32"]) == 0
    (row,) = _lines(capsys)
    assert row["n_a"] == 32 and row["n_b"] == 32
    assert row["gamma"] == 0.015625
    # same underlying distribution: both stats must sit near zero
    assert abs(row["mmd2"]) < 0.05 and abs(row["energy"]) < 0.5


def test_corpus_lsa_cli(spark, capsys):
    assert main(["corpus", "lsa", "--input", DOCS, "--vocab-size", "32",
                 "--topics", "2", "--top-terms", "3"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 6
    assert {r["topic"] for r in rows} == {0, 1}
    svs = sorted({r["topic"]: r["sv"] for r in rows}.items())
    assert svs[0][1] >= svs[1][1]  # singular values descend


def test_events_page_hinkley_cli(spark, capsys):
    assert main(["events", "page_hinkley", "--input", EVENTS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 30
    assert all(r["ph"] >= 0.0 for r in rows)


def test_events_trimmed_cli(spark, capsys):
    assert main(["events", "trimmed", "--input", EVENTS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5
    for r in rows:
        assert r["lo_cut"] <= r["hi_cut"]
        assert r["lo_cut"] - 1e9 <= r["trimmed_mean"] <= r["hi_cut"] + 1e-9


def test_corpus_ess_cli(spark, capsys):
    assert main(["corpus", "ess", "--input", DOCS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 20
    assert all(0.0 < r["ess"] <= r["n"] + 1e-9 for r in rows)


def test_corpus_brier_cli(spark, capsys):
    assert main(["corpus", "brier", "--input", DOCS,
                 "--score-col", "n_chars",
                 "--label-expr", "n_chars >= 400"]) == 0
    (row,) = _lines(capsys)
    assert row["n"] == 500
    assert abs(
        row["brier"]
        - (row["reliability"] - row["resolution"] + row["uncertainty"]
           + row["within_bin_var"])
    ) < 5e-6


def test_events_welch_cli(spark, capsys):
    expr = "'v' || CAST(user_id % 3 AS STRING)"
    assert main(["events", "welch", "--input", EVENTS,
                 "--class-expr", expr]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5
    assert all(r["k_classes"] == 3 and r["df1"] == 2 for r in rows)


def test_corpus_cramers_cli(spark, capsys):
    assert main(["corpus", "cramers", "--input", DOCS]) == 0
    (row,) = _lines(capsys)
    assert row["n"] == 500
    assert 0.0 <= row["v"] <= 1.0
    assert row["v_corrected"] <= row["v"] + 1e-9


def test_analyze_dbscan_cli(spark, capsys):
    assert main(["analyze", "dbscan", "--input", EMB, "--eps", "0.7",
                 "--min-pts", "4", "--method", "exact"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 500
    assert {r["role"] for r in rows} <= {"core", "border", "noise"}


def test_events_shift_cli(spark, capsys):
    assert main(["events", "shift", "--input", EVENTS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 45  # 5 types x 9 deciles
    assert all(abs(r["shift"] - (r["q_b"] - r["q_a"])) < 2e-6 for r in rows)


def test_corpus_cochran_and_friedman_cli(spark, capsys, tmp_path):
    p = str(tmp_path / "verdicts8.parquet")
    rows = [(i, f"r{j}", (i * (j + 1)) % 3 == 0) for i in range(30) for j in range(3)]
    spark.createDataFrame(
        rows, "doc_id long, rater string, verdict boolean"
    ).write.mode("overwrite").parquet(p)
    assert main(["corpus", "cochran", "--input", p]) == 0
    (row,) = _lines(capsys)
    assert row["n_items"] == 30 and row["dof"] == 2

    ps = str(tmp_path / "scores8.parquet")
    srows = [(i, f"s{j}", float((i * 7 + j * 13) % 19)) for i in range(30) for j in range(3)]
    spark.createDataFrame(
        srows, "doc_id long, scorer string, score double"
    ).write.mode("overwrite").parquet(ps)
    assert main(["corpus", "friedman", "--input", ps]) == 0
    (row,) = _lines(capsys)
    assert row["n_blocks"] == 30 and row["k_treatments"] == 3


def test_corpus_mixing_cli(spark, capsys):
    assert main(["corpus", "mixing", "--input", DOCS, "--n-shards", "4"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 4
    assert all(r["entropy"] >= 0.0 for r in rows)


def test_events_ks_cli(spark, capsys):
    assert main(["events", "ks", "--input", EVENTS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5
    assert all(0.0 <= r["d_stat"] <= 1.0 and 0.0 <= r["p_value"] <= 1.0
               for r in rows)


def test_analyze_decontaminate_cli(spark, capsys, tmp_path):
    train = EMB
    test = str(tmp_path / "planted.parquet")
    sub = spark.read.parquet(EMB).where("vec_id % 25 = 0").withColumn(
        "vec_id", F.col("vec_id") + F.lit(700000)
    )
    sub.write.mode("overwrite").parquet(test)
    assert main(["analyze", "decontaminate", "--train", train,
                 "--test", test, "--threshold", "0.999"]) == 0
    rows = _lines(capsys)
    planted = {(r["train_id"], r["test_id"]) for r in rows
               if r["cosine_sim"] >= 0.999999}
    assert all(t == s + 700000 for s, t in planted)
    assert len(planted) >= sub.count()
