"""Round-8 candidate CLI wiring: graph pagerank/hits/communities/
triangles, events burstiness, analyze mi/kcenter, corpus cosine_pairs/
neg_sampling/ppmi/compression/quantile_align."""

import json
import os

import pytest

from nbdatatools_spark.__main__ import main

SF = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF, "documents.parquet")
EVENTS = os.path.join(SF, "events.parquet")
EMB = os.path.join(SF, "embeddings.parquet")


def _lines(capsys):
    return [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]


@pytest.fixture(scope="module")
def edges_pq(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("graph") / "edges.parquet")
    spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        "src string, dst string",
    ).write.mode("overwrite").parquet(p)
    return p


def test_graph_hits_cli(spark, capsys, edges_pq):
    assert main(["graph", "hits", "--edges", edges_pq, "--iterations", "3"]) == 0
    rows = _lines(capsys)
    assert {r["node"] for r in rows} == {"a", "b", "c", "d"}
    auth = [r["authority"] for r in rows]
    assert auth == sorted(auth, reverse=True)
    assert all(0.0 <= r["authority"] <= 1.0 and 0.0 <= r["hub"] <= 1.0 for r in rows)


def test_graph_pagerank_and_communities_cli(spark, capsys, edges_pq):
    assert main(["graph", "pagerank", "--edges", edges_pq,
                 "--iterations", "4"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 4 and all(r["rank"] > 0 for r in rows)
    assert main(["graph", "communities", "--edges", edges_pq,
                 "--iterations", "3"]) == 0
    rows = _lines(capsys)
    assert sum(r["size"] for r in rows) == 4


def test_graph_triangles_cli(spark, capsys, edges_pq):
    assert main(["graph", "triangles", "--edges", edges_pq]) == 0
    (row,) = _lines(capsys)
    assert row["n_triangles"] == 1 and row["n_nodes"] == 4


def test_events_burstiness_cli(spark, capsys):
    assert main(["events", "burstiness", "--input", EVENTS,
                 "--min-events", "3"]) == 0
    rows = _lines(capsys)
    assert rows
    b = [r["burstiness"] for r in rows if r["burstiness"] is not None]
    assert b == sorted(b, reverse=True)
    assert all(-1.0 <= x <= 1.0 for x in b)


def test_analyze_mi_cli(spark, capsys):
    assert main(["analyze", "mi", "--input", DOCS,
                 "--col-a", "lang", "--col-b", "source"]) == 0
    (row,) = _lines(capsys)
    assert row["mi"] >= 0.0 and row["n"] > 0


def test_analyze_kcenter_cli(spark, capsys):
    assert main(["analyze", "kcenter", "--input", EMB, "-k", "4"]) == 0
    rows = _lines(capsys)
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
    assert rows[0]["sq_dist"] is None
    d = [r["sq_dist"] for r in rows[1:]]
    assert d == sorted(d, reverse=True)


def test_corpus_cosine_pairs_cli(spark, capsys):
    assert main(["corpus", "cosine_pairs", "--input", DOCS,
                 "--threshold", "0.95", "--limit", "5"]) == 0
    rows = _lines(capsys)
    assert rows and all(r["cosine"] >= 0.95 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_corpus_neg_sampling_cli(spark, capsys):
    assert main(["corpus", "neg_sampling", "--input", DOCS,
                 "--vocab-size", "5"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5
    assert rows[-1]["cum_weight"] == pytest.approx(1.0, abs=1e-6)


def test_corpus_ppmi_cli(spark, capsys, tmp_path):
    out = str(tmp_path / "vecs.parquet")
    assert main(["corpus", "ppmi", "--input", DOCS, "--output", out,
                 "--vocab-size", "16", "--dim", "4"]) == 0
    vecs = spark.read.parquet(out)
    assert vecs.count() == 16
    assert len(vecs.first()["vector"]) == 4


def test_corpus_compression_cli(spark, capsys):
    assert main(["corpus", "compression", "--input", DOCS,
                 "--limit", "3"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 3
    cr = [r["compression_ratio"] for r in rows]
    assert cr == sorted(cr)


def test_corpus_quantile_align_cli(spark, capsys, tmp_path):
    out = str(tmp_path / "aligned.parquet")
    assert main(["corpus", "quantile_align", "--input", DOCS,
                 "--score-col", "n_chars", "--group-col", "source",
                 "--output", out]) == 0
    aligned = spark.read.parquet(out)
    assert aligned.count() == spark.read.parquet(DOCS).count()
    vals = [r["score_pct"] for r in aligned.select("score_pct").collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_corpus_log_odds_cli(spark, capsys):
    assert main(["corpus", "log_odds", "--input", DOCS, "--group-col", "lang",
                 "--group-a", "en", "--group-b", "de", "--top-k", "3"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 6
    assert {r["side"] for r in rows} == {"a", "b"}


def test_corpus_ndcg_cli(spark, capsys):
    assert main(["corpus", "ndcg", "--input", DOCS, "--score-col", "n_chars",
                 "--gain-col", "n_chars", "-k", "5", "--linear"]) == 0
    (row,) = _lines(capsys)
    assert row["ndcg"] == 1.0  # score == gain: perfect ranking


def test_corpus_rbo_cli(spark, capsys):
    assert main(["corpus", "rbo", "--input", DOCS, "--score-a", "n_chars",
                 "--score-b", "n_chars", "-k", "10"]) == 0
    (row,) = _lines(capsys)
    assert row["rbo_ext"] == pytest.approx(1.0, abs=1e-6)


def test_corpus_parity_cli(spark, capsys):
    assert main(["corpus", "parity", "--input", DOCS,
                 "--keep-expr", "n_chars >= 300", "--group-col", "source"]) == 0
    rows = _lines(capsys)
    assert rows and all(0.0 <= r["keep_rate"] <= 1.0 for r in rows)


def test_corpus_wasserstein_cli(spark, capsys):
    assert main(["corpus", "wasserstein", "--input", DOCS,
                 "--value-col", "n_chars", "--group-col", "lang",
                 "--group-a", "en", "--group-b", "de"]) == 0
    (row,) = _lines(capsys)
    assert row["wasserstein"] >= 0.0 and row["n_a"] > 0


def test_corpus_reweight_cli(spark, capsys):
    assert main(["corpus", "reweight", "--input", DOCS,
                 "--domain-col", "source", "--loss-col", "n_chars",
                 "--eta", "0.01"]) == 0
    rows = _lines(capsys)
    assert rows and sum(r["weight"] for r in rows) == pytest.approx(1.0, abs=1e-4)


def test_events_did_cli(spark, capsys):
    assert main(["events", "did", "--input", EVENTS,
                 "--treat-expr", "user_id % 2 = 0",
                 "--cutoff", "2024-01-16"]) == 0
    (row,) = _lines(capsys)
    assert row["did"] is not None and row["n_t_pre"] > 0


def test_corpus_conformal_cli(spark, capsys):
    assert main(["corpus", "conformal", "--input", DOCS,
                 "--score-col", "n_chars", "--alpha", "0.2",
                 "--group-col", "lang"]) == 0
    rows = _lines(capsys)
    assert rows and all(r["q_index"] <= r["n"] for r in rows)


def test_analyze_procrustes_cli(spark, capsys, tmp_path):
    rout = str(tmp_path / "rot.parquet")
    assert main(["analyze", "procrustes", "--input-a", EMB, "--input-b", EMB,
                 "--rotation-out", rout]) == 0
    (row,) = _lines(capsys)
    assert row["residual_sq"] <= 1e-6
    rot = spark.read.parquet(rout)
    assert rot.count() == row["d"]


def test_analyze_knn_overlap_cli(spark, capsys):
    assert main(["analyze", "knn-overlap", "--input-a", EMB, "--input-b", EMB,
                 "-k", "5"]) == 0
    (row,) = _lines(capsys)
    assert row["mean_overlap"] == 1.0


def test_corpus_shards_cli(spark, capsys, tmp_path):
    assert main(["corpus", "shards", "--input", DOCS, "--n-shards", "4"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 4
    assert all(0.9 < r["weight_ratio"] < 1.1 for r in rows)
    out = str(tmp_path / "sharded")
    assert main(["corpus", "shards", "--input", DOCS, "--n-shards", "4",
                 "--output", out]) == 0
    assert spark.read.parquet(out).count() == spark.read.parquet(DOCS).count()


def test_events_quantiles_cli(spark, capsys):
    assert main(["events", "quantiles", "--input", EVENTS,
                 "--probs", "0.5,0.9", "--hi", "512"]) == 0
    rows = _lines(capsys)
    assert [r["p"] for r in rows] == [0.5, 0.9]
    assert rows[0]["estimate"] <= rows[1]["estimate"]
