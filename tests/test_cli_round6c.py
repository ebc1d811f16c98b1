"""Round-6 batch-3 CLI wiring: corpus qc/length_drift/cms_topk/
bloom_decontam, analyze silhouette."""

import json
import os

from nbdatatools_spark.__main__ import main

SF = os.environ.get("NBDT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF, "documents.parquet")
EMB = os.path.join(SF, "embeddings.parquet")
EVENTS = os.path.join(SF, "events.parquet")


def _lines(capsys):
    return [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]


def test_corpus_qc_cli(spark, capsys):
    assert main(["corpus", "qc", "--input", DOCS]) == 0
    rows = _lines(capsys)
    assert rows and {"grp", "n_docs", "mean_fertility", "clean_frac"} <= set(rows[0])
    assert all(0.0 <= r["clean_frac"] <= 1.0 for r in rows)


def test_corpus_length_drift_cli(spark, capsys):
    assert main(["corpus", "length_drift", "--input", DOCS, "--reference", "src0"]) == 0
    rows = _lines(capsys)
    by = {r["grp"]: r for r in rows}
    assert by["src0"]["psi"] == 0.0
    assert all(r["psi"] >= 0.0 for r in rows)


def test_corpus_cms_topk_cli(spark, capsys):
    assert main(["corpus", "cms_topk", "--input", DOCS, "--top", "5"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 5
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)


def test_corpus_bloom_decontam_cli(spark, capsys, tmp_path):
    # split the corpus so the test set shares text with train (true hits)
    from nbdatatools_spark.session import get_spark

    spark_ = get_spark()
    docs = spark_.read.parquet(DOCS)
    docs.where("doc_id % 50 = 0").write.mode("overwrite").parquet(
        str(tmp_path / "test.parquet")
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "train.parquet"))
    assert (
        main(
            [
                "corpus", "bloom_decontam",
                "--train", str(tmp_path / "train.parquet"),
                "--test", str(tmp_path / "test.parquet"),
                "--m-bits", "8192", "-k", "2",
            ]
        )
        == 0
    )
    rows = _lines(capsys)
    summary = rows[0]
    assert summary["n_contaminated"] >= 10  # the copies themselves hit
    assert summary["n_flagged"] >= summary["n_contaminated"]
    assert all(r["contaminated"] for r in rows[1:])


def test_analyze_silhouette_cli(spark, capsys):
    assert main(["analyze", "silhouette", "--input", EMB]) == 0
    rows = _lines(capsys)
    assert len(rows) == 10
    assert all(-1.0 <= r["mean_silhouette"] <= 1.0 for r in rows)


def test_corpus_source_similarity_cli(spark, capsys):
    assert main(["corpus", "source_similarity", "--input", DOCS]) == 0
    rows = _lines(capsys)
    assert len(rows) == 190
    assert all(-1e-6 <= r["cosine"] <= 1.0 + 1e-6 for r in rows)


def test_corpus_boilerplate_cli(spark, capsys):
    assert main(["corpus", "boilerplate", "--input", DOCS, "--min-docs", "2"]) == 0
    rows = _lines(capsys)
    assert rows and all(r["n_docs"] >= 2 for r in rows)


def test_generate_denoising_pairs_cli(spark, capsys, tmp_path):
    out = str(tmp_path / "pairs.parquet")
    assert main(["generate", "denoising-pairs", "--input", DOCS, "--output", out]) == 0
    rows = _lines(capsys)
    assert rows[0]["rows"] == 500
    from nbdatatools_spark.session import get_spark

    df = get_spark().read.parquet(out)
    assert {"id", "corrupted", "target", "n_masked"} <= set(df.columns)


def test_analyze_hubness_cli(spark, capsys):
    assert main(["analyze", "hubness", "--input", EMB, "-k", "5", "--top", "3"]) == 0
    rows = _lines(capsys)
    assert rows[0]["n_vectors"] == 500
    assert rows[0]["mean"] == 5.0  # sum N_k == n*k exactly
    assert len(rows) == 4


def test_analyze_robust_scale_cli(spark, capsys, tmp_path):
    out = str(tmp_path / "scaled.parquet")
    assert main(["analyze", "robust-scale", "--input", EMB, "--output", out]) == 0
    rows = _lines(capsys)
    assert rows[0]["rows"] == 32000


def test_corpus_filter_eval_cli(spark, capsys):
    assert (
        main(
            [
                "corpus", "filter_eval", "--input", DOCS,
                "--score-expr", "least(n_chars / 1000.0, 1.0)",
                "--label-expr", "n_chars >= 400",
            ]
        )
        == 0
    )
    rows = _lines(capsys)
    head = rows[0]
    assert head["auc"] == 1.0  # label is a threshold of the score itself
    assert {"n_pos", "n_neg", "agreement", "kappa"} <= set(head)
    assert all("positive_rate" in r for r in rows[1:])


def test_compute_mutual_knn_cli(spark, capsys):
    assert main(["compute", "mutual-knn", "--input", EMB, "-k", "5", "--limit", "20"]) == 0
    rows = _lines(capsys)
    assert rows and all(r["id_a"] < r["id_b"] for r in rows)


def test_corpus_cross_dedup_cli(spark, capsys, tmp_path):
    from nbdatatools_spark.session import get_spark

    spark_ = get_spark()
    docs = spark_.read.parquet(DOCS)
    docs.where("doc_id % 2 = 0").write.mode("overwrite").parquet(str(tmp_path / "a.parquet"))
    from pyspark.sql import functions as F

    b = docs.where("doc_id % 2 = 1").unionByName(
        docs.where("doc_id % 20 = 0").withColumn("doc_id", F.col("doc_id") + F.lit(10**6))
    )
    b.write.mode("overwrite").parquet(str(tmp_path / "b.parquet"))
    assert (
        main(
            [
                "corpus", "cross_dedup",
                "--a", str(tmp_path / "a.parquet"),
                "--b", str(tmp_path / "b.parquet"),
            ]
        )
        == 0
    )
    rows = _lines(capsys)
    found = {(r["id_a"], r["id_b"]) for r in rows}
    assert all(ia % 2 == 0 and ia < 10**6 for ia, _ in found)
    assert (0, 10**6) in found  # the planted copy of doc 0


def test_events_theil_sen_cli(spark, capsys):
    assert main(["events", "theil_sen", "--input", EVENTS]) == 0
    rows = _lines(capsys)
    assert rows and all({"slope", "intercept", "n_points"} <= set(r) for r in rows)


def test_events_bootstrap_ci_cli(spark, capsys):
    assert main(["events", "bootstrap_ci", "--input", EVENTS, "--n-boot", "50"]) == 0
    rows = _lines(capsys)
    assert rows and all(r["ci_lo"] <= r["mean"] <= r["ci_hi"] for r in rows)


def test_analyze_cka_cli(spark, capsys):
    assert main(["analyze", "cka", "--input", EMB, "-m", "16"]) == 0
    rows = _lines(capsys)
    assert rows[0]["m"] == 16 and 0.0 < rows[0]["cka"] <= 1.0


def test_events_dp_counts_cli(spark, capsys):
    # default = release shape: noisy_count only, fresh secret seed
    assert main(["events", "dp_counts", "--input", EVENTS, "--epsilon", "2.0"]) == 0
    rows = _lines(capsys)
    assert rows and all(set(r) == {"event_type", "noisy_count"} for r in rows)
    # --seed + --audit = reproducible mechanism audit
    assert (
        main(
            [
                "events", "dp_counts", "--input", EVENTS,
                "--epsilon", "2.0", "--seed", "42", "--audit",
            ]
        )
        == 0
    )
    rows = _lines(capsys)
    assert rows and all(
        abs(abs(r["noisy_count"] - r["true_count"]) - r["abs_error"]) < 1e-6
        for r in rows
    )


def test_fetch_dlhf_cli_gated(spark, capsys):
    """Without huggingface_hub the command exits 1 with the install hint
    (loud failure, never fake success)."""
    try:
        import huggingface_hub  # noqa: F401

        return  # hub present in this env: the gate path is not testable
    except ImportError:
        pass
    assert main(["fetch", "dlhf", "some/repo", "--local-dir", "/tmp/x"]) == 1
    rows = _lines(capsys)
    assert "huggingface_hub" in rows[0]["error"]


def test_events_k_anonymity_cli(spark, capsys):
    assert main(["events", "k_anonymity", "--input", EVENTS, "-k", "3",
                 "--quasi", "event_type,user_id", "--limit", "5"]) == 0
    rows = _lines(capsys)
    assert {"n_risky_groups", "n_rows_at_risk"} <= set(rows[0])
    assert all(r["n"] < 3 for r in rows[1:])
