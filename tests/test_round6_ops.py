"""Round-6 operator tests: Lloyd k-means, SQ8 error audit, seasonal
decomposition, CUSUM, MAD outliers, interval concurrency, triangle census,
dataset card, RAKE, Kneser-Ney, MinHash calibration, IPF raking.

Strategy mirrors SURVEY §5: numpy/pure-Python differentials for the
numeric kernels, invariant checks for the statistical ones (the DuckDB
hash parity itself is covered by scripts/check_oracle.py and the driver
gate)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# --- Lloyd k-means ----------------------------------------------------------


def test_lloyd_matches_numpy_differential(spark, embeddings):
    from nbdatatools_spark.operators.clustering import lloyd_fixed_iterations

    out = lloyd_fixed_iterations(embeddings, k=4, iterations=2).collect()
    rows = embeddings.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)

    cents = np.round(vecs[np.argsort(ids)[:4]], 6)

    def assign(v, c):
        d = np.round(np.sqrt(((v[:, None, :] - c[None, :, :]) ** 2).sum(-1)), 6)
        return d.argmin(1), d.min(1)

    for _ in range(2):
        a, _ = assign(vecs, cents)
        new = cents.copy()
        for i in range(4):
            m = vecs[a == i]
            if len(m):
                new[i] = np.round(
                    np.round(np.round(m, 9).sum(0), 9) / len(m), 6
                )
        cents = new
    a, d = assign(vecs, cents)
    for r in out:
        i = r["centroid_id"]
        assert r["n_assigned"] == int((a == i).sum())
        expect = round(float(np.round(d[a == i] ** 2, 9).sum()), 6)
        assert abs(r["inertia"] - expect) < 1e-5, (i, r["inertia"], expect)


def test_lloyd_total_assignment_partition(spark, embeddings):
    from nbdatatools_spark.operators.clustering import lloyd_fixed_iterations

    out = lloyd_fixed_iterations(embeddings, k=8, iterations=1)
    total = out.agg(F.sum("n_assigned")).first()[0]
    assert total == embeddings.count()


# --- SQ8 error audit --------------------------------------------------------


def test_sq8_error_within_quantizer_bound(spark, embeddings):
    from nbdatatools_spark.operators.similarity import sq8_error_report

    rep = sq8_error_report(embeddings).collect()
    assert len(rep) == len(embeddings.first()["embedding"])
    for r in rep:
        assert r["within_bound"], r
        assert r["mse"] <= r["max_abs_err"] ** 2 + 1e-12
        assert r["lo"] <= r["hi"]


# --- Seasonal decomposition -------------------------------------------------


def test_seasonal_decompose_identity_and_nulls(spark, sf_dir):
    from nbdatatools_spark.operators.temporal import seasonal_decompose

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = seasonal_decompose(ev).collect()
    days = [r["day"] for r in out]
    assert days == sorted(days)
    # first/last 3 days lack a full centered window -> no trend
    for r in out[:3] + out[-3:]:
        assert r["trend"] is None
    for r in out:
        if r["trend"] is not None and r["seasonal"] is not None:
            # additive identity holds to rounding
            assert abs(
                r["value"] - r["trend"] - r["seasonal"] - r["residual"]
            ) < 2e-6


def test_seasonal_flat_series_zero_seasonal(spark):
    import datetime

    rows = [
        (datetime.datetime(2025, 1, 1) + datetime.timedelta(days=d, hours=h),)
        for d in range(21)
        for h in range(4)
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    from nbdatatools_spark.operators.temporal import seasonal_decompose

    out = seasonal_decompose(df).collect()
    for r in out:
        if r["trend"] is not None:
            assert r["trend"] == 4.0
            assert abs(r["seasonal"]) < 1e-9
            assert abs(r["residual"]) < 1e-9


# --- CUSUM ------------------------------------------------------------------


def test_cusum_closed_form_equals_recursion(spark, sf_dir):
    from nbdatatools_spark.operators.temporal import cusum_changepoints

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = cusum_changepoints(ev).collect()
    # replay the textbook recursion S_t = max(0, S_{t-1} + z_t - k)
    s = 0.0
    for r in sorted(out, key=lambda r: r["day"]):
        s = max(0.0, s + round(r["z"] - 0.5, 9))
        assert abs(r["cusum_pos"] - round(s, 6)) < 5e-6, r
        assert r["is_alarm"] == (r["cusum_pos"] > 4.0)


def test_cusum_detects_planted_shift(spark):
    import datetime

    rows = []
    for d in range(30):
        n = 10 if d < 20 else 40  # mean shift at day 20
        for i in range(n):
            rows.append(
                (datetime.datetime(2025, 3, 1) + datetime.timedelta(days=d, minutes=i),)
            )
    df = spark.createDataFrame(rows, "ts timestamp")
    from nbdatatools_spark.operators.temporal import cusum_changepoints

    out = cusum_changepoints(df).collect()
    alarms = [r["day"].day for r in out if r["is_alarm"]]
    assert alarms and min(alarms) >= 21  # fires after the shift, not before


# --- MAD outliers -----------------------------------------------------------


def test_mad_outliers_differential(spark, sf_dir):
    from nbdatatools_spark.operators.temporal import mad_outliers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = {r["key"]: r for r in mad_outliers(ev).collect()}
    rows = ev.select("event_type", "value").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["event_type"], []).append(r["value"])
    for k, vs in by_key.items():
        med = float(np.percentile(vs, 50, method="linear"))
        mad = float(np.percentile([abs(v - med) for v in vs], 50, method="linear"))
        n_out = sum(1 for v in vs if abs(v - med) > 3.0 * 1.4826 * mad)
        assert out[k]["n"] == len(vs)
        assert abs(out[k]["med"] - round(med, 6)) < 1e-9
        assert abs(out[k]["mad"] - round(mad, 6)) < 1e-9
        assert out[k]["n_outliers"] == n_out


# --- Interval concurrency ---------------------------------------------------


def test_concurrency_known_intervals(spark):
    import datetime

    t0 = datetime.datetime(2025, 5, 1, 10, 0, 0)
    # three overlapping events in hour 10, one isolated in hour 12
    rows = [
        (t0,),
        (t0 + datetime.timedelta(minutes=5),),
        (t0 + datetime.timedelta(minutes=9),),
        (t0 + datetime.timedelta(hours=2),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    from nbdatatools_spark.operators.temporal import interval_concurrency

    out = {r["bucket_start"].hour: r["max_concurrent"] for r in
           interval_concurrency(df, duration_minutes=10).collect()}
    assert out[10] == 3 and out[12] == 1


def test_concurrency_touching_intervals_do_not_overlap(spark):
    import datetime

    t0 = datetime.datetime(2025, 5, 1, 10, 0, 0)
    rows = [(t0,), (t0 + datetime.timedelta(minutes=10),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    from nbdatatools_spark.operators.temporal import interval_concurrency

    out = interval_concurrency(df, duration_minutes=10).collect()
    assert max(r["max_concurrent"] for r in out) == 1


# --- Triangle census --------------------------------------------------------


def test_triangle_stats_known_graph(spark):
    # K4 minus one edge: nodes 1-4, edges 12 13 14 23 24 -> 2 triangles
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 1)],  # dup 13 reversed
        "src int, dst int",
    )
    from nbdatatools_spark.operators.graph import triangle_stats

    r = triangle_stats(edges).first()
    assert r["n_nodes"] == 4 and r["n_edges"] == 5
    assert r["n_triangles"] == 2
    # wedges: deg 3,3,2,2 -> 3+3+1+1 = 8; coeff = 6/8
    assert r["n_wedges"] == 8
    assert abs(r["clustering_coeff"] - 0.75) < 1e-9


def test_triangle_stats_triangle_free(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src int, dst int"
    )
    from nbdatatools_spark.operators.graph import triangle_stats

    r = triangle_stats(edges).first()
    assert r["n_triangles"] == 0 and r["clustering_coeff"] == 0.0


# --- Dataset card -----------------------------------------------------------


def test_dataset_card_invariants(spark, documents):
    from nbdatatools_spark.operators.analysis import dataset_card

    card = dataset_card(documents).collect()
    sources = {r["slice"] for r in card}
    assert sources == {
        r["source"] for r in documents.select("source").distinct().collect()
    }
    n_total = sum(r["n_docs"] for r in card)
    assert n_total == documents.count()
    for r in card:
        assert 0.0 <= r["dup_rate"] < 1.0
        assert r["n_langs"] >= 1
        # entropy bounded by ln(n_langs)
        assert -1e-9 <= r["lang_entropy"] <= math.log(r["n_langs"]) + 1e-6
        assert r["total_tokens"] >= r["n_docs"] * 0  # type sanity (BIGINT)


def test_dataset_card_entropy_differential(spark):
    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3], "s0", 7) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    from nbdatatools_spark.operators.analysis import dataset_card

    r = dataset_card(df).first()
    # uniform 3-way mix -> ln(3)
    assert abs(r["lang_entropy"] - round(math.log(3), 6)) < 1e-5
    assert r["n_langs"] == 3


# --- RAKE -------------------------------------------------------------------


def test_rake_scores_differential(spark):
    txt = "deep learning of deep networks. the deep learning models are models"
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    from nbdatatools_spark.operators.analysis import rake_keyphrases

    out = {r["phrase"]: r for r in rake_keyphrases(df, top_n=50).collect()}
    # phrases (stopword/punct split; 'of','the','are' are stopwords):
    # [deep learning] [deep networks] [deep learning models] [models]
    # word stats (occurrence-level): deep deg=2+2+3=7 freq=3; learning
    # deg=2+3=5 freq=2 -> 2.5; networks deg=2 freq=1 -> 2.0; models
    # deg=3+1=4 freq=2 -> 2.0
    assert set(out) == {
        "deep learning", "deep networks", "deep learning models", "models"
    }
    assert all(r["n_occurrences"] == 1 for r in out.values())
    d = round(7 / 3, 9)
    assert abs(out["deep learning"]["score"] - round(d + 2.5, 6)) < 1e-9
    assert abs(out["deep networks"]["score"] - round(d + 2.0, 6)) < 1e-9
    assert abs(out["deep learning models"]["score"] - round(d + 4.5, 6)) < 1e-9
    assert abs(out["models"]["score"] - 2.0) < 1e-9


def test_rake_punctuation_is_a_phrase_boundary(spark):
    """ADVICE r6: punctuation with NO adjacent stopword must still split
    phrases (the old per-char strip let 'alpha beta. gamma delta' form a
    single four-word phrase spanning the sentence boundary)."""
    from nbdatatools_spark.operators.analysis import rake_keyphrases

    df = spark.createDataFrame(
        [(1, "alpha beta. gamma delta")], "doc_id long, text string"
    )
    out = {r["phrase"] for r in rake_keyphrases(df, top_n=50).collect()}
    assert out == {"alpha beta", "gamma delta"}


def test_rake_respects_max_phrase_len(spark, documents):
    from nbdatatools_spark.operators.analysis import rake_keyphrases

    out = rake_keyphrases(documents, top_n=100, max_phrase_len=3).collect()
    assert out and all(len(r["phrase"].split(" ")) <= 3 for r in out)


# --- Kneser-Ney -------------------------------------------------------------


def test_kneser_ney_differential(spark):
    docs = [
        (1, "a b a b c"),
        (2, "a b c d"),
        (3, "b c a b"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from nbdatatools_spark.operators.lm import kneser_ney_bigrams

    out = {(r["w1"], r["w2"]): r for r in
           kneser_ney_bigrams(df, top_n=100).collect()}
    # pure-python replica
    from collections import Counter

    pairs = []
    for _, t in docs:
        ws = t.split()
        pairs += list(zip(ws, ws[1:]))
    cb = Counter(pairs)
    c1 = Counter(w1 for w1, _ in pairs)
    nf = Counter(w1 for (w1, _) in cb)
    npre = Counter(w2 for (_, w2) in cb)
    nt = len(cb)
    d = 0.75
    for (w1, w2), nb in cb.items():
        expect = round(
            max(nb - d, 0.0) / c1[w1] + ((d * nf[w1]) / c1[w1]) * (npre[w2] / float(nt)),
            9,
        )
        assert abs(out[(w1, w2)]["p_kn"] - expect) < 1e-12
        assert out[(w1, w2)]["n_bigram"] == nb


def test_kneser_ney_probabilities_proper(spark, documents):
    """For every observed w1, sum over OBSERVED w2 of P_KN <= 1 (the
    remaining mass goes to unseen continuations)."""
    from nbdatatools_spark.operators.lm import kneser_ney_bigrams

    out = kneser_ney_bigrams(documents, top_n=10**6).collect()
    by_w1 = {}
    for r in out:
        by_w1.setdefault(r["w1"], 0.0)
        by_w1[r["w1"]] += r["p_kn"]
    assert by_w1 and all(s <= 1.0 + 1e-6 for s in by_w1.values())


# --- MinHash calibration ----------------------------------------------------


def test_minhash_calibration_error_small_on_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [(1, base), (2, base + "tail"), (3, "completely different text " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from nbdatatools_spark.operators.dedup import minhash_calibration

    out = minhash_calibration(df, num_hashes=32, bands=8, impl="md5").collect()
    pair = {(r["id_a"], r["id_b"]): r for r in out}
    assert (1, 2) in pair  # near-dups must collide in some band
    r = pair[(1, 2)]
    assert r["exact_jaccard"] > 0.8
    assert r["abs_err"] == round(abs(r["est_jaccard"] - r["exact_jaccard"]), 6)
    assert r["abs_err"] < 0.35  # 32 hashes -> se ~ 1/sqrt(32) ~ 0.18


def test_minhash_calibration_estimator_range(spark, documents):
    from nbdatatools_spark.operators.dedup import minhash_calibration

    out = minhash_calibration(documents, num_hashes=32, bands=8, impl="md5")
    bad = out.where(
        (F.col("est_jaccard") < 0) | (F.col("est_jaccard") > 1)
        | (F.col("exact_jaccard") < 0) | (F.col("exact_jaccard") > 1)
    )
    assert bad.count() == 0


# --- IPF --------------------------------------------------------------------


def test_ipf_converges_toward_uniform_marginals(spark, documents):
    from nbdatatools_spark.operators.sampling import ipf_weights

    out = ipf_weights(documents, iterations=2)
    n_rows = out.select("row_key").distinct().count()
    n_cols = out.select("col_key").distinct().count()
    total = documents.count()
    col_mass = (
        out.groupBy("col_key").agg(F.sum(F.col("n") * F.col("weight")).alias("m"))
    ).collect()
    # the LAST fitted marginal (columns) matches its target almost exactly
    for r in col_mass:
        assert abs(r["m"] - total / n_cols) < 0.01 * total / n_cols
    row_mass = (
        out.groupBy("row_key").agg(F.sum(F.col("n") * F.col("weight")).alias("m"))
    ).collect()
    # the row marginal is within 25% after 2 rounds (IPF converges geometrically)
    for r in row_mass:
        assert abs(r["m"] - total / n_rows) < 0.25 * total / n_rows


def test_ipf_weights_positive_and_cells_complete(spark, documents):
    from nbdatatools_spark.operators.sampling import ipf_weights

    out = ipf_weights(documents, iterations=2)
    assert out.where(F.col("weight") <= 0).count() == 0
    n_cells_in = documents.select("lang", "source").distinct().count()
    assert out.count() == n_cells_in
