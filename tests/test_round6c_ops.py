"""Round-6 batch-3 operator tests: tokenizer fertility, encoding QC,
script profiling, token-length drift, Bloom decontamination, count-min
heavy hitters, simplified silhouette."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# --- fertility --------------------------------------------------------------


def test_fertility_known_values(spark):
    from nbdatatools_spark.functions.text import fertility_stats

    df = spark.createDataFrame(
        [(0, "hello world"), (1, "it's a test-case"), (2, ""), (3, "héllo")],
        ["i", "t"],
    )
    rows = {
        r["i"]: r
        for r in df.select("i", fertility_stats(F.col("t")).alias("f"))
        .select("i", "f.*")
        .collect()
    }
    r = rows[0]
    assert (r["n_bytes"], r["n_chars"], r["n_ws_tokens"]) == (11, 11, 2)
    # GPT-2 pre-split: 'hello' + ' world' -> 2 subword pieces
    assert r["n_subword_tokens"] == 2 and r["fertility"] == 1.0
    # contraction splits: it | 's | a | test | - | case -> 6 pieces over 3 words
    r1 = rows[1]
    assert r1["n_ws_tokens"] == 3 and r1["n_subword_tokens"] == 6
    assert r1["fertility"] == 2.0
    # empty text: zero counts, NULL ratios
    r2 = rows[2]
    assert r2["n_ws_tokens"] == 0 and r2["fertility"] is None
    assert r2["bytes_per_subword"] is None
    # utf-8 multibyte: bytes > chars
    r3 = rows[3]
    assert r3["n_bytes"] == 6 and r3["n_chars"] == 5


# --- encoding QC ------------------------------------------------------------


def test_encoding_quality_counts(spark):
    from nbdatatools_spark.functions.text import encoding_quality

    df = spark.createDataFrame(
        [
            (0, "clean ascii text"),
            (1, "bad �� mark"),
            (2, "bell\x07 and del\x7f"),
            (3, "moji Ã© and â€™ twice Ã©"),
            (4, "tabs\tand\nnewlines ok"),
            (5, ""),
        ],
        ["i", "t"],
    )
    rows = {
        r["i"]: r
        for r in df.select("i", encoding_quality(F.col("t")).alias("e"))
        .select("i", "e.*")
        .collect()
    }
    assert rows[0]["is_clean"] and rows[0]["non_ascii_ratio"] == 0.0
    assert rows[1]["n_replacement"] == 2 and not rows[1]["is_clean"]
    assert rows[2]["n_control"] == 2 and not rows[2]["is_clean"]
    assert rows[3]["n_mojibake"] == 3 and not rows[3]["is_clean"]
    # \t and \n are NOT counted as controls
    assert rows[4]["n_control"] == 0 and rows[4]["is_clean"]
    assert rows[5]["non_ascii_ratio"] == 0.0 and rows[5]["is_clean"]


# --- script profile ---------------------------------------------------------


def test_script_profile_classes_and_dominance(spark):
    from nbdatatools_spark.functions.text import script_profile

    df = spark.createDataFrame(
        [
            (0, "plain latin"),
            (1, "привет мир"),
            (2, "你好世界"),
            (3, "abc 123 xyz"),  # latin 6 > digit 3
            (4, "12 34"),
            (5, ""),
            (6, "مرحبا"),
            (7, "한국어 텍스트"),
            (8, "αβγ"),
        ],
        ["i", "t"],
    )
    rows = {
        r["i"]: r
        for r in df.select("i", script_profile(F.col("t")).alias("s"))
        .select("i", "s.*")
        .collect()
    }
    assert rows[0]["dominant"] == "latin"
    assert rows[1]["dominant"] == "cyrillic" and rows[1]["n_cyrillic"] == 9
    assert rows[2]["dominant"] == "cjk" and rows[2]["n_cjk"] == 4
    assert rows[3]["dominant"] == "latin" and rows[3]["n_digit"] == 3
    assert rows[4]["dominant"] == "digit"
    assert rows[5]["dominant"] == "none" and rows[5]["dominant_ratio"] == 0.0
    assert rows[6]["dominant"] == "arabic"
    assert rows[7]["dominant"] == "hangul"
    assert rows[8]["dominant"] == "greek"


def test_script_profile_tie_break_priority(spark):
    from nbdatatools_spark.functions.text import script_profile

    # 2 latin chars vs 2 digits: tie broken by class order -> latin
    df = spark.createDataFrame([(0, "ab 12")], ["i", "t"])
    r = df.select(script_profile(F.col("t")).alias("s")).select("s.*").first()
    assert r["n_latin"] == 2 and r["n_digit"] == 2
    assert r["dominant"] == "latin"


# --- length drift -----------------------------------------------------------


def test_length_drift_self_zero_and_shifted(spark):
    from nbdatatools_spark.operators.analysis import length_drift

    rows = [(i, "a", "w " * 50) for i in range(40)]
    rows += [(100 + i, "b", "w " * 50) for i in range(40)]  # same distribution
    rows += [(200 + i, "c", "w " * 500) for i in range(40)]  # shifted
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["grp"]: r for r in length_drift(df, reference="a").collect()}
    assert out["a"]["psi"] == 0.0
    assert out["b"]["psi"] == 0.0  # identical histogram
    assert out["c"]["psi"] > 0.25  # fully shifted
    assert out["c"]["n_docs"] == 40 and out["c"]["n_reference"] == 40


def test_length_drift_absent_reference_is_empty(spark, documents):
    from nbdatatools_spark.operators.analysis import length_drift

    assert length_drift(documents, reference="no_such_source").count() == 0


# --- bloom decontamination --------------------------------------------------


def _bloom_positions(gram: str, m: int, k: int):
    hx = hashlib.md5(gram.encode("utf-8")).hexdigest()
    h1, h2 = int(hx[:13], 16), int(hx[13:26], 16)
    return [(h1 + i * (2 * h2 + 1)) % m for i in range(k)]


def test_bloom_no_false_negatives_and_exact_confirm(spark, documents):
    from nbdatatools_spark.operators.dedup import bloom_decontaminate, contaminated_ids

    test = documents.where(F.col("doc_id") % 101 == 0)
    train = documents.where(F.col("doc_id") % 101 != 0).unionByName(
        test.withColumn("doc_id", F.col("doc_id") + F.lit(10**6))
    )
    out = bloom_decontaminate(train, test, n=13, m_bits=8192, k=2)
    rows = out.collect()
    by_id = {r["id"]: r for r in rows}
    # the re-idded test copies MUST be flagged and contaminated (no false
    # negatives: every true hit passes the bloom screen)
    for r in test.select("doc_id").collect():
        c = by_id[r["doc_id"] + 10**6]
        assert c["bloom_flagged"] and c["contaminated"], c
        assert c["n_exact_hits"] == c["n_grams"] > 0
    # flagged ⊇ contaminated; false_positive = flagged − contaminated
    for r in rows:
        if r["contaminated"]:
            assert r["bloom_flagged"]
        assert r["false_positive"] == (r["bloom_flagged"] and not r["contaminated"])
        assert r["n_bloom_hits"] >= r["n_exact_hits"]
    # exact side agrees with the reference decontamination operator
    exact = {
        r["id"]: r["n_hits"]
        for r in contaminated_ids(train, test, n=13).collect()
    }
    for r in rows:
        assert r["n_exact_hits"] == exact.get(r["id"], 0), r["id"]


def test_bloom_position_convention_matches_python(spark):
    """The pandas-UDF probe and the Spark-side position exprs use the same
    md5-uint52 double-hashing convention."""
    from nbdatatools_spark.operators.dedup import _bloom_hash_cols

    df = spark.createDataFrame([("some gram text",)], ["g"])
    got = df.select(
        F.array(*_bloom_hash_cols(F.col("g"), 8192, 3)).alias("p")
    ).first()["p"]
    assert got == _bloom_positions("some gram text", 8192, 3)


# --- CMS heavy hitters ------------------------------------------------------


def test_cms_overestimates_and_finds_heavy_hitter(spark):
    from nbdatatools_spark.operators.lm import cms_heavy_hitters

    rows = [(i, "common " * 30 + f"rare{i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = cms_heavy_hitters(df, depth=4, width=256, topk=5).collect()
    assert out[0]["token"] == "common" and out[0]["exact_n"] == 1500
    for r in out:
        assert r["cms_est"] >= r["exact_n"]  # CMS never underestimates
        assert r["overestimate"] == r["cms_est"] - r["exact_n"]


def test_cms_narrow_width_collides_more(spark, documents):
    from nbdatatools_spark.operators.lm import cms_heavy_hitters

    wide = cms_heavy_hitters(documents, depth=4, width=4096, topk=10).collect()
    narrow = cms_heavy_hitters(documents, depth=4, width=64, topk=10).collect()
    assert sum(r["overestimate"] for r in narrow) >= sum(
        r["overestimate"] for r in wide
    )


# --- simplified silhouette --------------------------------------------------


def test_silhouette_separated_clusters(spark):
    from nbdatatools_spark.operators.clustering import simplified_silhouette

    rng = np.random.RandomState(7)
    rows = []
    for lab, center in [(0, 0.0), (1, 10.0)]:
        for i in range(30):
            v = (rng.randn(4) * 0.05 + center).tolist()
            rows.append((lab * 100 + i, [float(x) for x in v], lab))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["label"]: r for r in simplified_silhouette(df).collect()}
    assert out[0]["n_vectors"] == 30 and out[1]["n_vectors"] == 30
    # tight, far-apart clusters -> silhouette near 1
    assert out[0]["mean_silhouette"] > 0.95
    assert out[1]["mean_silhouette"] > 0.95


def test_silhouette_numpy_differential(spark, embeddings):
    from nbdatatools_spark.operators.clustering import simplified_silhouette

    got = {r["label"]: r for r in simplified_silhouette(embeddings).collect()}
    rows = embeddings.select("vec_id", "embedding", "label").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labs = np.array([r["label"] for r in rows])
    cents = {l: X[labs == l].mean(0) for l in np.unique(labs)}
    sils = {l: [] for l in cents}
    for x, l in zip(X, labs):
        a = math.sqrt(((x - cents[l]) ** 2).sum())
        b = min(
            math.sqrt(((x - c) ** 2).sum()) for m, c in cents.items() if m != l
        )
        sils[l].append((b - a) / max(a, b))
    for l, vals in sils.items():
        assert got[l]["n_vectors"] == len(vals)
        assert abs(got[l]["mean_silhouette"] - np.mean(vals)) < 1e-3, l
