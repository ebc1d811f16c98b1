"""Analysis/dedup/window/shuffle operator tests vs numpy + invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.analysis import (
    count_zero_vectors,
    describe,
    dim_moments,
    ks_statistic_normal,
)
from nbdatatools_spark.operators.dedup import clean_vectors, exact_dedup, jaccard_verify, minhash_lsh_candidates
from nbdatatools_spark.operators.shuffle import seeded_shuffle
from nbdatatools_spark.operators.windows import parse_window, rebase_ordinals, window_slice


@pytest.fixture(scope="module")
def vecdf(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(loc=1.0, scale=2.0, size=(300, 6)).astype(np.float32)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(300)]
    rows[5] = (5, [0.0] * 6)
    rows[17] = (17, [0.0] * 6)
    rows[40] = (40, rows[3][1])  # duplicate of ordinal 3
    df = spark.createDataFrame(rows, "ordinal BIGINT, vector ARRAY<FLOAT>").cache()
    return df, rows


def test_count_zero_vectors(vecdf):
    df, _ = vecdf
    r = count_zero_vectors(df).collect()[0]
    assert (r["n_zero"], r["n_total"]) == (2, 300)


def test_describe(vecdf):
    df, _ = vecdf
    r = describe(df).collect()[0]
    assert r["count"] == 300 and r["min_ordinal"] == 0 and r["max_ordinal"] == 299
    assert r["n_distinct_dims"] == 1 and r["min_dim"] == r["max_dim"] == 6
    assert r["n_zero"] == 2


def test_clean_vectors(vecdf):
    df, rows = vecdf
    out = clean_vectors(df).select("ordinal").collect()
    ords = sorted(r[0] for r in out)
    assert 5 not in ords and 17 not in ords      # zeros dropped
    assert 3 in ords and 40 not in ords          # dup keeps lowest ordinal
    assert len(ords) == 297


def test_dim_moments_vs_numpy(vecdf):
    df, rows = vecdf
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    got = {r["dim"]: r for r in dim_moments(df).collect()}
    for d in range(6):
        col = mat[:, d]
        assert got[d]["mean"] == pytest.approx(col.mean(), rel=1e-9)
        assert got[d]["variance"] == pytest.approx(col.var(), rel=1e-6)
        sk = ((col - col.mean()) ** 3).mean() / col.std() ** 3
        assert got[d]["skewness"] == pytest.approx(sk, rel=1e-4, abs=1e-6)
        ku = ((col - col.mean()) ** 4).mean() / col.var() ** 2 - 3
        assert got[d]["kurtosis"] == pytest.approx(ku, rel=1e-4, abs=1e-6)


def test_ks_normal_on_gaussian_data(spark):
    """Gaussian data should clear the 'strong' K-S threshold 0.03 at n=2000
    (06_model_fitting.md)."""
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(2000, 3)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(2000)],
        "ordinal BIGINT, vector ARRAY<FLOAT>",
    )
    ks = ks_statistic_normal(df).collect()
    assert len(ks) == 3
    assert all(r["ks_stat"] < 0.03 for r in ks)


def test_fit_distribution_selection(spark):
    """A4 selection: dim0 gaussian -> normal/strong; dim1 uniform ->
    uniform best; pathological bimodal -> empirical fallback."""
    rng = np.random.default_rng(5)
    n = 3000
    d0 = rng.normal(size=n)
    d1 = rng.uniform(-1, 1, size=n)
    d2 = np.concatenate([rng.normal(-8, 0.1, n // 2), rng.normal(8, 0.1, n - n // 2)])
    mat = np.stack([d0, d1, d2], axis=1).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "ordinal BIGINT, vector ARRAY<FLOAT>",
    )
    from nbdatatools_spark.operators.analysis import fit_distributions

    fits = {r["dim"]: r for r in fit_distributions(df).collect()}
    assert fits[0]["best_fit"] == "normal" and fits[0]["fit_grade"] == "strong"
    assert fits[1]["best_fit"] == "uniform" and fits[1]["ks_uniform"] < 0.03
    assert fits[2]["fit_grade"] == "empirical"


def test_ks_detects_uniform(spark):
    rng = np.random.default_rng(12)
    mat = rng.uniform(-1, 1, size=(2000, 1)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(2000)],
        "ordinal BIGINT, vector ARRAY<FLOAT>",
    )
    ks = ks_statistic_normal(df).collect()[0]
    assert ks["ks_stat"] > 0.03  # uniform is NOT normal


# --- windows --------------------------------------------------------------

def test_parse_window_sugar():
    assert parse_window("0..1000") == [(0, 1000)]
    assert parse_window(500) == [(0, 500)]
    assert parse_window(["10..20", "30..40"]) == [(10, 20), (30, 40)]
    with pytest.raises(ValueError):
        parse_window("20..10")


def test_window_slice_and_rebase(vecdf):
    df, _ = vecdf
    sliced = window_slice(df, ["10..20", "100..105"])
    assert sliced.count() == 15
    rb = rebase_ordinals(sliced, out="logical").orderBy("logical").collect()
    assert [r["logical"] for r in rb] == list(range(15))
    assert rb[0]["ordinal"] == 10 and rb[10]["ordinal"] == 100


# --- shuffle --------------------------------------------------------------

def test_seeded_shuffle_deterministic(vecdf):
    df, _ = vecdf
    a = [r["new_ordinal"] for r in seeded_shuffle(df, 42).orderBy("ordinal").collect()]
    b = [r["new_ordinal"] for r in seeded_shuffle(df, 42).orderBy("ordinal").collect()]
    c = [r["new_ordinal"] for r in seeded_shuffle(df, 43).orderBy("ordinal").collect()]
    assert a == b                      # same seed -> same permutation
    assert a != c                      # different seed -> different
    assert sorted(a) == list(range(300))  # it IS a permutation


# --- text dedup -----------------------------------------------------------

def test_exact_dedup_survivor(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text")],
        "doc_id BIGINT, text STRING",
    )
    out = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    assert out == [1, 3]  # normalization folds case/whitespace; min id survives


def test_minhash_bucket_cap(spark):
    """Degenerate buckets (e.g. boilerplate-identical docs) are dropped when
    they exceed max_bucket — the n^2 blowup guard."""
    docs = [(i, "identical boilerplate text repeated " * 10) for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    capped = minhash_lsh_candidates(df, num_hashes=16, bands=4, max_bucket=5)
    assert capped.count() == 0
    uncapped = minhash_lsh_candidates(df, num_hashes=16, bands=4, max_bucket=0)
    assert uncapped.count() == 12 * 11 // 2


def test_embedding_near_dups_lsh_matches_exact_at_high_threshold(spark):
    """LSH-blocked near-dup must find the same high-similarity pairs as the
    exact all-pairs method (hyperplane agreement probability -> 1 as
    cosine_sim -> 1)."""
    import numpy as np

    from nbdatatools_spark.operators.dedup import embedding_near_dups

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # a near-duplicate of each: tiny perturbation
        rows.append((100 + i, [float(x) for x in v + rng.normal(0, 0.01, 16)]))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(df, threshold=0.999, method="exact").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(
            df, threshold=0.999, method="lsh", dim=16, n_bits=8, n_tables=6
        ).collect()
    }
    assert exact, "fixture must contain near-dup pairs"
    assert lsh <= exact  # LSH never invents pairs (exact filter applied)
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} too low: {exact - lsh}"


def test_minhash_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy")
    other = "completely different content about spark aggregation pipelines " * 8
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id BIGINT, text STRING"
    )
    cands = minhash_lsh_candidates(df, num_hashes=32, bands=16)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs
    verified = jaccard_verify(cands, df, threshold=0.5).collect()
    assert any((v["id_a"], v["id_b"]) == (1, 2) and v["jaccard"] > 0.5 for v in verified)
    assert not any({v["id_a"], v["id_b"]} == {1, 3} for v in verified)


def test_simhash_semantic_distance(spark):
    """SimHash's defining property: near-identical docs land close in
    hamming space, unrelated docs far."""
    from nbdatatools_spark.operators.dedup import simhash

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 6
    near = base.replace("lazy", "tired")
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, "completely different content about spark engines")],
        "doc_id BIGINT, text STRING",
    )
    h = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    d12 = bin(h[1] ^ h[2]).count("1")
    d13 = bin(h[1] ^ h[3]).count("1")
    assert d12 <= 12 < d13
    # determinism: same input -> same hash
    h2 = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    assert h == h2


def test_simhash_near_dups_guarantee(spark):
    """The 4-chunk pigeonhole blocking GUARANTEES pairs within hamming 3;
    an exact duplicate (hamming 0) must always be found, an unrelated doc
    never."""
    from nbdatatools_spark.operators.dedup import simhash_near_dups

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 6
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different content about spark engines")],
        "doc_id BIGINT, text STRING",
    )
    pairs = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dups(docs, max_hamming=3).collect()
    }
    assert (1, 2, 0) in pairs
    assert all(p[:2] == (1, 2) for p in pairs)


def test_connected_components_chain_clique_pair(spark):
    """Min-label propagation: a 4-chain, a triangle, and an isolated pair
    each collapse to their minimum id."""
    from nbdatatools_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),  # triangle
         (20, 21)],                     # pair
        "id_a BIGINT, id_b BIGINT",
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_minhash_dedup_transitive_single_survivor(spark):
    """VERDICT r3 next-round #6: A~B and B~C near-dups with A!~C directly —
    one-hop keeps a stray survivor on such chains; transitive closure must
    keep exactly one doc of the chain (the min id)."""
    from nbdatatools_spark.operators.dedup import jaccard_verify, minhash_dedup, minhash_lsh_candidates

    words = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
             "kilo lima mike november oscar papa quebec romeo sierra tango").split()
    # chain ends get the LOW ids, the middle doc the HIGH id: one-hop drops
    # only id_b docs, i.e. only the middle — leaving TWO survivors of one
    # duplicate cluster. Transitive closure must leave exactly one.
    end_a = " ".join(words * 3)
    end_b = " ".join((words[:-8] + ["uniform", "victor", "whiskey", "xray",
                                    "yankee", "zulu", "one", "two"]) * 3)
    middle = " ".join((words[:-4] + ["uniform", "victor", "whiskey", "xray"]) * 3)
    other = "unrelated content entirely about spark physical plans and shuffles " * 6
    df = spark.createDataFrame(
        [(1, end_a), (2, end_b), (3, middle), (4, other)],
        "doc_id BIGINT, text STRING",
    )
    # fixture sanity: 1~3 and 2~3 verify at the threshold, 1~2 must not
    cands = minhash_lsh_candidates(df, num_hashes=32, bands=16)
    ver = {(r["id_a"], r["id_b"]) for r in
           jaccard_verify(cands, df, threshold=0.55).collect()}
    assert (1, 3) in ver and (2, 3) in ver and (1, 2) not in ver

    kept_onehop = {r["doc_id"] for r in
                   minhash_dedup(df, threshold=0.55).collect()}
    kept_trans = {r["doc_id"] for r in
                  minhash_dedup(df, threshold=0.55, transitive=True).collect()}
    assert kept_onehop == {1, 2, 4}      # the one-hop gap: two survivors
    assert kept_trans == {1, 4}          # exactly one survivor of the cluster


def test_vocab_coverage_closed_form(spark):
    from nbdatatools_spark.operators.analysis import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a a a b b c d"), (2, "a b e")], "doc_id BIGINT, text STRING"
    )
    # counts a:5 b:3 c:1 d:1 e:1 (total 11); cum 5,8,9,10,11
    out = {r["threshold"]: (r["k_tokens"], r["coverage"])
           for r in vocab_coverage(df, (0.5, 0.9, 1.0)).collect()}
    assert out[0.5] == (2, round(8 / 11, 6))
    assert out[0.9] == (4, round(10 / 11, 6))
    assert out[1.0] == (5, 1.0)


def test_vocab_coverage_partition_invariant(spark, sf_dir):
    import __spark_entry__ as e
    from nbdatatools_spark.operators.analysis import vocab_coverage

    docs = e._t(spark, sf_dir, "documents")
    a = vocab_coverage(docs).collect()
    b = vocab_coverage(docs.repartition(7)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_vocab_coverage_validates_thresholds(spark):
    from nbdatatools_spark.operators.analysis import vocab_coverage

    df = spark.createDataFrame([(1, "x")], "doc_id BIGINT, text STRING")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        vocab_coverage(df, (0.0, 0.5))
    with _pytest.raises(ValueError):
        vocab_coverage(df, ())


def test_covariance_matrix_vs_numpy(spark):
    import numpy as np
    from nbdatatools_spark.operators.analysis import covariance_matrix

    rng = np.random.default_rng(7)
    data = rng.normal(size=(300, 6)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    got = {(r["i"], r["j"]): r["cov"]
           for r in covariance_matrix(df, "embedding").collect()}
    want = np.cov(data.astype("float64").T, bias=True)
    assert len(got) == 21  # 6*7/2 upper triangle
    for (i, j), v in got.items():
        assert v == pytest.approx(want[i, j], abs=1e-9)
    # diagonal equals dim_moments population variance
    from nbdatatools_spark.operators.analysis import dim_moments
    var = {r["dim"]: r["variance"]
           for r in dim_moments(df, "embedding").collect()}
    for i in range(6):
        assert got[(i, i)] == pytest.approx(var[i], abs=1e-9)


def test_covariance_matrix_dims_cap_and_validation(spark):
    from nbdatatools_spark.operators.analysis import covariance_matrix

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    assert covariance_matrix(df, "embedding", dims=2).count() == 3
    with pytest.raises(ValueError):
        covariance_matrix(df.where("vec_id < 0"), "embedding")


def test_pca_matches_numpy(spark):
    import numpy as np
    from nbdatatools_spark.operators.analysis import (
        pca_project,
        pca_top_components,
    )

    rng = np.random.default_rng(11)
    # anisotropic cloud: dominant axis along (1, 1, 0)/sqrt(2)
    base = rng.normal(size=(400, 3)) * np.array([3.0, 0.5, 0.2])
    rot = np.array([[2**-0.5, 2**-0.5, 0], [-(2**-0.5), 2**-0.5, 0], [0, 0, 1.0]])
    data = (base @ rot).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    vals, comps = pca_top_components(df, "embedding", k=2)
    x = data.astype("float64")
    cov = np.cov(x.T, bias=True)
    want_vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert vals[0] == pytest.approx(want_vals[0], rel=1e-4)
    assert vals[1] == pytest.approx(want_vals[1], rel=1e-4)
    assert vals[0] > vals[1] > 0
    # PC1 aligns with the planted dominant axis
    pc1 = np.array(comps[0])
    planted = np.array([2**-0.5, 2**-0.5, 0.0])
    assert abs(float(pc1 @ planted)) > 0.99
    # projection matches numpy dot within float32-input tolerance
    proj = {r["vec_id"]: r["pc0"]
            for r in pca_project(df, comps, "embedding").collect()}
    want_proj = x @ pc1
    for i in range(0, 400, 37):
        assert proj[i] == pytest.approx(float(want_proj[i]), abs=1e-4)


def test_pca_project_no_shuffle_no_udf(spark):
    from nbdatatools_spark.operators.analysis import pca_project

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    plan = (
        pca_project(df, [[1.0, 0.0], [0.0, 1.0]], "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pca_validates_k(spark):
    from nbdatatools_spark.operators.analysis import pca_top_components

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [2.0, 1.0])], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    with pytest.raises(ValueError):
        pca_top_components(df, "embedding", k=5)


def test_covariance_gemm_matches_expr(spark):
    import numpy as np
    from nbdatatools_spark.operators.analysis import covariance_matrix

    rng = np.random.default_rng(3)
    data = rng.normal(size=(500, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    ).repartition(9)
    a = {(r["i"], r["j"]): r["cov"]
         for r in covariance_matrix(df, "embedding", impl="expr").collect()}
    b = {(r["i"], r["j"]): r["cov"]
         for r in covariance_matrix(df, "embedding", impl="gemm").collect()}
    assert set(a) == set(b)
    for k in a:
        assert b[k] == pytest.approx(a[k], abs=1e-12)
    with pytest.raises(ValueError):
        covariance_matrix(df, "embedding", impl="nope")


def test_standardize_vectors_matches_numpy(spark, embeddings):
    import numpy as np

    from nbdatatools_spark.operators.analysis import standardize_vectors

    rows = embeddings.limit(100).collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    mu = np.round(X.mean(axis=0), 9)
    sd = np.round(np.sqrt((X * X).mean(axis=0) - X.mean(axis=0) ** 2), 9)
    expect = {
        r.vec_id: np.round((np.asarray(r.embedding, dtype=np.float64) - mu) / sd, 6)
        for r in rows
    }
    got = standardize_vectors(
        spark.createDataFrame(rows, embeddings.schema)
    ).collect()
    for r in got:
        assert np.allclose(r.z, expect[r.vec_id], atol=2e-6), r.vec_id


def test_standardize_vectors_zero_variance_dim(spark):
    from nbdatatools_spark.operators.analysis import standardize_vectors

    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [1.0, 7.0])], "vec_id long, embedding array<double>"
    )
    z = {r.vec_id: r.z for r in standardize_vectors(df).collect()}
    assert z[0][0] == 0.0 and z[1][0] == 0.0  # constant dim -> 0
    assert z[0][1] == -1.0 and z[1][1] == 1.0  # +-1 around the mean


def test_standardize_projection_has_no_shuffle(spark, embeddings):
    from nbdatatools_spark.operators.analysis import standardize_vectors

    out = standardize_vectors(embeddings)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # fit collects d rows; projection is map-side


# ---------------------------------------------------------------------------
# group_keywords
# ---------------------------------------------------------------------------

def test_group_keywords_closed_form(spark):
    from nbdatatools_spark.operators.analysis import group_keywords
    import math

    rows = [
        (1, "g1", "apple apple common common"),
        (2, "g1", "apple common"),
        (3, "g2", "banana banana common common"),
        (4, "g2", "banana common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, text STRING")
    out = group_keywords(docs, "src", "text", top_k=2, min_count=1).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["src"], []).append(r)
    # apple: 3x in g1 only -> idf = ln(2); common: both groups -> idf 0
    ln2 = round(math.log(2.0), 9)
    g1 = {r["token"]: r for r in by_group["g1"]}
    assert g1["apple"]["rank"] == 1
    assert g1["apple"]["n_occurrences"] == 3
    assert g1["apple"]["n_groups_with"] == 1
    assert g1["apple"]["score"] == pytest.approx(round(3 * ln2, 6), abs=1e-9)
    assert g1["common"]["score"] == 0.0
    g2 = {r["token"]: r for r in by_group["g2"]}
    assert g2["banana"]["rank"] == 1
    assert g2["banana"]["score"] == pytest.approx(round(3 * ln2, 6), abs=1e-9)


def test_group_keywords_min_count_and_ties(spark):
    from nbdatatools_spark.operators.analysis import group_keywords

    rows = [
        (1, "g1", "rare zebra zebra yak yak"),
        (2, "g2", "other other thing thing"),
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, src STRING, text STRING")
    out = [
        r
        for r in group_keywords(docs, "src", "text", top_k=5, min_count=2).collect()
        if r["src"] == "g1"
    ]
    toks = {r["token"] for r in out}
    assert "rare" not in toks  # below min_count
    # yak/zebra tie on score -> token ASC order
    ranks = {r["token"]: r["rank"] for r in out}
    assert ranks["yak"] < ranks["zebra"]

    with pytest.raises(ValueError):
        group_keywords(docs, top_k=0)
    with pytest.raises(ValueError):
        group_keywords(docs, min_count=0)


def test_mahalanobis_outliers_planted_blowup(spark):
    import numpy as np
    import pytest as _pt

    from nbdatatools_spark.operators.analysis import mahalanobis_outliers

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(100)]
    rows.append((999, [50.0] * 8))  # planted scale blowup
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = mahalanobis_outliers(df, top_k=5).collect()
    assert out[0].vec_id == 999 and out[0].rank == 1
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
    # distances non-increasing with rank
    ds = [r.mdist for r in sorted(out, key=lambda r: r.rank)]
    assert ds == sorted(ds, reverse=True)
    # numpy differential on the winner (engine rounding replicated)
    X = np.array([r[1] for r in rows])
    mu = np.round(X.mean(axis=0), 9)
    sd = np.round(np.sqrt((X * X).mean(axis=0) - X.mean(axis=0) ** 2), 9)
    z2 = np.round(((X[-1] - mu) / sd) ** 2, 9)
    want = round(float(np.sqrt(z2.sum())), 6)
    assert out[0].mdist == _pt.approx(want, abs=1e-6)
    with _pt.raises(ValueError):
        mahalanobis_outliers(df, top_k=0)
