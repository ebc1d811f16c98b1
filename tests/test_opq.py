"""OPQ (Ge et al. CVPR 2013) vs plain PQ: on data whose cluster
structure lives in a rotated (axis-misaligned) basis, the learned
orthogonal rotation must recover enough of the mixing for ADC recall to
beat axis-aligned PQ."""

import numpy as np
import pytest

from nbdatatools_spark.operators.similarity import pq_encode, pq_topk, pq_train


def _planted(seed=7, n=400, d=16, m=4, k_clusters=4):
    """Per-subspace cluster structure in a LATENT basis, then a random
    orthogonal mixing so no axis-aligned split sees the clusters."""
    rng = np.random.default_rng(seed)
    dsub = d // m
    parts = []
    for s in range(m):
        centers = rng.normal(size=(k_clusters, dsub)) * 5.0
        parts.append(centers[rng.integers(0, k_clusters, n)] + 0.15 * rng.normal(size=(n, dsub)))
    Z = np.concatenate(parts, axis=1)
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    return Z @ Q.T


def _recall(pairs_df, truth, k):
    got = {}
    for r in pairs_df.collect():
        got.setdefault(r.query_id, set()).add(r.base_id)
    hits = sum(len(got.get(q, set()) & truth[q]) for q in truth)
    return hits / (len(truth) * k)


@pytest.fixture(scope="module")
def planted_df(spark):
    X = _planted()
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    return df.localCheckpoint(), X


def test_opq_rotation_is_orthogonal_and_deterministic(spark, planted_df):
    df, _ = planted_df
    books1, R1 = pq_train(df, m=4, n_codes=16, iters=8, opq=True, opq_iters=4)
    books2, R2 = pq_train(df, m=4, n_codes=16, iters=8, opq=True, opq_iters=4)
    assert np.allclose(R1 @ R1.T, np.eye(R1.shape[0]), atol=1e-9)
    assert np.array_equal(R1, R2) and np.array_equal(books1, books2)


def test_opq_recall_beats_pq_on_planted_rotation(spark, planted_df):
    df, X = planted_df
    k, n_q = 10, 24
    truth = {
        q: set(
            np.argsort(((X - X[q]) ** 2).sum(1) + np.arange(len(X)) * 0.0)[:k]
            .astype(int)
            .tolist()
        )
        for q in range(n_q)
    }
    queries = df.where(f"vec_id < {n_q}")
    books_pq = pq_train(df, m=4, n_codes=16, iters=8)
    books_opq, R = pq_train(df, m=4, n_codes=16, iters=8, opq=True, opq_iters=6)
    enc_pq = pq_encode(df, books_pq)
    enc_opq = pq_encode(df, books_opq, rotation=R)
    r_pq = _recall(pq_topk(queries, enc_pq, books_pq, k=k), truth, k)
    r_opq = _recall(pq_topk(queries, enc_opq, books_opq, k=k, rotation=R), truth, k)
    assert r_opq >= r_pq, (r_opq, r_pq)
    assert r_opq >= 0.6, r_opq  # rotation recovered real structure


def test_opq_rerank_path_uses_raw_vectors(spark, planted_df):
    # exact re-rank after the rotated ADC shortlist: distances must be the
    # TRUE euclidean distances (rotation-free), self-match at rank 1.
    df, X = planted_df
    books, R = pq_train(df, m=4, n_codes=16, iters=8, opq=True, opq_iters=3)
    enc = pq_encode(df, books, rotation=R)
    q = df.where("vec_id < 8")
    out = pq_topk(q, enc, books, k=3, rotation=R, rerank_base=df).collect()
    top1 = {r.query_id: (r.base_id, r.distance) for r in out if r.rank == 1}
    for qid, (bid, dist) in top1.items():
        assert bid == qid and dist == 0.0


def test_pq_train_default_signature_unchanged(spark, planted_df):
    # opq=False returns the bare codebook array exactly as before
    df, _ = planted_df
    books = pq_train(df, m=4, n_codes=16, iters=4)
    assert books.shape == (4, 16, 4)
