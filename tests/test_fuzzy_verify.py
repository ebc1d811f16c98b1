"""MaxSim late-interaction scoring (similarity.py::maxsim_topk) and
blocked edit-distance verification (dedup.py::edit_distance_pairs)."""

import math

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.operators.dedup import edit_distance_pairs
from nbdatatools_spark.operators.similarity import maxsim_topk


# --- MaxSim ----------------------------------------------------------------

QSCHEMA = "query_id BIGINT, token_pos BIGINT, vec ARRAY<DOUBLE>"
DSCHEMA = "doc_id BIGINT, token_pos BIGINT, vec ARRAY<DOUBLE>"


def test_maxsim_closed_form(spark):
    """One query, two tokens; doc 1 matches both tokens exactly (score 2),
    doc 2 matches only the first (score 1 + cos(x, y))."""
    q = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (0, 1, [0.0, 1.0])], QSCHEMA
    )
    d = spark.createDataFrame(
        [
            (1, 0, [2.0, 0.0]),  # cos=1 with q-token 0
            (1, 1, [0.0, 3.0]),  # cos=1 with q-token 1
            (2, 0, [1.0, 0.0]),  # cos=1 with q-token 0, 0 with token 1
        ],
        DSCHEMA,
    )
    rows = maxsim_topk(q, d, k=10).collect()
    scores = {r["doc_id"]: r["maxsim_score"] for r in rows}
    assert scores[1] == pytest.approx(2.0, abs=1e-9)
    assert scores[2] == pytest.approx(1.0, abs=1e-9)
    ranks = {r["doc_id"]: r["rank"] for r in rows}
    assert ranks[1] == 1 and ranks[2] == 2


def test_maxsim_numpy_differential(spark):
    np = pytest.importorskip("numpy")
    rng = np.random.default_rng(7)
    qtok = [(qid, pos, rng.normal(size=8).tolist()) for qid in range(2) for pos in range(3)]
    dtok = [(did, pos, rng.normal(size=8).tolist()) for did in range(5) for pos in range(4)]
    q = spark.createDataFrame(qtok, QSCHEMA)
    d = spark.createDataFrame(dtok, DSCHEMA)

    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(a @ b / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))))

    expected = {}
    for qid in range(2):
        for did in range(5):
            s = 0.0
            for _, pos, qv in [t for t in qtok if t[0] == qid]:
                s += round(
                    max(cos(qv, dv) for _, _, dv in [t for t in dtok if t[0] == did]),
                    9,
                )
            expected[(qid, did)] = s
    got = {
        (r["query_id"], r["doc_id"]): r["maxsim_score"]
        for r in maxsim_topk(q, d, k=5).collect()
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-9)
    # ranks follow (score DESC, doc_id ASC) per query
    for qid in range(2):
        order = sorted(
            (did for did in range(5)), key=lambda d_: (-round(expected[(qid, d_)], 9), d_)
        )
        ranked = sorted(
            ((r["rank"], r["doc_id"]) for r in maxsim_topk(q, d, k=5).collect() if r["query_id"] == qid)
        )
        assert [d_ for _, d_ in ranked] == order


def test_maxsim_k_truncates(spark):
    q = spark.createDataFrame([(0, 0, [1.0, 0.0])], QSCHEMA)
    d = spark.createDataFrame(
        [(i, 0, [1.0, float(i) / 10.0]) for i in range(1, 8)], DSCHEMA
    )
    rows = maxsim_topk(q, d, k=3).collect()
    assert len(rows) == 3
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]


def test_maxsim_no_shuffle_before_first_reduction(spark):
    """The interaction stage must be a broadcast join — the only
    Exchanges in the plan belong to the two reductions and the rank
    window, never a pre-join repartition of doc tokens."""
    q = spark.createDataFrame([(0, 0, [1.0, 0.0])], QSCHEMA)
    d = spark.createDataFrame([(1, 0, [2.0, 0.0])], DSCHEMA)
    plan = maxsim_topk(q, d, k=1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_maxsim_validates_k(spark):
    q = spark.createDataFrame([(0, 0, [1.0])], QSCHEMA)
    with pytest.raises(ValueError, match="k must be"):
        maxsim_topk(q, q.selectExpr("query_id as doc_id", "token_pos", "vec"), k=0)


# --- edit_distance_pairs ---------------------------------------------------

DOCS = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows], DOCS
    )


def test_edit_distance_finds_near_dups_within_block(spark):
    df = _docs(
        spark,
        [
            (1, "the quick brown fox", "en", "web"),
            (2, "the quick brown fax", "en", "web"),  # distance 1 from doc 1
            (3, "totally different words here", "en", "web"),
            (4, "the quick brown fox", "de", "web"),  # other block: never paired
        ],
    )
    rows = edit_distance_pairs(df, max_distance=2).collect()
    assert {(r["id_a"], r["id_b"], r["edit_distance"]) for r in rows} == {(1, 2, 1)}


def test_edit_distance_length_prefilter_prunes(spark):
    df = _docs(
        spark,
        [
            (1, "aaaa", "en", "web"),
            (2, "aaaa" + "x" * 50, "en", "web"),  # len delta 50 > 3: pruned
        ],
    )
    assert edit_distance_pairs(df, max_distance=100).count() == 0


def test_edit_distance_python_differential(spark):
    """Differential vs python-Levenshtein over the same normalized prefix."""

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma delts",
        "alpha  beta\tgamma delta",  # normalizes equal to doc 0
        "epsilon zeta eta theta iota",
        "epsilon zeta eta theta iotas",
    ]
    df = _docs(spark, [(i, t, "en", "s") for i, t in enumerate(texts)])
    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in edit_distance_pairs(
            df, max_len_delta=10, prefix_len=60, max_distance=100
        ).collect()
    }
    norm = lambda t: " ".join(t.split())[:60]
    expected = {}
    rows = [(i, norm(t), len(t)) for i, t in enumerate(texts)]
    for i, ta, la in rows:
        for j, tb, lb in rows:
            if i < j and abs(la - lb) <= 10:
                expected[(i, j)] = lev(ta, tb)
    assert got == expected


def test_edit_distance_no_cartesian(spark):
    df = _docs(spark, [(1, "x", "en", "web"), (2, "y", "en", "web")])
    plan = (
        edit_distance_pairs(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_edit_distance_validates(spark):
    df = _docs(spark, [(1, "x", "en", "web")])
    with pytest.raises(ValueError, match="prefix_len"):
        edit_distance_pairs(df, prefix_len=0)
