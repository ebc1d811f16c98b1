"""Regression tests for the round-8 ADVICE fixes:

- dbscan_from_pairs canonicalizes directed pair lists (both-orientation
  ANN output must not double-count degrees);
- friedman_test / cochran_q / fleiss_kappa gate blocks/items on DISTINCT
  treatment/rater counts (a duplicate masking a missing one must drop);
- bh_adjust derives `rejected` from the same 6dp-rounded value emitted
  as p_adj (no boundary row showing p_adj == alpha with rejected=false);
- kcore's runaway guard scales with node count (chain-like graphs peel
  ~1-2 nodes/round, legitimately past any fixed constant);
- mann_kendall keeps single-point groups (n_points=1, S=0, no_trend)
  instead of silently dropping them.
"""

import pytest

from nbdatatools_spark.operators.clustering import dbscan_from_pairs
from nbdatatools_spark.operators.evaluation import cochran_q, fleiss_kappa
from nbdatatools_spark.operators.graph import kcore
from nbdatatools_spark.operators.stats import (
    bh_adjust,
    friedman_test,
    mann_kendall,
)


def test_dbscan_both_orientations_no_degree_inflation(spark):
    # one true edge supplied in BOTH orientations: degree must stay 1,
    # so with min_pts=3 (needs deg+1 >= 3) both endpoints are noise
    points = spark.createDataFrame([(1,), (2,)], "vec_id int")
    pairs = spark.createDataFrame([(1, 2), (2, 1)], "id_a int, id_b int")
    out = {r["id"]: r for r in dbscan_from_pairs(points, pairs, min_pts=3).collect()}
    assert out[1]["role"] == "noise" and out[2]["role"] == "noise"
    assert out[1]["cluster"] is None


def test_dbscan_directed_input_matches_undirected(spark):
    # a 4-clique given directed must produce the same clustering as the
    # unordered pair list
    ids = list(range(4))
    und = [(a, b) for a in ids for b in ids if a < b]
    points = spark.createDataFrame([(i,) for i in ids], "vec_id int")
    p_und = spark.createDataFrame(und, "id_a int, id_b int")
    p_dir = spark.createDataFrame(
        und + [(b, a) for a, b in und], "id_a int, id_b int"
    )
    r_und = sorted(
        dbscan_from_pairs(points, p_und, min_pts=4).collect(),
        key=lambda r: r["id"],
    )
    r_dir = sorted(
        dbscan_from_pairs(points, p_dir, min_pts=4).collect(),
        key=lambda r: r["id"],
    )
    assert [tuple(r) for r in r_und] == [tuple(r) for r in r_dir]
    assert all(r["role"] == "core" for r in r_und)


def test_friedman_drops_duplicated_treatment_block(spark):
    # clean blocks b1/b2 carry t1..t3; b3 duplicates t1 and misses t3 —
    # raw count == 3 but distinct count == 2, so it must drop loudly and
    # chi2 must equal the clean-only computation
    clean = [
        ("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
        ("b2", "t1", 1.0), ("b2", "t2", 2.0), ("b2", "t3", 3.0),
    ]
    dirty = clean + [("b3", "t1", 1.0), ("b3", "t1", 2.0), ("b3", "t2", 3.0)]
    schema = "b string, t string, v double"
    r_clean = friedman_test(
        spark.createDataFrame(clean, schema), "b", "t", "v"
    ).collect()[0]
    r_dirty = friedman_test(
        spark.createDataFrame(dirty, schema), "b", "t", "v"
    ).collect()[0]
    assert r_dirty["n_blocks"] == 2
    assert r_dirty["n_blocks_dropped"] == 1
    assert r_dirty["chi2"] == r_clean["chi2"]


def test_cochran_drops_duplicated_treatment_item(spark):
    clean = [
        ("i1", "t1", 1), ("i1", "t2", 0), ("i1", "t3", 0),
        ("i2", "t1", 1), ("i2", "t2", 1), ("i2", "t3", 0),
        ("i3", "t1", 0), ("i3", "t2", 0), ("i3", "t3", 0),
    ]
    dirty = clean + [("i4", "t1", 1), ("i4", "t1", 1), ("i4", "t2", 0)]
    schema = "item string, t string, f int"
    r_clean = cochran_q(
        spark.createDataFrame(clean, schema), "item", "t", "f"
    ).collect()[0]
    r_dirty = cochran_q(
        spark.createDataFrame(dirty, schema), "item", "t", "f"
    ).collect()[0]
    assert r_dirty["n_items"] == 3
    assert r_dirty["n_items_dropped"] == 1
    assert r_dirty["q_stat"] == r_clean["q_stat"]


def test_fleiss_drops_duplicated_rater_item(spark):
    # 3 clean items rated by A/B/C; i4 has A twice + B (3 rows = modal
    # count, but only 2 distinct raters) — must drop, loudly
    clean = [
        (i, r, c)
        for i, cats in [("i1", "yyn"), ("i2", "yyy"), ("i3", "nnn")]
        for r, c in zip("ABC", cats)
    ]
    dirty = clean + [("i4", "A", "y"), ("i4", "A", "n"), ("i4", "B", "y")]
    schema = "item string, rater string, c string"
    r_clean = fleiss_kappa(
        spark.createDataFrame(clean, schema), "item", "rater", "c"
    ).collect()[0]
    r_dirty = fleiss_kappa(
        spark.createDataFrame(dirty, schema), "item", "rater", "c"
    ).collect()[0]
    assert r_dirty["n_items"] == 3
    assert r_dirty["n_items_dropped"] == 1
    assert r_dirty["kappa"] == r_clean["kappa"]


def test_bh_rejected_consistent_with_displayed_p_adj(spark):
    # unrounded adj = 0.0500001 > alpha, but the emitted p_adj rounds to
    # 0.05: rejected must agree with what the row DISPLAYS
    df = spark.createDataFrame([("a", 0.0500001)], "k string, p double")
    r = bh_adjust(df, "p", ["k"], alpha=0.05).collect()[0]
    assert r["p_adj"] == 0.05
    assert r["rejected"] is True


def test_kcore_guard_scales_past_max_iter(spark):
    # a 30-node path at k=2 peels ~2 nodes/round (~15 rounds): with
    # max_iter=5 the old fixed guard raised; the node-scaled guard
    # finishes and returns the (empty) 2-core — a path has none
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(29)], "src int, dst int"
    )
    out = kcore(edges, k=2, max_iter=5)
    assert out.count() == 0


def test_kcore_still_returns_core_with_tiny_max_iter(spark):
    # triangle + pendant chain: the triangle IS the 2-core; reaching it
    # requires peeling the 10-node chain (~5+ rounds) past max_iter=2
    chain = [(100 + i, 100 + i + 1) for i in range(9)] + [(109, 0)]
    tri = [(0, 1), (1, 2), (0, 2)]
    edges = spark.createDataFrame(chain + tri, "src int, dst int")
    rows = {r["node"]: r["degree"] for r in kcore(edges, k=2, max_iter=2).collect()}
    assert rows == {0: 2, 1: 2, 2: 2}


def test_mann_kendall_keeps_single_point_group(spark):
    rows = [("up", float(i), float(i)) for i in range(8)] + [
        ("lonely", 1.0, 42.0)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in mann_kendall(df, "g", "x", "y").collect()}
    assert set(out) == {"up", "lonely"}
    lone = out["lonely"]
    assert lone["n_points"] == 1
    assert lone["s_stat"] == 0
    assert lone["z"] == 0.0
    assert lone["trend"] == "no_trend"
    assert out["up"]["trend"] == "increasing"
