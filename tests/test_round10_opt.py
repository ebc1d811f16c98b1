"""Round-10 optimization equivalence pins: the operator rewrites in the
first optimization round are value-preserving by argument — these tests
pin the arguments' edge cases so a future change can't silently break
them.

- cooccurrence_edges moved from a bucket-key self-join to map-side pair
  generation: NULL bucket keys must still drop (the old equi-join never
  matched them) and NULL nodes must still count toward the bucket-size
  cap without ever appearing in a pair.
- jaccard_verify now semi-joins the corpus to the candidate id set:
  inner-join semantics for ids absent from the corpus are unchanged.
- grouped_avg_ranks(counts=...) must equal the direct-scan path.
- spread_small_input widens only under-split inputs and is a safe no-op
  on streaming frames.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F


def test_cooccurrence_edges_null_and_cap_semantics(spark):
    from nbdatatools_spark.operators.graph import cooccurrence_edges

    rows = [
        # bucket "a": nodes 1,2,3 -> 3 pairs
        ("a", 1), ("a", 2), ("a", 3), ("a", 2),  # duplicate collapses
        # bucket "b": 2 real nodes + a NULL node -> size 3 (over cap=2),
        # so the cap must drop the WHOLE bucket even though only 2
        # non-null nodes exist (the old count(1) semantics)
        ("b", 10), ("b", 11), ("b", None),
        # bucket "c": node + NULL -> size 2 (cap ok), but no pair
        ("c", 20), ("c", None),
        # NULL bucket: never participates (old equi-join semantics)
        (None, 30), (None, 31),
    ]
    df = spark.createDataFrame(rows, "bk string, node bigint")
    out = cooccurrence_edges(
        df, ["bk"], "node", max_bucket=2, min_support=1
    ).collect()
    # only bucket "a" survives the cap... but its size is 3 > 2: dropped
    assert out == []
    out2 = {
        (r["src"], r["dst"]): r["weight"]
        for r in cooccurrence_edges(
            df, ["bk"], "node", max_bucket=3, min_support=1
        ).collect()
    }
    # bucket a (size 3): pairs (1,2),(1,3),(2,3); bucket b (size 3 with
    # NULL): pairs (10,11) only; bucket c: none; NULL bucket: none
    assert out2 == {(1, 2): 1, (1, 3): 1, (2, 3): 1, (10, 11): 1}


def test_cooccurrence_edges_matches_bruteforce(spark):
    from nbdatatools_spark.operators.graph import cooccurrence_edges

    rows = [(f"b{i % 5}", (i * 7) % 11) for i in range(60)]
    df = spark.createDataFrame(rows, "bk string, node bigint")
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in cooccurrence_edges(
            df, ["bk"], "node", max_bucket=100, min_support=2
        ).collect()
    }
    buckets: dict[str, set[int]] = {}
    for bk, n in rows:
        buckets.setdefault(bk, set()).add(n)
    want: dict[tuple[int, int], int] = {}
    for ns in buckets.values():
        for a, b in combinations(sorted(ns), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    want = {k: v for k, v in want.items() if v >= 2}
    assert got == want


def test_jaccard_verify_missing_candidate_ids_still_inner(spark):
    from nbdatatools_spark.operators.dedup import jaccard_verify

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"),
         (3, "something else entirely")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 999), (998, 999)], "id_a long, id_b long"
    )
    out = jaccard_verify(cands, docs, threshold=0.0).collect()
    # pairs referencing ids absent from the corpus produce NO row (the
    # pre-optimization inner-join behavior)
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
    assert out[0]["jaccard"] == 1.0


def test_grouped_avg_ranks_counts_path_equals_direct(spark):
    from nbdatatools_spark.operators.stats import grouped_avg_ranks

    rows = [("g1", float(v)) for v in [3, 1, 3, 2, 2, 2]] + [
        ("g2", float(v)) for v in [5, 5, 7]
    ]
    df = spark.createDataFrame(rows, "__g string, __s double")
    direct = sorted(
        tuple(r) for r in grouped_avg_ranks(df, "__g", "__s").collect()
    )
    counts = df.groupBy("__g", "__s").agg(F.count(F.lit(1)).alias("__n"))
    derived = sorted(
        tuple(r)
        for r in grouped_avg_ranks(df, "__g", "__s", counts=counts).collect()
    )
    assert direct == derived


def test_spread_small_input_widens_only_undersplit(spark):
    from nbdatatools_spark.session import spread_small_input

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    assert spread_small_input(narrow).rdd.getNumPartitions() == target
    wide = spark.range(1000).repartition(target + 3)
    assert spread_small_input(wide).rdd.getNumPartitions() == target + 3
    # values untouched
    assert spread_small_input(narrow).count() == 1000


def test_spread_small_input_streaming_noop(spark):
    from nbdatatools_spark.session import spread_small_input

    s = spark.readStream.format("rate").load()
    out = spread_small_input(s)
    assert out.isStreaming
