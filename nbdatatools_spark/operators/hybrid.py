"""Hybrid-query ground truth: ANN search ∧ metadata predicate (SURVEY §0.3).

Reference semantics (specs/ordinal_predicate_writers_v1.md:24-33): predicate
*i* pairs with query vector *i*; the filtered answer key for query i is the
top-k of base vectors RESTRICTED to the ordinals matching predicate i
(result_indices facet). This is the reference's core correctness query for
filtered vector search.

Physical strategy: compile each predicate to a Column once (driver-side, the
predicate table is small by construction — one row per query), build the
per-query candidate set via the compiled filter, then run the same
broadcast-crossJoin + windowed top-k as operators.knn but with an extra
semi-join against the per-query match set. For large predicate counts the
match sets are computed in ONE pass by unioning tagged filters (each
predicate's matches tagged with its ordinal) — no per-predicate job.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nbdatatools_spark.functions.distance import distance_expr
from nbdatatools_spark.predicates.compiler import compile_pnode
from nbdatatools_spark.predicates.pnode import PNode, parse_pnode


def result_indices_table(
    meta: DataFrame,
    predicates: list[tuple[int, PNode | str]],
    ordinal: str = "ordinal",
) -> DataFrame:
    """Materialize the result_indices facet for MANY predicates in one job.

    -> (ordinal BIGINT, matches ARRAY<BIGINT>) where row i lists the
    ascending metadata ordinals satisfying predicate i (P8;
    TestDataKind.java:85-89). One scan of ``meta`` evaluates every compiled
    predicate as a boolean projection; explode+filter+collect keeps it a
    single shuffle keyed by predicate ordinal.
    """
    cols = []
    for pid, node in predicates:
        if isinstance(node, (str, bytes, dict)):
            node = parse_pnode(node)
        pred = compile_pnode(node, columns=meta.columns)
        cols.append(F.when(pred, F.lit(pid)))
    tagged = meta.select(
        F.col(ordinal).alias("__mord"),
        F.array_compact(F.array(*cols)).alias("__pids"),
    )
    exploded = tagged.select("__mord", F.explode("__pids").alias("pid"))
    return (
        exploded.groupBy("pid")
        .agg(F.array_sort(F.collect_list("__mord")).alias("matches"))
        .select(F.col("pid").cast("bigint").alias(ordinal), "matches")
    )


def hybrid_ground_truth(
    queries: DataFrame,
    base: DataFrame,
    meta: DataFrame,
    predicates: list[tuple[int, PNode | str]],
    k: int,
    metric: str = "cosine",
    ordinal: str = "ordinal",
    vec: str = "vector",
) -> DataFrame:
    """Filtered KNN answer key: for each query i, top-k over base vectors
    whose ordinal satisfies predicate i.

    Returns (ordinal, indices, distances) like exact_knn. The per-query
    allowed sets ride along the broadcast query side as arrays — the big base
    table still streams through exactly once.
    """
    matches = result_indices_table(meta, predicates, ordinal)
    q = queries.select(
        F.col(ordinal).alias("__qid"), F.col(vec).alias("__qvec")
    ).join(
        matches.select(F.col(ordinal).alias("__qid"), F.col("matches").alias("__allowed")),
        "__qid",
        "inner",
    )
    b = base.select(F.col(ordinal).alias("__bid"), F.col(vec).alias("__bvec"))
    pairs = (
        b.crossJoin(F.broadcast(q))
        .where(F.array_contains(F.col("__allowed"), F.col("__bid").cast("bigint")))
        .select(
            "__qid",
            "__bid",
            distance_expr(metric, F.col("__qvec"), F.col("__bvec")).alias("__dist"),
        )
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("__dist").asc_nulls_last(), F.col("__bid").asc()
    )
    topk = pairs.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    return (
        topk.groupBy("__qid")
        .agg(F.array_sort(F.collect_list(F.struct("__rn", "__bid", "__dist"))).alias("__nn"))
        .select(
            F.col("__qid").alias(ordinal),
            F.transform("__nn", lambda s: s["__bid"]).alias("indices"),
            F.transform("__nn", lambda s: s["__dist"]).alias("distances"),
        )
    )
