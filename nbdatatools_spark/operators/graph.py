"""Graph analytics beyond connected components (SURVEY §7.8 extension):
fixed-iteration weighted PageRank as pure DataFrame ops.

Scale shape: every iteration is ONE edge-keyed equi-join (edges x current
ranks on src) plus ONE dst-keyed aggregate — the standard distributed
power-iteration shape that runs at web-graph scale (edges never
materialize on the driver; per-iteration state is (node, rank)).
``localCheckpoint`` per iteration cuts the lineage exactly as
``dedup.connected_components`` does — without it the plan doubles per
round and optimizer time dominates.

Exactness contract (what makes the gate oracle-able): per-edge
contributions are rounded to 9dp and DECIMAL-summed (order-invariant),
the rank update is one double multiply-add rounded to 9dp, and the
teleport term is a Python double literal — an engine replaying the same
fixed iteration count reproduces every rank bit-for-bit.

Semantics note: this is the simplified (teleport-only) PageRank — mass
from dangling nodes (no out-edges) is NOT redistributed, the common
formulation for transition graphs where every observed state has
outgoing transitions. Ranks therefore need not sum to exactly 1.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONTRIB_DEC = "decimal(28,9)"


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Weighted PageRank after exactly ``iterations`` power steps over a
    directed edge list. ``weight=None`` treats every edge as weight 1.
    Returns ``(node, rank)`` with rank rounded to 9dp.

    rank_0(v) = 1/N;
    rank_{t+1}(v) = round((1-d)/N + d * sum_{(u,v) in E}
                          round(rank_t(u) * w(u,v) / out_w(u), 9), 9)
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.select(
            F.col(src).alias("__s"), F.col(dst).alias("__d"), w_col.alias("__w")
        )
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # bounded driver scalar, inlined as a literal
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    teleport = (1.0 - damping) / n_nodes  # python double, replayable literal
    outw = e.groupBy("__s").agg(F.sum("__w").alias("__ow"))
    ew = e.join(outw, "__s")  # (src, dst, w, out_w) — static per run
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "__s"), "__s")
            .select(
                F.col("__d").alias("node"),
                F.round((F.col("rank") * F.col("__w")) / F.col("__ow"), 9)
                .cast(_CONTRIB_DEC)
                .alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(F.col("__in").cast("double"), F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count + clustering coefficient over an UNDIRECTED
    simple graph given as an edge list (either orientation, duplicates
    and self-loops tolerated — canonicalized internally).

    Algorithm: orient every edge low->high (each undirected edge appears
    exactly once), then count paths a->b->c whose closing edge a->c
    exists — the standard two-join oriented-wedge scheme. Orientation
    bounds the join fan-out by the max ORIENTED degree (<= sqrt(2m) after
    degree-ordering at scale), the classic distributed-triangle trick;
    no node ever joins its full undirected neighborhood.

    Global clustering coefficient = 3 * triangles / wedges, where wedges
    = sum over nodes of C(degree, 2) on the undirected graph.

    Returns one row ``(n_nodes, n_edges, n_wedges, n_triangles,
    clustering_coeff)``.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("n_wedges"),
    )
    # DEGREE-ordered orientation (not id order): orient each edge from the
    # endpoint that is smaller under (degree, id) to the larger. Every
    # node's ORIENTED out-degree is then O(sqrt(2m)) — the classic bound —
    # so the wedge join below cannot blow up on high-degree hubs (id
    # orientation measured 56s on the sf0.1 co-visitation graph; this
    # shape runs it in seconds). Triangle count is orientation-invariant.
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
    keyed = canon.join(da, "a").join(db, "b")
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("x"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("y"),
        F.when(a_first, F.col("__db")).otherwise(F.col("__da")).alias("__dy"),
    ).localCheckpoint(eager=False)
    # wedges at the order-minimum node x: pairs (y, z) of out-neighbors
    # with y before z under (degree, id); close with the oriented edge y->z
    e1 = oriented.select("x", F.col("y"), F.col("__dy"))
    e2 = oriented.select(
        F.col("x").alias("x"), F.col("y").alias("z"), F.col("__dy").alias("__dz")
    )
    wedge = e1.join(e2, "x").where(
        (F.col("__dy") < F.col("__dz"))
        | ((F.col("__dy") == F.col("__dz")) & (F.col("y") < F.col("z")))
    )
    closing = oriented.select(F.col("x").alias("y"), F.col("y").alias("z"))
    tri = wedge.join(closing, ["y", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    n_edges = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        # 1-row aggregate sides: explicit broadcast keeps the pre-AQE plan a
        # BroadcastNestedLoopJoin, never a CartesianProduct (gate-wide lint)
        wedges.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def hits_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
) -> DataFrame:
    """Kleinberg HITS hub/authority scores after exactly ``iterations``
    synchronous update rounds over a directed edge list (duplicate edges
    collapsed — HITS is defined on the adjacency matrix, not a multigraph).
    Returns ``(node, authority, hub)``, both rounded to 9dp.

        a_t(v) = sum_{(u,v) in E} h_{t-1}(u)   then L2-normalized,
        h_t(v) = sum_{(v,u) in E} a_t(u)        then L2-normalized.

    Scale shape: PageRank's power-iteration discipline exactly
    (``pagerank`` above) — each half-step is ONE edge-keyed equi-join plus
    ONE keyed aggregate; per-iteration state is ``(node, score)``, the
    normalizer is a broadcast 1-row aggregate, and ``localCheckpoint``
    cuts the doubling lineage per round.

    Exactness contract (what makes the gate oracle-able): raw sums are
    9dp-rounded contributions DECIMAL-summed (order-invariant); the L2
    norm is sqrt of a DECIMAL sum of 9dp-rounded squares; the normalized
    score is one double divide rounded to 9dp. An engine replaying the
    same fixed iteration count reproduces every score bit-for-bit.
    Reference analogue: none (graph analytics are brief-driven; the
    recursion discipline follows graph.py::pagerank).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        # raw: (node, col) with 0.0 for nodes that received no mass.
        norm = raw.agg(
            F.sqrt(
                F.sum(F.round(F.col(col) * F.col(col), 9).cast(_CONTRIB_DEC))
                .cast("double")
            ).alias("__n")
        )
        return raw.crossJoin(F.broadcast(norm)).select(
            "node",
            F.when(F.col("__n") > 0.0, F.round(F.col(col) / F.col("__n"), 9))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auths = nodes.select("node", F.lit(1.0).alias("authority"))
    for _ in range(iterations):
        a_raw = (
            e.join(hubs.withColumnRenamed("node", "__s"), "__s")
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum(F.round("hub", 9).cast(_CONTRIB_DEC)).alias("__a"))
        )
        a_raw = nodes.join(a_raw, "node", "left").select(
            "node",
            F.coalesce(F.col("__a").cast("double"), F.lit(0.0)).alias("authority"),
        )
        auths = _normalize(a_raw, "authority").localCheckpoint()
        h_raw = (
            e.join(auths.withColumnRenamed("node", "__d"), "__d")
            .groupBy(F.col("__s").alias("node"))
            .agg(F.sum(F.round("authority", 9).cast(_CONTRIB_DEC)).alias("__h"))
        )
        h_raw = nodes.join(h_raw, "node", "left").select(
            "node",
            F.coalesce(F.col("__h").cast("double"), F.lit(0.0)).alias("hub"),
        )
        hubs = _normalize(h_raw, "hub").localCheckpoint()
    return auths.join(hubs, "node").select("node", "authority", "hub")


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
) -> DataFrame:
    """Deterministic synchronous label propagation (community detection)
    over an UNDIRECTED simple graph after exactly ``iterations`` rounds.
    Returns ``(node, community)`` where ``community`` is the surviving
    label (initially each node's own id).

    Update rule (all nodes in parallel, integer arithmetic only —
    trivially oracle-able): each node adopts the label with the highest
    vote count among its neighbors' current labels PLUS its own current
    label (the self-vote damps the 2-cycle oscillation synchronous LPA
    is known for on bipartite structures); ties break toward the
    SMALLEST label. A fixed iteration count makes the output exact and
    engine-replayable regardless of convergence.

    Scale shape: per round ONE edge-keyed join (neighbor label lookup) +
    ONE (node, label) count aggregate + ONE per-node arg-min — the same
    bounded power-iteration shape as ``pagerank``; state is one row per
    node, lineage cut per round with ``localCheckpoint``.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    both = canon.union(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)
    nodes = both.select(F.col("a").alias("node")).distinct().localCheckpoint()
    labels = nodes.select("node", F.col("node").alias("community"))
    for _ in range(iterations):
        votes = (
            both.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "community")
            .union(labels.select("node", "community"))  # self-vote
            .groupBy("node", "community")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        # arg-max by (count DESC, label ASC) via a struct min: min over
        # (-count, label) is (max count, then min label) — one aggregate,
        # no ranking window.
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__c")).alias("nc"),
                        F.col("community").alias("l"),
                    )
                ).alias("__b")
            )
            .select("node", F.col("__b.l").alias("community"))
            .localCheckpoint()
        )
    return labels


def cooccurrence_edges(
    df: DataFrame,
    bucket_cols: Sequence[str],
    node_col: str,
    max_bucket: int = 100,
    min_support: int = 3,
) -> DataFrame:
    """Co-visitation edge list: nodes sharing a bucket (the grouping
    columns) get an edge, weighted by the number of DISTINCT shared
    buckets; only edges with ``weight >= min_support`` survive.

    Both knobs are the scale levers the LSH family already uses:
    ``max_bucket`` drops degenerate buckets (a bucket of n nodes emits
    n(n-1)/2 pair rows — one boilerplate hour would dominate the whole
    job; same rationale as minhash_lsh_candidates), and ``min_support``
    prunes the near-complete graph a long observation window otherwise
    produces (hour-grain co-occurrence over 30 days connects ~70% of all
    pairs; support >= 3 keeps the meaningfully-correlated ones). The
    support count is one map-side-combinable aggregate on the pair key.

    Returns ``(src, dst, weight)`` with src < dst.

    Physical shape (optimization round 10, guide §2.4 "remove shuffles
    outright"): the old plan self-joined the distinct occurrence table
    on the bucket key (two more shuffles of the whole table, plus a
    separate bucket-size aggregate + semi-join for the cap). Pairs are
    now generated map-side: one collect_list aggregate — keyed exactly
    like the preceding distinct, so it reuses that exchange — then a
    double explode with the src < dst filter. NULL bucket keys are
    dropped explicitly — the old equi-joins never matched them.
    Identical (src, dst, weight) multiset; the occurrence table crosses
    the network once instead of three times.

    Cap placement (optimization round 11, VERDICT r10 #3 / guide §2.5
    skew + §5): the r10 shape collected EVERY bucket's node list and
    applied the ``max_bucket`` filter afterward, so one viral bucket —
    the exact degenerate the cap exists for — buffered millions of
    elements in a single aggregation buffer before being discarded.
    Over-cap bucket KEYS are now found first with a count-only
    aggregate (map-side combinable, tiny output — the over-cap key set
    is small by definition) and broadcast-anti-joined out of the
    occurrence stream BEFORE the collect, so the cap provably bounds
    the aggregation buffer at ``max_bucket`` elements. The count uses
    the same count(1)-over-distinct-occurrences the r10 filter used
    (NULL nodes count toward bucket size exactly as before); the
    distinct occurrence table is localCheckpointed once so the count
    pass and the collect pass share one scan + one corpus exchange.
    """
    from nbdatatools_spark.session import spread_small_input

    occ = (
        spread_small_input(df)
        .select(*bucket_cols, F.col(node_col).alias("__n"))
        .distinct()
    )
    for c in bucket_cols:
        occ = occ.where(F.col(c).isNotNull())
    if max_bucket:
        occ = occ.localCheckpoint(eager=False)
        over_cap = (
            occ.groupBy(*bucket_cols)
            .agg(F.count(F.lit(1)).alias("__bn"))
            .where(F.col("__bn") > max_bucket)
            .select(*bucket_cols)
        )
        occ = occ.join(F.broadcast(over_cap), list(bucket_cols), "left_anti")
    lists = occ.groupBy(*bucket_cols).agg(
        F.collect_list("__n").alias("__ns"),
    )
    return (
        lists.select("__ns", F.explode("__ns").alias("src"))
        .select("src", F.explode("__ns").alias("dst"))
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
        .where(F.col("weight") >= min_support)
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient of an UNDIRECTED simple graph
    (Newman 2002): the Pearson correlation of endpoint degrees over the
    edge-end list — positive when hubs link to hubs (social shape),
    negative when hubs link to leaves (hub-and-spoke / web shape).

    Edges are canonicalized like triangle_stats (either orientation,
    duplicates and self-loops dropped); each undirected edge contributes
    BOTH ordered ends (x=deg_u,y=deg_v and x=deg_v,y=deg_u), which makes
    the correlation symmetric without a separate mean split.

    Returns one row ``(n_nodes, n_edges, assortativity)`` at 6dp; NULL
    assortativity for degree-regular graphs (zero variance).

    Plan: one distinct + one degree aggregate + two keyed joins + one
    DECIMAL-summed Pearson reduction. No windows, nothing all-pairs.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
    keyed = canon.join(da, "a").join(db, "b")
    ends = keyed.select(
        F.col("__da").cast("double").alias("x"),
        F.col("__db").cast("double").alias("y"),
    ).unionAll(
        keyed.select(
            F.col("__db").cast("double").alias("x"),
            F.col("__da").cast("double").alias("y"),
        )
    )

    def _dsum(expr):
        return F.sum(F.round(expr, 9).cast("decimal(30,9)")).cast("double")

    agg = ends.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        _dsum(F.col("x")).alias("sx"),
        _dsum(F.col("y")).alias("sy"),
        _dsum(F.col("x") * F.col("y")).alias("sxy"),
        _dsum(F.col("x") * F.col("x")).alias("sxx"),
        _dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    ) * F.sqrt(F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
    r = F.when(den <= 0.0, F.lit(None).cast("double")).otherwise(num / den)
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(agg))
        .select(
            "n_nodes",
            "n_edges",
            (F.round(r, 6) + 0.0).alias("assortativity"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """k-core of an UNDIRECTED simple graph: the maximal subgraph where
    every node has degree >= k — the standard density filter before
    community/influence analysis (Seidman 1983). Iterative peeling:
    drop all nodes with degree < k, recompute degrees on the induced
    subgraph, repeat to fixpoint.

    Returns ``(node, degree)`` for the surviving core, degree measured
    IN the core, ordered by node. Empty result when the graph has no
    k-core.

    Scale shape: each round is one degree aggregate + two semi-joins,
    all keyed on node ids; ``localCheckpoint`` cuts lineage per round
    (the connected_components discipline) so plans stay flat. Rounds are
    data-bounded (each drops >= 1 node, <= the peeling depth, which is
    small for real degree distributions); the runaway guard is
    max(``max_iter``, node_count + 1) — peeling depth can legitimately
    reach the node count on chain-like graphs, so the guard scales with
    the graph and raises loudly rather than returning a non-fixpoint.

    Not SQL-expressible (fixpoint of a shrinking set) — differential
    pytest vs a pure-Python peeler is the correctness evidence (the
    driver gate records rows-only).
    """
    live = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # every non-terminal round strictly drops >= 1 node, so node-count+1
    # rounds always reach the fixpoint: the guard scales with the graph
    # (chain-like graphs legitimately peel ~1 node/round, far past any
    # fixed constant) and max_iter stays only as an explicit lower bound
    # on the runaway ceiling for callers who want to cap work.
    bound: int | None = None
    rounds = 0
    while bound is None or rounds < bound:
        rounds += 1
        deg = (
            live.select(F.col("a").alias("node"))
            .unionAll(live.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
            .localCheckpoint(eager=False)
        )
        keep = deg.where(F.col("degree") >= k).select("node")
        # ONE aggregate job for both counts (optimization round 10):
        # the old two .count() actions each scheduled a full job over
        # the same checkpointed degree table every round
        counts = deg.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.when(F.col("degree") >= k, 1).otherwise(0)).alias(
                "__k"
            ),
        ).first()
        n_before = int(counts["__n"])
        n_keep = int(counts["__k"] or 0)
        if bound is None:
            bound = max(max_iter, n_before + 1)
        if n_keep == n_before:
            return (
                deg.where(F.col("degree") >= k)
                .select("node", F.col("degree").cast("bigint").alias("degree"))
                .orderBy("node")
            )
        if n_keep == 0:
            return (
                deg.where(F.lit(False))
                .select("node", F.col("degree").cast("bigint").alias("degree"))
            )
        live = (
            live.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    raise RuntimeError(
        f"kcore did not reach a fixpoint in {rounds} rounds "
        f"(guard = max(max_iter={max_iter}, nodes+1)) — raise max_iter"
    )


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top_n: int = 50,
    max_z_degree: int | None = None,
) -> DataFrame:
    """Neighborhood link-prediction scores for NON-edges at distance 2
    (Liben-Nowell & Kleinberg 2003) on an UNDIRECTED simple graph: for
    every node pair (a, b) that shares >= 1 common neighbor and is NOT
    already an edge, emit the three classic scores — common-neighbor
    count, Jaccard cn / (deg_a + deg_b - cn), and Adamic-Adar
    sum_z 1/ln(deg_z) over shared neighbors z (deg_z >= 2 always holds
    for a shared neighbor, so ln is safe). The standard QA lens over
    co-visitation graphs: "which missing edges does the graph itself
    predict" — candidate generation for entity resolution and
    recommender-shaped audits of ``cooccurrence_edges`` output.

    Returns the ``top_n`` rows ``(node_a, node_b, common_neighbors,
    jaccard, adamic_adar)`` (node_a < node_b) ordered by
    (adamic_adar DESC, node_a, node_b); 6dp scores.

    Scale shape: the same wedge join as triangle_stats — the candidate
    set is generated through the shared NEIGHBOR key (each neighbor z
    of degree d emits d(d-1)/2 wedges), so the cost is sum_z deg_z^2,
    bounded by the same degree caps the caller applies upstream
    (cooccurrence_edges max_bucket/min_support); never all-pairs over
    nodes. One anti-join removes existing edges; top_n is a
    TakeOrderedAndProject, not a global sort.

    ``max_z_degree`` is the in-operator scale lever for DENSE graphs
    (where upstream support thresholds can't sparsify without emptying
    smaller slices): wedge CENTERS with degree > the cap are dropped
    BEFORE the self-join, bounding the wedge count at cap * 2m. The
    candidates lost are exactly the ones a hub would generate — whose
    per-wedge Adamic-Adar weight 1/ln(deg_z) is smallest — the standard
    blocking discipline of entity-resolution candidate generation.
    Endpoint degrees for Jaccard always come from the FULL graph.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # adjacency with both orientations: (node, neighbor)
    adj = canon.select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionAll(canon.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    # wedges through z: (x, z), (y, z) with x < y -> candidate (x, y);
    # the z-degree cap filters the adjacency BEFORE the self-join so the
    # quadratic intermediate never materializes for hub centers
    zdeg = deg.select(F.col("node").alias("z"), F.col("deg").alias("__dz"))
    if max_z_degree is not None:
        if max_z_degree < 2:
            raise ValueError(
                f"max_z_degree must be >= 2, got {max_z_degree}"
            )
        zdeg = zdeg.where(F.col("__dz") <= max_z_degree).localCheckpoint(
            eager=False
        )
    adj_z = adj.join(
        zdeg.select("z"), adj["nbr"] == F.col("z"), "left_semi"
    ) if max_z_degree is not None else adj
    za = adj_z.select(F.col("nbr").alias("z"), F.col("node").alias("x"))
    zb = adj_z.select(F.col("nbr").alias("z"), F.col("node").alias("y"))
    wedges = za.join(zb, "z").where(F.col("x") < F.col("y"))
    scored = (
        wedges.join(zdeg, "z")
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(
                F.round(1.0 / F.log(F.col("__dz").cast("double")), 9).cast(
                    "decimal(30,9)"
                )
            )
            .cast("decimal(38,9)")
            .cast("double")
            .alias("aa"),
        )
    )
    non_edges = scored.join(
        canon,
        (scored["x"] == canon["a"]) & (scored["y"] == canon["b"]),
        "left_anti",
    )
    dx = deg.select(F.col("node").alias("x"), F.col("deg").alias("__dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("deg").alias("__dy"))
    return (
        non_edges.join(dx, "x")
        .join(dy, "y")
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            F.col("cn").cast("bigint").alias("common_neighbors"),
            (
                F.round(
                    F.col("cn")
                    / (F.col("__dx") + F.col("__dy") - F.col("cn")).cast(
                        "double"
                    ),
                    6,
                )
                + 0.0
            ).alias("jaccard"),
            (F.round("aa", 6) + 0.0).alias("adamic_adar"),
        )
        .orderBy(
            F.col("adamic_adar").desc(), F.col("node_a"), F.col("node_b")
        )
        .limit(top_n)
    )
