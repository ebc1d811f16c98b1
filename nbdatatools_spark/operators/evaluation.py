"""Classifier / filter evaluation metrics (SURVEY §7.8 training-data
extension): the readouts a curation team runs before trusting a quality
signal enough to gate a 100-TB corpus on it.

- ``ranking_auc``: exact ROC-AUC of a continuous score against a boolean
  label via the Mann-Whitney U rank-sum identity (average ranks for
  ties) — no threshold sweep, no curve materialization.
- ``calibration_bins``: reliability-diagram table (fixed score bins,
  observed positive rate per bin) — is a 0.8 score right 80% of the time.
- ``filter_agreement``: Cohen's kappa between two boolean filter
  decisions — how much two heuristics (e.g. Gopher vs C4 page rules)
  actually agree beyond chance before they're stacked in a pipeline.

Exactness: everything reduces to integer counts and ranks plus a handful
of divisions — rounded to 6dp at the end, DuckDB-replicable bit-for-bit.

Scale shape: ``ranking_auc`` is ONE global sort (Spark range-partitions
it; ties collapse to per-score groups before ranking so the rank table
is at most |distinct scores| rows); the other two are single aggregates
with map-side combine. Nothing is all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranking_auc(
    df: DataFrame,
    score_col: str,
    label_col: Column | str,
) -> DataFrame:
    """Exact ROC-AUC via the rank-sum identity:

        AUC = (R_pos - n_pos*(n_pos+1)/2) / (n_pos * n_neg)

    where ``R_pos`` is the sum of average ranks (ascending score, ties
    share the mean rank of their group) over the positive rows.

    Plan: collapse to per-(score) groups first — ONE groupBy(score) with
    counts of rows/positives — then compute each group's preceding-row
    count with the TWO-PHASE running sum (the windows.global_row_index
    discipline: range-partition by score, partition-local cumsum, P-row
    offset table broadcast back — no single-reducer global window), and
    the tie-averaged rank in closed form: groups occupying rows
    [c+1, c+n] have average rank c + (n+1)/2. Returns one row:
    (n_pos, n_neg, auc).
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    grouped = (
        df.select(F.col(score_col).alias("__s"), lab.cast("int").alias("__y"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__y").alias("__np"),
        )
    )
    n_part = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    g2 = (
        grouped.repartitionByRange(n_part, F.col("__s"))
        .sortWithinPartitions("__s")
        .select("*", F.spark_partition_id().alias("__pid"))
        # pin the partitioning: the row branch and the P-row offset branch
        # must read the SAME materialized exchange (AQE may re-plan an
        # unpinned ReusedExchange differently per consumer — the
        # global_row_index sf0.1 defect)
        .localCheckpoint(eager=False)
    )
    w_loc = (
        Window.partitionBy("__pid")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        g2.groupBy("__pid")
        .agg(F.sum("__n").alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        )
    )
    ranked = (
        g2.join(F.broadcast(offs), "__pid")
        .select(
            "__s",
            "__n",
            "__np",
            (
                F.coalesce(F.sum("__n").over(w_loc), F.lit(0)) + F.col("__off")
            ).alias("__before"),
        )
    )
    # average rank of every row in this score group
    avg_rank = F.col("__before") + (F.col("__n") + 1) / F.lit(2.0)
    return ranked.agg(
        F.sum("__np").cast("bigint").alias("n_pos"),
        (F.sum("__n") - F.sum("__np")).cast("bigint").alias("n_neg"),
        F.round(
            (
                F.sum(F.col("__np") * avg_rank)
                - (F.sum("__np") * (F.sum("__np") + 1)) / F.lit(2.0)
            )
            / (F.sum("__np") * (F.sum("__n") - F.sum("__np"))),
            6,
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: Column | str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability-diagram table: fixed-width score bins on [lo, hi]
    (values outside clamp to the edge bins), per-bin count, mean score,
    and observed positive rate. The calibration readout for any
    quality/classifier score. One map-side bin projection + one groupBy.
    Returns (bin, n, mean_score, positive_rate) for occupied bins."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    width = (hi - lo) / n_bins
    idx = F.floor(
        (F.col("__s") - F.lit(float(lo))) / F.lit(float(width))
    ).cast("int")
    return (
        df.select(
            F.col(score_col).cast("double").alias("__s"),
            lab.cast("int").alias("__y"),
        )
        .select(
            F.least(F.greatest(idx, F.lit(0)), F.lit(n_bins - 1)).alias("bin"),
            "__s",
            "__y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("__s"), 9).cast("decimal(20,9)"))
                .cast("decimal(38,9)")
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_score"),
            F.round(F.sum("__y").cast("double") / F.count(F.lit(1)), 6).alias(
                "positive_rate"
            ),
        )
        .orderBy("bin")
    )


def filter_agreement(
    df: DataFrame,
    flag_a: Column | str,
    flag_b: Column | str,
) -> DataFrame:
    """Cohen's kappa between two boolean filter decisions:

        kappa = (p_o - p_e) / (1 - p_e)

    with observed agreement ``p_o`` and chance agreement ``p_e`` from the
    marginals. Returns one row: the 2x2 confusion counts, raw agreement,
    and kappa (NULL when 1 - p_e == 0, i.e. both filters are constant).
    ONE aggregate with map-side combine — any scale."""
    a = (F.col(flag_a) if isinstance(flag_a, str) else flag_a).cast("int")
    b = (F.col(flag_b) if isinstance(flag_b, str) else flag_b).cast("int")
    c = df.select(a.alias("__a"), b.alias("__b")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__a") * F.col("__b")).cast("bigint").alias("n11"),
        F.sum(F.col("__a") * (1 - F.col("__b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("__a")) * F.col("__b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("__a")) * (1 - F.col("__b"))).cast("bigint").alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / n
    pe = (
        ((F.col("n11") + F.col("n10")) / n) * ((F.col("n11") + F.col("n01")) / n)
        + ((F.col("n01") + F.col("n00")) / n) * ((F.col("n10") + F.col("n00")) / n)
    )
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("agreement"),
        F.when(pe < 1.0, F.round((po - pe) / (1 - pe), 6)).alias("kappa"),
    )


def grouped_ranking_auc(
    df: DataFrame,
    score_col: str,
    label_col: Column | str,
    group_col: str,
) -> DataFrame:
    """Per-slice exact ROC-AUC — :func:`ranking_auc` partitioned by a
    group column (source, language, shard): the fairness readout that
    catches a quality filter scoring one slice well and another at
    chance before the filter gates a mixed corpus.

    Same rank-sum identity per group; ties collapse to per-(group,
    score) rows first, so the window state is |distinct scores in the
    group| and the running sum is a KEYED window (partitioned by group —
    parallel across groups, never a single-reducer global sort). AUC is
    NULL for degenerate slices (all-positive or all-negative).

    Returns ``(group, n_pos, n_neg, auc)`` ordered by group.
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    grouped = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(score_col).alias("__s"),
            lab.cast("int").alias("__y"),
        )
        .groupBy("__g", "__s")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__y").alias("__np"))
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = grouped.select(
        "__g",
        "__n",
        "__np",
        F.coalesce(F.sum("__n").over(w), F.lit(0)).alias("__before"),
    )
    avg_rank = F.col("__before") + (F.col("__n") + 1) / F.lit(2.0)
    per = ranked.groupBy("__g").agg(
        F.sum("__np").cast("bigint").alias("n_pos"),
        (F.sum("__n") - F.sum("__np")).cast("bigint").alias("n_neg"),
        F.sum(F.col("__np") * avg_rank).alias("__rpos"),
    )
    return per.select(
        F.col("__g").alias(group_col),
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                (
                    F.col("__rpos")
                    - (F.col("n_pos") * (F.col("n_pos") + 1)) / F.lit(2.0)
                )
                / (F.col("n_pos").cast("double") * F.col("n_neg")),
                6,
            ),
        ).alias("auc"),
    ).orderBy(group_col)


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: Column | str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Isotonic (PAV) calibration of a score against a boolean label,
    at the bin grain: the monotone recalibration map a curation team
    fits when a quality score ranks well (high AUC) but its raw values
    lie (reliability diagram off the diagonal). Platt's sibling with no
    parametric-shape assumption.

    The pool-adjacent-violators SOLUTION is computed in closed form via
    the minimax identity (Robertson-Wright-Dykstra):

        iso_i = max_{j <= i} min_{k >= i} wmean(y, bins j..k)

    — NOT the sequential pooling loop, so the whole fit is a bounded
    relational plan: bin prefix sums over the B-row bin table, the
    B^2 interval means from prefix differences, and a (i, j <= i <= k)
    range join folded by min-then-max. B is fixed and small (10-100);
    B^3 interval tuples cost nothing while events/documents never leave
    their one binning aggregate. Interval means round to 9dp; outputs
    to 6dp. The result is non-decreasing by construction.

    Returns ``(bin, n, mean_score, positive_rate, isotonic_rate)`` for
    occupied bins, ordered by bin.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    width = (hi - lo) / n_bins
    idx = F.floor(
        (F.col("__s") - F.lit(float(lo))) / F.lit(float(width))
    ).cast("int")
    bins = (
        df.select(
            F.col(score_col).cast("double").alias("__s"),
            lab.cast("int").alias("__y"),
        )
        .select(
            F.least(F.greatest(idx, F.lit(0)), F.lit(n_bins - 1)).alias(
                "bin"
            ),
            "__s",
            "__y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("sy"),
            F.round(
                F.sum(F.round(F.col("__s"), 9).cast("decimal(20,9)"))
                .cast("decimal(38,9)")
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_score"),
        )
    )
    # prefix sums over the occupied-bin table (B rows, bounded)
    w_pre = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "bin",
        "n",
        "sy",
        "mean_score",
        F.sum("n").over(w_pre).alias("cn"),
        F.sum("sy").over(w_pre).alias("cy"),
    )
    lohi = pre.select(
        F.col("bin").alias("__b"),
        F.col("cn").alias("__cn"),
        F.col("cy").alias("__cy"),
        (F.col("cn") - F.col("n")).alias("__pn"),
        (F.col("cy") - F.col("sy")).alias("__py"),
    )
    jj = lohi.select(
        F.col("__b").alias("j"), F.col("__pn").alias("pn_j"),
        F.col("__py").alias("py_j"),
    )
    kk = lohi.select(
        F.col("__b").alias("k"), F.col("__cn").alias("cn_k"),
        F.col("__cy").alias("cy_k"),
    )
    ivals = jj.join(F.broadcast(kk), F.col("j") <= F.col("k")).select(
        "j",
        "k",
        F.round(
            (F.col("cy_k") - F.col("py_j"))
            / (F.col("cn_k") - F.col("pn_j")),
            9,
        ).alias("m"),
    )
    pos = pre.select(F.col("bin").alias("i"))
    iso = (
        pos.join(
            F.broadcast(ivals),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("m").alias("inner"))
        .groupBy("i")
        .agg(F.round(F.max("inner"), 6).alias("isotonic_rate"))
    )
    return (
        pre.join(F.broadcast(iso), pre["bin"] == iso["i"])
        .select(
            "bin",
            "n",
            "mean_score",
            F.round(F.col("sy") / F.col("n"), 6).alias("positive_rate"),
            "isotonic_rate",
        )
        .orderBy("bin")
    )


def filter_yield_curve(
    df: DataFrame,
    score_col: str,
    weight_col: str | None = None,
    n_steps: int = 20,
) -> DataFrame:
    """Retention-vs-threshold curve for a quality filter: for each
    threshold ``t = i / n_steps`` (i in 0..n_steps), the fraction of
    documents — and of a weight column, typically tokens — that a
    ``score >= t`` filter keeps. The yield curve is what turns "pick a
    quality threshold" from a guess into a budget decision (keep 40% of
    tokens -> t = 0.62).

    Scale shape: one broadcast of the (n_steps+1)-row threshold grid,
    one conditional aggregate per threshold key — the scan reads the
    data once, the shuffle carries n_steps+1 keys of partials. All
    integer counts; fractions divide at the end (6dp).

    Returns ``(threshold, n_docs, n_kept, doc_yield, weight_total,
    weight_kept, weight_yield)`` ordered by threshold.
    """
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    base = df.select(
        F.col(score_col).cast("double").alias("__s"), w.alias("__w")
    )
    grid = df.sparkSession.range(0, n_steps + 1).select(
        F.round(F.col("id") / F.lit(float(n_steps)), 6).alias("threshold")
    )
    return (
        base.join(F.broadcast(grid), F.lit(True))
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("__s") >= F.col("threshold"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_kept"),
            F.sum("__w").cast("bigint").alias("weight_total"),
            F.sum(
                F.when(F.col("__s") >= F.col("threshold"), F.col("__w"))
                .otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("weight_kept"),
        )
        .select(
            "threshold",
            "n_docs",
            "n_kept",
            F.when(
                F.col("n_docs") > 0,
                F.round(F.col("n_kept") / F.col("n_docs"), 6),
            ).alias("doc_yield"),
            "weight_total",
            "weight_kept",
            F.when(
                F.col("weight_total") > 0,
                F.round(F.col("weight_kept") / F.col("weight_total"), 6),
            ).alias("weight_yield"),
        )
        .orderBy("threshold")
    )


def score_quantile_align(
    df: DataFrame,
    score_col: str,
    group_col: str,
    out_col: str = "score_pct",
) -> DataFrame:
    """Within-slice quantile normalization of a score: replace each row's
    score with its percent rank INSIDE its slice (source, shard,
    scorer-version), so a single global threshold means the same thing
    everywhere — the fix for per-slice scorer bias that
    :func:`grouped_ranking_auc` diagnoses ("source X's scorer runs 0.2
    hot, so a global 0.5 cut keeps its garbage and drops source Y's
    good middle").

    percent rank with tie-averaging: rows sharing a score get the mean
    of the ranks they occupy, scaled to [0, 1] by (n_group - 1) —
    matching the rank-sum convention of the AUC family, so a slice's
    AUC against any label is invariant under this transform. Degenerate
    single-row slices map to 0.5.

    Scale shape: ties collapse to per-(group, score) rows first, so the
    KEYED running-sum window state is |distinct scores in the slice|;
    the original frame joins back on (group, score) — no row-grain
    window, parallel across slices.

    Returns ``df`` with ``out_col`` appended (6dp).
    """
    grouped = (
        df.select(
            F.col(group_col).alias("__g"), F.col(score_col).alias("__s")
        )
        .groupBy("__g", "__s")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = grouped.groupBy("__g").agg(F.sum("__n").alias("__tot"))
    ranked = (
        grouped.select(
            "__g",
            "__s",
            (
                F.coalesce(F.sum("__n").over(w), F.lit(0))
                + (F.col("__n") + 1) / F.lit(2.0)
            ).alias("__avg_rank"),
        )
        .join(tot, "__g")
        .select(
            "__g",
            "__s",
            F.when(F.col("__tot") > 1,
                   F.round(
                       (F.col("__avg_rank") - 1)
                       / (F.col("__tot") - 1),
                       6,
                   ))
            .otherwise(F.lit(0.5))
            .alias(out_col),
        )
    )
    return df.join(
        ranked,
        (df[group_col] == ranked["__g"]) & (df[score_col] == ranked["__s"]),
    ).drop("__g", "__s")


def ndcg_at_k(
    df: DataFrame,
    score_col: str,
    gain_col: str,
    k: int = 10,
    group_col: str | None = None,
    id_col: str = "doc_id",
    exponential: bool = True,
) -> DataFrame:
    """Normalized discounted cumulative gain at ``k`` — THE graded
    ranking-quality metric (Järvelin & Kekäläinen 2002): how well the
    score orders items against their true gains, top-weighted by the
    1/log2(rank+1) discount. ``group_col`` scopes the metric per query /
    slice (NULL group column = one global row).

        DCG@k  = sum_{i<=k} (2^gain_i - 1) / log2(i + 1)   by score rank,
        (``exponential=False`` uses the linear-gain variant gain_i /
        log2(i+1) — required when gains are raw magnitudes rather than
        small relevance grades: 2^gain overflows past gain ~1000),
        IDCG@k = the same under the ideal (gain-sorted) order,
        nDCG   = DCG / IDCG   (NULL when IDCG = 0 — no positive gain).

    Ranks tie-break on (score DESC, id ASC) / (gain DESC, id ASC) — fully
    deterministic, engine-replayable; per-rank terms round to 9dp and
    DECIMAL-sum. Scale shape: two KEYED ranking windows (parallel across
    groups; k-bounded after the rank filter) + one keyed aggregate. The
    global case (``group_col=None``) does NOT funnel the corpus through
    a constant-partition window (ADVICE r7): each ranking is cut to its
    top-k first via orderBy().limit(k) — TakeOrderedAndProject — and
    ranked over the k-row result; n_items is a plain aggregate.

    Returns ``(group, n_items, dcg, idcg, ndcg)`` rounded to 6dp.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    num = (
        (F.pow(F.lit(2.0), F.col("__gain")) - 1.0)
        if exponential
        else F.col("__gain")
    )
    term = lambda r: F.round(  # noqa: E731
        num / F.log(2.0, F.col(r).cast("double") + 1.0), 9
    ).cast("decimal(30,9)")
    if group_col is None:
        base = df.select(
            F.col(score_col).alias("__s"),
            F.col(gain_col).cast("double").alias("__gain"),
            F.col(id_col).alias("__id"),
        )

        def _topk_sum(order_cols: list, out: str) -> DataFrame:
            topk = base.orderBy(*order_cols).limit(k)
            ranked = topk.select(
                "__gain",
                F.row_number().over(Window.orderBy(*order_cols)).alias("__r"),
            )
            return ranked.agg(
                F.sum(term("__r"))
                .cast("decimal(38,9)")
                .cast("double")
                .alias(out)
            )

        dcg = _topk_sum([F.desc("__s"), F.asc("__id")], "__dcg")
        idcg = _topk_sum([F.desc("__gain"), F.asc("__id")], "__idcg")
        n = base.agg(F.count(F.lit(1)).alias("n_items"))
        agg = (
            n.crossJoin(F.broadcast(dcg))
            .crossJoin(F.broadcast(idcg))
            .select(F.lit("<all>").alias("__g"), "n_items", "__dcg", "__idcg")
        )
        return agg.select(
            F.col("__g").alias("group"),
            "n_items",
            F.round(F.coalesce(F.col("__dcg"), F.lit(0.0)), 6).alias("dcg"),
            F.round(F.coalesce(F.col("__idcg"), F.lit(0.0)), 6).alias("idcg"),
            F.when(
                F.col("__idcg") > 0.0,
                F.round(F.col("__dcg") / F.col("__idcg"), 6),
            ).alias("ndcg"),
        )
    base = df.select(
        F.col(group_col).cast("string").alias("__g"),
        F.col(score_col).alias("__s"),
        F.col(gain_col).cast("double").alias("__gain"),
        F.col(id_col).alias("__id"),
    )
    w_score = Window.partitionBy("__g").orderBy(F.desc("__s"), F.asc("__id"))
    w_gain = Window.partitionBy("__g").orderBy(F.desc("__gain"), F.asc("__id"))
    ranked = base.select(
        "__g",
        "__gain",
        F.row_number().over(w_score).alias("__r"),
        F.row_number().over(w_gain).alias("__ri"),
    )
    agg = ranked.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.when(F.col("__r") <= k, term("__r")))
        .cast("decimal(38,9)")
        .cast("double")
        .alias("__dcg"),
        F.sum(F.when(F.col("__ri") <= k, term("__ri")))
        .cast("decimal(38,9)")
        .cast("double")
        .alias("__idcg"),
    )
    return agg.select(
        F.col("__g").alias("group"),
        "n_items",
        F.round(F.coalesce(F.col("__dcg"), F.lit(0.0)), 6).alias("dcg"),
        F.round(F.coalesce(F.col("__idcg"), F.lit(0.0)), 6).alias("idcg"),
        F.when(
            F.col("__idcg") > 0.0, F.round(F.col("__dcg") / F.col("__idcg"), 6)
        ).alias("ndcg"),
    ).orderBy("group")


def rbo_overlap(
    df: DataFrame,
    score_a: str,
    score_b: str,
    k: int = 20,
    p: float = 0.9,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rank-biased overlap between the two rankings induced by two score
    columns over the same items (Webber, Moffat & Zobel, TOIS 2010) —
    the top-weighted "do these two scorers agree where it matters"
    readout (e.g. exact-KNN order vs ANN order, old vs new quality
    model). Depth-d prefix overlap X_d = |A_d ∩ B_d| counted via
    max(rank_a, rank_b) <= d; reported at truncation depth ``k``:

        rbo_min = (1 - p) * sum_{d=1..k} p^(d-1) * X_d / d
        rbo_ext = rbo_min + p^k * X_k / k      (point extrapolation)

    Ranks tie-break on (score DESC, id ASC). Scale shape: each ranking
    is cut to its top-k FIRST via orderBy().limit(k) — Spark plans that
    as TakeOrderedAndProject (per-partition top-k + a k-row driver
    merge, no global sort) — and only then ranked with a window over
    the k-row result (ADVICE r7: ranking the full input under an
    unpartitioned window was a corpus-sized single-reducer sort). Plus
    one k-row depth-grid join; per-depth terms round to 9dp and
    DECIMAL-sum.

    Returns one row ``(k, p, overlap_at_k, rbo_min, rbo_ext)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0,1), got {p}")
    spark = df.sparkSession

    def _topk_ranked(score_col: str, rank_name: str) -> DataFrame:
        topk = (
            df.select(F.col(id_col).alias("__id"), F.col(score_col).alias("__s"))
            .orderBy(F.desc("__s"), F.asc("__id"))
            .limit(k)
        )
        return topk.select(
            "__id",
            F.row_number()
            .over(Window.orderBy(F.desc("__s"), F.asc("__id")))
            .alias(rank_name),
        )

    ra = _topk_ranked(score_a, "__ra")
    rb = _topk_ranked(score_b, "__rb")
    m = ra.join(rb, "__id").select(
        F.greatest("__ra", "__rb").alias("__m")
    )
    depths = spark.range(1, k + 1).select(F.col("id").cast("int").alias("d"))
    xd = (
        depths.join(F.broadcast(m), F.col("__m") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("__m").alias("x"))
    )
    terms = xd.select(
        "d",
        "x",
        F.round(
            F.pow(F.lit(float(p)), F.col("d") - 1)
            * F.col("x").cast("double")
            / F.col("d"),
            9,
        )
        .cast("decimal(30,9)")
        .alias("__t"),
    )
    agg = terms.agg(
        F.max(F.when(F.col("d") == k, F.col("x"))).alias("__xk"),
        (
            F.lit(1.0 - float(p))
            * F.sum("__t").cast("decimal(38,9)").cast("double")
        ).alias("__min"),
    )
    return agg.select(
        F.lit(k).alias("k"),
        F.lit(float(p)).alias("p"),
        F.col("__xk").cast("int").alias("overlap_at_k"),
        F.round("__min", 6).alias("rbo_min"),
        F.round(
            F.col("__min")
            + F.pow(F.lit(float(p)), F.lit(k)) * F.col("__xk") / F.lit(float(k)),
            6,
        ).alias("rbo_ext"),
    )


def selection_parity(
    df: DataFrame,
    keep_col: str,
    group_col: str,
) -> DataFrame:
    """Per-slice selection-rate parity audit: after any filter decides
    ``keep_col``, which slices (source, language, shard) are being
    disproportionately dropped — the demographic-parity readout for data
    curation (a filter that silently halves one language's keep rate is
    a corpus-composition change the dataset card must show).

    ``rate_ratio`` = slice keep rate / overall keep rate (the 80%-rule
    shape); NULL when the overall rate is 0. One contingency aggregate
    (map-side partial); outputs 6dp.

    Returns ``(<group_col>, n, n_kept, keep_rate, rate_ratio)``.
    """
    base = df.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("<null>")).alias(
            "__g"
        ),
        F.col(keep_col).cast("boolean").alias("__k"),
    )
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("__k"), 1).otherwise(0)).alias("n_kept"),
    )
    overall = per.agg(
        (F.sum("n_kept").cast("double") / F.sum("n")).alias("__or")
    )
    return (
        per.crossJoin(F.broadcast(overall))
        .select(
            F.col("__g").alias(group_col),
            "n",
            "n_kept",
            F.round(F.col("n_kept").cast("double") / F.col("n"), 6).alias(
                "keep_rate"
            ),
            F.when(
                F.col("__or") > 0.0,
                F.round(
                    (F.col("n_kept").cast("double") / F.col("n"))
                    / F.col("__or"),
                    6,
                ),
            ).alias("rate_ratio"),
        )
        .orderBy(group_col)
    )


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    alpha: float = 0.1,
    group_col: str | None = None,
) -> DataFrame:
    """Split-conformal calibration threshold (Vovk et al.; Angelopoulos
    & Bates 2023 tutorial form): the ceil((n+1)(1-alpha))-th smallest
    nonconformity score — predictions whose score is <= the threshold
    get coverage >= 1-alpha on exchangeable data. Per ``group_col``
    slice when given (per-source thresholds are mixture-shift insurance).

    The order statistic is exact and tie-safe (row_number among equal
    scores always lands on the same VALUE); the index clamps to n when
    (n+1)(1-alpha) exceeds it. One KEYED ranking window (parallel across
    slices) — threshold selection state is one slice's scores. The
    global case (``group_col=None``) uses the two-phase
    windows.global_row_index discipline instead of a constant-partition
    window (ADVICE r7: '<all>' funneled the whole input through one
    reducer); index assignment within a score-tie group is
    partition-dependent but every tied row carries the same VALUE, so
    the selected threshold is deterministic.

    Returns ``(group, n, q_index, threshold)``.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    if group_col is None:
        from nbdatatools_spark.operators.windows import global_row_index

        base = df.select(F.col(score_col).cast("double").alias("__s"))
        counts = base.agg(F.count(F.lit(1)).alias("n")).select(
            "n",
            F.least(
                F.ceil((F.col("n") + 1) * F.lit(1.0 - float(alpha))).cast(
                    "bigint"
                ),
                F.col("n"),
            ).alias("q_index"),
        )
        idx = global_row_index(base, ["__s"], out="__idx")
        return (
            idx.crossJoin(F.broadcast(counts))
            .where(F.col("__idx") == F.col("q_index") - 1)
            .select(
                F.lit("<all>").alias("group"),
                "n",
                "q_index",
                F.round("__s", 6).alias("threshold"),
            )
        )
    base = df.select(
        F.col(group_col).cast("string").alias("__g"),
        F.col(score_col).cast("double").alias("__s"),
    )
    w = Window.partitionBy("__g").orderBy(F.asc("__s"))
    counts = base.groupBy("__g").agg(F.count(F.lit(1)).alias("n"))
    qidx = F.least(
        F.ceil((F.col("n") + 1) * F.lit(1.0 - float(alpha))).cast("bigint"),
        F.col("n"),
    )
    ranked = base.select("__g", "__s", F.row_number().over(w).alias("__r"))
    return (
        ranked.join(counts.select("__g", "n", qidx.alias("q_index")), "__g")
        .where(F.col("__r") == F.col("q_index"))
        .select(
            F.col("__g").alias("group"),
            "n",
            "q_index",
            F.round("__s", 6).alias("threshold"),
        )
        .orderBy("group")
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    rater_col: str,
    category_col,
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971): chance-corrected agreement among a
    FIXED number of raters per item over categorical verdicts — the
    multi-rater generalization of filter_agreement's Cohen kappa, e.g.
    "do the C4 / Gopher / repetition filters agree on which documents to
    keep beyond what their base rates predict".

        P_i    = (sum_c n_ic^2 - n) / (n (n-1))     per item
        P_bar  = mean_i P_i
        P_e    = sum_c (sum_i n_ic / (N n))^2
        kappa  = (P_bar - P_e) / (1 - P_e)

    Every item must have the SAME rater count n (the statistic is
    undefined otherwise): items whose count differs from the global
    modal n are excluded and reported in ``n_items_dropped`` so ragged
    panels surface instead of silently biasing P_e.

    Returns ONE row ``(n_items, n_items_dropped, n_raters, n_categories,
    p_bar, p_e, kappa)`` at 6dp.

    Plan: one (item, category) count aggregate, one item-level reduce,
    one category-level reduce (bounded by the category alphabet), all
    DECIMAL-summed — map-side combinable, no windows, no pairs.
    """
    cat = (
        F.col(category_col) if isinstance(category_col, str) else category_col
    )
    base = df.select(
        F.col(item_col).alias("__i"),
        F.col(rater_col).alias("__r"),
        cat.cast("string").alias("__c"),
    ).where(F.col("__c").isNotNull()).localCheckpoint(eager=False)
    # base feeds BOTH the (item, category) counts and the rater census;
    # ic feeds the item reduce AND the category reduce — one
    # materialization each instead of re-evaluating the caller's
    # (typically regex-scored) rater union per consumer (round 10)
    ic = base.groupBy("__i", "__c").agg(
        F.count(F.lit(1)).alias("__n")
    ).localCheckpoint(eager=False)
    # distinct-rater count per item travels alongside the row count: a
    # duplicated rater masking a missing one reaches the modal row count
    # but must drop, loudly (the friedman_test/cochran_q fix)
    rdist = base.groupBy("__i").agg(F.count_distinct("__r").alias("__nd"))
    per_item = ic.groupBy("__i").agg(
        F.sum("__n").alias("__ni"),
        F.sum(F.col("__n") * F.col("__n")).alias("__sq"),
    ).join(rdist, "__i")
    # modal rater count decides the panel size; off-count items drop loudly
    modal = (
        per_item.groupBy("__ni")
        .agg(F.count(F.lit(1)).alias("__f"))
        .orderBy(F.col("__f").desc(), F.col("__ni").asc())
        .limit(1)
        .select(F.col("__ni").alias("__nr"))
    )
    tagged = per_item.crossJoin(F.broadcast(modal)).localCheckpoint(
        eager=False
    )
    ok = (F.col("__ni") == F.col("__nr")) & (F.col("__nd") == F.col("__ni"))
    kept = tagged.where(ok)
    dropped = tagged.where(~ok).agg(
        F.count(F.lit(1)).alias("n_items_dropped")
    )

    def _dsum(expr):
        return F.sum(F.round(expr, 9).cast("decimal(30,9)")).cast("double")

    nr = F.col("__nr").cast("double")
    item_agg = kept.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.max("__nr").alias("__nrr"),
        # ANSI guard: a 1-rater panel has no pairwise agreement (P_i is
        # undefined) — NULL the term instead of dividing by zero
        _dsum(
            F.when(
                F.col("__nr") > 1,
                (F.col("__sq").cast("double") - nr) / (nr * (nr - 1.0)),
            )
        ).alias("__sp"),
    )
    cat_counts = (
        ic.join(
            kept.select("__i"), "__i", "left_semi"
        )
        .groupBy("__c")
        .agg(F.sum("__n").alias("__nc"))
    )
    cat_agg = cat_counts.crossJoin(F.broadcast(item_agg)).agg(
        F.count(F.lit(1)).alias("n_categories"),
        _dsum(
            (
                F.col("__nc").cast("double")
                / (F.col("n_items") * F.col("__nrr")).cast("double")
            )
            * (
                F.col("__nc").cast("double")
                / (F.col("n_items") * F.col("__nrr")).cast("double")
            )
        ).alias("__pe"),
    )
    p_bar = F.col("__sp") / F.col("n_items").cast("double")
    p_e = F.col("__pe")
    kappa = F.when(p_e >= 1.0, F.lit(None).cast("double")).otherwise(
        (p_bar - p_e) / (1.0 - p_e)
    )
    return (
        item_agg.crossJoin(F.broadcast(cat_agg))
        .crossJoin(F.broadcast(dropped))
        .select(
            F.col("n_items").cast("bigint").alias("n_items"),
            F.col("n_items_dropped").cast("bigint").alias("n_items_dropped"),
            F.col("__nrr").cast("int").alias("n_raters"),
            F.col("n_categories").cast("int").alias("n_categories"),
            (F.round(p_bar, 6) + 0.0).alias("p_bar"),
            (F.round(p_e, 6) + 0.0).alias("p_e"),
            (F.round(kappa, 6) + 0.0).alias("kappa"),
        )
    )


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    label_col,
    n_bins: int = 10,
) -> DataFrame:
    """Brier score with the Murphy (1973) reliability / resolution /
    uncertainty decomposition over fixed [0,1] score bins — the single
    number that says whether a quality scorer's probabilities are USABLE
    as probabilities, split into the part that is miscalibration
    (reliability, lower better), the part that is discrimination
    (resolution, higher better), and the floor set by the base rate
    (uncertainty).

        brier       = mean (p_i - o_i)^2            (raw, unbinned)
        reliability = sum_k n_k (pbar_k - obar_k)^2 / N
        resolution  = sum_k n_k (obar_k - obar)^2 / N
        uncertainty = obar (1 - obar)

    The binned identity ``brier = reliability - resolution + uncertainty
    + within_bin_var`` is emitted with its residual term so the binning
    error is visible rather than silently folded in.

    Returns ONE row ``(n, base_rate, brier, reliability, resolution,
    uncertainty, within_bin_var)`` at 6dp.

    Plan: one row pass -> one n_bins-row aggregate -> one reduce; every
    sum is a round(9)-DECIMAL accumulator. Scores are clamped to [0,1];
    NULL scores/labels excluded.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    base = df.select(
        F.least(
            F.greatest(F.col(score_col).cast("double"), F.lit(0.0)), F.lit(1.0)
        ).alias("__p"),
        lab.cast("int").cast("double").alias("__o"),
    ).where(F.col("__p").isNotNull() & F.col("__o").isNotNull())
    bin_ = F.least(
        F.lit(n_bins - 1), F.floor(F.col("__p") * n_bins).cast("int")
    )

    def _dsum(expr):
        return F.sum(F.round(expr, 9).cast("decimal(30,9)")).cast("double")

    per_bin = base.groupBy(bin_.alias("__b")).agg(
        F.count(F.lit(1)).alias("__nk"),
        _dsum(F.col("__p")).alias("__sp"),
        _dsum(F.col("__o")).alias("__so"),
        _dsum((F.col("__p") - F.col("__o")) * (F.col("__p") - F.col("__o"))).alias(
            "__sq"
        ),
    )
    tot = per_bin.agg(
        F.sum("__nk").alias("__n"),
        _dsum(F.col("__so")).alias("__to"),
        _dsum(F.col("__sq")).alias("__tq"),
    )
    j = per_bin.crossJoin(F.broadcast(tot))
    nk = F.col("__nk").cast("double")
    pbar = F.col("__sp") / nk
    obar_k = F.col("__so") / nk
    obar = F.col("__to") / F.col("__n").cast("double")
    comps = j.agg(
        F.max("__n").alias("n"),
        F.max(F.round(F.col("__to") / F.col("__n").cast("double"), 9)).alias(
            "__obar"
        ),
        F.max(F.round(F.col("__tq") / F.col("__n").cast("double"), 9)).alias(
            "__brier"
        ),
        _dsum(nk * (pbar - obar_k) * (pbar - obar_k)).alias("__rel_n"),
        _dsum(nk * (obar_k - obar) * (obar_k - obar)).alias("__res_n"),
    )
    rel = F.col("__rel_n") / F.col("n").cast("double")
    res = F.col("__res_n") / F.col("n").cast("double")
    unc = F.col("__obar") * (1.0 - F.col("__obar"))
    return comps.select(
        F.col("n").cast("bigint").alias("n"),
        F.round("__obar", 6).alias("base_rate"),
        F.round("__brier", 6).alias("brier"),
        (F.round(rel, 6) + 0.0).alias("reliability"),
        (F.round(res, 6) + 0.0).alias("resolution"),
        (F.round(unc, 6) + 0.0).alias("uncertainty"),
        (F.round(F.col("__brier") - (rel - res + unc), 6) + 0.0).alias(
            "within_bin_var"
        ),
    )


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    category_col,
) -> DataFrame:
    """Krippendorff's alpha for NOMINAL data (Krippendorff 2004, the
    coincidence-matrix formulation): chance-corrected multi-rater
    agreement that — unlike ``fleiss_kappa`` — tolerates MISSING ratings
    (units rated by any subset of raters participate with whatever
    ratings they have; only single-rating units drop, reported in
    ``n_units_dropped``).

    With ``n_uc`` the count of category c in unit u and ``m_u`` its
    rating total (kept when >= 2):

        agree  = sum_u sum_c n_uc (n_uc - 1) / (m_u - 1)
        n      = sum_u m_u           (total pairable ratings)
        n_c    = sum_u n_uc          (category marginals)
        D_o    = (n - agree) / n
        D_e    = (n^2 - sum_c n_c^2) / (n (n - 1))
        alpha  = 1 - D_o / D_e       (NULL when D_e = 0: one category)

    Returns ONE row ``(n_units, n_units_dropped, n_ratings,
    n_categories, d_o, d_e, alpha)`` at 6dp.

    Plan: one (unit, category) count aggregate, one unit-grain reduce
    (agree terms 9dp-DECIMAL-summed — they are fractions), one
    category-grain reduce (bounded by the alphabet) — all map-side
    combinable, no windows, no pairs.
    """
    cat = (
        F.col(category_col) if isinstance(category_col, str) else category_col
    )
    base = df.select(
        F.col(unit_col).alias("__u"), cat.cast("string").alias("__c")
    ).where(F.col("__c").isNotNull())

    def _dsum(expr):
        return F.sum(F.round(expr, 9).cast("decimal(30,9)")).cast("double")

    # uc feeds the unit reduce AND the category marginals — one
    # materialization instead of two evaluations of the caller's rater
    # union (round 10, the fleiss/gwet shape)
    uc = base.groupBy("__u", "__c").agg(
        F.count(F.lit(1)).alias("__n")
    ).localCheckpoint(eager=False)
    per_u = uc.groupBy("__u").agg(
        F.sum("__n").alias("__m"),
        F.sum(F.col("__n") * (F.col("__n") - 1)).alias("__aa"),
    ).localCheckpoint(eager=False)
    kept = per_u.where(F.col("__m") >= 2)
    dropped = per_u.where(F.col("__m") < 2).agg(
        F.count(F.lit(1)).alias("n_units_dropped")
    )
    m = F.col("__m").cast("double")
    unit_agg = kept.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("__m").alias("__nn"),
        _dsum(F.col("__aa").cast("double") / (m - 1.0)).alias("__agree"),
    )
    nc = (
        uc.join(kept.select("__u"), "__u", "left_semi")
        .groupBy("__c")
        .agg(F.sum("__n").alias("__nc"))
    )
    cat_agg = nc.agg(
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(F.col("__nc") * F.col("__nc")).alias("__nc2"),
    )
    out = unit_agg.crossJoin(F.broadcast(cat_agg)).crossJoin(
        F.broadcast(dropped)
    )
    n = F.col("__nn").cast("double")
    d_o = (n - F.col("__agree")) / n
    d_e = (n * n - F.col("__nc2").cast("double")) / (n * (n - 1.0))
    alpha = F.when(d_e <= 0.0, F.lit(None).cast("double")).otherwise(
        1.0 - d_o / d_e
    )
    return out.select(
        F.col("n_units").cast("bigint").alias("n_units"),
        F.col("n_units_dropped").cast("bigint").alias("n_units_dropped"),
        F.col("__nn").cast("bigint").alias("n_ratings"),
        F.col("n_categories").cast("int").alias("n_categories"),
        (F.round(d_o, 6) + 0.0).alias("d_o"),
        (F.round(d_e, 6) + 0.0).alias("d_e"),
        (F.round(alpha, 6) + 0.0).alias("alpha"),
    )


def cochran_q(
    df: DataFrame,
    item_col: str,
    treatment_col: str,
    flag_col,
) -> DataFrame:
    """Cochran's Q test (Cochran 1950): do k BINARY treatments (filters,
    judges, pipeline variants) have the same pass rate on the same
    items — the k-treatment generalization of McNemar, the significance
    companion to fleiss_kappa's agreement magnitude:

        Q = k(k-1) * sum_j (C_j - T/k)^2 / (k T - sum_i R_i^2)

    with C_j the per-treatment success totals, R_i the per-item success
    totals, T the grand total. Items must carry all k treatments;
    off-count items are dropped loudly (``n_items_dropped``). Q is
    asymptotically chi-square with k-1 dof.

    Returns ONE row ``(n_items, n_items_dropped, k_treatments, q_stat,
    dof)`` at 6dp (NULL q when the denominator is 0 — all items
    unanimous).

    Plan: one (item) reduce + one (treatment) reduce over a 0/1
    projection — map-side combinable, state bounded by items/treatments.
    """
    flag = (F.col(flag_col) if isinstance(flag_col, str) else flag_col).cast(
        "int"
    )
    # materialize the 0/1 projection once (optimization round 10, the
    # friedman_test shape): base feeds the k-census action, the
    # per-item reduce and the kept semi-join — the caller's flag
    # expression (typically a regex quality score) otherwise
    # re-evaluates from the scan three times
    base = df.select(
        F.col(item_col).alias("__i"),
        F.col(treatment_col).alias("__t"),
        flag.alias("__f"),
    ).where(F.col("__f").isNotNull()).localCheckpoint(eager=False)
    k_all = base.select("__t").distinct().count()
    # gate on DISTINCT treatments AND raw rows (the friedman_test fix):
    # a duplicated treatment masking a missing one must drop, loudly
    per_item = base.groupBy("__i").agg(
        F.count(F.lit(1)).alias("__k"),
        F.count_distinct("__t").alias("__kd"),
        F.sum("__f").alias("__r"),
    ).localCheckpoint(eager=False)
    ok = (F.col("__k") == k_all) & (F.col("__kd") == k_all)
    kept_items = per_item.where(ok)
    dropped = per_item.where(~ok).agg(
        F.count(F.lit(1)).alias("n_items_dropped")
    )
    kept = base.join(kept_items.select("__i"), "__i", "left_semi")

    def _dsum(expr):
        return F.sum(F.round(expr, 9).cast("decimal(30,9)")).cast("double")

    cols = kept.groupBy("__t").agg(F.sum("__f").alias("__c"))
    rows_ = kept_items.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("__r").alias("__tt"),
        F.sum(F.col("__r") * F.col("__r")).alias("__rr"),
    )
    colagg = cols.crossJoin(F.broadcast(rows_)).agg(
        F.max("n_items").alias("n_items"),
        F.max("__tt").alias("__t2"),
        F.max("__rr").alias("__r2"),
        F.count(F.lit(1)).alias("__kk"),
        _dsum(
            (F.col("__c").cast("double") - F.col("__tt").cast("double") / k_all)
            * (F.col("__c").cast("double") - F.col("__tt").cast("double") / k_all)
        ).alias("__num"),
    )
    kk = F.col("__kk").cast("double")
    den = kk * F.col("__t2").cast("double") - F.col("__r2").cast("double")
    q = F.when(den <= 0.0, F.lit(None).cast("double")).otherwise(
        kk * (kk - 1.0) * F.col("__num") / den
    )
    return colagg.crossJoin(F.broadcast(dropped)).select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("n_items_dropped").cast("bigint").alias("n_items_dropped"),
        F.col("__kk").cast("int").alias("k_treatments"),
        (F.round(q, 6) + 0.0).alias("q_stat"),
        (F.col("__kk") - 1).cast("int").alias("dof"),
    )


def mcnemar_test(
    df: DataFrame,
    flag_a: Column | str,
    flag_b: Column | str,
) -> DataFrame:
    """McNemar's paired-proportion test (McNemar 1947, continuity
    corrected): do two binary filters DISAGREE symmetrically — the
    significance question behind filter_agreement's kappa (two filters
    can agree 95% of the time yet one systematically passes documents
    the other kills; the b vs c asymmetry is that signal):

        chi2 = (|b - c| - 1)^2 / (b + c)

    over the discordant cells b = a-pass/b-fail, c = a-fail/b-pass.
    Returns ONE row ``(n, n11, n10, n01, n00, chi2, p_value)`` — chi2
    NULL when b + c = 0 (no disagreement at all); p from the df=1
    chi-square via erf(sqrt(chi2/2)) (closed form, the A-S discipline,
    4dp). ONE aggregate with map-side combine."""
    import math as _math

    from nbdatatools_spark.operators.stats import _erf

    a = (F.col(flag_a) if isinstance(flag_a, str) else flag_a).cast("int")
    b = (F.col(flag_b) if isinstance(flag_b, str) else flag_b).cast("int")
    c = df.select(a.alias("__a"), b.alias("__b")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__a") * F.col("__b")).cast("bigint").alias("n11"),
        F.sum(F.col("__a") * (1 - F.col("__b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("__a")) * F.col("__b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("__a")) * (1 - F.col("__b"))).cast("bigint").alias("n00"),
    )
    disc = (F.col("n10") + F.col("n01")).cast("double")
    diff = F.abs((F.col("n10") - F.col("n01")).cast("double")) - 1.0
    chi2 = F.when(disc <= 0.0, F.lit(None).cast("double")).otherwise(
        F.greatest(F.lit(0.0), diff) * F.greatest(F.lit(0.0), diff) / disc
    )
    # df=1 chi-square survival: P(X > x) = 1 - erf(sqrt(x/2))
    p = F.round(1.0 - _erf(F.sqrt(chi2 / 2.0)), 4) + 0.0
    return c.select(
        "n", "n11", "n10", "n01", "n00",
        (F.round(chi2, 6) + 0.0).alias("chi2"),
        p.alias("p_value"),
    )


def temperature_scaling(
    df: DataFrame,
    score_col: str,
    label_col: Column | str,
    iterations: int = 5,
    eps: float = 1e-6,
) -> DataFrame:
    """Temperature scaling (Guo et al. 2017) of a probability score:
    fit the single scalar that recalibrates p' = sigmoid(logit(p) / T)
    by Newton's method on the logistic NLL — the one-parameter,
    accuracy-preserving recalibrator that fixes the systematic over- /
    under-confidence ``calibration_bins`` diagnoses and
    ``isotonic_calibration`` fixes non-parametrically (isotonic can
    overfit small slices; temperature cannot — it is one number).

    Parameterized as beta = 1/T (p' = sigmoid(beta * l), l = clamped
    9dp logit): each Newton step is the closed-form logistic-regression
    update beta -= sum((p'-y) l) / sum(p'(1-p') l^2). The loop is a
    FIXED ``iterations``-deep declarative chain — each step cross-joins
    the previous ONE-ROW scalar frame back over the data (the isotonic
    bounded-fold discipline; no driver round-trips, no collect), so the
    whole fit is one Catalyst plan with ``iterations`` passes over the
    rows. Newton on this 1-D strictly-convex objective converges to
    machine precision in ~4 steps for any realistic score column.

    Exactness: logits and all per-row gradient/Hessian/NLL terms are
    9dp-rounded and DECIMAL-summed; beta is re-rounded to 9dp after
    every step, so an oracle replays the entire optimization
    bit-for-bit. A degenerate step (Hessian sum 0: constant labels or
    all-zero logits) keeps the previous beta.

    Returns ONE row ``(n, n_pos, beta, temperature, nll_before,
    nll_after)`` at 6dp — temperature > 1 means the raw score was
    overconfident, < 1 underconfident; nll_after <= nll_before up to
    the 9dp trail by convexity.

    Scale shape: ``iterations + 2`` full-corpus aggregate passes, each
    map-side-combinable into a one-row frame; every join is a scalar
    crossJoin (broadcast by size). Nothing corpus-sized shuffles.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    s_clamped = F.least(
        F.greatest(F.col(score_col).cast("double"), F.lit(float(eps))),
        F.lit(1.0 - float(eps)),
    )
    # materialize (logit, label) ONCE (optimization round 10, guide
    # §1.2/§5): the Newton chain makes iterations+2 passes over these
    # rows — without the checkpoint each pass re-evaluated the caller's
    # score expression (typically a regex-heavy quality score over raw
    # text) from the scan up; with it the passes re-read two narrow
    # columns. Values unchanged: __l is 9dp-rounded before storage.
    rows = df.select(
        F.round(F.log(s_clamped / (1.0 - s_clamped)), 9).alias("__l"),
        lab.cast("int").alias("__y"),
    ).localCheckpoint(eager=False)

    def _dsum(expr):
        return (
            F.sum(F.round(expr, 9).cast("decimal(30,9)"))
            .cast("decimal(38,9)")
            .cast("double")
        )

    def _p(beta):
        return 1.0 / (1.0 + F.exp(-beta * F.col("__l")))

    def _nll_sum(beta):
        p = _p(beta)
        pc = F.least(
            F.greatest(p, F.lit(1e-12)), F.lit(1.0 - 1e-12)
        )
        return _dsum(
            -(
                F.col("__y") * F.log(pc)
                + (1 - F.col("__y")) * F.log(1.0 - pc)
            )
        )

    # beta_0 = 1.0 (T = 1: the identity calibration)
    beta_f = rows.agg(F.lit(1.0).alias("__b"))
    for _ in range(iterations):
        p = _p(F.col("__b"))
        step = rows.crossJoin(F.broadcast(beta_f)).agg(
            F.first("__b").alias("__b0"),
            _dsum((p - F.col("__y")) * F.col("__l")).alias("__g"),
            _dsum(p * (1.0 - p) * F.col("__l") * F.col("__l")).alias("__h"),
        )
        beta_f = step.select(
            F.when(
                F.col("__h") > 0.0,
                F.round(F.col("__b0") - F.col("__g") / F.col("__h"), 9),
            )
            .otherwise(F.col("__b0"))
            .alias("__b")
        )
    base = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").cast("bigint").alias("n_pos"),
        _nll_sum(F.lit(1.0)).alias("__nb"),
    )
    fit = rows.crossJoin(F.broadcast(beta_f)).agg(
        F.first("__b").alias("__bf"),
        _nll_sum(F.col("__b")).alias("__na"),
    )
    return base.crossJoin(F.broadcast(fit)).select(
        F.col("n").cast("bigint").alias("n"),
        "n_pos",
        (F.round("__bf", 6) + 0.0).alias("beta"),
        (
            F.round(
                F.when(F.col("__bf") != 0.0, 1.0 / F.col("__bf")), 6
            )
            + 0.0
        ).alias("temperature"),
        (F.round(F.col("__nb") / F.col("n"), 6) + 0.0).alias("nll_before"),
        (F.round(F.col("__na") / F.col("n"), 6) + 0.0).alias("nll_after"),
    )


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: Column | str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    group_col: str | None = None,
) -> DataFrame:
    """Expected / Maximum Calibration Error (Naeini et al. 2015; the
    binned summary Guo et al. 2017 popularized): ECE = sum_b (n_b/N) *
    |acc_b - conf_b| and MCE = max_b |acc_b - conf_b| over the same
    fixed-width score bins as ``calibration_bins`` — the ONE-NUMBER
    calibration readout that closes the family (bins = the diagnostic
    table, ECE = its scalar, temperature/isotonic = the fixes; re-run
    ECE after either to show the improvement).

    Returns ONE row ``(n, n_bins_occupied, ece, mce)`` at 6dp — or,
    with ``group_col``, one row per slice ``(group, n,
    n_bins_occupied, ece, mce)`` ordered by group: the sliced
    calibration audit (a scorer can be globally calibrated while badly
    mis-calibrated on individual slices — the per-source sibling of
    doc_sliced_auc).

    Exactness: per-bin confidence uses the DECIMAL sum of 9dp-rounded
    scores; the per-bin |acc - conf| gap is rounded to 9dp before the
    n_b-weighted DECIMAL reduction, so an oracle replays both levels.

    Scale shape: one map-side bin projection + one (group x n_bins)-row
    groupBy + one (group)-grain reduce — the calibration_bins bill
    exactly.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    width = (hi - lo) / n_bins
    idx = F.floor(
        (F.col("__s") - F.lit(float(lo))) / F.lit(float(width))
    ).cast("int")
    gcols = [F.col(group_col).alias("__g")] if group_col else []
    gkeys = ["__g"] if group_col else []
    per_bin = (
        df.select(
            *gcols,
            F.col(score_col).cast("double").alias("__s"),
            lab.cast("int").alias("__y"),
        )
        .select(
            *gkeys,
            F.least(F.greatest(idx, F.lit(0)), F.lit(n_bins - 1)).alias(
                "bin"
            ),
            "__s",
            "__y",
        )
        .groupBy(*gkeys, "bin")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.round(F.col("__s"), 9).cast("decimal(20,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            .alias("__ss"),
            F.sum("__y").alias("__ys"),
        )
        .select(
            *gkeys,
            "__n",
            F.round(
                F.abs(
                    F.col("__ys") / F.col("__n")
                    - F.col("__ss") / F.col("__n")
                ),
                9,
            ).alias("__gap"),
        )
    )
    aggs = [
        F.sum("__n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("int").alias("n_bins_occupied"),
        (
            F.round(
                F.sum(
                    F.round(F.col("__gap") * F.col("__n"), 9).cast(
                        "decimal(30,9)"
                    )
                )
                .cast("decimal(38,9)")
                .cast("double")
                / F.sum("__n"),
                6,
            )
            + 0.0
        ).alias("ece"),
        (F.round(F.max("__gap"), 6) + 0.0).alias("mce"),
    ]
    if group_col:
        return (
            per_bin.groupBy("__g")
            .agg(*aggs)
            .select(F.col("__g").alias(group_col), "n",
                    "n_bins_occupied", "ece", "mce")
            .orderBy(group_col)
        )
    return per_bin.agg(*aggs)


def score_psi(
    baseline: DataFrame,
    current: DataFrame,
    score_col: str,
    group_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Per-slice Population Stability Index on a SCORE column between
    two snapshots — the calibration-drift monitor for a deployed
    quality classifier (the temporal composite the score_quantile_align
    family was missing): embedding_psi watches the representation
    drift, THIS watches the decision variable itself, per slice, so a
    retrained or decaying scorer shows up as PSI > 0.25 on the slices
    it moved (0.1-0.25 drifting, < 0.1 stable — the standard bands).

        PSI_g = sum_bins (p_b - q_b) * ln(p_b / q_b)

    over ``n_bins`` fixed-width bins on [lo, hi] (out-of-range scores
    clamp to the edge bins; NULL scores drop), add-one smoothing on
    counts so empty bins stay defined, full per-group bin grid (a bin
    empty on BOTH sides still contributes its smoothing term — the
    embedding_psi convention).

    Returns ``(group, n_baseline, n_current, psi)`` at 6dp ordered by
    group; groups present in only one snapshot still report (their
    missing side is the smoothed-uniform reference).

    100-TB shape: two map-side bin projections union (no join) into
    ONE (group, bin) groupBy with conditional counts, then a
    group-grain rollup over the exploded n_bins grid. The (p-q)*ln(p/q)
    terms are rounded to 9dp and DECIMAL-summed (order-invariant).
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / n_bins

    def binned(df: DataFrame, tag: int) -> DataFrame:
        x = F.col(score_col).cast("double")
        idx = F.floor((x - F.lit(float(lo))) / F.lit(float(width))).cast(
            "int"
        )
        clamped = F.least(F.greatest(idx, F.lit(0)), F.lit(n_bins - 1))
        return df.where(F.col(score_col).isNotNull()).select(
            F.col(group_col).alias("__g"),
            clamped.alias("__bin"),
            F.lit(tag).alias("__side"),
        )

    counts = (
        binned(baseline, 0)
        .unionByName(binned(current, 1))
        .groupBy("__g", "__bin")
        .agg(
            F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).alias(
                "__cb"
            ),
            F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias(
                "__cc"
            ),
        )
    )
    totals = counts.groupBy("__g").agg(
        F.sum("__cb").alias("__nb"), F.sum("__cc").alias("__nc")
    )
    grid = totals.select(
        "__g",
        "__nb",
        "__nc",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("__bin"),
    )
    full = grid.join(counts, ["__g", "__bin"], "left").na.fill(
        0, ["__cb", "__cc"]
    )
    p = (F.col("__cb") + 1).cast("double") / (F.col("__nb") + F.lit(n_bins))
    q = (F.col("__cc") + 1).cast("double") / (F.col("__nc") + F.lit(n_bins))
    term = F.round((p - q) * F.log(p / q), 9).cast("decimal(20,9)")
    return (
        full.groupBy("__g")
        .agg(
            F.round(
                F.sum(term).cast("decimal(38,9)").cast("double"), 6
            ).alias("psi"),
            F.sum("__cb").cast("bigint").alias("n_baseline"),
            F.sum("__cc").cast("bigint").alias("n_current"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_baseline",
            "n_current",
            "psi",
        )
        .orderBy(group_col)
    )


def gwet_ac1(
    df: DataFrame,
    item_col: str,
    rater_col: str,
    category_col,
) -> DataFrame:
    """Gwet's AC1 (Gwet 2008): chance-corrected multi-rater nominal
    agreement that stays stable under skewed prevalence — the known
    paradox of :func:`fleiss_kappa` (two raters agreeing 95% of the
    time on a 95/5 label split can score kappa ~ 0; AC1 reads ~0.9) —
    and, unlike Fleiss, defined for RAGGED panels (any item with >= 2
    distinct raters contributes; no modal-count requirement):

        pa   = mean_i sum_c n_ic (n_ic - 1) / (r_i (r_i - 1))
        pi_c = mean_i n_ic / r_i
        pe   = (1 / (C - 1)) * sum_c pi_c (1 - pi_c)
        AC1  = (pa - pe) / (1 - pe)

    Items whose row count differs from their DISTINCT rater count (a
    duplicated rater masking a missing one — the friedman/fleiss gate)
    or with < 2 raters drop loudly into ``n_items_dropped``.

    Returns ONE row ``(n_items, n_items_dropped, n_categories, pa, pe,
    ac1)`` at 6dp; a single-category panel reports pa = 1 with NULL
    pe/ac1 (the C - 1 denominator is undefined).

    Plan: one (item, category) count aggregate, one item-grain reduce,
    one category-grain reduce (bounded by the category alphabet) — all
    9dp-DECIMAL-summed, map-side combinable, no windows, no pairs.
    """
    cat = (
        F.col(category_col) if isinstance(category_col, str) else category_col
    )
    base = df.select(
        F.col(item_col).alias("__i"),
        F.col(rater_col).alias("__r"),
        cat.cast("string").alias("__c"),
    ).where(F.col("__c").isNotNull()).localCheckpoint(eager=False)
    # base feeds BOTH the (item, category) counts and the rater census;
    # ic feeds the item reduce AND the category reduce — one
    # materialization each instead of re-evaluating the caller's
    # (typically regex-scored) rater union per consumer (round 10)
    ic = base.groupBy("__i", "__c").agg(
        F.count(F.lit(1)).alias("__n")
    ).localCheckpoint(eager=False)
    rdist = base.groupBy("__i").agg(F.count_distinct("__r").alias("__nd"))
    per_item = (
        ic.groupBy("__i")
        .agg(
            F.sum("__n").alias("__ri"),
            F.sum(F.col("__n") * (F.col("__n") - 1)).alias("__agr"),
        )
        .join(rdist, "__i")
        .localCheckpoint(eager=False)
    )
    ok = (F.col("__nd") == F.col("__ri")) & (F.col("__ri") >= 2)
    kept = per_item.where(ok)
    dropped = per_item.where(~ok).agg(
        F.count(F.lit(1)).alias("n_items_dropped")
    )

    def _dsum(expr):
        return F.sum(F.round(expr, 9).cast("decimal(30,9)")).cast(
            "decimal(38,9)"
        ).cast("double")

    ri = F.col("__ri").cast("double")
    item_agg = kept.agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum(F.col("__agr").cast("double") / (ri * (ri - 1.0))).alias(
            "__sp"
        ),
    )
    shares = (
        ic.join(kept.select("__i", "__ri"), "__i")
        .groupBy("__c")
        .agg(
            _dsum(
                F.col("__n").cast("double") / F.col("__ri").cast("double")
            ).alias("__sc")
        )
    )
    pi_c = F.col("__sc") / F.col("n_items").cast("double")
    cat_agg = shares.crossJoin(F.broadcast(item_agg)).agg(
        F.count(F.lit(1)).alias("n_categories"),
        _dsum(pi_c * (F.lit(1.0) - pi_c)).alias("__spq"),
    )
    pa = F.col("__sp") / F.col("n_items").cast("double")
    pe = F.when(
        F.col("n_categories") > 1,
        F.col("__spq") / (F.col("n_categories") - 1).cast("double"),
    )
    ac1 = F.when(
        pe.isNotNull() & (pe < 1.0), (pa - pe) / (F.lit(1.0) - pe)
    )
    return (
        item_agg.crossJoin(F.broadcast(cat_agg))
        .crossJoin(F.broadcast(dropped))
        .select(
            F.col("n_items").cast("bigint").alias("n_items"),
            F.col("n_items_dropped").cast("bigint").alias(
                "n_items_dropped"
            ),
            F.col("n_categories").cast("int").alias("n_categories"),
            (F.round(pa, 6) + 0.0).alias("pa"),
            (F.round(pe, 6) + 0.0).alias("pe"),
            (F.round(ac1, 6) + 0.0).alias("ac1"),
        )
    )


def auc_delong_ci(
    df: DataFrame,
    score_col: str,
    label_col,
    z: float = 1.959963984540054,
) -> DataFrame:
    """ROC-AUC with the DeLong variance and normal CI (DeLong, DeLong &
    Clarke-Pearson 1988, midrank formulation per Sun & Xu 2014) — the
    error bar :func:`ranking_auc` was missing: an AUC of 0.71 on 200
    docs and on 2M docs are different claims, and eval reports need
    the interval, not the point.

    Placement values at the (score)-group grain (all tied rows share
    one value): for positives ``V10 = (R - R+) / n0`` and for
    negatives ``V01 = 1 - (R - R-) / n1``, with R / R+ / R- the
    tie-averaged midranks over the combined / positive-only /
    negative-only samples. AUC = mean V10; s10/s01 = sample variances;
    SE = sqrt(s10/n1 + s01/n0); CI = AUC +/- z*SE.

    Returns ONE row ``(n_pos, n_neg, auc, se, ci_lo, ci_hi)`` at 6dp;
    panels with < 2 positives or < 2 negatives report NULL se/ci (the
    sample variance is undefined), and degenerate single-class panels
    report NULL auc.

    Plan: ONE groupBy(score) collapse, then the ranking_auc two-phase
    partition-offset running sums (one exchange materialized once —
    no single-reducer window) carrying all three cumulative counts;
    placement values are 9dp-rounded and DECIMAL-summed (count-
    weighted), variances computed from the rendered sums in one fixed
    double expression both engines replay.
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    grouped = (
        df.select(F.col(score_col).alias("__s"), lab.cast("int").alias("__y"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__y").alias("__np"),
        )
        .withColumn("__nn", F.col("__n") - F.col("__np"))
    )
    n_part = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    g2 = (
        grouped.repartitionByRange(n_part, F.col("__s"))
        .sortWithinPartitions("__s")
        .select("*", F.spark_partition_id().alias("__pid"))
        .localCheckpoint(eager=False)
    )
    w_loc = (
        Window.partitionBy("__pid")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        g2.groupBy("__pid")
        .agg(
            F.sum("__n").alias("__cn"),
            F.sum("__np").alias("__cp"),
            F.sum("__nn").alias("__cm"),
        )
        .select(
            "__pid",
            F.coalesce(F.sum("__cn").over(w_off), F.lit(0)).alias("__offn"),
            F.coalesce(F.sum("__cp").over(w_off), F.lit(0)).alias("__offp"),
            F.coalesce(F.sum("__cm").over(w_off), F.lit(0)).alias("__offm"),
        )
    )
    ranked = g2.join(F.broadcast(offs), "__pid").select(
        "__s",
        "__n",
        "__np",
        "__nn",
        (F.coalesce(F.sum("__n").over(w_loc), F.lit(0)) + F.col("__offn")).alias("__ba"),
        (F.coalesce(F.sum("__np").over(w_loc), F.lit(0)) + F.col("__offp")).alias("__bp"),
        (F.coalesce(F.sum("__nn").over(w_loc), F.lit(0)) + F.col("__offm")).alias("__bm"),
    )
    totals = ranked.agg(
        F.sum("__np").cast("bigint").alias("__n1"),
        F.sum("__nn").cast("bigint").alias("__n0"),
    )
    r_all = F.col("__ba") + (F.col("__n") + 1) / F.lit(2.0)
    r_pos = F.col("__bp") + (F.col("__np") + 1) / F.lit(2.0)
    r_neg = F.col("__bm") + (F.col("__nn") + 1) / F.lit(2.0)
    n0d = F.col("__n0").cast("double")
    n1d = F.col("__n1").cast("double")
    # ANSI guard: a single-class panel (n0 or n1 = 0) must not divide —
    # the final when() NULLs auc/se anyway
    v10 = F.round(
        F.when(n0d > 0.0, (r_all - r_pos) / n0d).otherwise(F.lit(0.0)), 9
    )
    v01 = F.round(
        F.when(n1d > 0.0, F.lit(1.0) - (r_all - r_neg) / n1d).otherwise(
            F.lit(0.0)
        ),
        9,
    )

    def _dsum(expr):
        return F.sum(expr.cast("decimal(30,9)")).cast(
            "decimal(38,9)"
        ).cast("double")

    sums = ranked.crossJoin(F.broadcast(totals)).agg(
        F.max("__n1").alias("n_pos"),
        F.max("__n0").alias("n_neg"),
        _dsum(F.col("__np") * v10).alias("__s10"),
        _dsum(F.col("__np") * F.round(v10 * v10, 9)).alias("__q10"),
        _dsum(F.col("__nn") * v01).alias("__s01"),
        _dsum(F.col("__nn") * F.round(v01 * v01, 9)).alias("__q01"),
    )
    n1 = F.col("n_pos").cast("double")
    n0 = F.col("n_neg").cast("double")
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("__s10") / n1,
    )
    s10 = (F.col("__q10") - n1 * auc * auc) / (n1 - 1.0)
    s01 = (F.col("__q01") - n0 * (F.col("__s01") / n0) * (F.col("__s01") / n0)) / (
        n0 - 1.0
    )
    se = F.when(
        (F.col("n_pos") > 1) & (F.col("n_neg") > 1),
        F.sqrt(
            F.greatest(s10, F.lit(0.0)) / n1
            + F.greatest(s01, F.lit(0.0)) / n0
        ),
    )
    return sums.select(
        "n_pos",
        "n_neg",
        (F.round(auc, 6) + 0.0).alias("auc"),
        (F.round(se, 6) + 0.0).alias("se"),
        (F.round(auc - F.lit(float(z)) * se, 6) + 0.0).alias("ci_lo"),
        (F.round(auc + F.lit(float(z)) * se, 6) + 0.0).alias("ci_hi"),
    )
