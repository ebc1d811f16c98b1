"""Distribution-comparison hypothesis tests (SURVEY §7.8 training-data
extension): the nonparametric readouts a curation team runs before
trusting that two slices of a corpus (variants, sources, time windows)
actually differ — rank tests that survive heavy-tailed metrics where the
t-test's normality assumption is junk.

- ``mann_whitney_u``: two-sample rank-sum test per group (Mann & Whitney
  1947) with tie-corrected normal approximation.
- ``kruskal_wallis``: k-sample rank test per group (Kruskal & Wallis
  1952), tie-corrected H.
- ``brown_forsythe``: equality-of-variance F test on median-centered
  absolute deviations (Brown & Forsythe 1974) — the robust Levene.
- ``spearman_corr``: rank correlation per group via average ranks.
- ``mann_kendall``: monotone-trend test over grouped, date-grain series
  (Mann 1945 / Kendall 1975), tie-corrected variance.
- ``bh_adjust``: Benjamini-Hochberg step-up FDR correction over a
  BOUNDED hypothesis family (one row per already-aggregated test).
- ``two_sample_distance``: RBF-kernel MMD^2 (Gretton et al. 2012) and
  energy distance (Szekely & Rizzo 2004) between two deterministic
  md5-ordered samples — the distribution-shift readout for embeddings.

Exactness: rank tables reduce to integer counts (average ranks are exact
.5 multiples), sums ride round(9)-DECIMAL accumulators, z p-values use
the Abramowitz-Stegun erf (the ks/ab_test discipline) at 4dp; everything
is DuckDB-replicable bit-for-bit.

Scale shape: average ranks come from per-(group, value) collapsed count
tables indexed with the TWO-PHASE running sum (the
windows.global_row_index / ranking_auc discipline — range-partition,
partition-local cumsum, P-row offset table broadcast back; no
single-reducer data-sized window). Mann-Kendall's pairwise join is
O(n^2) WITHIN each group and intended for date-grain series (the
theil_sen convention). ``bh_adjust``'s family-sized windows run over an
aggregate output (one row per hypothesis), never over row-level data.
``two_sample_distance`` is a TakeOrdered sample regardless of corpus
size; its (2S)^2 pair block is a bounded-frame nested-loop join (the
embedding_isotropy convention).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dsum(expr):
    """Order-invariant float sum: round(9) -> DECIMAL(30,9) accumulate."""
    return F.sum(F.round(expr, 9).cast("decimal(30,9)")).cast("double")


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf as a Column expr (|err| < 1.5e-7)."""
    sign = F.when(x < 0, -1.0).otherwise(1.0)
    ax = F.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = (
        0.254829592 * t
        - 0.284496736 * F.pow(t, 2)
        + 1.421413741 * F.pow(t, 3)
        - 1.453152027 * F.pow(t, 4)
        + 1.061405429 * F.pow(t, 5)
    )
    return sign * (1.0 - poly * F.exp(-ax * ax))


def _two_sided_p(z):
    """Two-sided normal p-value at 4dp (exp's last ulp is libm-dependent,
    the ks/ab_test rounding discipline)."""
    return F.round(1.0 - _erf(F.abs(z) / F.lit(math.sqrt(2.0))), 4) + 0.0


def grouped_avg_ranks(
    df: DataFrame,
    group_col: str,
    value_col: str,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-(group, value) tie-averaged ascending ranks WITHIN each group,
    without a data-sized window.

    Returns ``(group, value, n, avg_rank)`` where ``n`` is the tie-group
    size and ``avg_rank`` the mean rank its rows share (1-based within
    the group). NULL values are excluded from the ranking (they carry no
    order information; the wasserstein_1d NULL discipline).

    Plan: collapse to per-(group, value) counts, two-phase running sum
    over the (group, value) total order (groups are contiguous in that
    order, so the within-group preceding-count is the global one minus
    the group's first offset — a group-count aggregate broadcast back).
    The only unpartitioned window runs over the P-row partition-count
    table.

    ``counts``: optional precomputed per-(group, value) count table —
    columns exactly ``(group_col, value_col, "__n")``, NULL values
    already excluded. Callers that also need per-(group, value, class)
    counts (the rank-test family) derive this table from theirs with
    one tiny aggregate instead of paying a second corpus scan
    (optimization round 10, guide §1.2).
    """
    if counts is not None:
        grouped = counts.select(
            F.col(group_col).alias("__g"),
            F.col(value_col).alias("__s"),
            F.col("__n"),
        )
    else:
        grouped = (
            df.select(
                F.col(group_col).alias("__g"),
                F.col(value_col).cast("double").alias("__s"),
            )
            .where(F.col("__s").isNotNull())
            .groupBy("__g", "__s")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
    n_part = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    g2 = (
        grouped.repartitionByRange(n_part, F.col("__g"), F.col("__s"))
        .sortWithinPartitions("__g", "__s")
        .select("*", F.spark_partition_id().alias("__pid"))
        # pin the partitioning: the row branch and the P-row offset branch
        # must read the SAME materialized exchange (the global_row_index
        # sf0.1 AQE defect)
        .localCheckpoint(eager=False)
    )
    w_loc = (
        Window.partitionBy("__pid")
        .orderBy("__g", "__s")
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
    before = g2.join(F.broadcast(offs), "__pid").select(
        "__g",
        "__s",
        "__n",
        (
            F.coalesce(F.sum("__n").over(w_loc), F.lit(0)) + F.col("__off")
        ).alias("__before"),
    )
    gstart = before.groupBy("__g").agg(F.min("__before").alias("__gstart"))
    return before.join(F.broadcast(gstart), "__g").select(
        F.col("__g").alias(group_col),
        F.col("__s").alias(value_col),
        F.col("__n").alias("n"),
        (
            (F.col("__before") - F.col("__gstart"))
            + (F.col("__n") + 1) / F.lit(2.0)
        ).alias("avg_rank"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    class_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Mann-Whitney U test per group: does ``value_col`` differ
    in distribution between the two classes of ``class_col``.

    ``class_col`` must take exactly TWO values within each group (groups
    violating this are dropped with the k-count exposed via the paired
    kruskal_wallis operator — run that first when the arity is unknown).
    ``class_a`` is the lexicographically smaller label; ``u_a`` its U
    statistic; z uses the tie-corrected normal approximation with NO
    continuity correction (exactly replicable in SQL):

        sigma^2 = n_a*n_b/12 * ((n+1) - sum(t^3-t)/(n*(n-1)))

    Returns ``(group, class_a, class_b, n_a, n_b, u_a, cliffs_delta, z,
    p_value)`` per group, p two-sided at 4dp. ``cliffs_delta`` is the
    nonparametric effect size (Cliff 1993) derived from the same U:
    ``2*U_a/(n_a*n_b) - 1`` — the p-value says whether the shift is
    real; delta says whether it is big enough to matter.

    Plan: ONE grouped_avg_ranks pass over (group, value) + a per-(group,
    value, class) count table joined on the tie group — rank sums are
    DECIMAL-accumulated products of counts and exact .5-multiple ranks.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(class_col).cast("string").alias("__c"),
        F.col(value_col).cast("double").alias("__s"),
    ).where(F.col("__s").isNotNull() & F.col("__c").isNotNull())
    # ONE corpus pass (optimization round 10): the (group, value, class)
    # count table is the only corpus-sized aggregate; the (group, value)
    # tie table the rank machinery needs is derived from it with a tiny
    # second-stage aggregate (sum of per-class counts == direct count).
    # Before, grouped_avg_ranks ran its own full scan of base.
    cls = base.groupBy("__g", "__s", "__c").agg(
        F.count(F.lit(1)).alias("__nc")
    ).localCheckpoint(eager=False)
    grouped = cls.groupBy("__g", "__s").agg(F.sum("__nc").alias("__n"))
    ranks = grouped_avg_ranks(base, "__g", "__s", counts=grouped)
    joined = cls.join(ranks, ["__g", "__s"])
    per_class = joined.groupBy("__g", "__c").agg(
        F.sum("__nc").alias("__n"),
        _dsum(F.col("__nc") * F.col("avg_rank")).alias("__r"),
    )
    ties = ranks.groupBy("__g").agg(
        _dsum(F.col("n") * F.col("n") * F.col("n") - F.col("n")).alias("__t")
    )
    two = (
        per_class.groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("__k"),
            F.min_by(F.struct("__n", "__r"), "__c").alias("__a"),
            F.max_by(F.struct("__n", "__r"), "__c").alias("__b"),
            F.min("__c").alias("class_a"),
            F.max("__c").alias("class_b"),
        )
        .where(F.col("__k") == 2)
    )
    na = F.col("__a.__n").cast("double")
    nb = F.col("__b.__n").cast("double")
    n = na + nb
    u_a = F.col("__a.__r") - na * (na + 1) / 2.0
    mu = na * nb / 2.0
    joined2 = two.join(F.broadcast(ties), "__g")
    sigma2 = (
        na * nb / 12.0 * ((n + 1.0) - F.col("__t") / (n * (n - 1.0)))
    )
    z = F.when(sigma2 <= 0.0, F.lit(0.0)).otherwise(
        (u_a - mu) / F.sqrt(sigma2)
    )
    return joined2.select(
        F.col("__g").alias(group_col),
        "class_a",
        "class_b",
        F.col("__a.__n").cast("bigint").alias("n_a"),
        F.col("__b.__n").cast("bigint").alias("n_b"),
        (F.round(u_a, 6) + 0.0).alias("u_a"),
        (F.round(2.0 * u_a / (na * nb) - 1.0, 6) + 0.0).alias("cliffs_delta"),
        (F.round(z, 6) + 0.0).alias("z"),
        _two_sided_p(z).alias("p_value"),
    ).orderBy(group_col)


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    class_col: str,
    value_col: str,
) -> DataFrame:
    """Kruskal-Wallis H test per group: does ``value_col`` differ in
    distribution across the k classes of ``class_col``.

        H = 12/(N(N+1)) * sum_c R_c^2/n_c - 3(N+1)
        H_adj = H / (1 - sum(t^3-t)/(N^3-N))        (tie correction)

    Returns ``(group, k_classes, n, h_stat, h_adj, dof)`` per group
    (p-values need the chi-square CDF — pair with a lookup at the chosen
    alpha; the statistic itself is the engine-exact part).

    Plan: the mann_whitney_u rank machinery with a k-row per-class
    aggregate instead of the two-class pivot.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(class_col).cast("string").alias("__c"),
        F.col(value_col).cast("double").alias("__s"),
    ).where(F.col("__s").isNotNull() & F.col("__c").isNotNull())
    # ONE corpus pass — same sharing as mann_whitney_u (round 10)
    cls = base.groupBy("__g", "__s", "__c").agg(
        F.count(F.lit(1)).alias("__nc")
    ).localCheckpoint(eager=False)
    grouped = cls.groupBy("__g", "__s").agg(F.sum("__nc").alias("__n"))
    ranks = grouped_avg_ranks(base, "__g", "__s", counts=grouped)
    per_class = (
        cls.join(ranks, ["__g", "__s"])
        .groupBy("__g", "__c")
        .agg(
            F.sum("__nc").alias("__n"),
            _dsum(F.col("__nc") * F.col("avg_rank")).alias("__r"),
        )
    )
    agg = per_class.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("__n").alias("__nn"),
        _dsum(F.col("__r") * F.col("__r") / F.col("__n")).alias("__rr"),
    )
    ties = ranks.groupBy("__g").agg(
        _dsum(F.col("n") * F.col("n") * F.col("n") - F.col("n")).alias("__t")
    )
    nn = F.col("__nn").cast("double")
    h = 12.0 / (nn * (nn + 1.0)) * F.col("__rr") - 3.0 * (nn + 1.0)
    corr = 1.0 - F.col("__t") / (nn * nn * nn - nn)
    return (
        agg.join(F.broadcast(ties), "__g")
        .select(
            F.col("__g").alias(group_col),
            F.col("__k").cast("int").alias("k_classes"),
            F.col("__nn").cast("bigint").alias("n"),
            (F.round(h, 6) + 0.0).alias("h_stat"),
            (F.round(F.when(corr <= 0.0, h).otherwise(h / corr), 6) + 0.0).alias(
                "h_adj"
            ),
            (F.col("__k") - 1).cast("int").alias("dof"),
        )
        .orderBy(group_col)
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    class_col: str,
    value_col: str,
) -> DataFrame:
    """Brown-Forsythe equality-of-variance test per group (the
    median-centered Levene — robust to heavy tails): one-way ANOVA F on
    ``z = |value - median(class)|``.

    Returns ``(group, k_classes, n, f_stat, df1, df2)`` per group.

    Plan: per-(group, class) exact interpolated medians (percentile, the
    mad_outliers convention) broadcast back, then two keyed aggregates —
    sum/sum-of-squares of z per class, combined in closed form. No
    windows at all.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(class_col).cast("string").alias("__c"),
        F.col(value_col).cast("double").alias("__s"),
    ).where(F.col("__s").isNotNull() & F.col("__c").isNotNull())
    med = base.groupBy("__g", "__c").agg(
        F.expr("percentile(__s, 0.5)").alias("__m")
    )
    z = base.join(F.broadcast(med), ["__g", "__c"]).select(
        "__g", "__c", F.round(F.abs(F.col("__s") - F.col("__m")), 9).alias("__z")
    )
    per_class = z.groupBy("__g", "__c").agg(
        F.count(F.lit(1)).alias("__n"),
        _dsum(F.col("__z")).alias("__sz"),
        _dsum(F.col("__z") * F.col("__z")).alias("__szz"),
    )
    # within-class SS = szz - sz^2/n ; between SS from class means vs grand
    agg = per_class.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("__n").alias("__nn"),
        _dsum(F.col("__sz")).alias("__tz"),
        _dsum(F.col("__sz") * F.col("__sz") / F.col("__n")).alias("__bz"),
        _dsum(F.col("__szz") - F.col("__sz") * F.col("__sz") / F.col("__n")).alias(
            "__wss"
        ),
    )
    k = F.col("__k").cast("double")
    nn = F.col("__nn").cast("double")
    bss = F.col("__bz") - F.col("__tz") * F.col("__tz") / nn
    f = F.when(
        (F.col("__wss") <= 0.0) | (F.col("__k") < 2) | (F.col("__nn") <= F.col("__k")),
        F.lit(None).cast("double"),
    ).otherwise((bss / (k - 1.0)) / (F.col("__wss") / (nn - k)))
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__k").cast("int").alias("k_classes"),
        F.col("__nn").cast("bigint").alias("n"),
        (F.round(f, 6) + 0.0).alias("f_stat"),
        (F.col("__k") - 1).cast("int").alias("df1"),
        (F.col("__nn") - F.col("__k")).cast("bigint").alias("df2"),
    ).orderBy(group_col)


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Spearman rank correlation per group: Pearson correlation of the
    tie-averaged ranks of x and y (rows with NULL in either column are
    excluded from both rankings).

    Returns ``(group, n, rho)`` per group at 6dp.

    Plan (optimization round 11, guide §1.2 — one corpus aggregate
    instead of two): both axes rank in ONE pass. The frame is melted to
    (group, axis, value) rows, counted by (group, axis, value) in one
    map-side-combinable aggregate, and a single grouped_avg_ranks run
    over the melted count table — grouped by the (group, axis) struct —
    ranks both axes at once; rx/ry split back out by axis tag. The
    two-phase running sums are exact integer count sums over a total
    order, so per-(group, axis) ranks are bit-identical to the two
    separate passes (pinned by test). Ranks stay exact .5 multiples and
    the Pearson reduction rides DECIMAL sums, so the result is
    replayable.
    """
    base = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(x_col).cast("double").alias("__x"),
            F.col(y_col).cast("double").alias("__y"),
        )
        .where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
        .localCheckpoint(eager=False)
    )
    melted = base.select(
        "__g", F.lit(0).alias("__ax"), F.col("__x").alias("__s")
    ).unionAll(
        base.select("__g", F.lit(1).alias("__ax"), F.col("__y").alias("__s"))
    )
    counts = (
        melted.groupBy("__g", "__ax", "__s")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(F.struct("__g", "__ax").alias("__ga"), "__s", "__n")
    )
    # checkpoint the two-axis rank table once: rx and ry are two filters
    # over the SAME pass, not two pipelines
    ranks = grouped_avg_ranks(counts, "__ga", "__s", counts=counts).localCheckpoint(
        eager=False
    )
    rx = ranks.where(F.col("__ga.__ax") == 0).select(
        F.col("__ga.__g").alias("__g"),
        F.col("__s").alias("__x"),
        F.col("avg_rank").alias("__rx"),
    )
    ry = ranks.where(F.col("__ga.__ax") == 1).select(
        F.col("__ga.__g").alias("__g"),
        F.col("__s").alias("__y"),
        F.col("avg_rank").alias("__ry"),
    )
    ranked = base.join(rx, ["__g", "__x"]).join(ry, ["__g", "__y"])
    agg = ranked.groupBy("__g").agg(
        F.count(F.lit(1)).cast("double").alias("v"),
        _dsum(F.col("__rx")).alias("sx"),
        _dsum(F.col("__ry")).alias("sy"),
        _dsum(F.col("__rx") * F.col("__rx")).alias("sxx"),
        _dsum(F.col("__rx") * F.col("__ry")).alias("sxy"),
        _dsum(F.col("__ry") * F.col("__ry")).alias("syy"),
    )
    num = F.col("v") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        F.col("v") * F.col("sxx") - F.col("sx") * F.col("sx")
    ) * F.sqrt(F.col("v") * F.col("syy") - F.col("sy") * F.col("sy"))
    rho = F.when(den <= 0.0, F.lit(None).cast("double")).otherwise(num / den)
    # Fisher-z 95% CI (closed-form atanh, portable to SQL): defined for
    # n > 3 and |rho| < 1 — both judged on the 9dp-ROUNDED rho so the
    # boundary is engine-stable (an unrounded |rho| < 1 test can disagree
    # across engines at perfect correlation, where num/den lands 1 ulp
    # under 1.0)
    rho9 = F.round(rho, 9)
    zf = 0.5 * F.log((1.0 + rho9) / (1.0 - rho9))
    se = 1.959964 / F.sqrt(F.col("v") - 3.0)
    ci_ok = (F.col("v") > 3.0) & rho9.isNotNull() & (F.abs(rho9) < 1.0)
    lo = F.when(ci_ok, F.tanh(zf - se))
    hi = F.when(ci_ok, F.tanh(zf + se))
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("v").cast("bigint").alias("n"),
        (F.round(rho, 6) + 0.0).alias("rho"),
        (F.round(lo, 4) + 0.0).alias("ci_lo"),
        (F.round(hi, 4) + 0.0).alias("ci_hi"),
    ).orderBy(group_col)


def mann_kendall(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mann-Kendall monotone-trend test per group over a date-grain
    series: S = sum of sign(y_j - y_i) over x_i < x_j, tie-corrected
    variance, z with the standard +-1 continuity correction:

        var = (n(n-1)(2n+5) - sum_t t(t-1)(2t+5)) / 18
        z   = (S - sign(S)) / sqrt(var)     (0 when S = 0)

    Returns ``(group, n_points, s_stat, z, p_value, trend)`` —
    trend in {'increasing','decreasing','no_trend'} at p < 0.05.

    Intended for GROUPED, date-grain series (the theil_sen convention:
    the pairwise self-join is O(n^2) WITHIN each group and keyed on it,
    so groups parallelize; a year of daily points is ~66k pairs).
    """
    s = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(x_col).cast("double").alias("__x"),
            F.col(y_col).cast("double").alias("__y"),
        )
        .where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
        .localCheckpoint(eager=False)
    )
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(
        b, (F.col("a.__g") == F.col("b.__g")) & (F.col("a.__x") < F.col("b.__x"))
    ).select(
        F.col("a.__g").alias("__g"),
        F.signum(F.col("b.__y") - F.col("a.__y")).alias("__sg"),
    )
    s_stat = pairs.groupBy("__g").agg(
        F.sum("__sg").cast("double").alias("__s")
    )
    n_pts = s.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    ties = (
        s.groupBy("__g", "__y")
        .agg(F.count(F.lit(1)).cast("double").alias("__t"))
        .groupBy("__g")
        .agg(
            _dsum(
                F.col("__t") * (F.col("__t") - 1.0) * (2.0 * F.col("__t") + 5.0)
            ).alias("__tt")
        )
    )
    n = F.col("__n").cast("double")
    # single-point groups produce no pairs: left-join + S=0 keeps them in
    # the output (n_points=1, z=0, no_trend) instead of dropping them
    s0 = F.coalesce(F.col("__s"), F.lit(0.0))
    var = (n * (n - 1.0) * (2.0 * n + 5.0) - F.col("__tt")) / 18.0
    z = F.when((s0 == 0.0) | (var <= 0.0), F.lit(0.0)).otherwise(
        (s0 - F.signum(s0)) / F.sqrt(var)
    )
    p = _two_sided_p(z)
    return (
        n_pts.join(s_stat, "__g", "left")
        .join(F.broadcast(ties), "__g")
        .select(
            F.col("__g").alias(group_col),
            F.col("__n").cast("bigint").alias("n_points"),
            s0.cast("bigint").alias("s_stat"),
            (F.round(z, 6) + 0.0).alias("z"),
            p.alias("p_value"),
            F.when(p >= 0.05, F.lit("no_trend"))
            .when(s0 > 0, F.lit("increasing"))
            .otherwise(F.lit("decreasing"))
            .alias("trend"),
        )
        .orderBy(group_col)
    )


def bh_adjust(
    df: DataFrame,
    p_col: str,
    key_cols: list,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR correction over a BOUNDED hypothesis
    family: ranks p ascending, adjusted p_i = min_{j>=i}(m * p_(j) / j)
    clamped to 1, rejects at ``p_adj <= alpha``.

    Input MUST be an already-aggregated family — one row per hypothesis
    (per-source tests, per-slice comparisons): the ranking windows here
    are family-sized by construction (the P-row offset-table precedent),
    NOT row-level windows. Ties on p break by ``key_cols`` so the rank
    assignment is deterministic.

    Returns the input keys + ``(p_value, p_rank, p_adj, rejected)``
    ordered by key.
    """
    keys = [F.col(k) for k in key_cols]
    base = df.select(
        *keys, F.col(p_col).cast("double").alias("__p")
    ).where(F.col("__p").isNotNull())
    w_rank = Window.orderBy(F.col("__p").asc(), *[k.asc() for k in keys])
    w_m = Window.partitionBy()
    ranked = base.select(
        *key_cols,
        F.col("__p"),
        F.row_number().over(w_rank).alias("__r"),
        F.count(F.lit(1)).over(w_m).alias("__m"),
    )
    w_tail = Window.orderBy(F.col("__r").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    adj = F.least(
        F.lit(1.0),
        F.min(
            F.round(
                F.col("__m").cast("double") * F.col("__p") / F.col("__r"), 9
            )
        ).over(w_tail),
    )
    # rejected derives from the SAME rounded value emitted as p_adj, so a
    # boundary row can never display p_adj == alpha with rejected=false
    p_adj_out = F.round(adj, 6) + 0.0
    return ranked.select(
        *key_cols,
        (F.round(F.col("__p"), 6) + 0.0).alias("p_value"),
        F.col("__r").cast("int").alias("p_rank"),
        p_adj_out.alias("p_adj"),
        (p_adj_out <= alpha).alias("rejected"),
    ).orderBy(*key_cols)


def two_sample_distance(
    df_a: DataFrame,
    df_b: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    gamma: float | None = None,
    sample_size: int = 256,
) -> DataFrame:
    """RBF-kernel MMD^2 (unbiased U-statistic, Gretton et al. 2012) and
    energy distance (Szekely & Rizzo 2004) between two embedding
    populations — the two-sample distribution-shift readout that catches
    what per-dimension drift checks (PSI) miss: joint-geometry changes.

        mmd2   = 2*Kaa/(na(na-1)) + 2*Kbb/(nb(nb-1)) - 2*Kab/(na*nb)
        energy = 2*Dab/(na*nb) - 2*Daa/(na(na-1)) - 2*Dbb/(nb(nb-1))

    with k(x,y) = exp(-gamma * ||x-y||^2), d(x,y) = ||x-y||; gamma
    defaults to 1/dim (the median heuristic needs a data-dependent pass —
    pass an explicit gamma for that). Sampling: the ``sample_size``
    vectors with smallest md5(id) per side (the embedding_isotropy
    order-free deterministic draw).

    Exactness: squared distances are per-dimension round(9)-DECIMAL sums
    (order-free); kernel/distance values round to 9dp before
    DECIMAL-accumulating the block sums (exp's last ulp is
    libm-dependent; a 1e-9 quantization makes both engines agree), final
    stats at 6dp. Returns ONE row ``(n_a, n_b, gamma, mmd2, energy)``.

    Scale shape: each side is a TakeOrdered of S rows regardless of
    corpus size; the single pair join is a nested loop over the bounded
    2S-row union (side_a < side_b gives cross pairs, same-side id< gives
    within pairs) — never a corpus-level product.
    """
    if sample_size < 2:
        raise ValueError(f"sample_size must be >= 2, got {sample_size}")

    def _sample(sdf, tag):
        return (
            sdf.select(
                F.lit(tag).alias("side"),
                F.col(id_col).cast("string").alias("id"),
                F.col(vec).cast("array<double>").alias("v"),
                F.md5(F.col(id_col).cast("string")).alias("__k"),
            )
            .orderBy("__k", "id")
            .limit(sample_size)
            .drop("__k")
        )

    u = _sample(df_a, "a").unionByName(_sample(df_b, "b")).localCheckpoint(
        eager=False
    )
    x, y = u.alias("x"), u.alias("y")
    d2 = F.aggregate(
        F.zip_with(
            F.col("x.v"),
            F.col("y.v"),
            lambda p, q: F.round((p - q) * (p - q), 9),
        ),
        F.lit(0.0).cast("decimal(25,9)"),
        lambda acc, t: (acc + t.cast("decimal(25,9)")).cast("decimal(25,9)"),
    ).cast("double")
    pairs = x.join(
        y,
        (F.col("x.side") < F.col("y.side"))
        | ((F.col("x.side") == F.col("y.side")) & (F.col("x.id") < F.col("y.id"))),
    ).select(
        F.col("x.side").alias("sa"),
        F.col("y.side").alias("sb"),
        d2.alias("__d2"),
    )
    counts = u.groupBy("side").agg(F.count(F.lit(1)).alias("n"))
    na = F.max(F.when(F.col("side") == "a", F.col("n"))).cast("double")
    nb = F.max(F.when(F.col("side") == "b", F.col("n"))).cast("double")
    cnt = counts.agg(na.alias("na"), nb.alias("nb"))
    # gamma default 1/dim attached as a 1-row broadcast scalar (the repo's
    # crossJoin(F.broadcast(<1-row aggregate>)) convention — no driver
    # collect during plan construction)
    if gamma is not None:
        gdf = df_a.sparkSession.range(1).select(
            F.lit(round(float(gamma), 9)).alias("__gamma")
        )
    else:
        gdf = u.agg(
            F.round(1.0 / F.min(F.size("v")).cast("double"), 9).alias("__gamma")
        )
    blocks = (
        pairs.crossJoin(F.broadcast(gdf))
        .groupBy("sa", "sb")
        .agg(
            _dsum(F.exp(-F.col("__gamma") * F.col("__d2"))).alias("ks"),
            _dsum(F.sqrt(F.col("__d2"))).alias("ds"),
        )
    )
    pick = lambda col, s1, s2: F.max(
        F.when((F.col("sa") == s1) & (F.col("sb") == s2), F.col(col))
    )
    agg = blocks.agg(
        pick("ks", "a", "a").alias("kaa"),
        pick("ks", "b", "b").alias("kbb"),
        pick("ks", "a", "b").alias("kab"),
        pick("ds", "a", "a").alias("daa"),
        pick("ds", "b", "b").alias("dbb"),
        pick("ds", "a", "b").alias("dab"),
    )
    out = agg.crossJoin(F.broadcast(cnt)).crossJoin(F.broadcast(gdf))
    A, B = F.col("na"), F.col("nb")
    # ANSI guard: the unbiased estimators need >= 2 points per side
    ok = (A >= 2.0) & (B >= 2.0)
    mmd2 = F.when(
        ok,
        2.0 * F.col("kaa") / (A * (A - 1.0))
        + 2.0 * F.col("kbb") / (B * (B - 1.0))
        - 2.0 * F.col("kab") / (A * B),
    )
    energy = F.when(
        ok,
        2.0 * F.col("dab") / (A * B)
        - 2.0 * F.col("daa") / (A * (A - 1.0))
        - 2.0 * F.col("dbb") / (B * (B - 1.0)),
    )
    return out.select(
        A.cast("bigint").alias("n_a"),
        B.cast("bigint").alias("n_b"),
        F.col("__gamma").alias("gamma"),
        (F.round(mmd2, 6) + 0.0).alias("mmd2"),
        (F.round(energy, 6) + 0.0).alias("energy"),
    )


def trimmed_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim: float = 0.1,
) -> DataFrame:
    """Per-group trimmed and winsorized means — the robust location
    estimates for heavy-tailed metrics (one pathological value cannot
    move them): trim cuts rows outside the [trim, 1-trim] exact
    interpolated percentiles; winsorize clamps them to those bounds.

    Returns ``(group, n, lo_cut, hi_cut, mean, trimmed_mean,
    winsorized_mean)`` at 6dp, ordered by group. NULL values excluded.

    Plan: one percentile aggregate per group broadcast back, one pass of
    filter/clamp + DECIMAL means — no windows, no pairs.
    """
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__s"),
    ).where(F.col("__s").isNotNull())
    cuts = base.groupBy("__g").agg(
        F.expr(f"percentile(__s, {float(trim)!r})").alias("__lo"),
        F.expr(f"percentile(__s, {float(1.0 - trim)!r})").alias("__hi"),
    )
    j = base.join(F.broadcast(cuts), "__g")
    w = F.least(F.greatest(F.col("__s"), F.col("__lo")), F.col("__hi"))
    agg = j.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("__lo").alias("lo_cut"),
        F.max("__hi").alias("hi_cut"),
        _dsum(F.col("__s")).alias("__sum"),
        F.sum(
            F.when(
                (F.col("__s") >= F.col("__lo")) & (F.col("__s") <= F.col("__hi")),
                1,
            ).otherwise(0)
        ).alias("__nt"),
        _dsum(
            F.when(
                (F.col("__s") >= F.col("__lo")) & (F.col("__s") <= F.col("__hi")),
                F.col("__s"),
            )
        ).alias("__tsum"),
        _dsum(F.round(w, 9)).alias("__wsum"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("n").cast("bigint").alias("n"),
        F.round("lo_cut", 6).alias("lo_cut"),
        F.round("hi_cut", 6).alias("hi_cut"),
        F.round(F.col("__sum") / F.col("n"), 6).alias("mean"),
        F.round(F.col("__tsum") / F.col("__nt"), 6).alias("trimmed_mean"),
        F.round(F.col("__wsum") / F.col("n"), 6).alias("winsorized_mean"),
    ).orderBy(group_col)


def effective_sample_size(
    df: DataFrame,
    group_col: str,
    weight_col: str,
) -> DataFrame:
    """Kish effective sample size per stratum (Kish 1965):

        ESS = (sum w)^2 / sum w^2,   design_effect = n / ESS

    — the sanity gauge for any weighted sampling scheme (DSIR,
    temperature mixing, domain reweighting): a stratum whose weights are
    dominated by a few rows has ESS << n, and estimates from it carry
    far more variance than the row count suggests.

    Returns ``(group, n, sum_w, ess, ess_ratio, design_effect)`` at 6dp,
    ordered by group. Rows with NULL or non-positive weight are excluded
    (they contribute no sampling mass).

    Plan: ONE map-side-combinable aggregate per group. Nothing else.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(weight_col).cast("double").alias("__w"),
    ).where(F.col("__w").isNotNull() & (F.col("__w") > 0.0))
    agg = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("__w")).alias("__sw"),
        _dsum(F.col("__w") * F.col("__w")).alias("__sww"),
    )
    ess = F.col("__sw") * F.col("__sw") / F.col("__sww")
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("n").cast("bigint").alias("n"),
        F.round("__sw", 6).alias("sum_w"),
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n"), 6).alias("ess_ratio"),
        F.round(F.col("n") / ess, 6).alias("design_effect"),
    ).orderBy(group_col)


def welch_anova(
    df: DataFrame,
    group_col: str,
    class_col: str,
    value_col: str,
) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA per group (Welch 1951) —
    the k-sample mean comparison that does NOT assume equal variances
    (the assumption brown_forsythe exists to test):

        w_c   = n_c / s_c^2            (sample variance, ddof = 1)
        xbar_w = sum w_c xbar_c / W
        A     = sum w_c (xbar_c - xbar_w)^2 / (k - 1)
        B     = 1 + 2(k-2)/(k^2-1) * H,  H = sum (1 - w_c/W)^2/(n_c - 1)
        F     = A / B,  df1 = k - 1,  df2 = (k^2 - 1) / (3 H)

    Classes with n_c < 2 or zero variance are excluded (their weight is
    undefined) and surfaced via ``k_dropped``. Returns ``(group,
    k_classes, k_dropped, n, f_stat, df1, df2)`` at 6dp, ordered by
    group.

    Plan: one per-(group, class) DECIMAL moment aggregate, one k-row
    reduce joined back for W — no windows, no pairs, map-side
    combinable.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(class_col).cast("string").alias("__c"),
        F.col(value_col).cast("double").alias("__s"),
    ).where(F.col("__s").isNotNull() & F.col("__c").isNotNull())
    per = base.groupBy("__g", "__c").agg(
        F.count(F.lit(1)).alias("__n"),
        _dsum(F.col("__s")).alias("__sx"),
        _dsum(F.col("__s") * F.col("__s")).alias("__sxx"),
    )
    n = F.col("__n").cast("double")
    # ANSI guard: the n=1 class would divide by zero before the >=2 filter
    var = F.when(
        F.col("__n") >= 2,
        (F.col("__sxx") - F.col("__sx") * F.col("__sx") / n) / (n - 1.0),
    )
    keyed = per.select(
        "__g",
        "__c",
        "__n",
        (F.col("__sx") / n).alias("__m"),
        var.alias("__v"),
    ).localCheckpoint(eager=False)
    good = (F.col("__n") >= 2) & F.col("__v").isNotNull() & (F.col("__v") > 0.0)
    ok = keyed.where(good)
    dropped = keyed.where(~F.coalesce(good, F.lit(False))).groupBy("__g").agg(
        F.count(F.lit(1)).alias("__kd")
    )
    w = ok.select(
        "__g", "__c", "__n", "__m", (F.col("__n").cast("double") / F.col("__v")).alias("__w")
    )
    tot = w.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("__n").alias("__nn"),
        _dsum(F.col("__w")).alias("__ww"),
        _dsum(F.col("__w") * F.col("__m")).alias("__wm"),
    )
    j = w.join(F.broadcast(tot), "__g")
    xw = F.col("__wm") / F.col("__ww")
    kk = F.col("__k").cast("double")
    agg = j.groupBy("__g").agg(
        F.max("__k").alias("__k2"),
        F.max("__nn").alias("__nn2"),
        _dsum(F.col("__w") * (F.col("__m") - xw) * (F.col("__m") - xw)).alias(
            "__a_n"
        ),
        _dsum(
            (1.0 - F.col("__w") / F.col("__ww"))
            * (1.0 - F.col("__w") / F.col("__ww"))
            / (F.col("__n") - 1.0)
        ).alias("__h"),
    )
    k2 = F.col("__k2").cast("double")
    a = F.col("__a_n") / (k2 - 1.0)
    b = 1.0 + 2.0 * (k2 - 2.0) / (k2 * k2 - 1.0) * F.col("__h")
    f = F.when(
        (F.col("__k2") < 2) | (F.col("__h") <= 0.0), F.lit(None).cast("double")
    ).otherwise(a / b)
    df2 = F.when(F.col("__h") > 0.0, (k2 * k2 - 1.0) / (3.0 * F.col("__h")))
    return (
        agg.join(F.broadcast(dropped), "__g", "left")
        .select(
            F.col("__g").alias(group_col),
            F.col("__k2").cast("int").alias("k_classes"),
            F.coalesce(F.col("__kd"), F.lit(0)).cast("int").alias("k_dropped"),
            F.col("__nn2").cast("bigint").alias("n"),
            (F.round(f, 6) + 0.0).alias("f_stat"),
            (F.col("__k2") - 1).cast("int").alias("df1"),
            (F.round(df2, 6) + 0.0).alias("df2"),
        )
        .orderBy(group_col)
    )


def cramers_v(
    df: DataFrame,
    col_a: str,
    col_b: str,
    corrected: bool = True,
) -> DataFrame:
    """Cramér's V association between two categorical columns, with the
    Bergsma (2013) bias correction — the effect size the chi-square
    test's p-value does not give you (at 100-TB row counts EVERYTHING is
    'significant'; V says whether the association is material):

        chi2 = sum (n_ij - e_ij)^2 / e_ij,  e_ij = r_i c_j / n
        V    = sqrt(chi2/n / min(r-1, c-1))
        Vcorr: phi2' = max(0, chi2/n - (r-1)(c-1)/(n-1)),
               r' = r - (r-1)^2/(n-1), c' = c - (c-1)^2/(n-1),
               V' = sqrt(phi2' / min(r'-1, c'-1))

    Returns ONE row ``(n, r_levels, c_levels, chi2, v, v_corrected)`` at
    6dp. NULL categories are excluded.

    Plan: one (a, b) cell aggregate, two marginal reduces broadcast
    back, one DECIMAL chi2 sum over the CELL table (bounded by the
    category alphabet product, never rows).
    """
    base = df.select(
        F.col(col_a).cast("string").alias("__a"),
        F.col(col_b).cast("string").alias("__b"),
    ).where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    cells = base.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__n"))
    cells = cells.localCheckpoint(eager=False)
    ra = cells.groupBy("__a").agg(F.sum("__n").alias("__ra"))
    cb = cells.groupBy("__b").agg(F.sum("__n").alias("__cb"))
    tot = cells.agg(
        F.sum("__n").alias("__t"),
        F.count_distinct("__a").alias("__r"),
        F.count_distinct("__b").alias("__c"),
    )
    j = (
        cells.join(F.broadcast(ra), "__a")
        .join(F.broadcast(cb), "__b")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("__ra").cast("double") * F.col("__cb").cast("double") / F.col(
        "__t"
    ).cast("double")
    chi = j.agg(
        F.max("__t").alias("n"),
        F.max("__r").alias("r_levels"),
        F.max("__c").alias("c_levels"),
        _dsum(
            (F.col("__n").cast("double") - e) * (F.col("__n").cast("double") - e) / e
        ).alias("__chi2"),
    )
    # observed-zero cells contribute e_ij (their (0-e)^2/e term) — add the
    # missing mass in closed form: sum over missing cells of e = n - sum
    # over PRESENT cells of e. chi2_total = chi2_present + (n - sum_e).
    sum_e = j.agg(_dsum(e).alias("__se"))
    full = chi.crossJoin(F.broadcast(sum_e))
    nn = F.col("n").cast("double")
    chi2 = F.col("__chi2") + (nn - F.col("__se"))
    rr = F.col("r_levels").cast("double")
    cc = F.col("c_levels").cast("double")
    phi2 = chi2 / nn
    v = F.when(
        F.least(rr - 1.0, cc - 1.0) <= 0.0, F.lit(None).cast("double")
    ).otherwise(F.sqrt(phi2 / F.least(rr - 1.0, cc - 1.0)))
    # ANSI guard: the bias correction divides by n-1
    phi2c = F.when(
        nn > 1.0,
        F.greatest(F.lit(0.0), phi2 - (rr - 1.0) * (cc - 1.0) / (nn - 1.0)),
    )
    rc = rr - (rr - 1.0) * (rr - 1.0) / (nn - 1.0)
    ccx = cc - (cc - 1.0) * (cc - 1.0) / (nn - 1.0)
    # nested whens, not OR: the n-1 divisions must sit in a branch that is
    # only reached when nn > 1 (Spark's Or does not short-circuit)
    vc = F.when(nn <= 1.0, F.lit(None).cast("double")).otherwise(
        F.when(
            F.least(rc - 1.0, ccx - 1.0) <= 0.0, F.lit(None).cast("double")
        ).otherwise(F.sqrt(phi2c / F.least(rc - 1.0, ccx - 1.0)))
    )
    out = full.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("r_levels").cast("int").alias("r_levels"),
        F.col("c_levels").cast("int").alias("c_levels"),
        (F.round(chi2, 6) + 0.0).alias("chi2"),
        (F.round(v, 6) + 0.0).alias("v"),
        (F.round(vc, 6) + 0.0).alias("v_corrected"),
    )
    return out


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman rank test (Friedman 1937, Conover's tie-handling form):
    do k treatments (scorers, pipeline variants) rank the same blocks
    (documents) identically — the repeated-measures cousin of
    kruskal_wallis:

        chi2_F = (k-1) * (sum_j Rj^2 - n^2 k (k+1)^2/4) / A,
        A = sum_ij r_ij^2 - n k (k+1)^2/4

    with r_ij the tie-averaged rank of treatment j WITHIN block i and
    Rj its column sum; without ties A reduces to n k(k+1)(k-1)/12 and
    the classic statistic falls out. Blocks missing any treatment are
    dropped loudly (``n_blocks_dropped``).

    Returns ONE row ``(n_blocks, n_blocks_dropped, k_treatments, chi2,
    dof)`` at 6dp (NULL chi2 when A = 0 — every block fully tied).

    Plan: within-block ranks from a k^2-per-block self-join on the
    block key (k = treatment count, a handful — never data-sized), then
    two DECIMAL reduces. No windows.
    """
    # materialize (block, treatment, value) once (optimization round
    # 10): base feeds the k-census action below, the per-block gate,
    # the kept semi-join AND both sides of the rank self-join — without
    # the checkpoint the caller's (typically regex-scored) projection
    # re-evaluated from the scan four times
    base = df.select(
        F.col(block_col).alias("__b"),
        F.col(treatment_col).cast("string").alias("__t"),
        F.col(value_col).cast("double").alias("__s"),
    ).where(
        F.col("__s").isNotNull() & F.col("__t").isNotNull()
    ).localCheckpoint(eager=False)
    k_all = base.select("__t").distinct().count()
    # gate on DISTINCT treatments AND raw rows: a block with a duplicated
    # treatment and a missing one has __k == k_all by raw count but would
    # silently corrupt the within-block ranks — it must drop, loudly
    per_block = base.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__k"),
        F.count_distinct("__t").alias("__kd"),
    )
    ok = (F.col("__k") == k_all) & (F.col("__kd") == k_all)
    kept_ids = per_block.where(ok).select("__b")
    dropped = per_block.where(~ok).agg(
        F.count(F.lit(1)).alias("n_blocks_dropped")
    )
    kept = base.join(kept_ids, "__b", "left_semi").localCheckpoint(eager=False)
    o = kept.select(
        F.col("__b"), F.col("__t").alias("__t2"), F.col("__s").alias("__s2")
    )
    ranks = (
        kept.join(o, "__b")
        .groupBy("__b", "__t")
        .agg(
            (
                F.sum(F.when(F.col("__s2") < F.col("__s"), 1).otherwise(0))
                + (F.sum(F.when(F.col("__s2") == F.col("__s"), 1).otherwise(0)) + 1)
                / F.lit(2.0)
            ).alias("__r")
        )
    )
    per_t = ranks.groupBy("__t").agg(_dsum(F.col("__r")).alias("__rj"))
    tot = ranks.agg(
        F.count_distinct("__b").alias("__n"),
        _dsum(F.col("__r") * F.col("__r")).alias("__rr"),
    )
    agg = per_t.crossJoin(F.broadcast(tot)).agg(
        F.max("__n").alias("__n2"),
        F.max("__rr").alias("__rr2"),
        F.count(F.lit(1)).alias("__kk"),
        _dsum(F.col("__rj") * F.col("__rj")).alias("__rj2"),
    )
    n = F.col("__n2").cast("double")
    kk = F.col("__kk").cast("double")
    corr = n * kk * (kk + 1.0) * (kk + 1.0) / 4.0
    a = F.col("__rr2") - corr
    num = (kk - 1.0) * (F.col("__rj2") - n * corr)
    # Rj^2 correction term: sum Rj^2 - n^2 k (k+1)^2/4 = rj2 - n*corr
    chi2 = F.when(a <= 0.0, F.lit(None).cast("double")).otherwise(num / a)
    return agg.crossJoin(F.broadcast(dropped)).select(
        F.col("__n2").cast("bigint").alias("n_blocks"),
        F.col("n_blocks_dropped").cast("bigint").alias("n_blocks_dropped"),
        F.col("__kk").cast("int").alias("k_treatments"),
        (F.round(chi2, 6) + 0.0).alias("chi2"),
        (F.col("__kk") - 1).cast("int").alias("dof"),
    )


def shift_function(
    df: DataFrame,
    group_col: str,
    class_col: str,
    value_col: str,
    probs: tuple = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """Doksum shift function per group (Doksum 1974): the per-decile
    quantile difference between the two classes of ``class_col`` — WHERE
    in the distribution a treatment moved mass (a mean shift, a tail
    stretch, a variance squeeze all look different here; a single
    mean/U-test cannot tell them apart).

    ``class_a`` is the lexicographically smaller label; ``shift`` =
    q_b - q_a at each probe. Exact interpolated percentiles (the
    mad_outliers convention). Returns ``(group, class_a, class_b, p,
    q_a, q_b, shift)`` — groups x probes rows at 6dp, ordered
    (group, p).

    Plan: one percentile-array aggregate per (group, class) + one
    posexplode of the len(probs)-element arrays + a two-row pivot per
    group. Nothing row-sized after the first aggregate.
    """
    plist = ", ".join(repr(float(p)) for p in probs)
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(class_col).cast("string").alias("__c"),
        F.col(value_col).cast("double").alias("__s"),
    ).where(F.col("__s").isNotNull() & F.col("__c").isNotNull())
    two = base.groupBy("__g").agg(
        F.count_distinct("__c").alias("__k"),
        F.min("__c").alias("class_a"),
        F.max("__c").alias("class_b"),
    ).where(F.col("__k") == 2)
    qt = base.groupBy("__g", "__c").agg(
        F.expr(f"percentile(__s, array({plist}))").alias("__q")
    )
    probes = F.array(*[F.lit(float(p)) for p in probs])
    ex = qt.select(
        "__g",
        "__c",
        F.posexplode(F.arrays_zip(probes.alias("p"), F.col("__q").alias("q"))).alias(
            "__i", "__pq"
        ),
    ).select(
        "__g", "__c", F.col("__pq.p").alias("p"), F.col("__pq.q").alias("q")
    )
    a = ex.select(
        "__g", F.col("__c").alias("class_a"), "p", F.col("q").alias("q_a")
    )
    b = ex.select(
        "__g", F.col("__c").alias("class_b"), "p", F.col("q").alias("q_b")
    )
    out = (
        two.join(a, ["__g", "class_a"])
        .join(b, ["__g", "class_b", "p"])
        .select(
            F.col("__g").alias(group_col),
            "class_a",
            "class_b",
            F.round("p", 6).alias("p"),
            F.round("q_a", 6).alias("q_a"),
            F.round("q_b", 6).alias("q_b"),
            (F.round(F.col("q_b") - F.col("q_a"), 6) + 0.0).alias("shift"),
        )
        .orderBy(group_col, "p")
    )
    return out


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    class_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test per group: the supremum gap
    between the two classes' empirical CDFs — the whole-distribution
    companion to mann_whitney_u (which only sees location) and
    brown_forsythe (which only sees spread):

        D      = max_v |F_a(v) - F_b(v)|
        lambda = D * sqrt(n_a n_b / (n_a + n_b))
        p      = 2 sum_{k>=1} (-1)^(k-1) exp(-2 k^2 lambda^2)   (100 terms,
                 the asymptotic Kolmogorov series; 4dp — the erf rounding
                 discipline, exact enough everywhere p matters)

    Classes must be exactly two per group (others drop, the
    mann_whitney_u contract). Returns ``(group, class_a, class_b, n_a,
    n_b, d_stat, p_value)`` ordered by group.

    Plan: collapse to per-(group, value) class counts, ONE two-phase
    inclusive cumsum over the (group, value) order (the
    grouped_avg_ranks discipline — no data-sized window), per-group max
    of the CDF gaps, and a bounded 100-term series for p.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(class_col).cast("string").alias("__c"),
        F.col(value_col).cast("double").alias("__s"),
    ).where(F.col("__s").isNotNull() & F.col("__c").isNotNull())
    two = (
        base.groupBy("__g")
        .agg(
            F.count_distinct("__c").alias("__k"),
            F.min("__c").alias("class_a"),
            F.max("__c").alias("class_b"),
        )
        .where(F.col("__k") == 2)
        .localCheckpoint(eager=False)
    )
    tagged = base.join(F.broadcast(two.select("__g", "class_a")), "__g")
    grouped = tagged.groupBy("__g", "__s").agg(
        F.sum(F.when(F.col("__c") == F.col("class_a"), 1).otherwise(0)).alias(
            "__na"
        ),
        F.sum(F.when(F.col("__c") != F.col("class_a"), 1).otherwise(0)).alias(
            "__nb"
        ),
    )
    n_part = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    g2 = (
        grouped.repartitionByRange(n_part, F.col("__g"), F.col("__s"))
        .sortWithinPartitions("__g", "__s")
        .select("*", F.spark_partition_id().alias("__pid"))
        # pin the partitioning (the global_row_index sf0.1 AQE defect)
        .localCheckpoint(eager=False)
    )
    w_loc = (
        Window.partitionBy("__pid")
        .orderBy("__g", "__s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        g2.groupBy("__pid")
        .agg(
            F.sum("__na").alias("__ca"), F.sum("__nb").alias("__cb")
        )
        .select(
            "__pid",
            F.coalesce(F.sum("__ca").over(w_off), F.lit(0)).alias("__offa"),
            F.coalesce(F.sum("__cb").over(w_off), F.lit(0)).alias("__offb"),
        )
    )
    cum = g2.join(F.broadcast(offs), "__pid").select(
        "__g",
        "__s",
        (F.sum("__na").over(w_loc) + F.col("__offa")).alias("__cuma"),
        (F.sum("__nb").over(w_loc) + F.col("__offb")).alias("__cumb"),
    )
    # per-group start offsets = cumulative counts of EARLIER groups. The
    # cumsum is INCLUSIVE, so the group's own first-value counts must stay
    # in: start = (group's max cum) - (group total), never min(cum).
    gstart = cum.groupBy("__g").agg(
        F.max(F.col("__cuma")).alias("__xa"),
        F.max(F.col("__cumb")).alias("__xb"),
    )
    tot = grouped.groupBy("__g").agg(
        F.sum("__na").alias("__ta"), F.sum("__nb").alias("__tb")
    )
    st = gstart.join(tot, "__g").select(
        "__g",
        (F.col("__xa") - F.col("__ta")).alias("__sa0"),
        (F.col("__xb") - F.col("__tb")).alias("__sb0"),
        "__ta",
        "__tb",
    )
    gaps = cum.join(F.broadcast(st), "__g").select(
        "__g",
        "__ta",
        "__tb",
        F.abs(
            (F.col("__cuma") - F.col("__sa0")).cast("double")
            / F.col("__ta").cast("double")
            - (F.col("__cumb") - F.col("__sb0")).cast("double")
            / F.col("__tb").cast("double")
        ).alias("__gap"),
    )
    agg = gaps.groupBy("__g").agg(
        F.max("__ta").alias("__na2"),
        F.max("__tb").alias("__nb2"),
        F.max(F.round(F.col("__gap"), 9)).alias("__d"),
    )
    na = F.col("__na2").cast("double")
    nb = F.col("__nb2").cast("double")
    lam = F.col("__d") * F.sqrt(na * nb / (na + nb))
    terms = F.expr(
        "aggregate(sequence(1, 100), CAST(0.0 AS DECIMAL(30,9)), "
        "(acc, k) -> CAST(acc + CAST(round("
        "CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END "
        "* exp(-2.0 * k * k * __lam * __lam), 9) AS DECIMAL(30,9)) "
        "AS DECIMAL(30,9)))"
    ).cast("double")
    out = (
        agg.join(two, "__g")
        .withColumn("__lam", lam)
        # lam = 0 (identical ECDFs) degenerates the alternating series
        # (it oscillates 1, 0, 1, ... instead of converging): p is 1 by
        # definition there. For small positive lam the 100-term truncation
        # is the DEFINED statistic (engine and oracle share it bit-for-bit;
        # truncation error only matters where p ~ 1 anyway).
        .withColumn(
            "__p",
            F.when(F.col("__lam") <= 0.0, F.lit(1.0)).otherwise(
                F.least(F.lit(1.0), F.greatest(F.lit(0.0), 2.0 * terms))
            ),
        )
        .select(
            F.col("__g").alias(group_col),
            "class_a",
            "class_b",
            F.col("__na2").cast("bigint").alias("n_a"),
            F.col("__nb2").cast("bigint").alias("n_b"),
            (F.round(F.col("__d"), 6) + 0.0).alias("d_stat"),
            (F.round(F.col("__p"), 4) + 0.0).alias("p_value"),
        )
        .orderBy(group_col)
    )
    return out


def concordance_ccc(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Lin's concordance correlation coefficient per group (Lin 1989):
    how well two continuous scorers agree on the IDENTITY line — Pearson
    rewards any linear relation; CCC additionally punishes scale and
    location bias, which is what "can scorer B replace scorer A" really
    asks:

        CCC = 2 s_xy / (s_x^2 + s_y^2 + (xbar - ybar)^2)

    (population moments). Also emits Pearson r and the location/scale
    bias components (Cb = CCC/r, the bias-correction factor). Returns
    ``(group, n, r, ccc, c_b)`` at 6dp, NULL where either variance is 0.

    Plan: ONE DECIMAL-moment aggregate per group. Nothing else.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    agg = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("double").alias("v"),
        _dsum(F.col("__x")).alias("sx"),
        _dsum(F.col("__y")).alias("sy"),
        _dsum(F.col("__x") * F.col("__x")).alias("sxx"),
        _dsum(F.col("__x") * F.col("__y")).alias("sxy"),
        _dsum(F.col("__y") * F.col("__y")).alias("syy"),
    )
    v = F.col("v")
    mx = F.col("sx") / v
    my = F.col("sy") / v
    vx = F.col("sxx") / v - mx * mx
    vy = F.col("syy") / v - my * my
    cxy = F.col("sxy") / v - mx * my
    den_c = vx + vy + (mx - my) * (mx - my)
    ccc = F.when(den_c <= 0.0, F.lit(None).cast("double")).otherwise(
        2.0 * cxy / den_c
    )
    den_r = F.sqrt(vx) * F.sqrt(vy)
    r = F.when(den_r <= 0.0, F.lit(None).cast("double")).otherwise(cxy / den_r)
    cb = F.when(
        r.isNull() | (F.abs(r) <= 0.0), F.lit(None).cast("double")
    ).otherwise(ccc / r)
    return agg.select(
        F.col("__g").alias(group_col),
        v.cast("bigint").alias("n"),
        (F.round(r, 6) + 0.0).alias("r"),
        (F.round(ccc, 6) + 0.0).alias("ccc"),
        (F.round(cb, 6) + 0.0).alias("c_b"),
    ).orderBy(group_col)


def agreement_limits(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Bland-Altman limits of agreement per group (Bland & Altman 1986):
    mean difference (the systematic bias of scorer y vs x) and
    mean +- 1.96 sd bounds (where 95% of per-item disagreements live) —
    the practical companion to concordance_ccc: CCC says HOW MUCH the
    scorers agree, the limits say BY HOW MANY POINTS they can differ on
    one document.

    Returns ``(group, n, bias, sd_diff, loa_lo, loa_hi)`` at 6dp
    (population sd; NULL sd-dependent columns for n < 2).

    Plan: ONE DECIMAL-moment aggregate over the difference column.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        (F.col(y_col).cast("double") - F.col(x_col).cast("double")).alias(
            "__d"
        ),
    ).where(F.col("__d").isNotNull())
    agg = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("double").alias("v"),
        _dsum(F.round(F.col("__d"), 9)).alias("sd_"),
        _dsum(F.round(F.col("__d"), 9) * F.round(F.col("__d"), 9)).alias(
            "sdd"
        ),
    )
    v = F.col("v")
    bias = F.col("sd_") / v
    vard = F.greatest(F.lit(0.0), F.col("sdd") / v - bias * bias)
    sd = F.when(v >= 2.0, F.sqrt(vard))
    return agg.select(
        F.col("__g").alias(group_col),
        v.cast("bigint").alias("n"),
        (F.round(bias, 6) + 0.0).alias("bias"),
        (F.round(sd, 6) + 0.0).alias("sd_diff"),
        (F.round(bias - 1.959964 * sd, 6) + 0.0).alias("loa_lo"),
        (F.round(bias + 1.959964 * sd, 6) + 0.0).alias("loa_hi"),
    ).orderBy(group_col)
