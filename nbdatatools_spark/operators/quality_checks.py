"""Declarative data-quality verification (Deequ-style; Schelter et al.
VLDB 2018) — constraint checks over a DataFrame reported as one row per
check: ``(check STRING, n_violations BIGINT, passed BOOLEAN)``.

The core trick is Deequ's: every ROW-LOCAL constraint (not-null, range,
regex, custom predicate) compiles to a conditional-count aggregate, and
ALL of them run in a single map-side-combinable pass over the data — one
job, no shuffle beyond the final 1-row reduce, however many checks you
stack. Only two check families genuinely need more:

- ``unique(cols)`` — a distinct count (one hash-aggregate shuffle on the
  checked columns);
- ``foreign_key(cols, parent, parent_cols)`` — a left-anti join against
  the parent's distinct keys (AQE picks broadcast when the parent is
  small, the usual dim-table case).

Each family contributes its own job; results union into one tiny report
frame. At 100 TB the row-local pass is a single scan, the unique check
shuffles only the key columns, and FK checks shuffle child keys against
the (usually broadcast) parent key set — nothing materializes wide rows.

Checks are (name, kind, payload) tuples built by the helper
constructors; ``quality_report`` is the runner.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple:
    """Violation: the column is NULL."""
    return (f"not_null({col})", "row", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple:
    """Violation: value outside [lo, hi] (NULLs don't violate — stack a
    not_null check for that)."""
    c = F.col(col)
    return (
        f"in_range({col},{lo},{hi})",
        "row",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def matches(col: str, pattern: str) -> tuple:
    """Violation: non-NULL value does not match the anchored regex."""
    c = F.col(col)
    return (
        f"matches({col})",
        "row",
        c.isNotNull() & ~c.rlike(pattern),
    )


def satisfies(name: str, violation_cond) -> tuple:
    """Violation: the arbitrary boolean Column is true."""
    return (f"satisfies({name})", "row", violation_cond)


def unique(cols: str | Sequence[str]) -> tuple:
    """Violation count: count(*) - count(DISTINCT cols) — rows beyond
    the first per duplicate key. Rows where ANY checked column is NULL
    are dropped by count(DISTINCT ...) in both Spark and ANSI SQL, so
    every NULL-keyed row counts as a violation (stack not_null checks to
    attribute them)."""
    cs = [cols] if isinstance(cols, str) else list(cols)
    return (f"unique({','.join(cs)})", "unique", cs)


def foreign_key(
    cols: str | Sequence[str], parent: DataFrame, parent_cols: str | Sequence[str]
) -> tuple:
    """Violation count: child rows with a non-NULL key absent from the
    parent key set (SQL-standard FK semantics: NULL keys pass)."""
    cs = [cols] if isinstance(cols, str) else list(cols)
    ps = [parent_cols] if isinstance(parent_cols, str) else list(parent_cols)
    if len(cs) != len(ps):
        raise ValueError(f"child/parent key arity mismatch: {cs} vs {ps}")
    return (f"foreign_key({','.join(cs)})", "fk", (cs, parent, ps))


def quality_report(df: DataFrame, checks: Sequence[tuple]) -> DataFrame:
    """Run the checks; returns (check, n_violations, passed), one row per
    check, in a deterministic order (sorted by check name).

    All row-local checks share ONE aggregate pass; each unique/fk check
    adds one slim keyed job; the union is a handful of 1-row frames.
    """
    if not checks:
        raise ValueError("no checks given")
    names = [c[0] for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {sorted(names)}")
    spark = df.sparkSession
    reports: list[DataFrame] = []

    row_checks = [(n, cond) for n, kind, cond in checks if kind == "row"]
    if row_checks:
        agg_row = df.agg(
            *[
                F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"c{i}")
                for i, (_, cond) in enumerate(row_checks)
            ]
        )
        stacked = agg_row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("check"),
                            F.coalesce(F.col(f"c{i}"), F.lit(0)).alias(
                                "n_violations"
                            ),
                        )
                        for i, (n, _) in enumerate(row_checks)
                    ]
                )
            ).alias("r")
        ).select("r.check", "r.n_violations")
        reports.append(stacked)

    for n, kind, payload in checks:
        if kind == "unique":
            cs = payload
            rep = df.agg(
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cs]))
                .cast("long")
                .alias("n_violations")
            ).select(F.lit(n).alias("check"), "n_violations")
            reports.append(rep)
        elif kind == "fk":
            cs, parent, ps = payload
            # non-NULL composite keys only (SQL FK: NULL passes)
            cond = F.lit(True)
            for c in cs:
                cond = cond & F.col(c).isNotNull()
            child_keys = df.select(*[F.col(c) for c in cs]).where(cond)
            parent_keys = parent.select(
                *[F.col(p).alias(c) for c, p in zip(cs, ps)]
            ).distinct()
            rep = (
                child_keys.join(parent_keys, cs, "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                .select(F.lit(n).alias("check"), "n_violations")
            )
            reports.append(rep)

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "check",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check")


_NUM_TYPES = ("tinyint", "smallint", "int", "bigint", "float", "double")


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """Single-pass column profiling (the Deequ/Glue "analyzer" surface):
    per requested column, row count, NULL count, distinct count, and
    min/max — strings in ``min_str/max_str``, numerics rounded to 6dp in
    ``min_num/max_num``. Returns one row per column:
    ``(column, n_rows, n_null, n_distinct, min_str, max_str, min_num,
    max_num)``.

    Plan: ALL per-column statistics compile into ONE aggregate over one
    scan — count/min/max combine map-side; the exact distinct counts
    make Catalyst expand the input (one duplicate of the slim projection
    per distinct column), which is the classic multi-distinct plan and
    is fine while the column list is short. For 100-TB profiling runs
    pass ``approx=True``: ``approx_count_distinct`` (HLL) keeps the
    whole profile a single non-expanded map-side-combinable pass.
    The 1-row aggregate then explodes into the per-column report frame —
    driver never collects anything.
    """
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    nd = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(nd(F.col(c)).alias(f"__nd_{c}"))
        if dtypes[c] in _NUM_TYPES:
            aggs.append(F.round(F.min(c).cast("double"), 6).alias(f"__min_{c}"))
            aggs.append(F.round(F.max(c).cast("double"), 6).alias(f"__max_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__max_{c}"))
    row = df.agg(*aggs)
    entries = []
    for c in cols:
        is_num = dtypes[c] in _NUM_TYPES
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                (F.lit(None).cast("string") if is_num else F.col(f"__min_{c}")).alias(
                    "min_str"
                ),
                (F.lit(None).cast("string") if is_num else F.col(f"__max_{c}")).alias(
                    "max_str"
                ),
                (F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "min_num"
                ),
                (F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "max_num"
                ),
            )
        )
    return row.select(F.explode(F.array(*entries)).alias("__p")).select("__p.*")


def k_anonymity(df, quasi_cols, k: int = 5):
    """k-anonymity audit (Sweeney 2002): equivalence classes over the
    quasi-identifier columns with fewer than ``k`` members — the groups a
    release at this granularity would expose to re-identification. The
    release-gating companion to analysis.dp_counts: run this BEFORE
    publishing any grouped aggregate of user-linked data.

    ONE groupBy over the quasi tuple with map-side combine; the risky-set
    result is bounded by the quasi-space, not the row count. Returns the
    risky groups (quasi values + n) ordered by the quasi columns; empty
    result == the release is k-anonymous at this granularity.
    """
    from pyspark.sql import functions as F

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") < k)
        .orderBy(*quasi_cols)
    )


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column
    (beyond-reference surface, SURVEY §7.8) — the classic fabricated- or
    truncated-data smell test: organically-grown magnitudes put digit d
    first with probability ``log10(1 + 1/d)``; synthetic, capped, or
    copy-pasted values don't.

    First significant digit extraction is STRING-based (strip everything
    but 1-9 from the value's canonical repr, take the first char) — no
    ``floor(v / 10^floor(log10 v))`` float hazard at powers of ten.
    Rows with value <= 0 or no significant digit are excluded from n.

    Scale shape: one map-side project + a 9-key groupBy; the chi-square
    statistic folds the 9-row digit table (broadcast-sized). Per-digit
    terms round to 9dp and DECIMAL-sum; outputs round to 6dp.

    Returns 9 rows ``(digit, n_obs, p_expected, p_observed, chi2)`` —
    ``chi2`` is the GLOBAL statistic (8 dof), repeated per row.
    """
    sig = (
        df.select(
            F.col(value_col).alias("__v"),
            F.substring(
                F.regexp_replace(
                    F.col(value_col).cast("string"), "[^1-9]", ""
                ),
                1,
                1,
            ).alias("digit"),
        )
        .where((F.col("__v") > 0) & (F.col("digit") != ""))
        .select("digit")
    )
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("string").alias("digit")
    )
    counts = (
        digits.join(sig.groupBy("digit").count(), "digit", "left")
        .select("digit", F.coalesce("count", F.lit(0)).alias("n_obs"))
    )
    total = counts.agg(F.sum("n_obs").alias("n"))
    scored = counts.crossJoin(F.broadcast(total)).select(
        F.col("digit").cast("int").alias("digit"),
        "n_obs",
        F.round(
            F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
            / F.log(F.lit(10.0)),
            9,
        ).alias("p_expected"),
        F.when(
            F.col("n") > 0, F.round(F.col("n_obs") / F.col("n"), 6)
        ).alias("p_observed"),
        F.col("n"),
    )
    chi2 = scored.agg(
        F.round(
            F.sum(
                F.round(
                    F.when(
                        F.col("n") > 0,
                        F.pow(
                            F.col("n_obs")
                            - F.col("n") * F.col("p_expected"),
                            2,
                        )
                        / (F.col("n") * F.col("p_expected")),
                    ),
                    9,
                ).cast("decimal(30,9)")
            )
            .cast("decimal(38,9)")
            .cast("double"),
            6,
        ).alias("chi2")
    )
    return (
        scored.crossJoin(F.broadcast(chi2))
        .select("digit", "n_obs", "p_expected", "p_observed", "chi2")
        .orderBy("digit")
    )


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V effect size (beyond-reference surface,
    SURVEY §7.8) — the bias audit that says whether e.g. language and
    source are entangled in a corpus (a skew that stratified sampling
    must then correct for).

    ``chi2 = sum_cells (O - E)^2 / E`` with ``E = n_a * n_b / n`` from
    the marginals; ``dof = (R-1)(C-1)``;
    ``V = sqrt(chi2 / (n * min(R-1, C-1)))``.

    Scale shape: one groupBy(a, b) contingency aggregate (map-side
    partial) — everything downstream runs on the R*C cell table,
    broadcast-sized for real categorical columns. Null categories
    participate as their own level via a sentinel. Cell terms round to
    9dp and DECIMAL-sum; outputs round to 6dp.

    Returns one row ``(n, levels_a, levels_b, dof, chi2, cramers_v)``.
    """
    base = df.select(
        F.coalesce(F.col(col_a).cast("string"), F.lit("<null>")).alias("a"),
        F.coalesce(F.col(col_b).cast("string"), F.lit("<null>")).alias("b"),
    )
    cells = base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("o"))
    ma = cells.groupBy("a").agg(F.sum("o").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("o").alias("nb"))
    n = cells.agg(F.sum("o").alias("n"))
    # the full R x C grid: an UNOBSERVED cell still contributes
    # (0 - E)^2 / E = E to the statistic
    grid = ma.crossJoin(F.broadcast(mb)).join(cells, ["a", "b"], "left").select(
        "na", "nb", F.coalesce("o", F.lit(0)).alias("o")
    )
    terms = (
        grid.crossJoin(F.broadcast(n))
        .select(
            F.round(
                F.pow(
                    F.col("o")
                    - F.col("na").cast("double") * F.col("nb") / F.col("n"),
                    2,
                )
                / (F.col("na").cast("double") * F.col("nb") / F.col("n")),
                9,
            ).alias("term")
        )
    )
    stat = terms.agg(
        F.sum(F.col("term").cast("decimal(30,9)"))
        .cast("decimal(38,9)")
        .cast("double")
        .alias("chi2_raw")
    )
    dims = cells.agg(
        F.countDistinct("a").alias("levels_a"),
        F.countDistinct("b").alias("levels_b"),
    )
    return (
        n.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(stat))
        .select(
            "n",
            "levels_a",
            "levels_b",
            ((F.col("levels_a") - 1) * (F.col("levels_b") - 1)).alias("dof"),
            F.round("chi2_raw", 6).alias("chi2"),
            F.when(
                F.least(F.col("levels_a"), F.col("levels_b")) > 1,
                F.round(
                    F.sqrt(
                        F.col("chi2_raw")
                        / (
                            F.col("n")
                            * F.least(
                                F.col("levels_a") - 1,
                                F.col("levels_b") - 1,
                            )
                        )
                    ),
                    6,
                ),
            ).alias("cramers_v"),
        )
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information + normalized MI between two categorical columns
    (chi_square_independence's information-theoretic sibling; NMI here
    measures column-vs-column metadata entanglement, distinct from
    clustering.cluster_label_agreement which scores a clustering against
    ground truth).

    ``MI = sum_cells (o/n) * ln(o*n / (na*nb))`` over OBSERVED cells
    (empty cells contribute 0 in the limit); ``H(X) = -sum (na/n) ln(na/n)``;
    ``NMI = MI / sqrt(H(X) * H(Y))`` (NULL when either entropy is 0 — a
    constant column carries no information to normalize by).

    Scale shape: ONE groupBy(a, b) contingency aggregate (map-side
    partial); marginals re-aggregate the cell table, which is
    broadcast-sized for real categorical columns. Cell terms round to
    9dp and DECIMAL-sum (order-invariant); outputs round to 6dp. Null
    categories participate via a sentinel.

    Returns one row ``(n, levels_a, levels_b, mi, h_a, h_b, nmi)``.
    """
    base = df.select(
        F.coalesce(F.col(col_a).cast("string"), F.lit("<null>")).alias("a"),
        F.coalesce(F.col(col_b).cast("string"), F.lit("<null>")).alias("b"),
    )
    cells = base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("o"))
    ma = cells.groupBy("a").agg(F.sum("o").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("o").alias("nb"))
    n = cells.agg(F.sum("o").alias("n"))

    def _entropy(marg: DataFrame, cnt: str, out: str) -> DataFrame:
        return (
            marg.crossJoin(F.broadcast(n))
            .select(
                F.round(
                    -(F.col(cnt).cast("double") / F.col("n"))
                    * F.log(F.col(cnt).cast("double") / F.col("n")),
                    9,
                ).alias("t")
            )
            .agg(
                F.sum(F.col("t").cast("decimal(30,9)"))
                .cast("decimal(38,9)")
                .cast("double")
                .alias(out)
            )
        )

    mi_terms = (
        cells.join(ma, "a")
        .join(mb, "b")
        .crossJoin(F.broadcast(n))
        .select(
            F.round(
                (F.col("o").cast("double") / F.col("n"))
                * F.log(
                    F.col("o").cast("double")
                    * F.col("n")
                    / (F.col("na").cast("double") * F.col("nb"))
                ),
                9,
            ).alias("t")
        )
    )
    mi = mi_terms.agg(
        F.sum(F.col("t").cast("decimal(30,9)"))
        .cast("decimal(38,9)")
        .cast("double")
        .alias("mi_raw")
    )
    dims = cells.agg(
        F.countDistinct("a").alias("levels_a"),
        F.countDistinct("b").alias("levels_b"),
    )
    return (
        n.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(_entropy(ma, "na", "ha_raw")))
        .crossJoin(F.broadcast(_entropy(mb, "nb", "hb_raw")))
        .select(
            "n",
            "levels_a",
            "levels_b",
            F.round("mi_raw", 6).alias("mi"),
            F.round("ha_raw", 6).alias("h_a"),
            F.round("hb_raw", 6).alias("h_b"),
            F.when(
                (F.col("ha_raw") > 0.0) & (F.col("hb_raw") > 0.0),
                F.round(
                    F.col("mi_raw") / F.sqrt(F.col("ha_raw") * F.col("hb_raw")), 6
                ),
            ).alias("nmi"),
        )
    )
