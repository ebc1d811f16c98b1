"""Dataset analysis operators: zero detection, describe, per-dimension
moments, distribution fitting (A1-A6, P9 in SURVEY §2).

Reference semantics:
- ``analyze count_zeros`` (README.md:40; 03-cli-reference.md:184-198): count
  all-zero vectors.
- ``analyze describe`` (README.md:41): counts, dimensions, per-facet stats.
- model fitting (docs/user_manual/verification/06_model_fitting.md:1-60):
  per-dimension mean/variance/skewness/kurtosis/quantiles, K-S statistic vs
  candidate distributions.
- answer-key invariants (A6): distances ascending per row, indices in bounds.

All distributed: per-dimension stats use posexplode + groupBy(dim) — one
shuffle keyed by dimension index (perfectly uniform keys, no skew).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def is_zero_vector(vec) -> "F.Column":
    """True when every component is exactly zero (P9)."""
    return F.forall(vec, lambda x: x == 0)


def count_zero_vectors(df: DataFrame, vec: str = "vector") -> DataFrame:
    """``analyze count_zeros`` — 1-row (n_zero, n_total)."""
    return df.agg(
        F.sum(F.when(is_zero_vector(F.col(vec)), 1).otherwise(0)).alias("n_zero"),
        F.count("*").alias("n_total"),
    )


def describe(df: DataFrame, ordinal: str = "ordinal", vec: str = "vector") -> DataFrame:
    """``analyze describe`` — facet cardinality, dimension uniformity, ordinal
    span, zero count (A3). One pass, all JVM-side."""
    return df.agg(
        F.count("*").alias("count"),
        F.min(ordinal).alias("min_ordinal"),
        F.max(ordinal).alias("max_ordinal"),
        F.countDistinct(F.size(vec)).alias("n_distinct_dims"),
        F.min(F.size(vec)).alias("min_dim"),
        F.max(F.size(vec)).alias("max_dim"),
        F.sum(F.when(is_zero_vector(F.col(vec)), 1).otherwise(0)).alias("n_zero"),
    )


def dim_moments(df: DataFrame, vec: str = "vector") -> DataFrame:
    """Per-dimension mean / variance / skewness / kurtosis / quantiles (A4).

    Moments use explicit population formulas (avg of centered powers) so any
    SQL oracle reproduces them bit-for-bit-ish; skew/kurt follow the g1/g2
    population definitions used in the reference's model-fitting doc
    (03_interpreting_results.md:7-100).
    """
    exploded = df.select(F.posexplode(vec).alias("dim", "value")).select(
        "dim", F.col("value").cast("double").alias("value")
    )
    base = exploded.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mean"),
        F.avg(F.col("value") * F.col("value")).alias("m2raw"),
        F.avg(F.pow("value", 3)).alias("m3raw"),
        F.avg(F.pow("value", 4)).alias("m4raw"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
        F.percentile_approx("value", [0.25, 0.5, 0.75], 10000).alias("quartiles"),
    )
    mu = F.col("mean")
    m2 = F.col("m2raw") - mu * mu
    m3 = F.col("m3raw") - 3 * mu * F.col("m2raw") + 2 * F.pow(mu, 3)
    m4 = (
        F.col("m4raw")
        - 4 * mu * F.col("m3raw")
        + 6 * mu * mu * F.col("m2raw")
        - 3 * F.pow(mu, 4)
    )
    return base.select(
        "dim",
        "n",
        "mean",
        m2.alias("variance"),
        (m3 / F.pow(F.sqrt(m2), 3)).alias("skewness"),
        (m4 / (m2 * m2) - 3.0).alias("kurtosis"),
        "min",
        "max",
        "quartiles",
    )


def empirical_cdf(df: DataFrame, vec: str = "vector") -> DataFrame:
    """Per-dimension empirical CDF via cume_dist (W3) — input to K-S."""
    exploded = df.select(F.posexplode(vec).alias("dim", "value"))
    w = Window.partitionBy("dim").orderBy("value")
    return exploded.withColumn("cdf", F.cume_dist().over(w))


def ks_statistic_normal(df: DataFrame, vec: str = "vector") -> DataFrame:
    """Per-dimension K-S statistic against N(mean_d, var_d) fitted per dim.

    Mirrors the model-fitting pipeline's K-S step
    (06_model_fitting.md:1-60: thresholds 0.03 strong / 0.10 acceptable).
    Normal CDF via erf — a Catalyst-native closed form.
    """
    ecdf = empirical_cdf(df, vec)
    stats = (
        df.select(F.posexplode(vec).alias("dim", "value"))
        .groupBy("dim")
        .agg(F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma"))
    )
    joined = ecdf.join(F.broadcast(stats), "dim")
    z = (F.col("value") - F.col("mu")) / (F.col("sigma") * math.sqrt(2.0))
    theo = 0.5 * (1.0 + _erf(z))
    return (
        joined.withColumn("ks", F.abs(F.col("cdf") - theo))
        .groupBy("dim")
        .agg(F.max("ks").alias("ks_stat"))
    )


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf approximation as a Column expr (|err| <
    1.5e-7 — far below the 0.03 K-S threshold)."""
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


def ks_statistics(df: DataFrame, vec: str = "vector") -> DataFrame:
    """Per-dimension K-S statistics against fitted candidates in ONE pass
    over the exploded data: normal(mu, sigma) and uniform(min, max).

    Returns (dim, ks_normal, ks_uniform). Candidate params fit per dim from
    the same scan (broadcast back); empirical CDF via cume_dist. Extend by
    adding a theoretical-CDF expression per candidate — the join/agg shape
    stays identical.
    """
    ecdf = empirical_cdf(df, vec)
    stats = (
        df.select(F.posexplode(vec).alias("dim", "value"))
        .groupBy("dim")
        .agg(
            F.avg("value").alias("mu"),
            F.stddev_pop("value").alias("sigma"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )
    joined = ecdf.join(F.broadcast(stats), "dim")
    z = (F.col("value") - F.col("mu")) / (F.col("sigma") * math.sqrt(2.0))
    cdf_norm = 0.5 * (1.0 + _erf(z))
    width = F.col("hi") - F.col("lo")
    cdf_unif = F.when(width > 0, (F.col("value") - F.col("lo")) / width).otherwise(0.5)
    return (
        joined.select(
            "dim",
            F.abs(F.col("cdf") - cdf_norm).alias("d_norm"),
            F.abs(F.col("cdf") - cdf_unif).alias("d_unif"),
        )
        .groupBy("dim")
        .agg(
            F.max("d_norm").alias("ks_normal"),
            F.max("d_unif").alias("ks_uniform"),
        )
    )


# K-S acceptance thresholds (docs/user_manual/verification/
# 06_model_fitting.md: 0.03 strong fit, 0.10 acceptable)
KS_STRONG = 0.03
KS_ACCEPTABLE = 0.10


def fit_distributions(df: DataFrame, vec: str = "vector") -> DataFrame:
    """Model-extraction selection step (06_model_fitting.md:1-60): per
    dimension, pick the candidate with the lowest K-S statistic; grade the
    fit strong/acceptable/empirical (the reference's empirical fallback when
    nothing clears 0.10)."""
    ks = ks_statistics(df, vec)
    best_stat = F.least("ks_normal", "ks_uniform")
    best_name = F.when(F.col("ks_normal") <= F.col("ks_uniform"), "normal").otherwise(
        "uniform"
    )
    grade = (
        F.when(best_stat <= KS_STRONG, "strong")
        .when(best_stat <= KS_ACCEPTABLE, "acceptable")
        .otherwise("empirical")
    )
    return ks.select(
        "dim",
        "ks_normal",
        "ks_uniform",
        best_name.alias("best_fit"),
        best_stat.alias("ks_stat"),
        grade.alias("fit_grade"),
    )


def neighbor_invariants(
    indices_df: DataFrame,
    distances_df: DataFrame,
    base_count: int,
    ordinal: str = "ordinal",
) -> DataFrame:
    """Answer-key invariants (A6): distances non-decreasing within each row,
    indices within [0, base_count). Returns violation counts (all zero on a
    valid answer key)."""
    d = distances_df.select(
        ordinal,
        (
            ~F.forall(
                F.zip_with(
                    F.slice("distances", 1, F.size("distances") - 1),
                    F.slice("distances", 2, F.size("distances") - 1),
                    lambda a, b: a <= b,
                ),
                lambda ok: ok,
            )
        ).alias("bad_order"),
    )
    i = indices_df.select(
        ordinal,
        (
            ~F.forall("indices", lambda x: (x >= 0) & (x < base_count))
        ).alias("bad_bounds"),
    )
    return d.join(i, ordinal).agg(
        F.sum(F.col("bad_order").cast("int")).alias("n_bad_order"),
        F.sum(F.col("bad_bounds").cast("int")).alias("n_bad_bounds"),
        F.count("*").alias("n_rows"),
    )


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 100,
    exact_doc_counts: bool = True,
) -> DataFrame:
    """Corpus vocabulary: global top-k tokens by occurrence count, with
    document frequency — the wordcount shape of text analysis (SURVEY §7.8).

    Plan: explode(whitespace tokens of normalized text) -> one groupBy on
    token (map-side combinable counts) -> TakeOrderedAndProject for the
    global top-k (no full sort, no single-reducer window). Document
    frequency is countDistinct(id) — exact by default; at 100TB pass
    ``exact_doc_counts=False`` for approx_count_distinct (HLL, one pass,
    no distinct expansion)."""
    from nbdatatools_spark.functions.text import normalize_text, tokens

    # explode_outer + null drop (here and below): inner explode's
    # inferred size()>0 filter inlines the tokenize chain into an
    # interpreted per-row scan filter (the winnow_candidate_pairs trap).
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("token"),
    ).where(F.col("token").isNotNull())
    ndocs = (
        F.count_distinct("__id") if exact_doc_counts else F.approx_count_distinct("__id")
    )
    return (
        ex.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"), ndocs.alias("n_docs"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def covariance_matrix(
    df: DataFrame, vec: str = "vector", dims: int | None = None, impl: str = "expr"
) -> DataFrame:
    """Pairwise population covariance of the first ``dims`` vector
    dimensions (default: all) — the input to PCA / whitening / redundancy
    analysis over an embedding column.

    Two implementations, the knn-style expr/gemm duality:

    - ``impl="expr"`` (default, the oracle path): each row emits its
      upper-triangle (i <= j) products as an inline-generated struct
      array (pure Catalyst transform/flatten, no UDF), exploded into ONE
      groupBy((i, j)) — d(d+1)/2 perfectly uniform keys, fully map-side
      combinable: the shuffle payload is d(d+1)/2 partial aggregates per
      task regardless of row count. Wins at d <= ~64.
    - ``impl="gemm"`` (the scale path for d in the hundreds): one Arrow
      pass computes per-partition gramian partials (n, sum_x, X^T X — a
      BLAS matmul per batch), the driver combines P partials of d^2
      scalars (bounded by dimensionality, not rows; the fitting-sketch
      collect shape). Per-row cost is the d^2 GEMM flop, not d^2/2
      Catalyst struct allocations — orders of magnitude faster at d=256.
      Float accumulation order differs from expr, so results agree to
      ~1e-12 relative, not bitwise; the gate pins the expr path.

    cov = avg(xy) - avg(x) avg(y) (population, matching dim_moments'
    population variance on the diagonal). Returns ``(i, j, n, cov)``.
    """
    first = df.select(F.size(vec).alias("d")).first()
    d = int(first["d"]) if first is not None else 0
    if dims is not None:
        d = min(d, int(dims))
    if d < 1:
        raise ValueError("covariance_matrix needs at least one dimension")
    if impl == "gemm":
        return _covariance_gemm(df, vec, d)
    if impl != "expr":
        raise ValueError(f"impl must be 'expr' or 'gemm', got {impl!r}")
    hi = d - 1
    pairs = F.expr(
        f"flatten(transform(sequence(0, {hi}), i -> "
        f"transform(sequence(i, {hi}), j -> struct("
        f"i AS i, j AS j, "
        f"CAST({vec}[i] AS DOUBLE) AS x, CAST({vec}[j] AS DOUBLE) AS y))))"
    )
    ex = (
        df.select(F.explode_outer(pairs).alias("p"))
        .where(F.col("p").isNotNull())
    ).select(
        F.col("p.i").alias("i"),
        F.col("p.j").alias("j"),
        F.col("p.x").alias("x"),
        F.col("p.y").alias("y"),
    )
    return (
        ex.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")).alias("cov"),
        )
        .orderBy("i", "j")
    )


def _covariance_gemm(df: DataFrame, vec: str, d: int) -> DataFrame:
    """Gramian partials per partition (numpy X^T X over Arrow batches) +
    driver combine — see covariance_matrix(impl="gemm")."""
    import numpy as np

    spark = df.sparkSession

    def partials(batches):
        import pandas as pd

        n = 0
        s = np.zeros(d, dtype=np.float64)
        ss = np.zeros((d, d), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.asarray(
                [row[:d] for row in pdf["__v"].to_list()], dtype=np.float64
            )
            n += m.shape[0]
            s += m.sum(axis=0)
            ss += m.T @ m
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
        )

    rows = (
        df.select(F.col(vec).alias("__v"))
        .mapInPandas(partials, "n long, s array<double>, ss array<double>")
        .collect()
    )
    n_tot = sum(r["n"] for r in rows)
    if n_tot == 0:
        raise ValueError("covariance_matrix needs at least one row")
    s_tot = np.zeros(d)
    ss_tot = np.zeros((d, d))
    for r in rows:
        s_tot += np.asarray(r["s"])
        ss_tot += np.asarray(r["ss"]).reshape(d, d)
    mean = s_tot / n_tot
    cov = ss_tot / n_tot - np.outer(mean, mean)
    out = [
        (i, j, int(n_tot), float(cov[i, j]))
        for i in range(d)
        for j in range(i, d)
    ]
    return spark.createDataFrame(out, "i INT, j INT, n BIGINT, cov DOUBLE")


def pca_top_components(
    df: DataFrame, vec: str = "vector", k: int = 2, dims: int | None = None,
    impl: str = "expr",
):
    """Top-k principal components of a vector column: ONE distributed
    pass (covariance_matrix — map-side-combined d(d+1)/2 partial sums),
    then an eigendecomposition of the d x d matrix on the driver. The
    driver step is O(d^3) on d^2 SCALARS — bounded by construction
    (dimensionality, not row count), the same legitimate-collect shape as
    fitting's moment sketches; rows never leave the executors.

    Sign convention: each eigenvector is flipped so its largest-magnitude
    coordinate is positive (eigh's sign is otherwise arbitrary), making
    results deterministic across BLAS builds.

    Returns ``(eigenvalues, components)``: list[float] (descending) and
    list[list[float]] (row per component).
    """
    import numpy as np

    cov_rows = covariance_matrix(df, vec, dims=dims, impl=impl).collect()
    d = max(r["j"] for r in cov_rows) + 1
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    m = np.zeros((d, d))
    for r in cov_rows:
        m[r["i"], r["j"]] = m[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(m)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return [float(vals[i]) for i in order], comps


def pca_project(
    df: DataFrame,
    components: list,
    vec: str = "vector",
    out_prefix: str = "pc",
) -> DataFrame:
    """Project vectors onto fixed components (from pca_top_components or
    any external model): one literal-array dot product per component —
    pure Catalyst ``zip_with`` + ``aggregate``, whole-stage codegen, no
    shuffle, no UDF. Appends ``{out_prefix}0..{k-1}`` DOUBLE columns."""
    out = df
    for c_idx, comp in enumerate(components):
        lit = F.array(*[F.lit(float(x)) for x in comp])
        dot = F.aggregate(
            F.zip_with(
                F.slice(F.col(vec), 1, len(comp)),
                lit,
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"{out_prefix}{c_idx}", dot)
    return out


def vocab_coverage(
    df: DataFrame,
    thresholds: tuple = (0.5, 0.9, 0.99),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Zipf coverage curve: for each threshold p, the smallest k such that
    the top-k tokens (by occurrence count, token-asc tie-break) cover >= p
    of all token occurrences — the vocabulary-sizing question for
    tokenizer/vocab design ("how big a vocab covers 99% of the corpus?").

    Plan: one token-count groupBy (map-side combinable), then a global
    running sum over (count DESC, token ASC) in the two-phase
    partition-offset shape (windows.global_row_index's pattern: partition-
    local cumsum + P-row offset table joined back — no single-reducer
    window over the vocabulary). Total occurrences is one driver scalar
    (bounded collect). Threshold selection is three conditional
    min(struct) aggregates in ONE pass — no crossJoin.

    Returns ``(threshold DOUBLE, k_tokens BIGINT, coverage DOUBLE)`` —
    coverage is the exact covered-occurrence share at that k, rounded 6dp.
    """
    from nbdatatools_spark.functions.text import normalize_text, tokens

    if not thresholds or any(not 0.0 < p <= 1.0 for p in thresholds):
        raise ValueError(f"thresholds must be in (0, 1], got {thresholds}")
    counts = (
        df.select(F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("token"))
        .where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    order = [F.col("n").desc(), F.col("token").asc()]
    n_part = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    local = (
        counts.repartitionByRange(n_part, *order)
        .sortWithinPartitions(*order)
        .select(
            "*",
            F.spark_partition_id().alias("__pid"),
            (F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))).alias(
                "__local"
            ),
        )
        # pin the partitioning: both the row branch and the P-row offset
        # branch must read the SAME materialized exchange (AQE may re-plan
        # an unpinned ReusedExchange differently per consumer — the
        # global_row_index sf0.1 defect)
        .localCheckpoint(eager=False)
    )
    wl = (
        Window.partitionBy("__pid")
        .orderBy("__local")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = local.select(
        "__pid", "__local", "n", F.sum("n").over(wl).alias("__lcum")
    )
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"), F.sum("n").alias("__sum"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__cnt_off"),
            F.coalesce(F.sum("__sum").over(woff), F.lit(0)).alias("__sum_off"),
        )
    )
    ranked = local.join(offs, "__pid").select(
        (F.col("__local") + F.col("__cnt_off") + 1).alias("rnk"),
        (F.col("__lcum") + F.col("__sum_off")).alias("cum"),
    )
    total = counts.agg(F.sum("n")).collect()[0][0] or 0
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.lit(float(p)) * F.lit(int(total)),
                F.struct(F.col("rnk"), F.col("cum")),
            )
        ).alias(f"__p{i}")
        for i, p in enumerate(thresholds)
    ]
    one = ranked.agg(*picks)
    rows = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("threshold"),
                F.col(f"__p{i}.rnk").alias("k_tokens"),
                F.round(
                    F.col(f"__p{i}.cum").cast("double") / F.lit(int(total)), 6
                ).alias("coverage"),
            )
            for i, p in enumerate(thresholds)
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.threshold", "r.k_tokens", "r.coverage")
        .orderBy("threshold")
    )


def exact_percent_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    pct_col: str = "percentile",
) -> DataFrame:
    """EXACT percentile position ``(row_number - 1) / (n - 1)`` over a total
    order — the quantile-binning primitive (quality curricula, decile
    filtering) computed scalably: the global index is the two-phase
    partition-offset shape (windows.global_row_index), so no single-reducer
    window and no approx_percentile error bound anywhere.

    ``order_cols`` must be a TOTAL order (append an id tie-break);
    row_number semantics, not SQL percent_rank's tie-sharing — with a total
    order the two never differ on distinct keys and this stays
    deterministic on ties."""
    from nbdatatools_spark.operators.windows import global_row_index

    n = df.count()
    denom = float(n - 1) if n > 1 else 1.0
    idx = global_row_index(df, order_cols, out=rank_col)
    return idx.withColumn(pct_col, F.col(rank_col) / F.lit(denom))


def standardize_vectors(
    df: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "z",
    round_digits: int = 6,
) -> DataFrame:
    """Per-dimension z-score standardization of an embedding column
    ((x - mean_d) / std_d, population std) — the whitening/normalization
    preprocessing step in front of clustering, ANN, and SemDeDup.

    Scale shape: ONE corpus pass computes the d-row per-dimension moment
    table (posexplode + map-side-combined groupBy, output bounded by
    dimensionality, not corpus size — the same bounded-driver-result shape
    as pca_top_components); the fitted means/stds are inlined as literal
    arrays and the standardization itself is a shuffle-free, UDF-free
    transform projection.

    Engine-exact: means/stds are rounded to 9dp SQL-side BEFORE the
    projection (both engines standardize with the same literals, so avg()
    summation-order ulps can't propagate); outputs round to
    ``round_digits``. Zero-variance dimensions standardize to 0.0.
    """
    stats = (
        df.select(F.posexplode(vec).alias("dim", "value"))
        .select("dim", F.col("value").cast("double").alias("v"))
        .groupBy("dim")
        .agg(
            F.round(F.avg("v"), 9).alias("mu"),
            F.round(
                F.sqrt(F.avg(F.col("v") * F.col("v")) - F.avg("v") * F.avg("v")), 9
            ).alias("sd"),
        )
        .orderBy("dim")
        .collect()  # d rows — bounded by dimensionality
    )
    mus = F.array(*[F.lit(float(r.mu)) for r in stats])
    sds = F.array(*[F.lit(float(r.sd)) for r in stats])
    z = F.transform(
        F.col(vec),
        lambda x, i: F.when(F.element_at(sds, i + 1) == 0.0, F.lit(0.0)).otherwise(
            F.round(
                (x.cast("double") - F.element_at(mus, i + 1))
                / F.element_at(sds, i + 1),
                round_digits,
            )
        ),
    )
    return df.select(F.col(id_col), z.alias(out_col))


def group_keywords(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Distinguishing keywords per group — class-based TF-IDF (the
    c-TF-IDF idea behind BERTopic, Grootendorst arXiv:2203.05794,
    restated as classic group-level tf-idf): treat each group (domain,
    source, language, cluster id, ...) as one pseudo-document; score
    token t in group g by ``count(t in g) * ln(G / groups_containing(t))``
    and keep each group's top-k. Tokens present in every group (idf = 0)
    score 0 and only surface if nothing rarer exists.

    Plan: explode normalized tokens -> ONE map-side-combinable
    groupBy(group, token) count (the only pass over corpus text) ->
    group-frequency aggregate over the VOCAB-sized count table -> G is
    one bounded driver scalar (strata count, the mixture_rates pattern)
    -> per-group top-k via a ranking window over slim (group, token,
    score) rows. Nothing wide shuffles; the window partitions by group
    over vocab-sized input, not corpus-sized.

    Exactness: idf rounded 9dp, score = count * idf rounded 6dp; ties
    break on token ASC. Returns ``(group_col, token, n_occurrences,
    n_groups_with, score, rank)``.
    """
    from pyspark.sql import Window

    from nbdatatools_spark.functions.text import normalize_text, tokens

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    ex = df.select(
        F.col(group_col).alias("__g"),
        F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("token"),
    ).where(F.col("token").isNotNull())
    counts = ex.groupBy("__g", "token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    n_groups = df.select(group_col).distinct().count()
    gf = counts.groupBy("token").agg(F.count(F.lit(1)).alias("n_groups_with"))
    idf = F.round(F.log(F.lit(float(n_groups)) / F.col("n_groups_with")), 9)
    scored = (
        counts.where(F.col("n_occurrences") >= min_count)
        .join(gf, "token")
        .select(
            F.col("__g").alias(group_col),
            "token",
            "n_occurrences",
            "n_groups_with",
            F.round(F.col("n_occurrences") * idf, 6).alias("score"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
    )


def dim_quantiles(
    df: DataFrame,
    vec: str = "vector",
    probs: tuple = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact per-dimension quantiles of the vector population — the
    distribution companion to ``dim_moments`` (which only carries moments).
    posexplode -> ONE groupBy(dim) with Spark's exact sort-based
    ``percentile`` (linear interpolation at rank p*(n-1), the SQL-standard
    ``quantile_cont`` definition, so a SQL oracle matches to rounding).
    The shuffle carries (dim, value) pairs — d*n 12-byte rows, uniformly
    keyed by construction (every vector contributes one value per dim).
    """
    probs_arr = F.array(*[F.lit(float(p)) for p in probs])
    out = (
        df.select(F.posexplode(vec).alias("dim", "__v"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile(F.col("__v").cast("double"), probs_arr).alias("__q"),
        )
    )
    cols = [F.round(F.col("__q")[i], 6).alias(f"q{int(p * 100)}") for i, p in enumerate(probs)]
    return out.select("dim", "n", *cols).orderBy("dim")


def embedding_psi(
    baseline: DataFrame,
    current: DataFrame,
    vec: str = "embedding",
    n_bins: int = 10,
    lo: float = -4.0,
    hi: float = 4.0,
) -> DataFrame:
    """Per-dimension Population Stability Index between two embedding
    populations — the standard production drift monitor (PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted):

        PSI_d = sum_bins (p_b - q_b) * ln(p_b / q_b)

    over ``n_bins`` fixed-width bins on [lo, hi] (values outside clamp to
    the edge bins), with add-one smoothing on counts so empty bins stay
    defined. Fixed literal edges keep the monitor stateless and
    engine-portable; pass the baseline's own quantiles as (lo, hi) bounds
    upstream if adaptive edges are wanted.

    Plan: each side is one posexplode -> map-side bin projection; the two
    sides union (no join) into ONE (dim, bin) groupBy with conditional
    counts — 2*N*d slim rows shuffle on perfectly uniform keys, then a
    d-row rollup. The (p-q)*ln(p/q) terms are rounded to 9dp and
    DECIMAL-summed (order-independent, engine-exact to the final 6dp
    rounding).
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / n_bins

    def binned(df: DataFrame, tag: int) -> DataFrame:
        x = F.col("__v").cast("double")
        idx = F.floor((x - F.lit(float(lo))) / F.lit(float(width))).cast("int")
        clamped = F.least(F.greatest(idx, F.lit(0)), F.lit(n_bins - 1))
        return df.select(F.posexplode(vec).alias("dim", "__v")).select(
            "dim", clamped.alias("bin"), F.lit(tag).alias("__side")
        )

    counts = (
        binned(baseline, 0)
        .unionByName(binned(current, 1))
        .groupBy("dim", "bin")
        .agg(
            F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).alias("__cb"),
            F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("__cc"),
        )
    )
    totals = counts.groupBy("dim").agg(
        F.sum("__cb").alias("__nb"), F.sum("__cc").alias("__nc")
    )
    # full dim x bin grid: a bin empty on BOTH sides still contributes its
    # smoothing term (the canonical PSI definition) — observed-only groupBy
    # keys would silently drop it
    grid = totals.select(
        "dim", "__nb", "__nc",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    full = (
        grid.join(counts, ["dim", "bin"], "left")
        .na.fill(0, ["__cb", "__cc"])
    )
    p = (F.col("__cb") + 1).cast("double") / (F.col("__nb") + F.lit(n_bins))
    q = (F.col("__cc") + 1).cast("double") / (F.col("__nc") + F.lit(n_bins))
    term = F.round((p - q) * F.log(p / q), 9).cast("decimal(20,9)")
    return (
        full.groupBy("dim")
        .agg(
            F.round(F.sum(term).cast("decimal(38,9)").cast("double"), 6).alias("psi"),
            F.sum("__cb").alias("n_baseline"),
            F.sum("__cc").alias("n_current"),
        )
        .orderBy("dim")
    )


def ab_test_report(
    events: DataFrame,
    variant_col,
    conversion_pred,
    user_col: str = "user_id",
) -> DataFrame:
    """Two-proportion z-test between experiment variants — the A/B readout:
    per-variant exposed users and converting users, conversion rates, and
    (on the pairwise rows) the pooled-variance z statistic with a two-sided
    p-value via the Abramowitz-Stegun erf (the ks_statistics discipline, so
    a SQL oracle reproduces it to rounding).

    ``variant_col`` assigns each row a variant label (any deterministic
    Column — e.g. a hash of the user id for a synthetic split);
    ``conversion_pred`` is a boolean Column marking converting events.

    Returns one row per unordered variant pair: ``(variant_a, variant_b,
    users_a, conv_a, rate_a, users_b, conv_b, rate_b, z, p_value)``.

    Plan: ONE distinct over (variant, user, converted-flag collapsed by
    max) — user grain — then a variant-level aggregate (a handful of
    rows); the pairwise join runs on the tiny variant table. The event
    scan is touched once.
    """
    per_user = (
        events.select(
            variant_col.alias("__v"),
            F.col(user_col).alias("__u"),
            F.when(conversion_pred, 1).otherwise(0).alias("__c"),
        )
        .groupBy("__v", "__u")
        .agg(F.max("__c").alias("__c"))
    )
    per_variant = per_user.groupBy("__v").agg(
        F.count(F.lit(1)).alias("users"), F.sum("__c").alias("conv")
    )
    a = per_variant.select(
        F.col("__v").alias("variant_a"),
        F.col("users").alias("users_a"),
        F.col("conv").alias("conv_a"),
    )
    b = per_variant.select(
        F.col("__v").alias("variant_b"),
        F.col("users").alias("users_b"),
        F.col("conv").alias("conv_b"),
    )
    pairs = a.join(b, F.col("variant_a") < F.col("variant_b"))
    ra = F.col("conv_a").cast("double") / F.col("users_a")
    rb = F.col("conv_b").cast("double") / F.col("users_b")
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("users_a") + F.col("users_b")
    )
    se = F.sqrt(
        p_pool
        * (1.0 - p_pool)
        * (1.0 / F.col("users_a") + 1.0 / F.col("users_b"))
    )
    z = F.when(se == 0.0, F.lit(0.0)).otherwise((ra - rb) / se)
    p_value = 1.0 - _erf(F.abs(z) / F.lit(math.sqrt(2.0)))
    return pairs.select(
        "variant_a",
        "variant_b",
        "users_a",
        "conv_a",
        F.round(ra, 6).alias("rate_a"),
        "users_b",
        "conv_b",
        F.round(rb, 6).alias("rate_b"),
        # +0.0 collapses -0.0 (equal rates); p_value rounds to 4dp because
        # its exp() is not correctly-rounded and the last ulp differs
        # between libm implementations (the ks_statistic_normal precedent)
        (F.round(z, 6) + 0.0).alias("z"),
        (F.round(p_value, 4) + 0.0).alias("p_value"),
    ).orderBy("variant_a", "variant_b")


def cooccurrence_stats(
    df: DataFrame,
    basket_col: str = "user_id",
    item_col: str = "event_type",
) -> DataFrame:
    """Market-basket co-occurrence with lift: for every unordered item
    pair, the number of baskets containing both, each item's basket count,
    support, and lift = P(ab) / (P(a) P(b)) — the association-rule readout
    (lift > 1: items co-occur more than independence predicts).

    Plan: ONE distinct over (basket, item) — the only corpus-sized
    shuffle; the pair self-join keys on the basket id (per-basket blowup
    = distinct-items², the funnel discipline — cap baskets upstream for
    pathological cardinality); item totals and the final lift arithmetic
    run on item- and pair-cardinality rows.
    """
    hits = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    n_baskets = hits.select("__b").distinct().count()  # bounded driver scalar
    item_counts = hits.groupBy("__i").agg(F.count(F.lit(1)).alias("__ni"))
    a = hits.select(F.col("__b"), F.col("__i").alias("item_a"))
    b = hits.select(F.col("__b"), F.col("__i").alias("item_b"))
    pair_counts = (
        a.join(b, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = item_counts.select(F.col("__i").alias("item_a"), F.col("__ni").alias("n_a"))
    cb = item_counts.select(F.col("__i").alias("item_b"), F.col("__ni").alias("n_b"))
    n = float(n_baskets)
    support = F.col("n_both") / F.lit(n)
    lift = (F.col("n_both") * F.lit(n)) / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    return (
        pair_counts.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(support, 6).alias("support"),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy("item_a", "item_b")
    )


def group_percent_rank(
    df: DataFrame,
    group_cols,
    order_col: str,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Exact percent rank of ``order_col`` WITHIN each group —
    within-group score normalization (the per-group companion of
    exact_percent_rank's global two-phase index). Groups partition the
    window, so no single-reducer hazard: state per task is one group's
    rows. percent_rank = (rank - 1) / (n - 1), ties share a rank; single-
    row groups get 0.0 (SQL-standard)."""
    groups = list(group_cols)
    if not groups:
        raise ValueError("group_cols must be non-empty")
    w = Window.partitionBy(*groups).orderBy(F.col(order_col).asc())
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), 6))


def winsorize_vectors(
    df: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    out_col: str = "clipped",
    round_digits: int = 6,
) -> DataFrame:
    """Per-dimension winsorization: clip each component into its
    dimension's [lo_q, hi_q] exact quantile range — the outlier-taming
    front-door before moments/standardization when heavy tails would
    otherwise dominate (the clip-don't-drop counterpart of the
    median/MAD outlier flags).

    Scale shape (the standardize_vectors discipline): ONE corpus pass
    computes the d-row exact-quantile table (sort-based percentile keyed
    by dim — uniform keys); the bounds are inlined as literal arrays and
    the clip is a shuffle-free, UDF-free transform projection. Bounds
    round to 9dp before the projection so both engines clip with the
    same literals.
    """
    if not 0.0 <= lo_q < hi_q <= 1.0:
        raise ValueError(f"need 0 <= lo_q < hi_q <= 1, got ({lo_q}, {hi_q})")
    stats = (
        df.select(F.posexplode(vec).alias("dim", "value"))
        .groupBy("dim")
        .agg(
            F.round(F.percentile(F.col("value").cast("double"), F.lit(float(lo_q))), 9).alias("lo"),
            F.round(F.percentile(F.col("value").cast("double"), F.lit(float(hi_q))), 9).alias("hi"),
        )
        .orderBy("dim")
        .collect()  # d rows — bounded by dimensionality
    )
    los = F.array(*[F.lit(float(r.lo)) for r in stats])
    his = F.array(*[F.lit(float(r.hi)) for r in stats])
    clipped = F.transform(
        F.col(vec),
        lambda x, i: F.round(
            F.least(
                F.greatest(x.cast("double"), F.element_at(los, i + 1)),
                F.element_at(his, i + 1),
            ),
            round_digits,
        ),
    )
    return df.select(F.col(id_col), clipped.alias(out_col))


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 1000,
    min_count: int = 2,
) -> DataFrame:
    """Zipf's-law fit of the corpus rank-frequency curve: least-squares
    slope/intercept/R^2 of ln(freq) on ln(rank) over the top ``top_v``
    vocabulary entries — the one-row corpus-health readout (natural text
    sits near slope -1; templated or synthetic corpora drift far off it).

    Scale shape: the vocabulary aggregate is map-side combinable; the
    global top-v plans as TakeOrderedAndProject (per-partition partial
    top-k), so the ranking window only ever sees <= top_v rows — never a
    single-reducer pass over the vocabulary. The regression reduces to
    five bounded sums.

    Engine-exact: per-rank regression terms are 9dp-rounded then
    DECIMAL-summed (order-independent); the closed-form slope/intercept/R^2
    are single double divisions rounded to 6dp — the dim_moments recipe.
    """
    from nbdatatools_spark.functions.text import tokens

    counts = (
        df.select(F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(top_v)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("w").asc())
    xy = counts.select(
        F.row_number().over(w).cast("double").alias("r"),
        F.col("n").cast("double").alias("c"),
    ).select(
        F.round(F.log("r"), 9).alias("x"),
        F.round(F.log("c"), 9).alias("y"),
    )

    def _dsum(expr):
        return F.sum(F.round(expr, 9).cast("decimal(30,9)")).cast("double")

    agg = xy.agg(
        F.count(F.lit(1)).cast("double").alias("v"),
        _dsum(F.col("x")).alias("sx"),
        _dsum(F.col("y")).alias("sy"),
        _dsum(F.col("x") * F.col("x")).alias("sxx"),
        _dsum(F.col("x") * F.col("y")).alias("sxy"),
        _dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    v, sx, sy, sxx, sxy, syy = (F.col(c) for c in ("v", "sx", "sy", "sxx", "sxy", "syy"))
    denom = v * sxx - sx * sx
    slope = (v * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / v
    # R^2 = corr^2 in the simple-regression case
    corr_num = v * sxy - sx * sy
    corr_den = F.sqrt(denom) * F.sqrt(v * syy - sy * sy)
    return agg.select(
        v.cast("bigint").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round((corr_num / corr_den) * (corr_num / corr_den), 6).alias("r_squared"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    min_df: int = 1,
) -> DataFrame:
    """Per-DOCUMENT tf-idf keyword extraction (the document-grain
    companion of group_keywords' c-TF-IDF): score token t in doc d by
    ``tf(t, d) * ln(N / df(t))`` and keep each document's top-k — the
    classic per-doc keyword/tag extractor feeding search facets,
    clustering labels, and weak supervision.

    Plan: explode normalized tokens -> ONE map-side-combinable
    groupBy(doc, token) tf count (the only pass over corpus text) ->
    document-frequency aggregate over the (doc, token)-distinct rows ->
    N is one bounded driver scalar -> per-doc top-k via a ranking window
    partitioned by doc (per-task state = one document's vocabulary,
    never corpus-wide). min_df prunes hapax noise BEFORE the join.

    Exactness: idf = round(ln(N / df), 9); score = round(tf * idf, 6);
    ties break on token ASC. Returns ``(id_col, token, tf, df, score,
    rank)``.
    """
    from nbdatatools_spark.functions.text import normalize_text, tokens

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("token"),
    ).where(F.col("token").isNotNull())
    tf = ex.groupBy("__id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).distinct().count()  # bounded driver scalar
    dfreq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    idf = F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 9)
    scored = tf.join(dfreq, "token").select(
        "__id", "token", "tf", "df",
        F.round(F.col("tf") * idf, 6).alias("score"),
    )
    w = Window.partitionBy("__id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select(F.col("__id").alias(id_col), "token", "tf", "df", "score", "rank")
    )


def mahalanobis_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_k: int = 20,
) -> DataFrame:
    """Top-k embedding outliers by diagonal-covariance Mahalanobis
    distance — the corrupt/degenerate-embedding detector (encoder NaN
    rows, scale blowups, wrong-model mixtures) run before embeddings
    feed ANN indexes or semantic dedup: distance(v) =
    sqrt(sum_d ((v_d - mu_d) / sd_d)^2), zero-variance dims contribute 0.

    Scale shape: ONE posexplode pass fits the d-row moment table
    (map-side-combined, output bounded by dimensionality); z² terms join
    the broadcast moments and DECIMAL-sum per vector (order-invariant);
    the global top-k plans as TakeOrderedAndProject. Nothing corpus-sized
    ever sits in one task.

    Exactness: mu/sd rounded 9dp, each z² term rounded 9dp then
    DECIMAL(28,9)-summed, distance = round(sqrt(sum), 6); ties on id.
    Returns ``(id_col, mdist, rank)``.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    ex = df.select(
        F.col(id_col).alias("__id"), F.posexplode(vec_col).alias("dim", "v")
    ).select("__id", "dim", F.col("v").cast("double").alias("v"))
    # naive-moment sd (same expression tree as the DuckDB oracle and the
    # standardize_vectors fit) so the 9dp rounding sees identical doubles
    stats = ex.groupBy("dim").agg(
        F.round(F.avg("v"), 9).alias("mu"),
        F.round(
            F.sqrt(F.avg(F.col("v") * F.col("v")) - F.avg("v") * F.avg("v")), 9
        ).alias("sd"),
    )
    z2 = (
        ex.join(F.broadcast(stats), "dim")
        .select(
            "__id",
            F.when(
                F.col("sd") > 0,
                # explicit x*x, not pow(x, 2): libm pow need not be
                # bit-identical to multiplication across engines
                F.round(
                    ((F.col("v") - F.col("mu")) / F.col("sd"))
                    * ((F.col("v") - F.col("mu")) / F.col("sd")),
                    9,
                ),
            )
            .otherwise(F.lit(0.0))
            .cast("decimal(28,9)")
            .alias("__t"),
        )
        .groupBy("__id")
        .agg(F.round(F.sqrt(F.sum("__t").cast("double")), 6).alias("mdist"))
    )
    w = Window.orderBy(F.col("mdist").desc(), F.col("__id").asc())
    ranked = z2.orderBy(F.col("mdist").desc(), F.col("__id").asc()).limit(top_k)
    return ranked.withColumn("rank", F.row_number().over(w).cast("int")).select(
        F.col("__id").alias(id_col), "mdist", "rank"
    )


def dataset_card(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-slice dataset card (the datasheet/data-statement summary a
    training-data release ships): document and token volume, length
    distribution, exact-duplicate rate, language mix entropy, punctuation
    profile — one row per ``group_col`` value.

    Exactness: token counts are integers (exact sums); mean ratios ride
    9dp-rounded DECIMAL sums (order-invariant); lang-mix entropy
    DECIMAL-sums ``round(p*ln p, 12)`` per language so the
    group-iteration order can't perturb the double result; p50 uses
    exact interpolated percentile (DuckDB ``quantile_cont`` semantics).

    100-TB shape: two keyed aggregates (doc-grain, then (slice, lang)
    grain) joined on the slice key — all map-side-partial groupBys; the
    dup-rate distinct rides the same md5 digest discipline as
    exact_dedup (16-byte keys, raw text never shuffles).
    """
    from nbdatatools_spark.functions.text import normalize_text, punct_ratio, token_count

    doc = df.select(
        F.col(group_col).alias("slice"),
        F.col(lang_col).alias("__lang"),
        token_count(F.col(text_col)).alias("__ntok"),
        F.md5(normalize_text(F.col(text_col))).alias("__dig"),
        F.round(punct_ratio(F.col(text_col)), 9).cast("decimal(20,9)").alias("__punct"),
    )
    per_slice = doc.groupBy("slice").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__ntok").cast("bigint").alias("total_tokens"),
        F.round(F.sum("__ntok").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_tokens"
        ),
        F.round(F.expr("percentile(__ntok, 0.5)"), 6).alias("p50_tokens"),
        F.countDistinct("__dig").alias("__ndistinct"),
        F.round(
            F.sum("__punct").cast("decimal(38,9)").cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_punct_ratio"),
    )
    lang_counts = doc.groupBy("slice", "__lang").agg(
        F.count(F.lit(1)).alias("__nl")
    )
    slice_totals = lang_counts.groupBy("slice").agg(
        F.sum("__nl").alias("__n"), F.count(F.lit(1)).alias("n_langs")
    )
    p = F.col("__nl").cast("double") / F.col("__n")
    entropy = (
        lang_counts.join(slice_totals, "slice")
        .groupBy("slice", "n_langs")
        .agg(
            F.round(
                -F.sum(F.round(p * F.log(p), 12).cast("decimal(24,12)"))
                .cast("decimal(38,12)")
                .cast("double"),
                6,
            ).alias("lang_entropy")
        )
    )
    return (
        per_slice.join(entropy, "slice")
        .select(
            "slice",
            "n_docs",
            "total_tokens",
            "mean_tokens",
            "p50_tokens",
            F.round(
                F.lit(1.0) - F.col("__ndistinct") / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
            "n_langs",
            "lang_entropy",
            "mean_punct_ratio",
        )
        .orderBy("slice")
    )


def dataset_card_diff(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """What changed between two dataset snapshots, per slice — the
    release-to-release diff a training-data card consumer actually
    asks for (":func:`dataset_card` exists; what MOVED since the last
    snapshot" is the user question): both snapshots' cards FULL-OUTER
    joined on the slice key, with per-metric deltas and a status
    column.

    Returns one row per slice present in EITHER snapshot, ordered by
    slice: ``(slice, status, n_docs_old, n_docs_new, d_n_docs,
    d_total_tokens, d_mean_tokens, d_p50_tokens, d_dup_rate,
    d_n_langs, d_lang_entropy, d_mean_punct_ratio)`` — status in
    {'added', 'removed', 'changed', 'unchanged'} ('unchanged' = every
    delta exactly 0 at the cards' own 6dp grain), deltas = new - old
    at 6dp, NULL on added/removed rows (no counterpart to diff
    against).

    Exactness: every delta is a difference of two already-6dp-rounded
    card metrics (or exact integers) — no new float accumulation, so
    the diff inherits the card's engine-exactness bit-for-bit.

    100-TB shape: two dataset_card plans (each two keyed aggregates)
    + one slice-grain full-outer join; nothing beyond slice-count
    rows joins.
    """
    a = dataset_card(old, group_col, text_col, lang_col)
    b = dataset_card(new, group_col, text_col, lang_col)
    oldc = a.select(
        "slice", *[F.col(c).alias(f"__o_{c}") for c in a.columns[1:]]
    )
    newc = b.select(
        "slice", *[F.col(c).alias(f"__n_{c}") for c in b.columns[1:]]
    )
    j = oldc.join(newc, "slice", "full_outer")

    def delta(col: str):
        return F.round(
            F.col(f"__n_{col}").cast("double")
            - F.col(f"__o_{col}").cast("double"),
            6,
        ) + 0.0

    metrics = [
        "n_docs",
        "total_tokens",
        "mean_tokens",
        "p50_tokens",
        "dup_rate",
        "n_langs",
        "lang_entropy",
        "mean_punct_ratio",
    ]
    changed = None
    for m in metrics:
        c = delta(m) != 0.0
        changed = c if changed is None else (changed | c)
    status = (
        F.when(F.col("__o_n_docs").isNull(), F.lit("added"))
        .when(F.col("__n_n_docs").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "slice",
        status.alias("status"),
        F.col("__o_n_docs").cast("bigint").alias("n_docs_old"),
        F.col("__n_n_docs").cast("bigint").alias("n_docs_new"),
        *[delta(m).alias(f"d_{m}") for m in metrics],
    ).orderBy("slice")


def rake_keyphrases(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 25,
    max_phrase_len: int = 4,
) -> DataFrame:
    """Corpus-level RAKE keyphrase extraction (Rose et al. 2010): split
    text into candidate phrases at stopwords/punctuation, score each
    word by degree/frequency over co-occurrence within phrases, score a
    phrase as the sum of its word scores; return the ``top_n`` phrases
    by score.

    Window-native formulation (no UDF): each punctuation run is first
    rewritten to a sentinel boundary token ('0' — impossible as a word
    after the non-letter strip), so punctuation segments phrases exactly
    like stopwords do (ADVICE r6: the old per-char strip let phrases
    span sentence boundaries). Tokens get a per-doc position; a run id
    = running count of boundary tokens (stopword OR sentinel) segments
    each doc into phrases (one window over in-doc positions); degree(w)
    = sum over phrases containing w of phrase length, freq(w) = word
    occurrences — both integer aggregates.

    Exactness: scores are ratios of integers combined by a 9dp-rounded
    DECIMAL sum per phrase; ordering ties break on the phrase string.

    100-TB shape: the window partitions BY DOCUMENT (state = one doc's
    tokens); word/phrase tables group on md5 digests with exemplar
    strings (the kneser_ney discipline); top-n is
    TakeOrderedAndProject.
    """
    from nbdatatools_spark.functions.text import STOPWORDS, tokens

    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode_outer(
            tokens(
                F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z\s]+", " 0 ")
            )
        ).alias("__pos", "__w"),
    ).where(F.col("__w").isNotNull() & (F.length("__w") > 0))
    stop_arr = F.array(*[F.lit(w) for w in sorted(STOPWORDS)])
    marked = toks.withColumn(
        "__isstop",
        (
            F.array_contains(stop_arr, F.col("__w")) | (F.col("__w") == "0")
        ).cast("int"),
    )
    w = Window.partitionBy("__doc").orderBy("__pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    runs = marked.withColumn("__run", F.sum("__isstop").over(w)).where(
        F.col("__isstop") == 0
    )
    phrases = (
        runs.groupBy("__doc", "__run")
        .agg(
            F.array_join(F.collect_list("__w"), " ").alias("__phrase"),
            F.count(F.lit(1)).alias("__plen"),
        )
        .where(F.col("__plen") <= max_phrase_len)
        .localCheckpoint(eager=False)
    )
    words = phrases.select(
        F.col("__plen"), F.explode(F.split("__phrase", " ")).alias("__w")
    )
    word_scores = words.groupBy(F.md5("__w").alias("__hw")).agg(
        F.min("__w").alias("__w"),
        F.sum("__plen").alias("__deg"),
        F.count(F.lit(1)).alias("__freq"),
    )
    # word scores combine per phrase TYPE (occurrence weighting already
    # lives in deg/freq); build the phrase->word map from distinct phrases
    phrase_words = (
        phrases.select("__phrase")
        .distinct()
        .select(
            F.md5("__phrase").alias("__hp"),
            F.col("__phrase"),
            F.explode(F.split("__phrase", " ")).alias("__w"),
        )
        .select("__hp", "__phrase", F.md5("__w").alias("__hw"))
    )
    scored = (
        phrase_words.join(word_scores.select("__hw", "__deg", "__freq"), "__hw")
        .groupBy("__hp")
        .agg(
            F.min("__phrase").alias("phrase"),
            F.sum(
                F.round(
                    F.col("__deg").cast("double") / F.col("__freq"), 9
                ).cast("decimal(20,9)")
            )
            .cast("decimal(38,9)")
            .cast("double")
            .alias("score"),
        )
    )
    counts = phrases.groupBy(F.md5("__phrase").alias("__hp")).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    return (
        scored.join(counts, "__hp")
        .select(
            "phrase",
            "n_occurrences",
            F.round("score", 6).alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(top_n)
    )


def zca_whiten(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 16,
    eps: float = 1e-6,
):
    """ZCA whitening of the first ``dims`` vector components: W = V
    diag(1/sqrt(lambda + eps)) V' from the eigendecomposition of the
    covariance matrix; output = (x - mean) W — unit variance, zero
    cross-covariance, and (uniquely for ZCA among whitenings) minimal
    rotation away from the input basis.

    Scale shape: the pca_top_components bill — ONE distributed covariance
    pass (d(d+1)/2 map-side-combined sums), O(d^3) driver eigh on d^2
    scalars, then a literal-matrix Catalyst projection (no shuffle, no
    UDF). Rows never leave the executors.

    Returns ``(whitened_df, eigenvalues)``; the frame carries
    ``w0..w{dims-1}`` DOUBLE columns.
    """
    import numpy as np

    cov_rows = covariance_matrix(df, vec_col, dims=dims).collect()
    d = max(r["j"] for r in cov_rows) + 1
    m = np.zeros((d, d))
    for r in cov_rows:
        m[r["i"], r["j"]] = m[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(m)
    w = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, 0.0) + eps)) @ vecs.T
    mean_rows = (
        df.select(F.posexplode(F.slice(vec_col, 1, d)).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.avg(F.col("x").cast("double")).alias("mu"))
        .collect()
    )
    mu = np.zeros(d)
    for r in mean_rows:
        mu[int(r["dim"])] = float(r["mu"])
    out = df
    centered = F.zip_with(
        F.slice(vec_col, 1, d),
        F.array(*[F.lit(float(x)) for x in mu]),
        lambda x, m_: x.cast("double") - m_,
    )
    for j in range(d):
        col_lit = F.array(*[F.lit(float(w[i, j])) for i in range(d)])
        out = out.withColumn(
            f"w{j}",
            F.aggregate(
                F.zip_with(centered, col_lit, lambda x, c: x * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    return out, [float(v) for v in vals[::-1]]


def jl_matrix(dims: int, out_dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian random-projection matrix via md5 + Box-
    Muller: entry (i, j) derives u1/u2 from two 52-bit slices of
    md5('jl:{seed}:{i}:{j}') — content-addressed, reproducible on any
    engine that has md5/ln/cos (the DuckDB oracle replays it literally;
    Python's math.* and DuckDB both bind the platform libm, so the
    transcendentals agree bit-for-bit on one box).
    """
    import hashlib
    import math

    two52 = float(1 << 52)
    mat = []
    for i in range(dims):
        row = []
        for j in range(out_dim):
            h = hashlib.md5(f"jl:{seed}:{i}:{j}".encode()).hexdigest()
            u1 = (int(h[:13], 16) + 0.5) / two52
            u2 = (int(h[13:26], 16) + 0.5) / two52
            row.append(
                math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)
            )
        mat.append(row)
    return mat


def jl_project(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    dims: int = 64,
    seed: int = 42,
    out_col: str = "projected",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim`` dims:
    y = x R / sqrt(out_dim) with the deterministic ``jl_matrix``. Pure
    literal-matrix Catalyst projection (same zero-shuffle shape as
    pca_project); pairwise distances are preserved within the JL bound,
    which the gate audits on fixed pairs."""
    r = jl_matrix(dims, out_dim, seed)
    scale = 1.0 / (float(out_dim) ** 0.5)
    cols = []
    for j in range(out_dim):
        col_lit = F.array(*[F.lit(float(r[i][j])) for i in range(dims)])
        cols.append(
            F.aggregate(
                F.zip_with(
                    F.slice(vec_col, 1, dims),
                    col_lit,
                    lambda x, c: x.cast("double") * c,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * scale
        )
    return df.withColumn(out_col, F.array(*cols))


def vocab_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10,
) -> DataFrame:
    """Heaps-law vocabulary-growth curve: documents ordered by id are cut
    into ``n_buckets`` equal-count buckets; for each prefix (buckets
    1..b) report cumulative token count and cumulative DISTINCT
    vocabulary — the sub-linear growth curve that says how much new data
    still buys new vocabulary.

    Scale shape: token grouping keys are md5 digests (strings shuffle
    once per distinct token per partition, the lm.py discipline); the
    cumulative distinct needs NO per-prefix rescan — vocab_at(b) counts
    digests whose FIRST document (one min aggregate) lands in bucket
    <= b, and both cumulatives are running sums over the n_buckets-row
    bucket table. Bucketing uses the two-phase global-row-index
    discipline (windows.global_row_index — range-partitioned, no
    single-reducer ntile window; ADVICE r6) with NTILE's exact integer
    arithmetic on the 0-based index, so bucket assignment is
    bit-identical to SQL ntile at any scale.
    """
    from nbdatatools_spark.functions.text import tokens
    from nbdatatools_spark.operators.windows import global_row_index

    toks = df.select(
        F.col(id_col).alias("__id"),
        tokens(F.lower(F.col(text_col))).alias("__t"),
    )
    idx = global_row_index(toks, [F.col("__id").asc()], out="__rn")
    n_docs = idx.count()  # bounded driver scalar: inlines NTILE's q/r split
    q, r = divmod(n_docs, n_buckets)
    # SQL NTILE over n rows: first r buckets get q+1 rows, the rest q.
    cut = r * (q + 1)
    big = F.expr(f"CAST(__rn DIV {q + 1} AS INT) + 1")
    small = F.expr(f"CAST({r} + (__rn - {cut}) DIV {max(q, 1)} AS INT) + 1")
    ranked = idx.select(
        "__id",
        "__t",
        F.when(F.col("__rn") < cut, big).otherwise(small).alias("bucket"),
    )
    tok = (
        ranked.select(
            "__id", "bucket", F.explode_outer("__t").alias("__w")
        )
        .where(F.col("__w").isNotNull() & (F.length("__w") > 0))
        .select("__id", "bucket", F.md5("__w").alias("__h"))
    )
    per_bucket_tokens = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("__ntok")
    )
    first_bucket = tok.groupBy("__h").agg(F.min("bucket").alias("__fb"))
    new_vocab = first_bucket.groupBy(F.col("__fb").alias("bucket")).agg(
        F.count(F.lit(1)).alias("__nv")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket_tokens.join(new_vocab, "bucket", "left")
        .select(
            "bucket",
            F.sum("__ntok").over(w).cast("bigint").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("__nv"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_vocab"),
        )
        .withColumn(
            "vocab_per_token",
            F.round(F.col("cum_vocab") / F.col("cum_tokens").cast("double"), 9),
        )
        .orderBy("bucket")
    )


def length_drift(
    df: DataFrame,
    reference: str,
    group_col: str = "source",
    text_col: str = "text",
    n_bins: int = 10,
    bin_width: int = 64,
) -> DataFrame:
    """Token-length drift of every corpus slice against a reference slice:
    Population Stability Index over the whitespace-token-count
    distribution (the document-level sibling of :func:`embedding_psi` —
    PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted). Length
    distributions are the cheapest reliable drift tripwire between crawl
    snapshots / source mixes: truncation bugs, boilerplate changes and
    extractor regressions all move them before content metrics notice.

    Bins are fixed-width (``bin_width`` tokens, top bin open-ended) so the
    monitor is stateless and engine-portable; add-one smoothing keeps
    empty bins defined; the reference slice reports PSI = 0.0 against
    itself (sanity row). A ``reference`` value absent from the data
    yields an EMPTY result (the broadcast reference histogram has no
    rows) — callers should treat 0 output rows as a config error.

    Plan: ONE map-side (group, bin) projection of slim rows, one
    groupBy(group, bin) count with map-side combine, a per-group total,
    an exploded full bin grid (a bin empty in a slice still contributes
    its smoothing term), and a broadcast join of the n_bins-row reference
    histogram. The (p-q)*ln(p/q) terms round to 9dp and DECIMAL-sum
    (order-independent, engine-exact at the final 6dp).
    """
    from nbdatatools_spark.functions.text import token_count

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    binned = df.select(
        F.col(group_col).alias("grp"),
        F.least(
            (token_count(F.col(text_col)) / F.lit(bin_width)).cast("int"),
            F.lit(n_bins - 1),
        ).alias("bin"),
    )
    counts = binned.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("__c"))
    totals = counts.groupBy("grp").agg(F.sum("__c").alias("__n"))
    grid = totals.select(
        "grp", "__n", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    )
    full = grid.join(counts, ["grp", "bin"], "left").na.fill(0, ["__c"])
    ref = (
        full.where(F.col("grp") == reference)
        .select(F.col("bin"), F.col("__c").alias("__cr"), F.col("__n").alias("__nr"))
    )
    joined = full.join(F.broadcast(ref), "bin")
    p = (F.col("__cr") + 1).cast("double") / (F.col("__nr") + F.lit(n_bins))
    q = (F.col("__c") + 1).cast("double") / (F.col("__n") + F.lit(n_bins))
    term = F.round((p - q) * F.log(p / q), 9).cast("decimal(20,9)")
    return (
        joined.groupBy("grp")
        .agg(
            F.round(F.sum(term).cast("decimal(38,9)").cast("double"), 6).alias("psi"),
            F.max("__n").alias("n_docs"),
            F.max("__nr").alias("n_reference"),
        )
        .orderBy("grp")
    )


def robust_scale_vectors(
    df: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Median/IQR robust scaling per embedding dimension (the
    outlier-resistant sibling of standardize_vectors — scikit-learn's
    RobustScaler semantics): z = (x - median) / (q3 - q1). Heavy-tailed
    activation dims where mean/std standardization saturates keep a
    usable spread under quartile scaling.

    Plan: ONE posexplode -> per-dim exact interpolated percentiles
    (Spark's sort-based percentile agg, d groups — the mad_outliers
    pattern, = DuckDB quantile_cont) -> broadcast the d-row stats table
    back -> map-side scale projection. Returns exploded (id, dim, z)
    rows, 6dp (driver-hashable scalar shape); zero-IQR dims emit NULL.
    """
    ex = df.select(
        F.col(id_col).alias("id"), F.posexplode(vec).alias("dim", "__v")
    ).select("id", "dim", F.col("__v").cast("double").alias("__v"))
    stats = ex.groupBy("dim").agg(
        F.expr("percentile(__v, 0.5)").alias("__med"),
        F.expr("percentile(__v, 0.25)").alias("__q1"),
        F.expr("percentile(__v, 0.75)").alias("__q3"),
    )
    return (
        ex.join(F.broadcast(stats), "dim")
        .select(
            "id",
            "dim",
            F.when(
                F.col("__q3") > F.col("__q1"),
                F.round(
                    (F.col("__v") - F.col("__med")) / (F.col("__q3") - F.col("__q1")),
                    6,
                ),
            ).alias("z"),
        )
        .orderBy("id", "dim")
    )


def linear_cka(
    df: DataFrame,
    vec: str = "embedding",
    m: int = 8,
    dims: int | None = None,
    id_col: str = "vec_id",
    impl: str = "auto",
) -> DataFrame:
    """Linear Centered Kernel Alignment between a full embedding and its
    first-``m``-dimension truncation (Kornblith et al. ICML 2019 eq. 5,
    feature-space form):

        CKA(X, Y) = ||Cov(X,Y)||_F^2 / (||Cov(X,X)||_F * ||Cov(Y,Y)||_F)

    — how much of the representation's structure the truncation keeps
    (the quantitative companion to the Matryoshka family: CKA ~ 1 means
    the prefix already spans the geometry).

    Shared rounding discipline (both impls, engine-exact): products
    rounded to 9dp and DECIMAL-summed, covariances rounded to 9dp,
    squared terms rounded to 12dp and DECIMAL-summed into the three
    Frobenius norms (all three read the SAME cov table: Cxy = the
    (i < d, j < m) block, Cxx = everything, Cyy = the (i < m, j < m)
    block). Returns one row (d, m, n, cka) at 6dp.

    Two implementations, the covariance_matrix expr/gemm duality:

    - ``impl="gemm"`` (default via ``auto`` for d > 16 — VERDICT r6 #3):
      one Arrow pass computes per-partition int64 gramian partials of
      the 9dp-SCALED products (``rint(x*y * 1e9)`` — the decimal sum as
      an exact integer sum, so float accumulation order cannot perturb
      it), the driver combines P partials of d^2 scalars and replays the
      round9/round12 chain with java.math.BigDecimal semantics
      (HALF_UP over the double's shortest decimal repr). Per-row cost
      is a d^2 GEMM flop; nothing n*d^2-sized ever shuffles.
    - ``impl="expr"`` (the oracle/audit path): all (i, j) pairs from a
      dim-pair self-join — n * d^2 slim rows through Catalyst, exactly
      what the DuckDB oracle replays. ~8x the gemm wall at d=64;
      keep it for audits and tiny frames.
    """
    if dims is None:
        first = df.select(F.size(vec).alias("d")).first()
        dims = int(first["d"])
    if not 0 < m <= dims:
        raise ValueError(f"need 0 < m <= dims, got m={m} dims={dims}")
    if impl == "auto":
        impl = "gemm" if dims > 16 else "expr"
    if impl == "gemm":
        return _cka_gemm(df, vec, dims, m)
    if impl != "expr":
        raise ValueError(f"impl must be 'auto', 'expr' or 'gemm', got {impl!r}")
    ex = df.select(
        F.col(id_col).alias("rid"),
        F.posexplode(F.col(vec).cast("array<double>")).alias("i", "v"),
    ).where(F.col("i") < dims)
    a, b = ex.alias("a"), ex.alias("b")
    prods = a.join(b, F.col("a.rid") == F.col("b.rid")).select(
        F.col("a.i").alias("i"),
        F.col("b.i").alias("j"),
        (F.col("a.v") * F.col("b.v")).alias("xy"),
        F.col("a.v").alias("x"),
    )
    sums = prods.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("xy", 9).cast("decimal(25,9)"))
        .cast("decimal(38,9)")
        .cast("double")
        .alias("sxy"),
    )
    means = (
        ex.groupBy("i")
        .agg(
            F.round(
                F.sum(F.round("v", 9).cast("decimal(20,9)"))
                .cast("decimal(38,9)")
                .cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mu")
        )
    )
    mi = means.select(F.col("i"), F.col("mu").alias("mi"))
    mj = means.select(F.col("i").alias("j"), F.col("mu").alias("mj"))
    cov = (
        sums.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            "n",
            F.round(
                F.col("sxy") / F.col("n") - F.col("mi") * F.col("mj"), 9
            ).alias("c"),
        )
    )
    sq = F.round(F.col("c") * F.col("c"), 12).cast("decimal(24,12)")
    agg = cov.agg(
        F.max("n").alias("n"),
        F.sum(F.when((F.col("i") < dims) & (F.col("j") < m), sq))
        .cast("decimal(38,12)")
        .cast("double")
        .alias("__fxy"),
        F.sum(sq).cast("decimal(38,12)").cast("double").alias("__fxx"),
        F.sum(F.when((F.col("i") < m) & (F.col("j") < m), sq))
        .cast("decimal(38,12)")
        .cast("double")
        .alias("__fyy"),
    )
    return agg.select(
        F.lit(dims).alias("d"),
        F.lit(m).alias("m"),
        F.col("n"),
        F.round(
            F.col("__fxy") / F.sqrt(F.col("__fxx") * F.col("__fyy")), 6
        ).alias("cka"),
    )


def _round_half_up(x: float, k: int) -> float:
    """Replicate Spark's ``round(double, k)``: java.math.BigDecimal over
    the double's shortest decimal repr (Double.toString == Python repr),
    setScale(k, HALF_UP), back to double."""
    import math as _math
    from decimal import ROUND_HALF_UP, Decimal

    if _math.isnan(x) or _math.isinf(x):
        return x
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-k), ROUND_HALF_UP))


def _cka_gemm(df: DataFrame, vec: str, dims: int, m: int) -> DataFrame:
    """Gramian-partials implementation of linear_cka — bit-compatible with
    the expr path's DECIMAL discipline (see linear_cka docstring).

    The expr path sums ``round(x*y, 9)`` into a DECIMAL: every addend is
    an exact multiple of 1e-9, so the whole sum is exactly
    ``sum(rint(x*y * 1e9)) * 1e-9`` — an int64 sum (bounded: |xy| <= ~1e3
    scaled by 1e9 over <= 2^31 rows stays under 2^63), which numpy
    accumulates exactly and order-independently. The driver then replays
    the mean/cov/Frobenius rounding chain on d^2 scalars with exact
    Decimal arithmetic. Requires uniform vector length >= dims (ragged
    frames take the expr path, which counts per-cell)."""
    spark = df.sparkSession
    d = dims
    n_tot, sv, sxy = _gramian_int64(df, vec, d, caller="linear_cka")

    from decimal import Decimal

    # mean_i = round9(double(decimal_sum) / n) — the expr path's chain
    mu = [
        _round_half_up(float(Decimal(int(sv[i])) / Decimal(10**9)) / n_tot, 9)
        for i in range(d)
    ]
    q12 = Decimal(1).scaleb(-12)
    fxy = Decimal(0)
    fxx = Decimal(0)
    fyy = Decimal(0)
    for i in range(d):
        for j in range(d):
            sxy_dbl = float(Decimal(int(sxy[i][j])) / Decimal(10**9))
            c = _round_half_up(sxy_dbl / n_tot - mu[i] * mu[j], 9)
            sq = Decimal(repr(_round_half_up(c * c, 12))).quantize(q12)
            fxx += sq
            if j < m:
                fxy += sq
                if i < m:
                    fyy += sq
    cka = _round_half_up(
        float(fxy) / ((float(fxx) * float(fyy)) ** 0.5), 6
    )
    return spark.createDataFrame(
        [(d, m, n_tot, cka)], "d INT, m INT, n BIGINT, cka DOUBLE"
    )


def dp_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    seed: int | None = None,
    audit: bool = False,
) -> DataFrame:
    """Differentially-private group counts via the Laplace mechanism
    (Dwork et al. 2006; sensitivity 1 for a count), with seeded noise:
    the Laplace draw is inverse-CDF over an md5-uint52 uniform of
    (group, seed) — reproducible across runs, partitionings, and engines
    (the repo's sampling convention applied to noise).

        u ~ U(-1/2, 1/2);  noise = -(1/eps) * sign(u) * ln(1 - 2|u|)

    Default output is the RELEASE shape: (group, noisy_count) only.
    ``audit=True`` adds true_count and abs_error for MECHANISM AUDITS
    (calibrating eps against observed error) — an audit frame is NOT a
    private release and must never leave the trust boundary. One
    aggregate + a map-side noise projection; any scale.

    SECURITY CONTRACT (ADVICE r6): the noise is a deterministic function
    of (group, seed), so the mechanism provides differential privacy
    ONLY if the seed is secret and single-use — anyone who knows it can
    recompute and subtract the noise exactly. The default ``seed=None``
    draws a fresh 64-bit secret from ``os.urandom`` per release (the
    production mode: unpredictable to consumers, still deterministic
    WITHIN the release so retries/partitionings agree). Pass an explicit
    seed only for reproducible audits/tests, and treat any release made
    with a known seed as public true counts. Re-releasing with fresh
    seeds still composes: k releases at eps each spend k*eps budget
    (averaging recovers the true count) — rotation is not a substitute
    for budget accounting.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if seed is None:
        import os as _os

        seed = int.from_bytes(_os.urandom(8), "big")
    counts = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("g").cast("string"), F.lit(str(seed)))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(float(1 << 52)) - F.lit(0.5)
    noise = (
        F.lit(-1.0 / epsilon)
        * F.signum(u)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )
    cols = [
        F.col("g").alias(group_col),
        F.round(F.col("n") + noise, 6).alias("noisy_count"),
    ]
    if audit:
        cols += [
            F.col("n").alias("true_count"),
            F.round(F.abs(noise), 6).alias("abs_error"),
        ]
    return counts.select(*cols).orderBy(group_col)


def source_jsd(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    vocab_size: int = 512,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (in bits) between per-slice
    unigram token distributions — the distributional distance companion
    to :func:`~nbdatatools_spark.operators.lm.source_similarity`'s
    tf-idf cosine: symmetric, bounded [0, 1], and sensitive to mass
    re-allocation that cosine (which ignores scale) misses.

    Distributions live on the GLOBAL top-``vocab_size`` tokens
    (TakeOrderedAndProject — no full-vocab shuffle), renormalized within
    that vocabulary per slice. The pair sum splits into the
    shared-support part (one token-keyed equi-join between slice pairs)
    plus the disjoint-support mass, which contributes exactly
    ``p * log2(2p / p) = p`` bits — so tokens absent from one side never
    need an outer join: ``JSD = 0.5 * (T_a + (1 - S_a)) + 0.5 *
    (T_b + (1 - S_b))`` with ``T`` the shared-token term sum and ``S``
    the shared mass. Per-token probabilities and terms round to 9dp and
    DECIMAL-sum; output at 6dp.

    Scale shape: token counts are one digest-keyed groupBy; the pair
    join runs on the ``slices x vocab_size`` table (broadcast-sized for
    real slice counts). Returns ``(source_a, source_b, shared_tokens,
    jsd_bits)`` for pairs a < b, ordered.
    """
    from nbdatatools_spark.functions.text import normalize_text, tokens

    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("token"),
    ).where(F.length("token") > 0)
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), "token")
        .limit(vocab_size)
        .select("token")
    )
    cnt = (
        toks.join(F.broadcast(top), "token")
        .groupBy("g", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("g").agg(F.sum("c").alias("t"))
    probs = cnt.join(F.broadcast(tot), "g").select(
        "g", "token", F.round(F.col("c") / F.col("t"), 9).alias("p")
    )
    a, b = probs.alias("a"), probs.alias("b")
    ln2 = F.log(F.lit(2.0))
    shared = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.g") < F.col("b.g")),
        )
        .groupBy(F.col("a.g").alias("source_a"), F.col("b.g").alias("source_b"))
        .agg(
            F.count(F.lit(1)).alias("shared_tokens"),
            F.sum(F.round(F.col("a.p"), 9).cast("decimal(20,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            .alias("sa"),
            F.sum(F.round(F.col("b.p"), 9).cast("decimal(20,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            .alias("sb"),
            F.sum(
                F.round(
                    F.col("a.p")
                    * F.log(
                        F.lit(2.0)
                        * F.col("a.p")
                        / (F.col("a.p") + F.col("b.p"))
                    )
                    / ln2,
                    9,
                ).cast("decimal(20,9)")
            )
            .cast("decimal(38,9)")
            .cast("double")
            .alias("ta"),
            F.sum(
                F.round(
                    F.col("b.p")
                    * F.log(
                        F.lit(2.0)
                        * F.col("b.p")
                        / (F.col("a.p") + F.col("b.p"))
                    )
                    / ln2,
                    9,
                ).cast("decimal(20,9)")
            )
            .cast("decimal(38,9)")
            .cast("double")
            .alias("tb"),
        )
    )
    # the pair universe: slices with NO shared tokens are maximally
    # divergent (JSD = 1 bit) and must not vanish with the inner join
    ga = tot.select(F.col("g").alias("source_a"))
    gb = tot.select(F.col("g").alias("source_b"))
    grid = ga.join(
        F.broadcast(gb), F.col("source_a") < F.col("source_b")
    )
    return (
        grid.join(shared, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce("shared_tokens", F.lit(0)).alias("shared_tokens"),
            F.round(
                F.lit(0.5)
                * (
                    F.coalesce("ta", F.lit(0.0))
                    + (F.lit(1.0) - F.coalesce("sa", F.lit(0.0)))
                )
                + F.lit(0.5)
                * (
                    F.coalesce("tb", F.lit(0.0))
                    + (F.lit(1.0) - F.coalesce("sb", F.lit(0.0)))
                ),
                6,
            ).alias("jsd_bits"),
        )
        .orderBy("source_a", "source_b")
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 3,
    max_basket_items: int = 64,
) -> DataFrame:
    """Pairwise association rules over baskets (Agrawal & Srikant 1994,
    the pair grain): for item pairs co-occurring in at least
    ``min_pair_count`` baskets, report support, both conditional
    confidences, and lift — the market-basket readout, and for corpora
    the "these two sources/tags travel together" audit.

    Scale shape: the ONLY quadratic is per-basket, and it is capped —
    baskets with more than ``max_basket_items`` distinct items are
    dropped outright (one groupBy(basket) count + a semi-join BEFORE
    any array materializes, the standard frequent-itemset guard: a
    10k-item basket would alone emit 5*10^7 pairs). Pairs are then
    generated MAP-SIDE from each basket's sorted item array (an inline
    transform/flatten over arrays bounded at ``max_basket_items`` —
    measured 2.5x faster than the basket-key self-join it replaced,
    22.9s -> 9.3s at the 10x replica, because every basket-grain
    aggregate reuses ONE exchange and the pair grain never shuffles
    twice). Item marginals count DISTINCT baskets per item over the
    capped basket set, so ``confidence = P(b | a)`` is exact over the
    measured population. Lift routes through doubles (no int64
    overflow at 100-TB counts).

    Returns ``(item_a, item_b, n_a, n_b, n_ab, support, conf_a_to_b,
    conf_b_to_a, lift)`` ordered by (n_ab DESC, item_a, item_b).
    """
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    if max_basket_items < 2:
        raise ValueError(
            f"max_basket_items must be >= 2, got {max_basket_items}"
        )
    items = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    # ONE basket aggregate feeds the pair generation, the item
    # marginals, and the basket census (optimization round 10, guide
    # §2.4): the old plan aggregated the item table by basket TWICE
    # (size census + collect_set) with a semi-join between them, and
    # ran the marginals as a third aggregate over the semi-joined rows.
    # Marginals explode the capped arrays back out — identical row
    # multiset to the old capped item table.
    #
    # Cap placement (optimization round 11, VERDICT r10 #3 / guide §2.5
    # skew + §5): the r10 shape collect_set every basket and filtered on
    # size AFTERWARD, so one pathological giant basket was materialized
    # in a single aggregation buffer before being dropped. Over-cap
    # basket KEYS are now found first with a count-only aggregate
    # (map-side combinable; the over-cap key set is small by definition)
    # and broadcast-anti-joined out of the item stream BEFORE the
    # collect_set, so ``max_basket_items`` provably bounds the
    # aggregation buffer. The count(1)-over-distinct-(bk,it) semantics
    # match the r10 ``__sz`` filter exactly (NULL items counted toward
    # basket size, as before); the distinct item table is
    # localCheckpointed once so both passes share one scan + exchange.
    items = items.localCheckpoint(eager=False)
    over_cap = (
        items.groupBy("bk")
        .agg(F.count(F.lit(1)).alias("__sz"))
        .where(F.col("__sz") > max_basket_items)
        .select("bk")
    )
    baskets = (
        items.join(F.broadcast(over_cap), "bk", "left_anti")
        .groupBy("bk")
        .agg(F.sort_array(F.collect_set("it")).alias("its"))
        .localCheckpoint(eager=False)
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("nb"))
    marg = (
        baskets.select(F.explode_outer("its").alias("it"))
        .where(F.col("it").isNotNull())
        .groupBy("it")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_expr = F.expr(
        "flatten(transform(sequence(0, size(its) - 2), i -> "
        "transform(sequence(i + 1, size(its) - 1), j -> "
        "struct(its[i] AS a, its[j] AS b))))"
    )
    pairs = (
        baskets.where(F.size("its") >= 2)
        .select(F.explode_outer(pair_expr).alias("p"))
        .where(F.col("p").isNotNull())
        .groupBy(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_count)
    )
    ma = marg.select(F.col("it").alias("item_a"), F.col("n").alias("n_a"))
    mb = marg.select(F.col("it").alias("item_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(ma, "item_a")
        .join(mb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_ab",
            F.round(F.col("n_ab") / F.col("nb"), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_a_to_b"),
            F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_b_to_a"),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("nb")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), "item_a", "item_b")
    )


def _gramian_int64(df: DataFrame, vec: str, d: int, caller: str):
    """Shared 9dp-scaled int64 gramian collection (see _cka_gemm: each
    decimal-sum addend round(x*y, 9) is an exact multiple of 1e-9, so
    sum(rint(x*y*1e9)) as int64 reproduces it order-independently).
    Returns (n_total, sv, sxy) with sv/sxy as exact python-int arrays."""
    import numpy as np

    from nbdatatools_spark.session import spread_small_input

    df = spread_small_input(df)  # d^2 GEMM flops per row: heavy kernel

    def partials(batches):
        import pandas as pd

        n = 0
        sv = np.zeros(d, dtype=np.int64)
        sxy = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            vals = pdf["__v"].to_list()
            if any(v is None or len(v) < d for v in vals):
                raise ValueError(
                    f"{caller}(impl='gemm') needs uniform vectors of >= {d} dims"
                )
            mat = np.asarray([v[:d] for v in vals], dtype=np.float64)
            n += mat.shape[0]
            sv += np.rint(mat * 1e9).astype(np.int64).sum(axis=0)
            # block the outer products so peak memory stays ~256*d^2 doubles
            for s in range(0, mat.shape[0], 256):
                blk = mat[s : s + 256]
                prods = blk[:, :, None] * blk[:, None, :]
                sxy += np.rint(prods * 1e9).astype(np.int64).sum(axis=0)
        yield pd.DataFrame(
            {"n": [n], "sv": [sv.tolist()], "sxy": [sxy.ravel().tolist()]}
        )

    rows = (
        df.select(F.col(vec).alias("__v"))
        .mapInPandas(partials, "n long, sv array<long>, sxy array<long>")
        .collect()
    )
    n_tot = sum(r["n"] for r in rows)
    if n_tot == 0:
        raise ValueError(f"{caller} needs at least one row")
    sv = np.zeros(d, dtype=object)
    sxy = np.zeros((d, d), dtype=object)
    for r in rows:
        sv += np.asarray(r["sv"], dtype=object)
        sxy += np.asarray(r["sxy"], dtype=object).reshape(d, d)
    return n_tot, sv, sxy


def intrinsic_dimension(
    df: DataFrame,
    vec: str = "embedding",
    dims: int | None = None,
    impl: str = "auto",
    id_col: str = "vec_id",
) -> DataFrame:
    """Participation-ratio intrinsic dimension of an embedding column:

        PR = (sum_i var_i)^2 / sum_ij cov_ij^2 = trace(C)^2 / ||C||_F^2

    (Gao et al. 2017's participation ratio) — "how many directions does
    the embedding actually use": PR = d for isotropic noise, PR -> 1
    when one direction dominates. The truncation-budget audit run BEFORE
    committing to a Matryoshka/PCA cut; no eigendecomposition needed,
    both invariants come straight off the covariance matrix.

    Implementations (the covariance/CKA expr-gemm duality, bit-equal):

    - ``impl="expr"`` (the oracle path): n*d^2 slim dim-pair rows
      through Catalyst — products round(x*y, 9) DECIMAL-summed,
      cov = round(sxy/n - mu_i*mu_j, 9), trace/Frobenius folded as
      DECIMAL sums of round(c^2, 12).
    - ``impl="gemm"`` (default via ``auto`` for d > 16): one Arrow pass
      of 9dp-scaled int64 gramian partials (exact, order-independent),
      the driver replays the identical rounding chain with Decimal
      arithmetic on d^2 scalars. Nothing n*d^2-sized ever shuffles.

    Returns one row ``(d, n, trace, frob_sq, intrinsic_dim)`` at 6dp.
    """
    if dims is None:
        first = df.select(F.size(vec).alias("d")).first()
        dims = int(first["d"]) if first is not None else 0
    if dims < 1:
        raise ValueError("intrinsic_dimension needs at least one dimension")
    if impl == "auto":
        impl = "gemm" if dims > 16 else "expr"
    if impl == "gemm":
        return _intrinsic_gemm(df, vec, dims)
    if impl != "expr":
        raise ValueError(f"impl must be 'auto', 'expr' or 'gemm', got {impl!r}")
    d = dims
    ex = df.select(
        F.col(id_col).alias("rid"),
        F.posexplode(F.col(vec).cast("array<double>")).alias("i", "v"),
    ).where(F.col("i") < d)
    a, b = ex.alias("a"), ex.alias("b")
    sums = (
        a.join(b, F.col("a.rid") == F.col("b.rid"))
        .select(
            F.col("a.i").alias("i"),
            F.col("b.i").alias("j"),
            (F.col("a.v") * F.col("b.v")).alias("xy"),
        )
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round("xy", 9).cast("decimal(25,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            .alias("sxy"),
        )
    )
    means = ex.groupBy("i").agg(
        F.round(
            F.sum(F.round("v", 9).cast("decimal(20,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mu")
    )
    mi = means.select("i", F.col("mu").alias("mi"))
    mj = means.select(F.col("i").alias("j"), F.col("mu").alias("mj"))
    cov = (
        sums.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            "n",
            F.round(
                F.col("sxy") / F.col("n") - F.col("mi") * F.col("mj"), 9
            ).alias("c"),
        )
    )
    agg = cov.agg(
        F.max("n").alias("n"),
        F.sum(
            F.when(F.col("i") == F.col("j"), F.col("c").cast("decimal(20,9)"))
        )
        .cast("decimal(38,9)")
        .cast("double")
        .alias("trace"),
        F.sum(F.round(F.col("c") * F.col("c"), 12).cast("decimal(24,12)"))
        .cast("decimal(38,12)")
        .cast("double")
        .alias("frob_sq"),
    )
    return agg.select(
        F.lit(d).alias("d"),
        F.col("n").cast("bigint").alias("n"),
        F.round("trace", 6).alias("trace"),
        F.round("frob_sq", 6).alias("frob_sq"),
        F.when(
            F.col("frob_sq") != 0.0,
            F.round(
                F.col("trace") * F.col("trace") / F.col("frob_sq"), 6
            ),
        ).alias("intrinsic_dim"),
    )


def _intrinsic_gemm(df: DataFrame, vec: str, d: int) -> DataFrame:
    """Driver replay of intrinsic_dimension's expr rounding chain from
    exact int64 gramian partials — see _gramian_int64 / _cka_gemm."""
    from decimal import Decimal

    spark = df.sparkSession
    n_tot, sv, sxy = _gramian_int64(df, vec, d, caller="intrinsic_dimension")
    mu = [
        _round_half_up(float(Decimal(int(sv[i])) / Decimal(10**9)) / n_tot, 9)
        for i in range(d)
    ]
    q9 = Decimal(1).scaleb(-9)
    q12 = Decimal(1).scaleb(-12)
    trace = Decimal(0)
    frob = Decimal(0)
    for i in range(d):
        for j in range(d):
            sxy_dbl = float(Decimal(int(sxy[i][j])) / Decimal(10**9))
            c = _round_half_up(sxy_dbl / n_tot - mu[i] * mu[j], 9)
            if i == j:
                trace += Decimal(repr(c)).quantize(q9)
            frob += Decimal(repr(_round_half_up(c * c, 12))).quantize(q12)
    tr = float(trace)
    fq = float(frob)
    return spark.createDataFrame(
        [
            (
                d,
                n_tot,
                _round_half_up(tr, 6),
                _round_half_up(fq, 6),
                _round_half_up(tr * tr / fq, 6),
            )
        ],
        "d INT, n BIGINT, trace DOUBLE, frob_sq DOUBLE, intrinsic_dim DOUBLE",
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    window: int = 2,
    damping: float = 0.85,
    iterations: int = 6,
    min_count: int = 5,
    topk: int = 25,
    id_col: str | None = None,
) -> DataFrame:
    """Corpus-level TextRank keywords (Mihalcea & Tarau 2004): build the
    word co-occurrence graph — an undirected edge between tokens
    appearing within ``window`` positions of each other — and rank nodes
    with the shared fixed-iteration PageRank. The graph-centrality
    sibling of RAKE: RAKE scores phrases by degree/frequency inside
    stopword-delimited runs, TextRank lets importance FLOW, so a
    mid-frequency term bridging many contexts outranks a frequent but
    isolated one.

    Determinism/scale: candidate nodes are non-stopword tokens with
    global count >= ``min_count`` (bounds the graph by vocabulary, not
    corpus); co-occurrence pairs come from ``window`` offset equi-joins
    on (doc, position) — linear in corpus tokens, never per-doc
    quadratic; the power iteration is graph.pagerank's 9dp-DECIMAL
    recursion (oracle-unrollable). Ordering and the top-k cut use the
    6dp rank then token, so the cut is engine-exact.

    Returns ``(token, rank)`` — top ``topk`` by (rank DESC, token).
    """
    from nbdatatools_spark.functions.text import (
        STOPWORDS,
        normalize_text,
        tokens,
    )
    from nbdatatools_spark.operators.graph import pagerank

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    # doc key in its OWN projection before the generator:
    # monotonically_increasing_id inside the posexplode select would run
    # per OUTPUT row (every token its own doc -> empty edge table)
    base = (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__txt"))
        if id_col
        else df.select(
            F.monotonically_increasing_id().alias("doc"),
            F.col(text_col).alias("__txt"),
        )
    )
    pos = (
        base.select(
            "doc",
            F.posexplode_outer(tokens(normalize_text(F.col("__txt")))).alias(
                "pos", "w"
            ),
        )
        .where(F.length("w") > 0)
        .where(~F.col("w").isin(*STOPWORDS))
        .localCheckpoint(eager=False)
    )
    cand = (
        pos.groupBy("w")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= min_count)
        .select("w")
    )
    cpos = pos.join(F.broadcast(cand), "w")
    offs = df.sparkSession.range(1, window + 1).select(
        F.col("id").cast("int").alias("o")
    )
    a = cpos.select("doc", "pos", F.col("w").alias("wa"))
    b = cpos.select(
        "doc", F.col("pos").alias("pos_b"), F.col("w").alias("wb")
    )
    pairs = (
        a.join(F.broadcast(offs), F.lit(True))
        .join(
            b,
            (b["doc"] == a["doc"]) & (b["pos_b"] == a["pos"] + F.col("o")),
        )
        .where(F.col("wa") != F.col("wb"))
        .select(
            F.least("wa", "wb").alias("u"), F.greatest("wa", "wb").alias("v")
        )
    )
    und = pairs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
    edges = und.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).union(und.select(F.col("v"), F.col("u"), "w"))
    ranks = pagerank(
        edges, damping=damping, iterations=iterations, weight="w"
    )
    return (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(topk)
        .select(F.col("node").alias("token"), "rank")
    )


def rfm_segments(
    df: DataFrame,
    customer_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_buckets: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic warehouse cohorting readout: bucket every customer into
    ``n_buckets`` equal-population tiers per dimension, then report the
    segment grid. Bucket 0 = smallest value (oldest recency-gap /
    fewest orders / least spend), so (0, B-1, B-1) reads "recently
    active heavy spender".

    Scale shape: one groupBy(customer) reduces orders to the customer
    grain; each dimension ranks with the TWO-PHASE global row index
    (windows.global_row_index — range partition + local index +
    broadcast offsets, no single-reducer window) and buckets by
    ``floor(idx * B / n)`` (exact equal-population cuts, no ntile).
    Monetary sums ride round(,2)-DECIMAL (order-independent), so rank
    order is engine-exact. Ties across a bucket boundary split by
    (value, customer) — deterministic.

    Returns ``(r_bucket, f_bucket, m_bucket, n_customers, avg_recency_days,
    avg_orders, avg_monetary)`` for occupied segments, ordered.
    """
    from nbdatatools_spark.operators.windows import global_row_index

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    cust = df.groupBy(F.col(customer_col).alias("cust")).agg(
        F.max(F.to_date(ts_col)).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col(amount_col), 2).cast("decimal(24,2)"))
        .cast("decimal(38,2)")
        .alias("money"),
    ).localCheckpoint(eager=False)
    horizon = cust.agg(F.max("last_day").alias("h"))
    base = cust.crossJoin(F.broadcast(horizon)).select(
        "cust",
        F.datediff(F.col("h"), F.col("last_day")).alias("recency"),
        "freq",
        "money",
    )
    n = cust.agg(F.count(F.lit(1)).alias("n"))

    def bucketize(frame, col, out):
        idx = global_row_index(frame, [F.col(col), F.col("cust")], out="__i")
        return idx.crossJoin(F.broadcast(n)).select(
            "cust",
            F.floor(F.col("__i") * n_buckets / F.col("n"))
            .cast("int")
            .alias(out),
        )

    r = bucketize(base.select("cust", "recency"), "recency", "r_bucket")
    f = bucketize(base.select("cust", "freq"), "freq", "f_bucket")
    m = bucketize(base.select("cust", "money"), "money", "m_bucket")
    return (
        base.join(r, "cust")
        .join(f, "cust")
        .join(m, "cust")
        .groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.col("recency").cast("decimal(20,0)"))
                .cast("decimal(38,0)")
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_recency_days"),
            F.round(
                F.sum(F.col("freq").cast("decimal(20,0)"))
                .cast("decimal(38,0)")
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_orders"),
            F.round(
                F.sum("money").cast("decimal(38,2)").cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_monetary"),
        )
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )


def source_concentration(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Source-concentration audit: Lorenz curve + Gini coefficient of
    per-slice token mass — "is this corpus really 20 sources, or one
    source wearing 20 hats". A Gini of 0 means perfectly even
    contribution; near 1 means a single slice dominates (and its biases
    dominate the trained model).

    Gini over the ascending-mass order (ties split by slice name):
    ``G = sum_i (2i - n - 1) w_(i) / (n * sum w)``. One token-count
    aggregate reduces the corpus to the slice grain; the ranking window
    runs over the SLICE table only (bounded — the module's day-grain
    exception). Integer weights; shares at 6dp.

    Returns ``(rank, group, weight, share, cum_share, gini)`` ascending
    by rank, gini repeated per row (the benford chi2 convention).
    """
    from nbdatatools_spark.functions.text import token_count

    w = df.groupBy(F.col(group_col).alias("g")).agg(
        F.sum(token_count(F.col(text_col)).cast("long")).alias("w")
    )
    win = Window.orderBy("w", "g")
    tot = w.agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("tw")
    )
    ranked = (
        w.select("g", "w", F.row_number().over(win).alias("rank"))
        .crossJoin(F.broadcast(tot))
    )
    upto = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    gini = ranked.agg(
        F.round(
            F.sum(
                (F.lit(2) * F.col("rank") - F.col("n") - 1)
                .cast("decimal(20,0)")
                * F.col("w").cast("decimal(18,0)")
            )
            .cast("decimal(38,0)")
            .cast("double")
            / (F.max("n").cast("double") * F.max("tw")),
            6,
        ).alias("gini")
    )
    return (
        ranked.select(
            "rank",
            F.col("g").alias(group_col),
            "w",
            F.round(F.col("w") / F.col("tw"), 6).alias("share"),
            F.round(F.sum("w").over(upto) / F.col("tw"), 6).alias(
                "cum_share"
            ),
        )
        .crossJoin(F.broadcast(gini))
        .select(
            "rank", group_col,
            F.col("w").alias("weight"),
            "share", "cum_share", "gini",
        )
        .orderBy("rank")
    )


def embedding_isotropy(
    df: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 64,
) -> DataFrame:
    """Isotropy audit via a deterministic pairwise-cosine sample: take
    the ``sample_size`` vectors with the smallest md5(id) (an
    order-free, partition-invariant pseudo-random draw — the repo's
    sampling convention), compute all C(S,2) exact cosines, and report
    their mean / mean-absolute / max-absolute. Isotropic embeddings
    read mean |cos| near 0; anisotropic ones (the common "narrow cone"
    pathology, Ethayarajh 2019) read large positive means — the cheap
    pre-check before whitening is scheduled.

    Scale shape: the sample is a TakeOrdered of S rows regardless of
    corpus size; the S^2 cosine block is a broadcast self-join of a
    bounded frame. Dot products ride round(9)-DECIMAL sums per the
    distance-kernel convention. Returns one row ``(n_sampled, n_pairs,
    mean_cos, mean_abs_cos, max_abs_cos)`` at 6dp.
    """
    if sample_size < 2:
        raise ValueError(f"sample_size must be >= 2, got {sample_size}")
    sample = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec).cast("array<double>").alias("v"),
            F.md5(F.col(id_col).cast("string")).alias("__k"),
        )
        .orderBy("__k", "id")
        .limit(sample_size)
        .drop("__k")
        .localCheckpoint(eager=False)
    )
    a, b = sample.alias("a"), sample.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: F.round(x * y, 9)),
        F.lit(0.0).cast("decimal(25,9)"),
        lambda acc, t: (acc + t.cast("decimal(25,9)")).cast("decimal(25,9)"),
    ).cast("double")
    nrm = lambda side: F.sqrt(
        F.aggregate(
            F.transform(F.col(f"{side}.v"), lambda x: F.round(x * x, 9)),
            F.lit(0.0).cast("decimal(25,9)"),
            lambda acc, t: (acc + t.cast("decimal(25,9)")).cast(
                "decimal(25,9)"
            ),
        ).cast("double")
    )
    pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.round(dot / (nrm("a") * nrm("b")), 9).alias("cos")
    )
    n_sampled = sample.agg(
        F.count(F.lit(1)).cast("int").alias("n_sampled")
    )
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(F.col("cos").cast("decimal(20,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_cos"),
        F.round(
            F.sum(F.abs(F.col("cos")).cast("decimal(20,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_abs_cos"),
        F.round(F.max(F.abs(F.col("cos"))), 6).alias("max_abs_cos"),
    )
    return n_sampled.crossJoin(F.broadcast(stats))


def log_odds_tokens(
    docs: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    text_col: str = "text",
    alpha: float = 0.01,
    top_k: int = 25,
) -> DataFrame:
    """"Fightin' Words" corpus comparison (Monroe, Colaresi & Quinn,
    Political Analysis 2008): which tokens are statistically
    OVER-represented in slice A vs slice B, via the log-odds-ratio with
    an uninformative Dirichlet prior and its z-score — the
    sampling-variance-honest alternative to raw tf-idf deltas for
    "what changed between these two sources / snapshots / shards".

        delta_w = ln((y_aw + a) / (n_a + a0 - y_aw - a))
                - ln((y_bw + a) / (n_b + a0 - y_bw - a)),
        var_w   = 1/(y_aw + a) + 1/(y_bw + a),
        z_w     = delta_w / sqrt(var_w),      a0 = a * V.

    Returns the ``top_k`` tokens per side (side 'a' by z DESC, side 'b'
    by z ASC), ties on token ASC: ``(side, token, count_a, count_b, z)``
    with z rounded to 6dp.

    Scale shape: ONE token-count aggregate per side over the union vocab
    (map-side partial; the pivot is a conditional sum, not a join), V
    and n_a/n_b from the same vocab-sized table; top-k via two
    TakeOrderedAndProjects. All arithmetic is double over integer
    counts — engine-replayable.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from nbdatatools_spark.functions.text import tokens

    both = docs.where(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        (F.col(group_col) == group_a).alias("__isa"),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("__w"),
    ).where(F.col("__w").isNotNull() & (F.col("__w") != ""))
    counts = both.groupBy("__w").agg(
        F.sum(F.when(F.col("__isa"), 1).otherwise(0)).alias("ya"),
        F.sum(F.when(~F.col("__isa"), 1).otherwise(0)).alias("yb"),
    )
    totals = counts.agg(
        F.sum("ya").alias("na"),
        F.sum("yb").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    a = float(alpha)
    scored = counts.crossJoin(F.broadcast(totals)).select(
        F.col("__w").alias("token"),
        F.col("ya").alias("count_a"),
        F.col("yb").alias("count_b"),
        F.round(
            (
                F.log(
                    (F.col("ya") + a)
                    / (F.col("na") + a * F.col("v") - F.col("ya") - a)
                )
                - F.log(
                    (F.col("yb") + a)
                    / (F.col("nb") + a * F.col("v") - F.col("yb") - a)
                )
            )
            / F.sqrt(1.0 / (F.col("ya") + a) + 1.0 / (F.col("yb") + a)),
            6,
        ).alias("z"),
    )
    top_a = (
        scored.orderBy(F.desc("z"), "token")
        .limit(top_k)
        .select(F.lit("a").alias("side"), "token", "count_a", "count_b", "z")
    )
    top_b = (
        scored.orderBy(F.asc("z"), "token")
        .limit(top_k)
        .select(F.lit("b").alias("side"), "token", "count_a", "count_b", "z")
    )
    return top_a.unionAll(top_b)


def wasserstein_1d(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between two slices'
    empirical value distributions:

        W1 = integral |F_a(x) - F_b(x)| dx
           = sum over sorted distinct values of |F_a(v) - F_b(v)| * gap

    — the metric sibling of the PSI/KS drift family: PSI says "the score
    distribution moved", W1 says BY HOW MUCH in value units (the natural
    readout for "did the new scorer shift mass toward longer documents").

    Scale shape: ONE distinct-value contingency aggregate, then the
    two-phase range-partition cumsum discipline (ranking_auc's shape —
    partition-local running sums + P-row broadcast offsets, no
    single-reducer window); the cross-partition gap for each partition's
    last value comes from a P-row next-partition-minimum table. Per-value
    terms round to 9dp and DECIMAL-sum — engine-exact regardless of
    partitioning.

    Returns one row ``(n_a, n_b, wasserstein)`` (6dp); NULL distance when
    either slice is empty. NULL ``value_col`` rows are excluded from the
    distribution (ADVICE r7: nulls would otherwise count into n_a/n_b
    and — Spark sorts nulls first, DuckDB last — bias the CDF cumsums
    differently in engine and oracle whenever null rates differ).
    """
    base = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .where(F.col(value_col).isNotNull())
        .select(
            F.col(value_col).cast("double").alias("__v"),
            (F.col(group_col) == group_a).alias("__isa"),
        )
    )
    g = base.groupBy("__v").agg(
        F.sum(F.when(F.col("__isa"), 1).otherwise(0)).alias("__ia"),
        F.sum(F.when(~F.col("__isa"), 1).otherwise(0)).alias("__ib"),
    )
    n_part = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    g2 = (
        g.repartitionByRange(n_part, F.col("__v"))
        .sortWithinPartitions("__v")
        .select("*", F.spark_partition_id().alias("__pid"))
        .localCheckpoint(eager=False)
    )
    w_loc = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        g2.groupBy("__pid")
        .agg(
            F.sum("__ia").alias("__ca"),
            F.sum("__ib").alias("__cb"),
            F.min("__v").alias("__first_v"),
        )
        .select(
            "__pid",
            F.coalesce(F.sum("__ca").over(w_off), F.lit(0)).alias("__offa"),
            F.coalesce(F.sum("__cb").over(w_off), F.lit(0)).alias("__offb"),
            # the NEXT partition's first value closes this partition's last gap
            F.lead("__first_v").over(Window.orderBy("__pid")).alias("__next_first"),
        )
    )
    w_lead = Window.partitionBy("__pid").orderBy("__v")
    cum = g2.join(F.broadcast(offs), "__pid").select(
        "__v",
        (F.sum("__ia").over(w_loc) + F.col("__offa")).alias("__cuma"),
        (F.sum("__ib").over(w_loc) + F.col("__offb")).alias("__cumb"),
        F.coalesce(F.lead("__v").over(w_lead), F.col("__next_first")).alias(
            "__next"
        ),
    )
    tot = g.agg(
        F.sum("__ia").cast("bigint").alias("n_a"),
        F.sum("__ib").cast("bigint").alias("n_b"),
    )
    # term guarded on both slice totals: an empty slice would push NaN
    # into the ANSI decimal cast (double / 0 -> Inf -> abs -> NaN -> throw)
    terms = cum.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(
                F.abs(
                    F.col("__cuma").cast("double") / F.col("n_a")
                    - F.col("__cumb").cast("double") / F.col("n_b")
                )
                * (F.coalesce(F.col("__next"), F.col("__v")) - F.col("__v")),
                9,
            ),
        ).cast("decimal(30,9)").alias("__t"),
    )
    return terms.groupBy("n_a", "n_b").agg(
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(
                F.sum("__t").cast("decimal(38,9)").cast("double"), 6
            ),
        ).alias("wasserstein")
    )


def _cross_gramian_int64(
    joined: DataFrame, vec_a: str, vec_b: str, d: int, caller: str
):
    """Shared 9dp-scaled int64 CROSS-gramian collection over id-joined
    vector pairs (the _gramian_int64 discipline: every decimal-sum addend
    round(x*y, 9) is an exact multiple of 1e-9, so sum(rint(x*y*1e9)) as
    int64 reproduces it order-independently). Returns
    ``(n, trace_a_int, trace_b_int, m_int[d][d])`` as exact python ints,
    with M = A^T B in row-major (i indexes A's dims, j indexes B's)."""
    import numpy as np

    def partials(batches):
        import pandas as pd

        n = 0
        ta = np.int64(0)
        tb = np.int64(0)
        m = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            va = pdf["__a"].to_list()
            vb = pdf["__b"].to_list()
            if any(v is None or len(v) < d for v in va + vb):
                raise ValueError(
                    f"{caller} needs uniform vectors of >= {d} dims"
                )
            A = np.asarray([v[:d] for v in va], dtype=np.float64)
            B = np.asarray([v[:d] for v in vb], dtype=np.float64)
            n += A.shape[0]
            ta += np.rint(A * A * 1e9).astype(np.int64).sum()
            tb += np.rint(B * B * 1e9).astype(np.int64).sum()
            for s in range(0, A.shape[0], 256):
                blk_a, blk_b = A[s : s + 256], B[s : s + 256]
                prods = blk_a[:, :, None] * blk_b[:, None, :]
                m += np.rint(prods * 1e9).astype(np.int64).sum(axis=0)
        yield pd.DataFrame(
            {
                "n": [n],
                "ta": [int(ta)],
                "tb": [int(tb)],
                "m": [m.ravel().tolist()],
            }
        )

    rows = joined.select(
        F.col(vec_a).alias("__a"), F.col(vec_b).alias("__b")
    ).mapInPandas(partials, "n long, ta long, tb long, m array<long>").collect()
    n_tot = sum(r["n"] for r in rows)
    if n_tot == 0:
        raise ValueError(f"{caller} needs at least one joined row")
    import numpy as _np

    ta = sum(int(r["ta"]) for r in rows)
    tb = sum(int(r["tb"]) for r in rows)
    m = _np.zeros((d, d), dtype=object)
    for r in rows:
        m += _np.asarray(r["m"], dtype=object).reshape(d, d)
    return n_tot, ta, tb, m


def procrustes_align(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str = "vec_id",
    vec_a: str = "embedding",
    vec_b: str = "embedding",
    dims: int | None = None,
):
    """Orthogonal Procrustes alignment between two embedding snapshots
    (Schönemann 1966): the rotation R = U V^T from SVD(A^T B = U S V^T)
    that maps space A onto space B with minimal Frobenius error — the
    standard tool for comparing embeddings across model versions /
    checkpoints (align, THEN measure drift; unaligned cosine drift
    conflates rotation with real change).

    Returns ``(R, stats_df)``: R as a plain d x d list (row i = where
    A's dim i lands), stats_df one row ``(n, d, trace_a, trace_b,
    nuclear_m, residual_sq, relative_residual)`` where
    ``residual_sq = ||A R - B||_F^2 = trace_a + trace_b - 2 * sum(S)``
    (the Procrustes identity) and ``relative_residual = residual_sq /
    trace_b`` (0 = B is an exact rotation of A).

    Scale shape: ONE id-equi-join + ONE Arrow-batched cross-gramian pass
    (d^2 int64 partials per batch — the _gramian_int64 discipline, exact
    and order-independent); the SVD runs on the d x d matrix on the
    driver (the kmeans/fitting bounded-collect shape). Corpus size never
    hits the driver.
    """
    import numpy as np

    joined = df_a.select(
        F.col(id_col).alias("__id"), F.col(vec_a).alias("__va")
    ).join(
        df_b.select(F.col(id_col).alias("__id"), F.col(vec_b).alias("__vb")),
        "__id",
    )
    if dims is None:
        first = joined.select(F.size("__va").alias("s")).first()
        if first is None:
            raise ValueError("procrustes_align needs at least one joined row")
        dims = int(first["s"])
    n, ta_i, tb_i, m_i = _cross_gramian_int64(
        joined, "__va", "__vb", dims, caller="procrustes_align"
    )
    ta = float(ta_i) * 1e-9
    tb = float(tb_i) * 1e-9
    m = np.asarray(m_i, dtype=np.float64) * 1e-9
    u, s, vt = np.linalg.svd(m)
    r = u @ vt
    nuclear = float(s.sum())
    residual = max(0.0, ta + tb - 2.0 * nuclear)
    spark = df_a.sparkSession
    stats = spark.createDataFrame(
        [
            (
                n,
                dims,
                round(ta, 6),
                round(tb, 6),
                round(nuclear, 6),
                round(residual, 6),
                round(residual / tb, 6) if tb > 0 else None,
            )
        ],
        "n bigint, d int, trace_a double, trace_b double, nuclear_m double,"
        " residual_sq double, relative_residual double",
    )
    return [[float(x) for x in row] for row in r], stats


def value_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Fixed-grid value histogram: ``(bin, n)`` counts over ``n_bins``
    equal-width bins on [lo, hi], values outside clamped to the edge
    bins (the calibration_bins grid discipline). ONE map-side projection
    + ONE groupBy with state BOUNDED at n_bins cells — which is exactly
    why the same build runs unchanged as a STREAMING aggregation
    (streaming.events.stream_value_histogram): counts are order-free
    and idempotent-merge, the HLL/CMS sketch pattern.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / n_bins
    idx = F.floor(
        (F.col(value_col).cast("double") - F.lit(float(lo)))
        / F.lit(float(width))
    ).cast("int")
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.least(F.greatest(idx, F.lit(0)), F.lit(n_bins - 1)).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 64,
) -> DataFrame:
    """Streaming-mergeable quantile estimates from the fixed-grid
    histogram: for each probability p, locate the first bin whose
    cumulative count reaches ``p * n`` and interpolate linearly inside
    it — error bounded by ONE bin width, the classic histogram-sketch
    quantile (the fixed-grid sibling of approx_percentile's GK sketch,
    but with MERGEABLE state that the streaming build shares verbatim).

    Plan: the histogram aggregate (bounded n_bins state), ONE cumulative
    window over the n_bins-row table only (the vocab-table discipline),
    and a broadcast probs-grid join picking the qualifying bin via one
    struct-min aggregate. All arithmetic double-over-integers, rounded
    to 6dp — engine-exact.

    Returns ``(p, n, bin, estimate)`` ordered by p.
    """
    for p in probs:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"probs must be in (0,1], got {p}")
    hist = value_histogram(df, value_col, lo, hi, n_bins)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        "n",
        F.sum("n").over(w).alias("cum"),
    ).localCheckpoint(eager=False)
    spark = df.sparkSession
    grid = spark.createDataFrame([(float(p),) for p in probs], "p double")
    tot = hist.agg(F.sum("n").alias("total"))
    width = (float(hi) - float(lo)) / n_bins
    cand = (
        grid.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(cum),
            F.col("cum") >= F.col("p") * F.col("total"),
            "left",
        )
        .groupBy("p", "total")
        .agg(
            F.min(F.struct(F.col("bin"), F.col("n"), F.col("cum"))).alias("__b")
        )
    )
    est = (
        F.lit(float(lo))
        + F.lit(width)
        * (
            F.col("__b.bin")
            + (
                F.col("p") * F.col("total")
                - (F.col("__b.cum") - F.col("__b.n"))
            )
            / F.col("__b.n")
        )
    )
    return cand.select(
        "p",
        F.col("total").alias("n"),
        F.col("__b.bin").alias("bin"),
        F.round(F.least(est, F.lit(float(hi))), 6).alias("estimate"),
    ).orderBy("p")


def lexical_diversity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-slice lexical diversity profile — the vocabulary-richness
    readout that separates template/boilerplate-heavy sources from
    genuinely varied text (low diversity = SEO spam / log dumps even when
    quality filters pass):

    - ``root_ttr``: types / sqrt(tokens) (Guiraud 1954 — the
      length-robust type-token ratio),
    - ``hapax_ratio``: fraction of types occurring exactly once,
    - ``yule_k``: 10^4 * (sum_m m^2 V_m - N) / N^2 (Yule 1944; LOW K =
      diverse, HIGH K = repetitive),

    over normalized whitespace tokens (the vocab_topk tokenizer, so the
    numbers are comparable with the rest of the corpus-stats family).

    Returns ``(group, n_tokens, n_types, root_ttr, hapax_ratio, yule_k)``
    per slice at 6dp, ordered by group.

    Plan: one (group, token) count aggregate -> one (group, freq) count
    aggregate (the frequency-of-frequencies table is tiny) -> one group
    reduce. All integer counts until the final divisions — engine-exact.
    """
    from nbdatatools_spark.functions.text import normalize_text, tokens

    ex = df.select(
        F.col(group_col).alias("__g"),
        F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias("__t"),
    ).where(F.col("__t").isNotNull() & (F.length("__t") > 0))
    tok = ex.groupBy("__g", "__t").agg(F.count(F.lit(1)).alias("__m"))
    freqs = tok.groupBy("__g", "__m").agg(F.count(F.lit(1)).alias("__vm"))
    agg = freqs.groupBy("__g").agg(
        F.sum(F.col("__m") * F.col("__vm")).alias("__n"),
        F.sum("__vm").alias("__v"),
        F.sum(F.when(F.col("__m") == 1, F.col("__vm")).otherwise(F.lit(0))).alias(
            "__h"
        ),
        F.sum(F.col("__m") * F.col("__m") * F.col("__vm")).alias("__m2"),
    )
    n = F.col("__n").cast("double")
    v = F.col("__v").cast("double")
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__n").cast("bigint").alias("n_tokens"),
        F.col("__v").cast("bigint").alias("n_types"),
        F.round(v / F.sqrt(n), 6).alias("root_ttr"),
        F.round(F.col("__h").cast("double") / v, 6).alias("hapax_ratio"),
        F.round(
            1e4 * (F.col("__m2").cast("double") - n) / (n * n), 6
        ).alias("yule_k"),
    ).orderBy(group_col)


def distinct_ngrams(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    ns: Sequence[int] = (1, 2, 3),
) -> DataFrame:
    """Distinct-n diversity ratios (Li et al. 2016's distinct-1/2 —
    the standard generated-text / curated-slice diversity readout):
    per slice and n-gram order, the fraction of n-gram TOKENS that are
    unique TYPES. Near-0 = template spam or decoding collapse, near-1 =
    every n-gram fresh; the n-gram-order sibling of
    ``lexical_diversity`` (which is unigram-only but adds
    frequency-spectrum shape).

    Tokenization is the corpus-stats family's normalized whitespace
    tokenizer; n-grams are built JVM-side from the token array
    (``transform`` over a position ``sequence`` + ``slice`` — no
    explode-then-window, no Python). Documents shorter than n
    contribute no n-grams of that order.

    Returns ``(group, n, total_ngrams, distinct_ngrams,
    distinct_ratio)`` at 6dp, ordered by (group, n); slices with zero
    n-grams of an order are ABSENT for that order (nothing to measure).

    Scale shape: per n, one map-side n-gram explode into ONE
    (group, gram) count aggregate, then a (group)-keyed reduce —
    map-side-combinable throughout; the union over ``ns`` is |ns|
    independent aggregates Catalyst schedules in parallel.
    """
    from functools import reduce as _reduce

    from nbdatatools_spark.functions.text import normalize_text, tokens

    if not ns or any(n <= 0 for n in ns):
        raise ValueError(f"ns must be positive n-gram orders, got {ns!r}")
    toks = df.select(
        F.col(group_col).alias("__g"),
        tokens(normalize_text(F.col(text_col))).alias("__t"),
    )

    def one(n: int) -> DataFrame:
        grams = toks.where(F.size("__t") >= n).select(
            "__g",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("__t"), i, n)
                    ),
                )
            ).alias("__gram"),
        )
        counts = grams.groupBy("__g", "__gram").agg(
            F.count(F.lit(1)).alias("__c")
        )
        return counts.groupBy("__g").agg(
            F.lit(n).cast("int").alias("n"),
            F.sum("__c").cast("bigint").alias("total_ngrams"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_ngrams"),
        )

    out = _reduce(DataFrame.unionByName, [one(n) for n in sorted(ns)])
    return out.select(
        F.col("__g").alias(group_col),
        "n",
        "total_ngrams",
        "distinct_ngrams",
        (
            F.round(
                F.col("distinct_ngrams") / F.col("total_ngrams").cast("double"),
                6,
            )
            + 0.0
        ).alias("distinct_ratio"),
    ).orderBy(group_col, "n")


def sinkhorn_distance(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    n_bins: int = 12,
    lo: float = 0.0,
    hi: float = 1.0,
    eps: float = 0.25,
    iterations: int = 10,
) -> DataFrame:
    """Entropic-regularized optimal-transport cost (Sinkhorn, Cuturi
    2013) between two slices' binned value distributions — the
    regularized sibling of :func:`wasserstein_1d`: W1 is exact but only
    defined on the line; the Sinkhorn machinery is THE corpus-distance
    primitive that generalizes to any cost matrix (here |i-j|/(B-1)
    over B fixed-width bins, so at eps -> 0 it approaches W1 on the
    binned supports, in bin-width units of the normalized cost).

    The fixed-point loop u = a/(Kv), v = b/(Ku) runs a FIXED
    ``iterations`` count as a declarative chain over B-row frames (the
    temperature_scaling discipline): each half-step is one B^2-row join
    + one B-row aggregate; u and v are re-rounded to 9dp per half-step
    and K = round(exp(-C/eps), 9) cell-wise, so an oracle replays the
    whole optimization bit-for-bit. Histograms are value-clamped to the
    edge bins, NULL-dropped, and normalized at 9dp; empty-mass bins
    carry exact zeros through the updates (0/s = 0; denominators stay
    positive because K > 0 everywhere).

    Returns ONE row ``(n_a, n_b, cost, marginal_err)`` at 6dp: cost =
    sum P.C with P = diag(u) K diag(v); marginal_err = sum_j |col-sum
    P_j - b_j| — the TRUE convergence readout. The loop's final
    half-step is u = a/(Kv), which makes the ROW sums of P equal a by
    construction (up to 9dp rounding), so a row-marginal residual
    reads ~0 after even one iteration and says nothing about mixing;
    the unconstrained marginal after an ...v,u ending is the COLUMN
    one, and its residual against b is what shrinks as the fixed
    point converges (near 0 when mixed; at 10 iterations and
    eps >= 0.1 it is < 1e-4 on anything non-degenerate).

    Scale shape: ONE corpus aggregate builds both histograms (B-row
    result, lazily checkpointed so the 2*iterations references to the
    tiny frames never rescan the corpus); everything after is
    B^2-bounded. The corpus is scanned once regardless of iterations.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    spark = df.sparkSession
    width = (hi - lo) / n_bins
    idx = F.floor(
        (F.col("__v") - F.lit(float(lo))) / F.lit(float(width))
    ).cast("int")
    binned = (
        df.where(
            F.col(group_col).isin([group_a, group_b])
            & F.col(value_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .select(
            "__g",
            F.least(F.greatest(idx, F.lit(0)), F.lit(n_bins - 1)).alias(
                "__b"
            ),
        )
        .groupBy("__g", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("__b"))

    def hist(group: str, mass_col: str, n_col: str) -> DataFrame:
        h = binned.where(F.col("__g") == group).select("__b", "__c")
        tot = h.agg(F.sum("__c").alias("__n"))
        return (
            bins.join(h, "__b", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "__b",
                F.round(
                    F.coalesce(F.col("__c"), F.lit(0)) / F.col("__n"), 9
                ).alias(mass_col),
                F.col("__n").alias(n_col),
            )
            .localCheckpoint(eager=False)
        )

    a = hist(group_a, "__a", "__na")
    b = hist(group_b, "__bm", "__nb")
    # cost + Gibbs kernel over the B x B bin grid (exact cell formulas
    # both engines replay: C = |i-j|/(B-1), K = round(exp(-C/eps), 9))
    cost = F.abs(F.col("__i") - F.col("__j")) / F.lit(float(n_bins - 1))
    kmat = (
        bins.select(F.col("__b").alias("__i"))
        .crossJoin(bins.select(F.col("__b").alias("__j")))
        .select(
            "__i",
            "__j",
            F.round(cost, 9).alias("__cst"),
            F.round(F.exp(-cost / F.lit(float(eps))), 9).alias("__k"),
        )
        .localCheckpoint(eager=False)
    )

    def _dsum(expr):
        return (
            F.sum(F.round(expr, 9).cast("decimal(30,9)"))
            .cast("decimal(38,9)")
            .cast("double")
        )

    u = a.select(
        F.col("__b").alias("__i"),
        F.when(F.col("__a") > 0.0, F.lit(1.0)).otherwise(F.lit(0.0)).alias(
            "__u"
        ),
    )
    for _ in range(iterations):
        s_j = (
            kmat.join(u, "__i")
            .groupBy("__j")
            .agg(_dsum(F.col("__k") * F.col("__u")).alias("__s"))
        )
        v = b.select(F.col("__b").alias("__j"), "__bm").join(s_j, "__j").select(
            "__j",
            F.when(
                F.col("__s") > 0.0,
                F.round(F.col("__bm") / F.col("__s"), 9),
            )
            .otherwise(F.lit(0.0))
            .alias("__vv"),
        )
        s_i = (
            kmat.join(v, "__j")
            .groupBy("__i")
            .agg(_dsum(F.col("__k") * F.col("__vv")).alias("__s"))
        )
        u = a.select(F.col("__b").alias("__i"), "__a").join(s_i, "__i").select(
            "__i",
            F.when(
                F.col("__s") > 0.0,
                F.round(F.col("__a") / F.col("__s"), 9),
            )
            .otherwise(F.lit(0.0))
            .alias("__u"),
        )
        # cut lineage each iteration (optimization round 10, guide §3.3
        # "very large plans — planning time itself becomes the
        # bottleneck"): without this the final plan inlines all
        # 2*iterations B^2 joins (~550KB formatted at B=12, several
        # seconds of pure optimizer/codegen time on a 12-row problem).
        # u is a 9dp-rounded B-row frame, so checkpointing changes no
        # value; v's lineage is one join off the checkpointed u, so it
        # stays shallow without its own checkpoint.
        u = u.localCheckpoint(eager=False)
    plan = (
        kmat.join(u, "__i")
        .join(v, "__j")
        .select(
            "__j",
            "__cst",
            F.round(F.col("__u") * F.col("__k") * F.col("__vv"), 12).alias(
                "__p"
            ),
        )
    )
    total = plan.agg(
        _dsum(F.col("__p") * F.col("__cst")).alias("__cost"),
    )
    # convergence residual on the COLUMN marginal: the loop ends on a
    # u-update, so row sums equal a by construction — only the b-side
    # residual reflects mixing (round-10 ADVICE fix)
    col_err = (
        plan.groupBy("__j")
        .agg(
            F.sum(F.col("__p").cast("decimal(30,12)"))
            .cast("decimal(38,12)")
            .cast("double")
            .alias("__cs")
        )
        .join(b.select(F.col("__b").alias("__j"), "__bm"), "__j")
        .agg(_dsum(F.abs(F.col("__cs") - F.col("__bm"))).alias("__err"))
    )
    na = a.agg(F.max("__na").alias("n_a"))
    nb = b.agg(F.max("__nb").alias("n_b"))
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(col_err))
        .select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            (F.round("__cost", 6) + 0.0).alias("cost"),
            (F.round("__err", 6) + 0.0).alias("marginal_err"),
        )
    )


def vocab_richness(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-richness ESTIMATORS per slice from the frequency-of-
    frequencies spectrum — what ``lexical_diversity`` measures about the
    OBSERVED vocabulary, these extrapolate about the UNSEEN one (the
    corpus-growth planning question: "how much new vocabulary is left"):

    - ``chao1``: V + V1*(V1-1)/(2*(V2+1)) (Chao 1984, bias-corrected
      form — defined even when no type occurs exactly twice): a lower
      bound on the true vocabulary size,
    - ``unseen_mass``: V1/N (Good 1953; Good-Turing missing mass): the
      probability the NEXT token is an unseen type — near 0 means the
      slice's vocabulary is saturated, large means keep crawling,
    - ``herdan_c``: ln V / ln N (Herdan 1960): the log-log type-token
      slope, the scale-free diversity companion to Heaps-law fitting.

    Returns ``(group, n_tokens, n_types, v1, v2, chao1, unseen_mass,
    herdan_c)`` per slice at 6dp, ordered by group; single-token slices
    report NULL herdan_c (ln N = 0).

    Exactness: every input to the three formulas is an exact integer
    from two count aggregates; only the final divisions (and two libm
    ln calls on integers) are floating — engine-exact at 6dp.

    Scale shape: the lexical_diversity bill exactly — one (group,
    token) count aggregate -> one (group, freq) count aggregate (tiny)
    -> one group reduce.
    """
    from nbdatatools_spark.functions.text import normalize_text, tokens

    ex = df.select(
        F.col(group_col).alias("__g"),
        F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias(
            "__t"
        ),
    ).where(F.col("__t").isNotNull() & (F.length("__t") > 0))
    tok = ex.groupBy("__g", "__t").agg(F.count(F.lit(1)).alias("__m"))
    freqs = tok.groupBy("__g", "__m").agg(F.count(F.lit(1)).alias("__vm"))
    agg = freqs.groupBy("__g").agg(
        F.sum(F.col("__m") * F.col("__vm")).alias("__n"),
        F.sum("__vm").alias("__v"),
        F.sum(
            F.when(F.col("__m") == 1, F.col("__vm")).otherwise(F.lit(0))
        ).alias("__v1"),
        F.sum(
            F.when(F.col("__m") == 2, F.col("__vm")).otherwise(F.lit(0))
        ).alias("__v2"),
    )
    n = F.col("__n").cast("double")
    v = F.col("__v").cast("double")
    v1 = F.col("__v1").cast("double")
    v2 = F.col("__v2").cast("double")
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__n").cast("bigint").alias("n_tokens"),
        F.col("__v").cast("bigint").alias("n_types"),
        F.col("__v1").cast("bigint").alias("v1"),
        F.col("__v2").cast("bigint").alias("v2"),
        (
            F.round(v + v1 * (v1 - 1.0) / (2.0 * (v2 + 1.0)), 6) + 0.0
        ).alias("chao1"),
        (F.round(v1 / n, 6) + 0.0).alias("unseen_mass"),
        (
            F.round(
                F.when(F.col("__n") > 1, F.log(v) / F.log(n)), 6
            )
            + 0.0
        ).alias("herdan_c"),
    ).orderBy(group_col)


def approx_distinct_ngrams(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    ns: Sequence[int] = (1, 2, 3),
    precision: int = 10,
    hash_fn: str = "md5",
) -> DataFrame:
    """HyperLogLog scale path for :func:`distinct_ngrams`: per (slice,
    n-gram order), the distinct-TYPE count estimated by a
    ``2^precision``-register HLL keyed on (group, n) — at 100 TB the
    exact (group, gram) count table IS the corpus (3-gram types grow
    near-linearly in tokens), while this sketch shuffles at most
    ``partitions * m`` partial registers per slice. Total n-gram TOKENS
    stay exact (one integer count), so ``distinct_ratio`` inherits only
    the HLL error (~1.04/sqrt(m): ~3% at precision 10).

    Same md5-uint52 register convention and exact-integer harmonic sum
    as ``lm.hll_distinct`` (every 2^-M term a dyadic rational scaled to
    int64 — no float accumulation-order hazard); linear-counting
    correction below 2.5m when empty registers remain.

    ``hash_fn``: "md5" (default — DuckDB-replicable, the gate pins it)
    or "xxhash64" (JVM codegen, cheaper per gram; measured ~10% faster
    end-to-end at the 100x replica — the wall there is gram
    CONSTRUCTION, not hashing — so md5 stays the default; same
    estimator quality, different register assignment so estimates
    differ within the HLL error band).

    Returns ``(group, n, total_ngrams, distinct_estimate,
    distinct_ratio)`` ordered by (group, n); estimates at 6dp.
    tests/test_round10_batch5.py pins the relative error against the
    exact operator.
    """
    from nbdatatools_spark.functions.text import normalize_text, tokens

    if not ns or any(n <= 0 for n in ns):
        raise ValueError(f"ns must be positive n-gram orders, got {ns!r}")
    if not 4 <= precision <= 16:
        raise ValueError(f"precision must be in [4, 16], got {precision}")
    from functools import reduce as _reduce

    m = 1 << precision
    rbits = 52 - precision
    rmax = rbits + 1
    toks = df.select(
        F.col(group_col).alias("__g"),
        tokens(normalize_text(F.col(text_col))).alias("__t"),
    )

    def grams(n: int) -> DataFrame:
        return toks.where(F.size("__t") >= n).select(
            "__g",
            F.lit(n).cast("int").alias("__n"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i, n)),
                )
            ).alias("__gram"),
        )

    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"hash_fn must be md5 or xxhash64, got {hash_fn!r}")
    allg = _reduce(DataFrame.unionByName, [grams(n) for n in sorted(ns)])
    if hash_fn == "xxhash64":
        # uniform uint52 = the low 52 bits of the JVM xxhash64 —
        # branch-free mask, and unlike abs()%m it cannot go negative
        # (abs(Long.MIN_VALUE) overflows negative and Spark's % keeps
        # the dividend sign, which would yield a negative register)
        h = F.xxhash64("__gram").bitwiseAND(F.lit((1 << 52) - 1))
    else:
        h = F.conv(F.substring(F.md5("__gram"), 1, 13), 16, 10).cast("long")
    ranked = allg.select(
        "__g",
        "__n",
        (h % m).cast("int").alias("__reg"),
        F.shiftright(h, precision).alias("__w"),
    ).select(
        "__g",
        "__n",
        "__reg",
        F.when(F.col("__w") == 0, F.lit(rmax))
        .otherwise(F.lit(rbits) - F.length(F.bin("__w")) + 1)
        .cast("int")
        .alias("__rank"),
    )
    regs = ranked.groupBy("__g", "__n", "__reg").agg(
        F.max("__rank").alias("__mx")
    )
    sketch = regs.groupBy("__g", "__n").agg(
        F.count(F.lit(1)).alias("__used"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - __mx)")
        ).alias("__hsum_used"),
    )
    totals = allg.groupBy("__g", "__n").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_ngrams")
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    pow2 = float(1 << rmax)
    zero = F.lit(m) - F.col("__used")
    hsum = (
        F.col("__hsum_used")
        + zero.cast("long") * F.shiftleft(F.lit(1).cast("long"), rmax)
    )
    raw = F.lit(alpha) * m * m * pow2 / hsum
    est = F.when(
        (raw <= 2.5 * m) & (zero > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zero), 6),
    ).otherwise(F.round(raw, 6))
    return (
        totals.join(sketch, ["__g", "__n"])
        .select(
            F.col("__g").alias(group_col),
            F.col("__n").alias("n"),
            "total_ngrams",
            est.alias("distinct_estimate"),
            F.round(est / F.col("total_ngrams"), 6).alias(
                "distinct_ratio"
            ),
        )
        .orderBy(group_col, "n")
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    k: int = 50,
) -> DataFrame:
    """Hill tail-index estimator (Hill 1975) per slice over a positive
    value column — the heavy-tail risk planner the packing/batching
    family needs: alpha <= 2 on the document-length tail means the
    extreme documents dominate the token budget (infinite variance —
    the padding/length-batching assumptions break), alpha >= 3 means
    the tail is benign:

        alpha_hat = k / sum_{i=1..k} ln(x_(i) / x_(k+1))

    over the k largest order statistics (x_(k+1) the threshold).

    Returns ``(group, n, k_used, x_threshold, hill_alpha)`` at 6dp,
    ordered by group: k_used = min(k, n-1); groups with < 2 positive
    values, or a degenerate tail (all top-k equal to the threshold:
    the log-sum is 0) report NULL hill_alpha.

    Exactness: the rank window orders by value DESC only, so
    row_number over boundary TIES is assignment-nondeterministic —
    but the OUTPUT is deterministic at the value grain: whichever
    tied rows land inside rank k+1, the kept value MULTISET and the
    threshold are unchanged, and rows tied WITH the threshold
    contribute log(x/thr) = 0 to the sum. Log terms are 9dp-rounded
    and DECIMAL-summed.

    Scale shape: one rank window partitioned by group — the
    WindowGroupLimit pushdown keeps per-task state at k+1 rows per
    group before the shuffle — then a (group)-keyed aggregate over at
    most k+1 rows per group. No corpus-sized state anywhere.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rows = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__x"),
    ).where(F.col("__x") > 0.0)
    w = Window.partitionBy("__g").orderBy(F.col("__x").desc())
    topk = rows.withColumn("__r", F.row_number().over(w)).where(
        F.col("__r") <= k + 1
    )
    n_per = rows.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    # threshold = the (k_used + 1)-th largest = the LAST row kept
    thr = topk.groupBy("__g").agg(
        F.max("__r").alias("__rmax"), F.min("__x").alias("__thr")
    )
    lsum = (
        topk.join(thr, "__g")
        .where(F.col("__r") < F.col("__rmax"))
        .select(
            "__g",
            F.round(F.log(F.col("__x") / F.col("__thr")), 9).alias("__l"),
        )
        .groupBy("__g")
        .agg(
            F.sum(F.col("__l").cast("decimal(30,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            .alias("__ls"),
            F.count(F.lit(1)).alias("__ku"),
        )
    )
    return (
        n_per.join(lsum, "__g", "left")
        .join(thr, "__g", "left")
        .select(
            F.col("__g").alias(group_col),
            F.col("__n").cast("bigint").alias("n"),
            F.coalesce(F.col("__ku"), F.lit(0))
            .cast("int")
            .alias("k_used"),
            (F.round("__thr", 6) + 0.0).alias("x_threshold"),
            (
                F.round(
                    F.when(
                        (F.col("__ku") >= 1) & (F.col("__ls") > 0.0),
                        F.col("__ku") / F.col("__ls"),
                    ),
                    6,
                )
                + 0.0
            ).alias("hill_alpha"),
        )
        .orderBy(group_col)
    )


def rarity_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document vocabulary-rarity score: the mean smoothed IDF of
    the document's tokens,

        rarity = mean_t ln((N + 1) / (df_t + 1))

    (token occurrences weighted — a document that repeats one rare
    term scores high) — the curation signal between quality filters
    and dedup: LOW rarity = boilerplate/stopword soup (every token is
    everywhere), HIGH rarity = specialized or noisy vocabulary worth a
    closer look. The document-grain sibling of the corpus tf-idf
    family.

    Returns ``(id, n_tokens, rarity)`` at 6dp, ordered by id; empty
    documents are ABSENT (no tokens to score).

    Exactness — the INTEGER-NANO discipline (stronger than the usual
    9dp-DECIMAL fold, which this operator genuinely needs): per-token
    idf terms are 9dp-rounded then scaled to exact BIGINT nanos, and
    the mean is computed ENTIRELY in integer arithmetic with explicit
    half-up micro-rounding ((sum + 500 n) div (1000 n)). A plain
    round(sum/n, 6) is NOT engine-stable here: token counts are small
    round integers, so the mean frequently lands exactly on a 6dp
    rounding TIE, where Spark's BigDecimal HALF_UP and DuckDB's
    scaled-multiply round disagree by one ulp (observed at sf0.1).
    The only floats left are one ln per distinct df value and the
    final micro->double render of an exact integer.

    Scale shape: one (token) document-frequency aggregate (vocabulary-
    sized), one token-keyed join back to the exploded corpus (skew on
    stopwords is bounded by AQE — the token df side is vocabulary-
    grain, broadcastable for real corpora), one (doc)-keyed aggregate.
    """
    from nbdatatools_spark.functions.text import normalize_text, tokens

    ex = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tokens(normalize_text(F.col(text_col)))).alias(
            "__t"
        ),
    ).where(F.col("__t").isNotNull() & (F.length("__t") > 0))
    n_docs = df.select(F.count(F.lit(1)).alias("__nd"))
    dfreq = ex.select("__id", "__t").distinct().groupBy("__t").agg(
        F.count(F.lit(1)).alias("__df")
    )
    idf_nano = F.round(
        F.round(
            F.log((F.col("__nd") + 1.0) / (F.col("__df") + 1.0)), 9
        )
        * 1e9,
        0,
    ).cast("long")
    agg = (
        ex.join(dfreq, "__t")
        .crossJoin(F.broadcast(n_docs))
        .select("__id", idf_nano.alias("__in"))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("__nt"),
            F.sum("__in").alias("__s"),
        )
    )
    mean_micro = F.expr("(__s + 500 * __nt) div (1000 * __nt)")
    return agg.select(
        F.col("__id").alias(id_col),
        F.col("__nt").cast("bigint").alias("n_tokens"),
        (mean_micro.cast("double") / 1e6).alias("rarity"),
    ).orderBy(id_col)


def centroid_drift(
    a: DataFrame,
    b: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid shift between two embedding snapshots — the
    class-conditional drift monitor: ``embedding_psi`` watches marginal
    per-dimension histograms, but a re-embedded corpus (new encoder
    checkpoint, new preprocessing) moves each CLASS's mean vector, and
    the per-group centroid cosine is the standard cheap alarm before
    anything downstream (ANN indexes, dedup thresholds, classifiers)
    silently degrades.

    For each group present in both snapshots: cosine similarity and L2
    distance between the group's mean vectors. Groups present in only
    one snapshot report NULL metrics with their counts (added/removed
    classes surface rather than vanish — the card_diff convention).

    Determinism: per-dim sums are round(x, 9) DECIMAL folds; means
    round to 9dp; cross-centroid products round(.,9) DECIMAL-sum —
    the embedding-stats discipline (covariance/CKA/psi), hash-exact on
    both engines. Final cosine/l2 at 6dp (+0.0 kills -0.0).

    100-TB shape: two (group, dim) map-side-combinable aggregates (the
    shuffle payload is groups x dims partials per task, not rows), one
    (group, dim)-keyed join of two group x dim frames, one group-grain
    reduce. Nothing scales with row count but the scans.
    """
    def _means(df: DataFrame, side: str) -> DataFrame:
        ex = df.select(
            F.col(group_col).alias("__g"),
            F.posexplode(F.col(vec_col)).alias("__d", "__x"),
        )
        return ex.groupBy("__g", "__d").agg(
            F.round(
                F.sum(F.round(F.col("__x").cast("double"), 9).cast("decimal(30,9)"))
                .cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias(f"__m{side}")
        )

    def _counts(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy(F.col(group_col).alias("__g")).agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n_{side}")
        )

    ma, mb = _means(a, "a"), _means(b, "b")
    s9 = lambda c: F.sum(F.round(c, 9).cast("decimal(30,9)")).cast("double")  # noqa: E731
    joined = ma.join(mb, ["__g", "__d"]).groupBy("__g").agg(
        s9(F.col("__ma") * F.col("__mb")).alias("__dot"),
        s9(F.col("__ma") * F.col("__ma")).alias("__aa"),
        s9(F.col("__mb") * F.col("__mb")).alias("__bb"),
        s9((F.col("__ma") - F.col("__mb")) * (F.col("__ma") - F.col("__mb"))).alias(
            "__l2"
        ),
    )
    counts = _counts(a, "a").join(_counts(b, "b"), "__g", "full_outer")
    return (
        counts.join(joined, "__g", "left")
        .select(
            F.col("__g").alias(group_col),
            "n_a",
            "n_b",
            (
                F.when(
                    (F.col("__aa") > 0) & (F.col("__bb") > 0),
                    F.round(
                        F.col("__dot")
                        / (F.sqrt(F.col("__aa")) * F.sqrt(F.col("__bb"))),
                        6,
                    ),
                )
                + 0.0
            ).alias("cosine"),
            (F.round(F.sqrt(F.col("__l2")), 6) + 0.0).alias("l2"),
        )
        .orderBy(group_col)
    )
