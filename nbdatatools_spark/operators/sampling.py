"""Deterministic corpus sampling + domain-mixture rebalancing (SURVEY §7.8
training-data extension).

A corpus build downsamples overrepresented sources to hit a target domain
mixture (the static variant of mixture reweighting — cf. Du et al. PaLM §3,
Xie et al. DoReMi; the engine computes closed-form static rates, not the
iterative proxy-model loop). Two properties matter at 100TB:

- **Content-keyed determinism**: ``df.sample`` is seed+partition dependent —
  re-running after a repartition keeps DIFFERENT rows. Sampling here is a
  pure function of (key, seed): keep iff ``md5_52(key || ':' || seed) <
  rate * 2^52``. Stable across runs, partitionings, and engines (md5-prefix
  arithmetic is the same portable convention as functions.text.kgram_hashes,
  so DuckDB oracles replicate it bit-for-bit).
- **No shuffle**: the keep-decision is one projection; ``mixture_rates`` is
  one tiny groupBy collect (n_strata rows to the driver), then the rates
  are inlined as a literal CASE chain.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 52)


def sample_hash(key: Column, seed: int = 42) -> Column:
    """Portable uint52 hash of a key column: first 13 hex chars of
    md5(key ':' seed) as a BIGINT. Uniform on [0, 2^52)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(seed)))), 1, 13
        ),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on ``key_col``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(sample_hash(F.col(key_col), seed) < fraction * _HASH_SPACE)


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps rows with
    ``hash < rates[s] * 2^52``; strata absent from ``rates`` (and NULL)
    use ``default_rate``. The rate lookup is a literal CASE chain — pure
    projection, no join, no shuffle."""
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return df.where(sample_hash(F.col(key_col), seed) < rate * _HASH_SPACE)


def mixture_rates(
    df: DataFrame,
    strata_col: str = "source",
    target: Mapping[str, float] | None = None,
    weight_col: str | None = None,
    cap: float = 1.0,
) -> dict[str, float]:
    """Closed-form per-stratum keep rates that achieve a target mixture.

    With stratum weights ``w_s`` (row counts, or sums of ``weight_col`` —
    e.g. token counts) and target proportions ``p_s``, the largest total
    retained corpus satisfying ``kept_s / total = p_s`` and ``rate_s <=
    cap`` is ``T = min_s(w_s * cap / p_s)``, ``rate_s = p_s * T / w_s``.

    ``target=None`` means uniform over the observed strata. A partial
    target dict assigns the named strata their proportions and splits the
    remaining mass evenly over the other observed strata. Unknown strata in
    ``target`` raise (silent typos would skew the mixture)."""
    rows = (
        df.groupBy(strata_col)
        .agg(
            (
                F.sum(weight_col) if weight_col else F.count(F.lit(1))
            ).cast("double").alias("w")
        )
        .collect()
    )
    weights = {r[strata_col]: r["w"] for r in rows}
    if target is not None:
        unknown = set(target) - set(weights)
        if unknown:
            raise ValueError(f"target strata not present in data: {sorted(unknown)}")
        named_mass = sum(target.values())
        if named_mass > 1.0 + 1e-12:
            raise ValueError(f"target proportions sum to {named_mass} > 1")
        rest = [s for s in weights if s not in target]
        props = dict(target)
        if rest:
            for s in rest:
                props[s] = (1.0 - named_mass) / (len(weights) - len(target))
    else:
        props = {s: 1.0 / len(weights) for s in weights}
    t = min(weights[s] * cap / props[s] for s in props if props[s] > 0)
    return {s: (props[s] * t / weights[s]) if props[s] > 0 else 0.0 for s in props}


def temperature_mixture_rates(
    df: DataFrame,
    strata_col: str = "source",
    temperature: float = 2.0,
    weight_col: str | None = None,
    cap: float = 1.0,
) -> DataFrame:
    """Temperature-scaled mixture rates (the multilingual/multi-source
    sampling rule of mBERT/XLM-R/PaLM data recipes): target proportions
    p_s ∝ w_s^(1/T) flatten the natural distribution toward uniform as T
    grows (T=1 keeps it, T→∞ is uniform). Rates solve the same program as
    mixture_rates — the largest retained corpus with kept_s/total = p_s
    and rate_s <= cap:

        q_s   = round9(w_s^(1/T))
        rate_s = cap * (q_s / w_s) * min_u(w_u / q_u)

    (the normalizer cancels, so NO cross-strata sum exists — every term
    is a per-stratum ratio plus one global min, order-independent and
    engine-exact at the 6dp output rounding).

    Fully DataFrame-native — the strata table never reaches the driver
    (at millions of domains it stays distributed; the min is a 1-row
    broadcast). Returns (stratum, weight, rate, expected_weight).
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not 0 < cap <= 1:
        raise ValueError(f"cap must be in (0, 1], got {cap}")
    w = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        (
            F.sum(weight_col) if weight_col else F.count(F.lit(1))
        ).alias("weight")
    )
    # zero/negative-weight strata (possible with a weight_col of all-zero
    # token counts) would poison the global min with ln(0) -> NaN; they
    # carry no mass to balance, so they drop from the program. Callers
    # keep/drop their rows explicitly.
    w = w.where(F.col("weight") > 0)
    q = w.withColumn(
        "__q",
        F.round(F.exp(F.log(F.col("weight").cast("double")) / temperature), 9),
    )
    minr = q.agg(F.min(F.col("weight") / F.col("__q")).alias("__minr"))
    return (
        q.crossJoin(F.broadcast(minr))
        .select(
            "stratum",
            "weight",
            F.round(
                F.lit(cap) * F.col("__q") / F.col("weight") * F.col("__minr"), 6
            ).alias("rate"),
            F.round(F.lit(cap) * F.col("__q") * F.col("__minr"), 6).alias(
                "expected_weight"
            ),
        )
        .orderBy("stratum")
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum (per-domain caps, the
    overrepresented-site rule in web-corpus builds — cf. RefinedWeb /
    Gopher's per-domain limits), deterministically: the survivors are the
    ``cap`` smallest ``(md5_52(key), key)`` pairs in each stratum, a pure
    function of content keys — stable across runs, partitionings, engines.

    100-TB shape: rather than ranking full rows, rank a SLIM projection
    ``(stratum, key, hash)`` (~24 bytes/row) and derive each stratum's
    exact cap-th-smallest ``(hash, key)`` threshold — one tiny table,
    one row per over-cap stratum. The wide rows are then filtered by a
    join on ``strata_col`` against that threshold table; the join side is
    n_strata rows, so AQE picks a broadcast when it fits (deliberately NOT
    a forced ``F.broadcast`` — at millions of domains the planner must be
    free to shuffle instead). Documents never enter the ranking shuffle.

    Known limit: one stratum's slim rows sort in one task. At ~24 B/row a
    100M-row domain is ~2.4 GB — acceptable; beyond that, pre-filter with
    an approximate quantile of the hash before the exact rank.

    NULL strata are capped too (null-safe join).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = sample_hash(F.col(key_col), seed)
    slim = df.select(
        F.col(strata_col).alias("__s"),
        F.col(key_col).alias("__k"),
        h.alias("__h"),
    )
    w = Window.partitionBy("__s").orderBy("__h", "__k")
    thresholds = (
        slim.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == cap)
        .select("__s", F.col("__h").alias("__ht"), F.col("__k").alias("__kt"))
    )
    joined = df.join(thresholds, df[strata_col].eqNullSafe(thresholds["__s"]), "left")
    keep = (
        thresholds["__ht"].isNull()  # under-cap stratum: no threshold row
        | (h < thresholds["__ht"])
        | ((h == thresholds["__ht"]) & (df[key_col] <= thresholds["__kt"]))
    )
    return joined.where(keep).drop("__s", "__ht", "__kt")


def train_val_test_split(
    df: DataFrame,
    fractions: Sequence[float] = (0.98, 0.01, 0.01),
    names: Sequence[str] = ("train", "val", "test"),
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Assign every row a split label by content-keyed hash range —
    ``split_i`` gets rows with ``md5_52(key)`` in the half-open interval
    ``[cum_{i-1}, cum_i) * 2^52``. Pure projection (no shuffle, no state);
    the same row lands in the same split on every run, engine, and
    partitioning, and membership is decidable per-row (a streaming ingest
    can label on arrival). Boundaries accumulate left-to-right in double
    precision — oracles must replicate the same summation order."""
    if len(fractions) != len(names):
        raise ValueError("fractions and names must have equal length")
    if any(f < 0 for f in fractions):
        raise ValueError(f"fractions must be >= 0, got {list(fractions)}")
    total = 0.0
    for f in fractions:
        total += f
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    hv = sample_hash(F.col(key_col), seed)
    cum = 0.0
    expr = None
    for frac, name in zip(fractions[:-1], names[:-1]):
        cum += frac
        cond = hv < cum * _HASH_SPACE
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", split)


def group_split(
    df: DataFrame,
    group_col: str,
    fractions: Sequence[float] = (0.98, 0.01, 0.01),
    names: Sequence[str] = ("train", "val", "test"),
    seed: int = 42,
) -> DataFrame:
    """Leakage-safe split assignment: hash the GROUP key, not the row
    key — every member of a group (near-dup cluster, source domain, any
    unit whose members must not straddle splits) lands in the SAME split
    by construction. Row-keyed splitting leaks: two near-duplicate
    documents hash independently, one lands in train and one in test,
    and the eval set is contaminated in exactly the way dedup was meant
    to prevent. Same content-keyed hash-range mechanics (and the same
    determinism contract) as ``train_val_test_split``; NULL groups all
    hash together — pre-assign singleton group ids if that is not
    intended. Pure projection, no shuffle.
    """
    return train_val_test_split(
        df, fractions=fractions, names=names, key_col=group_col, seed=seed
    )


def unimax_rates(
    df: DataFrame,
    budget: float,
    strata_col: str = "source",
    weight_col: str | None = None,
    max_epochs: float = 1.0,
) -> dict[str, float]:
    """UniMax sampling rates (Chung et al. 2023, arXiv:2304.09151):
    distribute a total training ``budget`` (rows, or ``weight_col``
    units — e.g. tokens) as UNIFORMLY as possible across strata, capped
    at ``max_epochs`` passes over any stratum — the fairness-first
    mixture member (mixture_rates hits explicit targets,
    temperature_mixture_rates tilts by size; UniMax equalizes without
    over-epoching the small strata).

    Closed-form water-filling over the per-stratum caps ``c_s =
    max_epochs * w_s`` (sorted ascending, ties on stratum name): the
    water level theta satisfies ``sum_s min(c_s, theta) = budget``;
    strata below the level take their full cap. When ``budget >=
    sum(caps)`` every stratum takes its cap (the budget is not
    attainable). Returns ``{stratum: rate}`` with ``rate = alloc_s /
    w_s`` in [0, max_epochs] — rates above 1 mean multiple epochs.

    Driver-side arithmetic over ONE tiny groupBy collect (n_strata
    rows — the mixture_rates shape); the float operation order is fixed
    (ascending-cap scan) so an oracle replays every double exactly.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    rows = (
        df.groupBy(strata_col)
        .agg(
            (
                F.sum(weight_col) if weight_col else F.count(F.lit(1))
            ).cast("double").alias("w")
        )
        .collect()
    )
    caps = sorted(
        ((float(r["w"]) * max_epochs, r[strata_col], float(r["w"])) for r in rows),
        key=lambda x: (x[0], str(x[1])),
    )
    n = len(caps)
    remaining = float(budget)
    alloc: dict = {}
    theta = None
    for i, (cap, s, w) in enumerate(caps):
        if theta is None:
            share = remaining / (n - i)
            if cap <= share:
                alloc[s] = cap
                remaining -= cap
                continue
            theta = share
        alloc[s] = theta
    return {
        s: (alloc[s] / w if w > 0 else 0.0) for cap, s, w in caps
    }


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
    score_col: str = "es_score",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: top-``k`` rows
    by the Efraimidis–Spirtes key (Inf. Proc. Letters 97(5), 2006).

    Each row draws u ∈ (0, 1] from the same portable content-keyed md5
    hash as ``hash_sample`` (u = (md5_52 + 1) / 2^52) and scores
    ``ln(u) / w`` — taking the k LARGEST scores (all ≤ 0; closest to 0
    wins) is distributionally identical to sequential weighted draws
    without replacement. Content-keying makes the sample a pure function
    of (key, seed): partition- and engine-invariant, reproducible at
    100 TB with zero coordination.

    Scale shape: one projection + global top-k (TakeOrderedAndProject —
    per-partition partial top-k, no full sort). Scores are rounded to 9dp
    with a ``key_col`` tie-break so the selected set is stable across
    engines (same discipline as lm.bigram_lm_score).

    Rows with NULL or non-positive weight are excluded (zero-weight rows
    can never be drawn; negative weights are undefined).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (sample_hash(F.col(key_col), seed) + 1) / F.lit(_HASH_SPACE)
    score = F.round(F.log(u) / F.col(weight_col), 9)
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(score_col, score)
        .orderBy(F.col(score_col).desc(), F.col(key_col))
        .limit(k)
    )


def reservoir_sample(
    df: DataFrame,
    k: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic fixed-size uniform sample WITHOUT replacement: the
    ``k`` rows with the smallest content-keyed hash (the bottom-k sketch
    formulation of reservoir sampling — a uniform hash order makes "k
    smallest hashes" distributionally identical to a k-reservoir, with
    none of the sequential state).

    Content-keying (``sample_hash``) makes the sample a pure function of
    (key, seed): partition-, engine- and run-invariant — re-running after
    a repartition or appending unrelated rows keeps the SAME survivors
    (minus any displaced by new smaller hashes), which is what an
    incremental 100 TB corpus build needs. ``df.sample`` guarantees none
    of this and cannot hit an exact k.

    Scale shape: one projection + global top-k on the hash
    (TakeOrderedAndProject — per-partition partial top-k, no full sort,
    no shuffle of the data rows). Ties are impossible for distinct keys
    (md5-52 collisions aside, broken by ``key_col``).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = sample_hash(F.col(key_col), seed)
    return (
        df.withColumn("__rs_hash", h)
        .orderBy(F.col("__rs_hash").asc(), F.col(key_col))
        .limit(k)
        .drop("__rs_hash")
    )


def stratified_reservoir(
    df: DataFrame,
    k: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic exactly-``min(k, n_s)``-per-stratum sample: rank rows
    within each stratum by the content-keyed hash and keep the first k —
    the per-group bottom-k sketch (the fixed-SIZE sibling of
    ``stratified_sample``'s fixed-RATE keep).

    Scale shape: ONE shuffle on the stratum key (the rank window); the
    rank is over the 52-bit hash with a ``key_col`` tie-break, so output
    is partition-invariant. Skewed strata are bounded by AQE; k rows per
    stratum survive regardless of stratum size.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = sample_hash(F.col(key_col), seed)
    w = Window.partitionBy(strata_col).orderBy(
        F.col("__rs_hash").asc(), F.col(key_col)
    )
    return (
        df.withColumn("__rs_hash", h)
        .withColumn("__rs_rank", F.row_number().over(w))
        .where(F.col("__rs_rank") <= k)
        .drop("__rs_hash", "__rs_rank")
    )


def token_budget_select(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str,
    token_col: str,
    id_col: str = "doc_id",
    keep_partial: bool = False,
) -> DataFrame:
    """Best-first corpus selection under a global token budget — "give me
    the highest-quality ``budget_tokens`` tokens": rank documents by
    (quality DESC, id), lay them on one global token stream, and keep the
    prefix that fits. The final assembly step of a curation run, after
    filtering and dedup have scored what survives.

    Scale shape: the two-phase partition-offset cumsum from
    packing.pack_sequences on the composite (quality DESC, id) range
    partitioning — phase 1 is an Arrow-batched partition-local running
    sum (zero shuffle beyond the range partition), phase 2 broadcasts a
    P-row offset table; no single-reducer window ever sees the corpus.
    The budget test is per-row-decidable integer arithmetic.

    ``keep_partial=False`` keeps only documents that fit WHOLE
    (start + n_tokens <= budget); ``True`` also keeps the single document
    straddling the boundary (start < budget). Appends ``start_tok``.

    Determinism contract: ``quality_col`` must be identically computed in
    any replicating engine (round scores before passing them in — the
    gate uses the 6dp-rounded quality_score) so the total order, hence
    the cumsum, matches bit-for-bit.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    from pyspark.sql.types import LongType, StructField, StructType

    order = [F.col(quality_col).desc(), F.col(id_col).asc()]
    n_part = max(int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    d = (
        df.repartitionByRange(n_part, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        # pin the partitioning: the mapInPandas branch and the P-row offset
        # branch must read the SAME materialized exchange (the
        # global_row_index sf0.1 AQE defect)
        .localCheckpoint(eager=False)
    )
    out_schema = StructType(list(d.schema) + [StructField("__local_start", LongType())])
    tok = token_col

    def local_cumsum(batches):
        running = 0
        for pdf in batches:
            t = pdf[tok].to_numpy()
            starts = t.cumsum() - t + running
            running = int(starts[-1] + t[-1]) if len(t) else running
            yield pdf.assign(__local_start=starts)

    local = d.mapInPandas(local_cumsum, out_schema)
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        d.groupBy("__pid")
        .agg(F.sum(tok).cast("long").alias("__cnt"))
        .select("__pid", F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"))
    )
    start = (F.col("__off") + F.col("__local_start")).cast("long")
    fits = (
        start < F.lit(int(budget_tokens))
        if keep_partial
        else start + F.col(tok) <= F.lit(int(budget_tokens))
    )
    return (
        local.join(F.broadcast(offs), "__pid")
        .withColumn("start_tok", start)
        .where(fits)
        .drop("__pid", "__local_start", "__off")
    )


def curriculum_interleave(
    df: DataFrame,
    tier_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified interleave — the training-order builder
    that round-robins documents across tiers (quality deciles, perplexity
    buckets, languages, domains) so every training window sees a balanced
    tier mix instead of a tier-sorted corpus: document at within-tier
    rank r in tier t gets interleave key ``r * n_tiers + t_idx``, and the
    final ``training_pos`` is the dense global rank of that key (unequal
    tiers compact naturally as shorter tiers exhaust).

    Scale shape: within-tier ranks come from ONE two-phase global index
    over (tier, id) (windows.global_row_index — range partitioned, no
    single reducer) minus per-tier offsets (a tier-count-sized aggregate
    broadcast back); the final position is a second two-phase index over
    the integer interleave key. A per-tier row_number window would drag
    each tier through one task — this never does.

    Returns ``(id_col, tier_col, tier_idx, rank_in_tier, training_pos)``,
    all 0-based integers — bit-replayable by any engine.
    """
    from nbdatatools_spark.operators.windows import global_row_index

    tiers = sorted(
        r[0] for r in df.select(tier_col).distinct().collect()
    )  # bounded driver list (strata count, the mixture_rates pattern)
    if not tiers:
        return df.select(
            F.col(id_col), F.col(tier_col),
            F.lit(0).alias("tier_idx"),
            F.lit(0).cast("long").alias("rank_in_tier"),
            F.lit(0).cast("long").alias("training_pos"),
        ).limit(0)
    n_tiers = len(tiers)
    tier_idx = F.coalesce(
        *[F.when(F.col(tier_col) == t, i) for i, t in enumerate(tiers)]
    ) if n_tiers > 1 else F.lit(0)
    idx = global_row_index(
        df.select(id_col, tier_col),
        [F.col(tier_col).asc(), F.col(id_col).asc()],
        out="__gidx",
    )
    offs = idx.groupBy(tier_col).agg(F.min("__gidx").alias("__toff"))
    ranked = idx.join(F.broadcast(offs), tier_col).select(
        id_col,
        tier_col,
        tier_idx.cast("int").alias("tier_idx"),
        (F.col("__gidx") - F.col("__toff")).cast("long").alias("rank_in_tier"),
    )
    keyed = ranked.withColumn(
        "__key", F.col("rank_in_tier") * F.lit(n_tiers) + F.col("tier_idx")
    )
    out = global_row_index(
        keyed, [F.col("__key").asc(), F.col(id_col).asc()], out="training_pos"
    )
    return out.select(
        id_col, tier_col, "tier_idx", "rank_in_tier",
        F.col("training_pos").cast("long").alias("training_pos"),
    )


def ipf_weights(
    df: DataFrame,
    row_col: str = "lang",
    col_col: str = "source",
    iterations: int = 2,
) -> DataFrame:
    """Iterative proportional fitting (raking) of per-cell sampling
    weights so BOTH marginals of the (row_col x col_col) contingency
    table approach uniform targets — the two-constraint generalization
    of ``domain_cap`` (which balances one key and lets the other drift).

    After ``iterations`` rounds of alternating row/column scaling the
    weighted cell mass w*n satisfies sum_c(w*n) ~ N/|rows| per row and
    sum_r(w*n) ~ N/|cols| per column (classical IPF converges
    geometrically; 2 rounds is the standard mixture-balancing setting).

    Exactness contract: n are integer counts; weights update as
    ``w = round(w * (target / masked_sum), 9)`` where every marginal sum
    is a 9dp-rounded DECIMAL sum of the cell masses (order-invariant) —
    the lloyd/pagerank fixed-iteration discipline, fully SQL-unrollable.

    100-TB shape: ONE corpus-grain aggregate produces the cell table
    (|rows| x |cols| cells — category-bounded, tiny); all iterations run
    on that bounded table (join + keyed agg per half-step,
    localCheckpoint per round to cut lineage). Applying the weights
    downstream is a broadcast join + per-row Bernoulli, the
    weighted_sample bill.

    Returns ``(row_key, col_key, n, weight, weighted_n)`` sorted.
    """
    cells = (
        df.groupBy(
            F.col(row_col).alias("row_key"), F.col(col_col).alias("col_key")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("weight", F.lit(1.0))
        .localCheckpoint(eager=False)
    )
    totals = cells.agg(
        F.sum("n").alias("__N"),
        F.countDistinct("row_key").alias("__nr"),
        F.countDistinct("col_key").alias("__nc"),
    ).collect()[0]
    row_target = float(totals["__N"]) / float(totals["__nr"])
    col_target = float(totals["__N"]) / float(totals["__nc"])

    def _mass():
        return F.round(F.col("n") * F.col("weight"), 9).cast("decimal(24,9)")

    for _ in range(iterations):
        row_mass = (
            cells.groupBy("row_key")
            .agg(F.sum(_mass()).cast("decimal(38,9)").cast("double").alias("__rm"))
        )
        cells = (
            cells.join(row_mass, "row_key")
            .withColumn(
                "weight",
                F.round(F.col("weight") * (F.lit(row_target) / F.col("__rm")), 9),
            )
            .drop("__rm")
        )
        col_mass = (
            cells.groupBy("col_key")
            .agg(F.sum(_mass()).cast("decimal(38,9)").cast("double").alias("__cm"))
        )
        cells = (
            cells.join(col_mass, "col_key")
            .withColumn(
                "weight",
                F.round(F.col("weight") * (F.lit(col_target) / F.col("__cm")), 9),
            )
            .drop("__cm")
            .localCheckpoint(eager=False)
        )
    return cells.select(
        "row_key",
        "col_key",
        "n",
        "weight",
        F.round(F.col("n") * F.col("weight"), 6).alias("weighted_n"),
    ).orderBy("row_key", "col_key")


def domain_reweight(
    df: DataFrame,
    domain_col: str,
    loss_col: str,
    eta: float = 1.0,
    smoothing: float = 0.0,
) -> DataFrame:
    """DoReMi-style exponentiated-gradient domain reweighting (Xie et
    al., "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining", NeurIPS 2023, eq. 1 update shape): tilt each domain's
    mixture weight by its EXCESS loss relative to the corpus mean —
    domains the (proxy) model finds hardest get upweighted:

        w_d  prop  share_d * exp(eta * (mean_loss_d - mean_loss)),
        weight_d = (1 - smoothing) * w_d / Z + smoothing / D.

    The one-step closed form of the DoReMi inner update with the current
    token share as reference weights (run it per training round with
    refreshed per-domain losses for the full iterative recipe — each
    round is one call). Complements mixture_rates (target-share
    rebalance) and temperature_mixture_rates (power tilt): this one is
    LOSS-driven.

    Exactness: per-domain mean losses from 9dp-DECIMAL loss sums over
    exact counts; the tilt is double exp; Z is a DECIMAL sum of
    9dp-rounded tilted shares; weights round to 6dp. One keyed aggregate
    over domains (map-side partial) — the domain table is
    broadcast-sized by construction. ANSI-safe: rows with NULL loss are
    excluded from the mean but still counted in the share.

    Returns ``(<domain_col>, n_rows, share, mean_loss, weight)``.
    """
    if smoothing < 0.0 or smoothing >= 1.0:
        raise ValueError(f"smoothing must be in [0,1), got {smoothing}")
    per = (
        df.select(
            F.coalesce(F.col(domain_col).cast("string"), F.lit("<null>")).alias(
                "__d"
            ),
            F.col(loss_col).cast("double").alias("__l"),
        )
        .groupBy("__d")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count("__l").alias("__nl"),
            F.sum(F.round("__l", 9).cast("decimal(30,9)"))
            .cast("decimal(38,9)")
            .cast("double")
            .alias("__sl"),
        )
    )
    tot = per.agg(
        F.sum("__n").alias("__tn"),
        F.sum("__nl").alias("__tnl"),
        F.sum(F.col("__sl").cast("decimal(38,9)"))
        .cast("decimal(38,9)")
        .cast("double")
        .alias("__tsl"),
        F.count(F.lit(1)).alias("__nd"),
    )
    e = float(eta)
    s = float(smoothing)
    tilted = per.crossJoin(F.broadcast(tot)).select(
        "__d",
        "__n",
        "__nd",
        (F.col("__n").cast("double") / F.col("__tn")).alias("__share"),
        F.when(F.col("__nl") > 0, F.col("__sl") / F.col("__nl")).alias(
            "__ml"
        ),
        F.round(
            (F.col("__n").cast("double") / F.col("__tn"))
            * F.exp(
                e
                * (
                    F.coalesce(
                        F.col("__sl") / F.col("__nl"),
                        F.col("__tsl") / F.col("__tnl"),
                    )
                    - F.col("__tsl") / F.col("__tnl")
                )
            ),
            9,
        ).alias("__w"),
    )
    z = tilted.agg(
        F.sum(F.col("__w").cast("decimal(20,9)"))
        .cast("decimal(38,9)")
        .cast("double")
        .alias("__z")
    )
    return (
        tilted.crossJoin(F.broadcast(z))
        .select(
            F.col("__d").alias(domain_col),
            F.col("__n").alias("n_rows"),
            F.round("__share", 6).alias("share"),
            F.round("__ml", 6).alias("mean_loss"),
            F.round(
                F.lit(1.0 - s) * F.col("__w") / F.col("__z")
                + F.lit(s) / F.col("__nd"),
                6,
            ).alias("weight"),
        )
        .orderBy(domain_col)
    )
