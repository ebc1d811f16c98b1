"""Snapshot diff (change-data-capture between two materializations of a
keyed table) — the daily-pipeline primitive behind incremental loads:
given yesterday's and today's snapshots, classify every key as insert /
delete / update / unchanged.

Scale shape: both sides project down to (key, compared columns) BEFORE
the full-outer join — the shuffle carries only what the diff needs,
never wide rows. With ``digest=True`` the compared columns collapse
map-side to one 8-byte ``xxhash64`` per row, so the shuffle payload is
keys + 8 bytes regardless of row width — the right mode for wide tables
(a hash collision, ~2^-64 per changed row, can only misclassify an
update as unchanged; the equivalence is pinned by a test). Join strategy
is left to AQE (two big snapshots sort-merge; a small delta side
broadcasts).

Null semantics: keys are assumed non-NULL (enforced loudly); compared
columns diff with IS DISTINCT FROM semantics (NULL != value,
NULL == NULL).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
    digest: bool = False,
) -> DataFrame:
    """Classify keys across two snapshots. Returns one row per key seen
    in either snapshot: ``(*key_cols, change_type)`` with change_type in
    {'insert', 'delete', 'update', 'unchanged'} ('unchanged' rows are
    dropped unless ``include_unchanged``).

    ``compare_cols`` defaults to all non-key columns present in BOTH
    snapshots; pass explicitly to diff a subset. ``digest=True`` swaps
    per-column comparison for a map-side xxhash64 row digest (see module
    docstring).
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    cmps = list(compare_cols)

    def guard_keys(df: DataFrame, side: str) -> DataFrame:
        cond = F.lit(True)
        for k in keys:
            cond = cond & F.col(k).isNotNull()
        checked = F.when(cond, F.lit(1)).otherwise(
            F.raise_error(
                F.lit(f"snapshot_diff: NULL key in {side} snapshot (cols {keys})")
            )
        )
        return df.withColumn("__present", checked)

    if digest and cmps:
        proj = lambda df: df.select(
            *keys, F.xxhash64(*[F.col(c) for c in cmps]).alias("__d"), "__present"
        )
        o = proj(guard_keys(old, "old"))
        n = proj(guard_keys(new, "new"))
        changed = F.col("o.__d") != F.col("n.__d")
    else:
        proj = lambda df: df.select(*keys, *cmps, "__present")
        o = proj(guard_keys(old, "old"))
        n = proj(guard_keys(new, "new"))
        changed = F.lit(False)
        for c in cmps:
            changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))

    j = o.alias("o").join(n.alias("n"), keys, "full_outer")
    change = (
        F.when(F.col("o.__present").isNull(), F.lit("insert"))
        .when(F.col("n.__present").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(*[F.col(k) for k in keys], change.alias("change_type"))
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    ops: tuple = ("upsert", "delete"),
) -> DataFrame:
    """MERGE INTO semantics without a table format: apply a change batch to
    a keyed snapshot and return the new snapshot — upserts replace or insert
    whole rows, deletes remove keys. The Delta/Iceberg ``MERGE WHEN MATCHED
    THEN UPDATE / WHEN NOT MATCHED THEN INSERT / ... THEN DELETE`` shape as
    a plain DataFrame transform (the storage-side transaction is the table
    format's job; the relational semantics are this operator's).

    ``changes`` must carry the target's columns plus ``op_col`` with values
    in ``ops`` ('upsert' | 'delete'); unknown op values fail loudly at
    execution (raise_error column guard, the snapshot_diff discipline).
    If a key appears multiple times in one batch the call is rejected —
    change batches must be key-deduplicated first (e.g. keep the last
    change per key upstream); silently picking one would hide an ordering
    bug.

    Scale shape: ONE left-anti join of the target against the change keys
    (AQE broadcasts a small delta — the common case — so the big snapshot
    never shuffles), then a unionByName with the upsert rows. The
    duplicate-key guard is an aggregate on the slim key projection.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if op_col not in changes.columns:
        raise ValueError(f"changes is missing op column {op_col!r}")
    valid = F.col(op_col).isin(*ops)
    guarded = changes.withColumn(
        "__op_ok",
        F.when(valid, F.lit(1)).otherwise(
            F.raise_error(F.concat(F.lit(f"apply_changes: unknown {op_col}="), F.col(op_col)))
        ),
    )
    # duplicate-key guard: any key with >1 change row is an upstream bug
    dup_guard = (
        guarded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__dup_ok",
            F.when(F.col("__n") == 1, F.lit(1)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("apply_changes: duplicate change rows for key ("),
                        F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
                        F.lit(")"),
                    )
                )
            ),
        )
        .select(*keys, "__dup_ok")
    )
    checked = (
        guarded.where(F.col("__op_ok") == 1)
        .join(dup_guard, keys)
        .where(F.col("__dup_ok") == 1)
        .select(*changes.columns)
    )
    survivors = target.join(checked.select(*keys), keys, "left_anti")
    upserts = checked.where(F.col(op_col).isin("upsert")).select(*target.columns)
    return survivors.unionByName(upserts)


def scd2_history(
    snapshots: DataFrame,
    key_cols: Sequence[str],
    snapshot_col: str,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension Type-2 history from a stack of
    snapshots: one validity interval per (key, unchanged-attribute run) —
    ``(keys, attrs, valid_from, valid_to, is_current)`` with half-open
    [valid_from, valid_to) intervals, ``valid_to`` NULL while current.

    ``snapshots`` holds every snapshot unioned, tagged by ``snapshot_col``
    (a sortable snapshot id: date, batch number, …); one row per (key,
    snapshot) — duplicates fail loudly. A key absent from a snapshot closes
    its interval at that snapshot (and a later reappearance opens a new
    one, even with identical attributes — delete + re-insert, not
    continuity).

    Plan: the snapshot CALENDAR (distinct snapshot ids, dense-indexed) is a
    tiny broadcast — it turns "absent from the next snapshot" into integer
    arithmetic. ONE hash shuffle on the key then carries everything:
    change/gap detection (lag), run numbering (running sum of change
    markers), the per-run rollup, and the next-run lead all reuse the same
    (key) partitioning, so Catalyst plans a single Exchange for the wide
    data. Compared columns collapse to one xxhash64 before the lag (8
    bytes of window state per row at any row width; a collision can only
    merge two adjacent versions — the snapshot_diff digest caveat).
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        compare_cols = [
            c for c in snapshots.columns if c not in set(keys) | {snapshot_col}
        ]
    cmps = list(compare_cols)
    from pyspark.sql import Window

    # dense calendar index: N_snapshots rows, single-partition window is
    # over the calendar only (the packing.py two-phase discipline does not
    # apply at dozens of rows)
    calendar = (
        snapshots.select(F.col(snapshot_col).alias("__snap")).distinct()
        .withColumn("__idx", F.row_number().over(Window.orderBy("__snap")))
    )
    latest = calendar.agg(F.max("__idx").alias("__last_idx"))

    digest = F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cmps]
    )
    rows = snapshots.join(
        F.broadcast(calendar), snapshots[snapshot_col] == F.col("__snap")
    ).select(*keys, *cmps, "__snap", "__idx", digest.alias("__d"))

    w = Window.partitionBy(*keys).orderBy("__idx")
    wdup = Window.partitionBy(*keys, "__idx")
    marked = (
        rows.withColumn("__ndup", F.count(F.lit(1)).over(wdup))
        .withColumn(
            "__dup_ok",
            F.when(F.col("__ndup") == 1, F.lit(1)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("scd2_history: duplicate rows for key ("),
                        F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
                        F.lit(") in one snapshot"),
                    )
                )
            ),
        )
        .withColumn("__prev_idx", F.lag("__idx").over(w))
        .withColumn("__prev_d", F.lag("__d").over(w))
        .withColumn(
            "__chg",
            F.when(
                F.col("__prev_idx").isNull()                       # first sighting
                | (F.col("__prev_idx") != F.col("__idx") - 1)      # gap = delete+reinsert
                | (F.col("__prev_d") != F.col("__d")),             # attribute change
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .where(F.col("__dup_ok") == 1)  # filter references the guard so
        # Catalyst cannot prune the raise_error column away
        .withColumn("__run", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    runs = marked.groupBy(*keys, "__run").agg(
        F.min("__snap").alias("valid_from"),
        F.max("__idx").alias("__max_idx"),
        *[F.max(c).alias(c) for c in cmps],  # constant within a run
    )
    # A run ends right after its last sighting, whatever follows (an
    # attribute change starts the next run at exactly max_idx+1; a gap or
    # final disappearance also closes at calendar[max_idx+1]) — so
    # valid_to is always the calendar snapshot after max_idx, NULL when
    # max_idx IS the last snapshot (still current).
    after = calendar.select(
        F.col("__idx").alias("__after_idx"), F.col("__snap").alias("__after_snap")
    )
    out = (
        runs.crossJoin(F.broadcast(latest))
        .join(
            F.broadcast(after),
            F.col("__after_idx") == F.col("__max_idx") + 1,
            "left",
        )
        .select(
            *keys,
            *cmps,
            "valid_from",
            F.col("__after_snap").alias("valid_to"),
            (F.col("__max_idx") == F.col("__last_idx")).alias("is_current"),
        )
    )
    return out


def incremental_agg_update(
    state: DataFrame,
    target: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    key_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    op_col: str = "op",
    count_col: str = "n",
) -> DataFrame:
    """Incremental view maintenance for a grouped count/sum aggregate: given
    the current aggregate ``state`` (``group_cols`` + ``count_col`` + one
    summed column per ``sum_cols``), the current ``target`` snapshot, and a
    change batch (upserts/deletes keyed by ``key_cols``), produce the
    aggregate of the POST-merge snapshot without rescanning it — the
    100-TB rule: a day's delta must not cost a full-corpus aggregate.

    Algebra (counts and sums are group-homomorphic): rows being replaced or
    deleted contribute -1 * their measures, upsert rows +1; the signed
    union aggregates to a per-group delta (a |changes|-sized computation —
    the ONE join against ``target`` is a left-semi on change keys, which
    AQE executes as a broadcast lookup for a small delta), then one
    full-outer merge with ``state``. Groups whose count reaches 0 drop out.

    The correctness identity — incremental result == from-scratch aggregate
    of ``apply_changes(target, changes)`` — is the gate's oracle: the two
    paths share no code.
    """
    groups = list(group_cols)
    keys = list(key_cols)
    sums = list(sum_cols)
    if not groups or not keys:
        raise ValueError("group_cols and key_cols must be non-empty")
    old = target.join(changes.select(*keys), keys, "left_semi")
    neg = old.select(*groups, F.lit(-1).alias("__w"), *sums)
    pos = changes.where(F.col(op_col) == "upsert").select(
        *groups, F.lit(1).alias("__w"), *sums
    )
    delta = (
        neg.unionByName(pos)
        .groupBy(*groups)
        .agg(
            F.sum("__w").alias("__dn"),
            *[F.sum(F.col("__w") * F.col(c)).alias(f"__d_{c}") for c in sums],
        )
    )
    merged = state.join(delta, groups, "full_outer").select(
        *groups,
        (F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))).alias(
            count_col
        ),
        *[
            (F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"__d_{c}"), F.lit(0))).alias(c)
            for c in sums
        ],
    )
    return merged.where(F.col(count_col) != 0)


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    time_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    values: tuple = (),
    prefix: str = "dim_",
) -> DataFrame:
    """Point-in-time (AS OF) join of a fact stream against an SCD
    Type-2 dimension: each fact row gains the dimension version whose
    half-open validity interval ``[valid_from, valid_to)`` contains the
    fact's ``time_col`` (open current versions have NULL valid_to) —
    the warehouse-classic "facts join the dim as it WAS".

    Scale shape: reuses the as-of union-tag carry (temporal.asof_join):
    ONE shuffle keyed on the dimension keys, in-partition sort on
    (time, side), running carry of the latest version at-or-before each
    fact — never a range nested-loop; the validity-end check is a
    post-carry filter. Facts at a version boundary take the NEW version
    (valid_from inclusive), matching the half-open interval contract.

    Returns facts + ``{prefix}{v}`` for each requested dim column (NULL
    when no version covers the fact time).
    """
    from nbdatatools_spark.operators.temporal import asof_join

    if not values:
        values = tuple(
            c for c in dim.columns
            if c not in set(keys) | {valid_from, valid_to}
        )
    carry_vals = tuple(values) + (valid_to,)
    # asof_join keys on a single 'by' column and a shared time column; build
    # a composite key column when needed and align the time columns.
    kc = keys[0] if len(keys) == 1 else "__pit_key"
    f = facts
    d = dim
    if len(keys) > 1:
        f = f.withColumn(kc, F.concat_ws("\x1f", *[F.col(k) for k in keys]))
        d = d.withColumn(kc, F.concat_ws("\x1f", *[F.col(k) for k in keys]))
    # Carry ONE struct, not separate columns: asof_join's running carry is
    # last-non-null PER COLUMN, and an open current version has NULL
    # valid_to — independent carries would pair the new version's
    # attributes with the PREVIOUS version's valid_to (stale mix that
    # wrongly fails the validity check at the last boundary). The struct
    # is never NULL on right rows, so the carry stays atomic.
    d = d.select(
        kc,
        F.col(valid_from).alias(time_col),
        F.struct(*[F.col(v) for v in carry_vals]).alias("__pitv"),
    )
    out = asof_join(f, d, on=time_col, by=kc, values=("__pitv",), prefix=prefix)
    pv = F.col(f"{prefix}__pitv")
    vto = pv[valid_to]
    keep = pv.isNotNull() & (vto.isNull() | (F.col(time_col) < vto))
    for v in values:
        out = out.withColumn(f"{prefix}{v}", F.when(keep, pv[v]))
    out = out.drop(f"{prefix}__pitv", f"{prefix}{time_col}")
    if len(keys) > 1:
        out = out.drop(kc)
    return out
