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
