"""Ordinal window slicing and logical re-basing (P1/W2 in SURVEY §2).

Reference semantics: FWindow / FInterval multi-interval ordinal windows
(layout/FWindow.java:32-140, layoutv2/DSWindow.java:29-54) with logical→
physical index translation
(spec/datasets/impl/xvec/CoreXVecVectorDatasetViewMethods.java:389-403).

A window is a list of half-open ``[start, end)`` ordinal intervals. Slicing is
a pure filter (pushes down to parquet via min/max stats); logical re-basing is
a row_number over the global ordinal order — a shuffle, applied only when the
caller genuinely needs 0-based logical ordinals (cacheable).
"""

from __future__ import annotations

import re
from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INTERVAL_RX = re.compile(r"^\s*(\d+)\s*\.\.\s*(\d+)\s*$")


def parse_window(spec: str | int | list) -> list[tuple[int, int]]:
    """Parse window sugar (docs/specs/dataset_yaml_v1.md:65-79):
    ``"0..1000"`` -> [(0, 1000)); bare count ``1000`` -> [(0, 1000));
    list of either -> multi-interval."""
    if isinstance(spec, int):
        return [(0, spec)]
    if isinstance(spec, list):
        return [iv for s in spec for iv in parse_window(s)]
    s = str(spec).strip()
    if s.isdigit():
        return [(0, int(s))]
    m = _INTERVAL_RX.match(s)
    if not m:
        raise ValueError(f"unparseable window spec: {spec!r}")
    a, b = int(m.group(1)), int(m.group(2))
    if b < a:
        raise ValueError(f"window end before start: {spec!r}")
    return [(a, b)]


def window_slice(
    df: DataFrame, spec: str | int | list, ordinal: str = "ordinal"
) -> DataFrame:
    """Restrict to the window's ordinal intervals (multi-interval = OR of
    between-clauses; each pushes to the scan)."""
    intervals = parse_window(spec)
    cond = reduce(
        or_,
        [(F.col(ordinal) >= a) & (F.col(ordinal) < b) for a, b in intervals],
    )
    return df.where(cond)


def rebase_ordinals(
    df: DataFrame, ordinal: str = "ordinal", out: str = "ordinal"
) -> DataFrame:
    """Renumber ordinals 0..n-1 in existing ordinal order (W2;
    CoreXVecVectorDatasetViewMethods.java:389-403 logical index translation).
    Costs one global sort — apply after slicing, cache if reused."""
    w = Window.orderBy(F.col(ordinal).asc())
    res = df.withColumn("__logical", F.row_number().over(w) - 1)
    if out == ordinal:
        res = res.drop(ordinal)
    return res.withColumnRenamed("__logical", out)
