"""Catalyst cost diagnostics: per-node size/row estimates from the
optimizer's statistics — the numbers behind broadcast decisions
(autoBroadcastJoinThreshold compares against exactly these sizeInBytes)
and AQE re-planning. `cost_report` makes them inspectable so a query
author can see WHY a join did or didn't broadcast before running it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_UNITS = {"b": 1, "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}


def _parse_bytes(v: str) -> int:
    """Spark byte-string conf literal -> int ('67108864', '10m', '64MB', '-1')."""
    s = str(v).strip().lower().removesuffix("b")
    if s and s[-1] in _UNITS:
        return int(s[:-1]) * _UNITS[s[-1]]
    return int(s)


def cost_report(df: DataFrame) -> list[dict]:
    """Walk the optimized logical plan and return one dict per node:
    ``{"depth", "node", "size_bytes", "row_count"}`` (row_count None when
    the optimizer has no estimate). Pure plan inspection — no job runs."""
    rows: list[dict] = []

    def walk(node, depth: int) -> None:
        stats = node.stats()
        rc = stats.rowCount()
        rows.append(
            {
                "depth": depth,
                "node": node.nodeName(),
                "size_bytes": int(str(stats.sizeInBytes())),
                "row_count": int(str(rc.get())) if rc.isDefined() else None,
            }
        )
        children = node.children()
        for i in range(children.length()):
            walk(children.apply(i), depth + 1)

    walk(df._jdf.queryExecution().optimizedPlan(), 0)
    return rows


def would_broadcast(side: DataFrame) -> bool:
    """Whether Catalyst's size estimate for ``side`` is under the session's
    autoBroadcastJoinThreshold — the pre-run answer to "will this join
    side broadcast?" (AQE may still upgrade at runtime on exact sizes; a
    -1 threshold disables broadcasting entirely)."""
    threshold = _parse_bytes(
        side.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    )
    if threshold < 0:
        return False
    size = int(str(side._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    return size <= threshold
