"""Token templating over dataset attributes + computed stats (F6).

Reference: spec/tokens/Templatizer.java:45 substitutes ``${token}`` from
dataset attributes and computed SpecTokens (SpecToken.java:40-81: counts,
dimensions, max_k, vendor...). Spark shape: tiny agg queries feed a plain
``str`` substitution driver-side.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RX = re.compile(r"\$\{([A-Za-z0-9_.]+)\}")


def compute_spec_tokens(
    base: DataFrame | None = None,
    queries: DataFrame | None = None,
    indices: DataFrame | None = None,
    vec: str = "vector",
) -> dict[str, str]:
    """Computed tokens per SpecToken.java:40-81 — one tiny agg per facet."""
    out: dict[str, str] = {}
    if base is not None:
        row = base.agg(
            F.count("*").alias("n"), F.min(F.size(vec)).alias("d")
        ).collect()[0]
        out["base_vectors"] = str(row["n"])
        out["dimensions"] = str(row["d"])
    if queries is not None:
        out["query_vectors"] = str(queries.count())
    if indices is not None:
        out["max_k"] = str(indices.agg(F.max(F.size("indices"))).collect()[0][0])
    return out


class Templatizer:
    """``${token}`` substitution; unknown tokens raise (fail-fast like the
    reference's template resolution)."""

    def __init__(self, tokens: dict[str, str]):
        self.tokens = {str(k): str(v) for k, v in tokens.items()}

    def render(self, template: str) -> str:
        def sub(m: re.Match) -> str:
            key = m.group(1)
            if key not in self.tokens:
                raise KeyError(f"unknown template token ${{{key}}}")
            return self.tokens[key]

        return _TOKEN_RX.sub(sub, template)
