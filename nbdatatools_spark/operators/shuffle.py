"""Deterministic permutation (U4: ``generate ivec-shuffle``, README.md:63).

The reference reshuffles integer vectors with a seeded RNG. A sequential RNG
is order-dependent and unreproducible in parallel (SURVEY §7 "What's hard"),
so the engine re-specifies the permutation as *sort by a seeded portable
hash of the ordinal* — deterministic, parallel, and reproducible in any engine
(md5 exists in Spark and DuckDB alike; used instead of xxhash64 precisely so
oracles can replicate the permutation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seeded_shuffle(
    df: DataFrame, seed: int = 42, ordinal: str = "ordinal", renumber: bool = True
) -> DataFrame:
    """Permute rows by md5(seed:ordinal); optionally emit new 0-based
    ordinals in shuffled order."""
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(ordinal).cast("string")))
    out = df.withColumn("__shufkey", key)
    if renumber:
        w = Window.orderBy(F.col("__shufkey").asc(), F.col(ordinal).asc())
        out = (
            out.withColumn("new_ordinal", F.row_number().over(w) - 1)
        )
    return out.orderBy("__shufkey").drop("__shufkey")
