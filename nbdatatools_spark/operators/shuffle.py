"""Deterministic permutation (U4: ``generate ivec-shuffle``, README.md:63).

The reference reshuffles integer vectors with a seeded RNG. A sequential RNG
is order-dependent and unreproducible in parallel (SURVEY §7 "What's hard"),
so the engine re-specifies the permutation as *sort by a seeded portable
hash of the ordinal* — deterministic, parallel, and reproducible in any engine
(md5 exists in Spark and DuckDB alike; used instead of xxhash64 precisely so
oracles can replicate the permutation)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seeded_shuffle(
    df: DataFrame, seed: int = 42, ordinal: str = "ordinal", renumber: bool = True
) -> DataFrame:
    """Permute rows by md5(seed:ordinal); optionally emit new 0-based
    ordinals in shuffled order.

    Renumbering uses the two-phase partition-offset index (see
    windows.global_row_index) — the round-1 ``Window.orderBy`` form pushed
    every row through a single reducer (VERDICT r1 #5). The permutation key
    is unique per row (md5 of the unique ordinal), so the index is total."""
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(ordinal).cast("string")))
    out = df.withColumn("__shufkey", key)
    if renumber:
        from nbdatatools_spark.operators.windows import global_row_index

        out = global_row_index(
            out, [F.col("__shufkey").asc(), F.col(ordinal).asc()], out="new_ordinal"
        )
    return out.orderBy("__shufkey").drop("__shufkey")
