"""Facet-level operators: ordinal alignment joins, select/slice/find, sample,
prebuffer (J1, P10, O5, T3 in SURVEY §2).

J1 (data_access_v1.md:23-34): facet rows correlate by ordinal — query i pairs
with neighbor row i; neighbor index VALUES are foreign keys into base-vector
ordinals. ``align_facets`` is the equi-join; ``expand_neighbors`` is the
explode-then-join that resolves neighbor ordinals to vectors.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def align_facets(ordinal: str = "ordinal", **facets: DataFrame) -> DataFrame:
    """Equi-join N facet tables on ordinal; non-ordinal columns are prefixed
    by facet name to avoid collisions. Inner join — a missing ordinal in any
    facet is a dataset integrity error the caller should catch with counts."""
    if len(facets) < 2:
        raise ValueError("need at least two facets to align")
    renamed = []
    for name, df in facets.items():
        cols = [F.col(ordinal)] + [
            F.col(c).alias(f"{name}_{c}") for c in df.columns if c != ordinal
        ]
        renamed.append(df.select(*cols))
    return reduce(lambda a, b: a.join(b, ordinal), renamed)


def expand_neighbors(
    neighbors: DataFrame,
    base: DataFrame,
    ordinal: str = "ordinal",
    indices_col: str = "indices",
    base_vec: str = "vector",
) -> DataFrame:
    """Resolve each neighbor index to its base vector:
    (query_ordinal, rank, base_ordinal, vector). The explode output is
    Q*k rows; the join broadcasts nothing by default — at scale base is the
    big side and Catalyst picks the shuffle join keyed on base ordinal."""
    exploded = neighbors.select(
        F.col(ordinal).alias("query_ordinal"),
        F.posexplode(indices_col).alias("pos", "base_ordinal"),
    ).select("query_ordinal", (F.col("pos") + 1).alias("rank"), "base_ordinal")
    b = base.select(
        F.col(ordinal).cast("bigint").alias("base_ordinal"), F.col(base_vec)
    )
    return exploded.withColumn(
        "base_ordinal", F.col("base_ordinal").cast("bigint")
    ).join(b, "base_ordinal").select("query_ordinal", "rank", "base_ordinal", base_vec)


def select_by_ordinals(df: DataFrame, ordinals: list[int], ordinal: str = "ordinal") -> DataFrame:
    """P10 ``vector select``: extract rows by explicit ordinal list."""
    return df.where(F.col(ordinal).isin(ordinals))


def find_vectors(df: DataFrame, criteria, limit: int | None = None) -> DataFrame:
    """P10 ``vector find``: locate vectors matching a Column criteria (e.g.
    ``is_zero_vector(col('vector'))`` or any compiled PNode)."""
    out = df.where(criteria)
    return out.limit(limit) if limit else out


def sample_facet(
    df: DataFrame, n: int = 10, ordinal: str = "ordinal", random: bool = False, seed: int = 42
) -> DataFrame:
    """O5 ``vectordata sample``: first-n in ordinal order, or a seeded random
    sample (deterministic via portable md5 ordering)."""
    if not random:
        return df.orderBy(ordinal).limit(n)
    return (
        df.withColumn("__h", F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(ordinal).cast("string"))))
        .orderBy("__h")
        .limit(n)
        .drop("__h")
    )


def prebuffer(df: DataFrame) -> DataFrame:
    """T3 prebuffer (DatasetView.java:29-42): warm the facet into executor
    memory before benchmarking — persist + a full materializing pass."""
    cached = df.persist()
    cached.count()
    return cached
