"""Slab store semantics on Parquet (S7/S8 in SURVEY §2.1).

The reference's slabtastic is a paged, appendable, namespaced ordinal->blob
file with O(log n) pages-page binary search (design/slabtastic.md:31-150,
SlabReader.java:58,246-344). In the engine the storage format concern
disappears: a slab is a Parquet table ``(namespace STRING, ordinal BIGINT,
data BINARY)`` partitioned by namespace and sorted by ordinal within files —
parquet row-group min/max stats give the same pruning the pages-page gave
(SURVEY §2.6 O3).

Operations (slabtastic CLI: CMD_slab_append.java:146, CMD_slab_import.java:730,
CMD_slab_export.java:362, CMD_slab_rewrite.java:173):
- get(ns, ordinal)        -> filter (stats-pruned point lookup)
- get_all(ns, ordinals)   -> IN-list / join for large batches
- append                  -> mode("append") write
- rewrite (compact)       -> read -> repartition -> sorted overwrite
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SLAB_SCHEMA = "namespace STRING, ordinal BIGINT, data BINARY"


class SlabStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def df(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    # --- reads (SlabReader.java:58,246-344) --------------------------------
    def get(self, namespace: str, ordinal: int) -> bytes | None:
        rows = (
            self.df()
            .where((F.col("namespace") == namespace) & (F.col("ordinal") == ordinal))
            .select("data")
            .limit(1)
            .collect()
        )
        return bytes(rows[0][0]) if rows else None

    def get_all(self, namespace: str, ordinals: list[int]) -> DataFrame:
        """Batched multi-get (SlabReader BatchResult): small lists inline as
        an IN filter (stats-pruned); large lists join against a broadcast
        ordinal table."""
        base = self.df().where(F.col("namespace") == namespace)
        if len(ordinals) <= 1000:
            return base.where(F.col("ordinal").isin(ordinals)).select("ordinal", "data")
        wanted = self.spark.createDataFrame([(o,) for o in ordinals], "ordinal BIGINT")
        return base.join(F.broadcast(wanted), "ordinal").select("ordinal", "data")

    def namespaces(self) -> list[str]:
        return [r[0] for r in self.df().select("namespace").distinct().collect()]

    def count(self, namespace: str | None = None) -> int:
        df = self.df()
        if namespace is not None:
            df = df.where(F.col("namespace") == namespace)
        return df.count()

    # --- writes (SlabWriter.java:93,326-359) -------------------------------
    @classmethod
    def create(cls, spark: SparkSession, path: str, df: DataFrame) -> "SlabStore":
        cls._write(df, path, "overwrite")
        return cls(spark, path)

    def append(self, df: DataFrame) -> None:
        self._write(df, self.path, "append")

    def rewrite(self) -> None:
        """Compact: re-sort and rewrite (CMD_slab_rewrite). Reads fully
        before overwrite via an eager local checkpoint on the shuffled data."""
        compacted = (
            self.df()
            .repartition("namespace")
            .sortWithinPartitions("namespace", "ordinal")
            .localCheckpoint()
        )
        self._write(compacted, self.path, "overwrite", already_sorted=True)

    @staticmethod
    def _write(df: DataFrame, path: str, mode: str, already_sorted: bool = False) -> None:
        for col in ("namespace", "ordinal", "data"):
            if col not in df.columns:
                raise ValueError(f"slab frame needs column {col!r}")
        out = df
        if not already_sorted:
            out = df.repartition("namespace").sortWithinPartitions("namespace", "ordinal")
        (
            out.write.mode(mode)
            .partitionBy("namespace")
            .parquet(path)
        )

    # --- predicate-store facet decode (SlabtasticPredicateBackend.java:42-48)
    def read_predicate_store_typed(self) -> dict:
        """Typed view of the four predicate-store namespaces ``predicates``
        / ``result_indices`` / ``metadata_layout`` / ``metadata_content``
        (same blob codecs as the SQLite backend; layout at ordinal 0).
        See sources.sqlite_store.read_predicate_store_typed."""
        from nbdatatools_spark.sources.metadata_codec import (
            MetadataLayout,
            metadata_content_view,
            predicates_view,
            result_indices_view,
        )

        present = set(self.namespaces())
        out: dict = {}
        layout = None
        if "metadata_layout" in present:
            blob = self.get("metadata_layout", 0)
            if blob is not None:
                layout = MetadataLayout.decode(blob)
                out["layout"] = layout

        def ns(df_ns: str) -> DataFrame:
            return (
                self.df()
                .where(F.col("namespace") == df_ns)
                .select("ordinal", "data")
            )

        if layout is not None and "metadata_content" in present:
            out["metadata_content"] = metadata_content_view(ns("metadata_content"), layout)
        if "result_indices" in present:
            out["result_indices"] = result_indices_view(ns("result_indices"))
        if "predicates" in present:
            out["predicates"] = predicates_view(ns("predicates"))
        return out
