"""Format conversion utilities (S4, S11, X3 in SURVEY §2).

- JSON / YAML vector egress (datagen/TestDataFiles.java:105-123): JSON via
  native ``df.write.json``; YAML via mapPartitions (no Spark YAML sink).
- Parquet Group->vector converters (datatools-io-parquet/.../conversion/
  ConverterType.java:29-71): in Spark each converter is a ``select``
  expression; the two shipped converters are provided as helpers.
- Hugging Face dataset fetch (``fetch dlhf``, README.md:85-86): gated behind
  an import-try — ``huggingface_hub`` is not in this environment; the
  download step raises a clear error while the post-download read path is the
  normal parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_vectors_json(df: DataFrame, path: str, ordinal: str = "ordinal", vec: str = "vector") -> None:
    """One JSON object per line: {"ordinal": i, "vector": [...]} (S4)."""
    df.select(ordinal, vec).sort(ordinal).write.mode("overwrite").json(path)


def write_vectors_yaml(df: DataFrame, path: str, ordinal: str = "ordinal", vec: str = "vector") -> None:
    """Single YAML sequence file (driver-assembled; export utility like the
    reference's saveToFile yaml)."""
    rows = df.select(ordinal, vec).sort(ordinal).toLocalIterator()
    with open(path, "w") as f:
        for r in rows:
            comps = ", ".join(repr(float(x)) for x in r[1])
            f.write(f"- ordinal: {int(r[0])}\n  vector: [{comps}]\n")


# --- parquet converters (ConverterType.java:29-71) -------------------------

def hf_embeddings_to_vectors(
    df: DataFrame, emb_col: str = "emb", ordinal_col: str | None = None
) -> DataFrame:
    """EmbeddingsListFloat / HFEmbedToFloatAry equivalent: cast an embeddings
    list column to ARRAY<FLOAT> with explicit ordinals."""
    vec = F.col(emb_col).cast("array<float>").alias("vector")
    if ordinal_col:
        return df.select(F.col(ordinal_col).cast("bigint").alias("ordinal"), vec)
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    # explicit materialized ordinal, never implicit row order downstream
    return df.select(vec).withColumn("ordinal", F.row_number().over(w) - 1).select(
        "ordinal", "vector"
    )


def long_indexed_to_vectors(
    df: DataFrame, index_col: str, emb_col: str
) -> DataFrame:
    """Long-indexed converter: (row index column, embedding column)."""
    return df.select(
        F.col(index_col).cast("bigint").alias("ordinal"),
        F.col(emb_col).cast("array<float>").alias("vector"),
    )


# --- HF fetch (S11) ---------------------------------------------------------

def fetch_hf_dataset(repo_id: str, local_dir: str, allow_patterns: list[str] | None = None) -> str:
    """Download a Hugging Face dataset snapshot (``fetch dlhf``). Requires
    ``huggingface_hub`` which this environment does not ship — the call is
    gated and raises with instructions; everything downstream is
    ``spark.read.parquet(local_dir)``."""
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise NotImplementedError(
            "huggingface_hub is not installed in this environment; install it "
            "to enable dataset fetch, then read the result with "
            "spark.read.parquet(local_dir)"
        ) from e
    return snapshot_download(
        repo_id=repo_id,
        repo_type="dataset",
        local_dir=local_dir,
        allow_patterns=allow_patterns,
    )
