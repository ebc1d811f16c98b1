"""CSV vector ingest with JSON-array column autodetect (S3 in SURVEY §2.1).

Reference: readers/CsvJsonArrayStreamer.java:46,64-80 — detects which CSV
column holds a JSON number array (sampling the first rows), optional header.
Spark-first: sample driver-side for detection, then a declarative
``spark.read.csv`` + ``from_json`` plan (pushdown-friendly, no UDFs).
"""

from __future__ import annotations

import csv
import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ARRAY_RX = re.compile(r"^\s*\[\s*-?[\d.]")


def _detect(path: str, sample_rows: int = 10) -> tuple[int, bool]:
    """(array column index, has_header) from a driver-side sample."""
    with open(path, newline="") as f:
        rows = []
        for i, row in enumerate(csv.reader(f)):
            rows.append(row)
            if i >= sample_rows:
                break
    if not rows:
        raise ValueError(f"{path}: empty CSV")

    def array_col(row) -> int | None:
        for i, cell in enumerate(row):
            if _ARRAY_RX.match(cell):
                try:
                    parsed = json.loads(cell)
                    if isinstance(parsed, list) and parsed and all(
                        isinstance(x, (int, float)) for x in parsed
                    ):
                        return i
                except ValueError:
                    continue
        return None

    first = array_col(rows[0])
    rest = [array_col(r) for r in rows[1:]]
    col = next((c for c in rest if c is not None), None)
    if col is None and first is None:
        raise ValueError(f"{path}: no JSON-array column detected")
    has_header = first is None and col is not None
    return (col if col is not None else first), has_header


def read_csv_vectors(
    spark: SparkSession,
    path: str,
    element_type: str = "float",
    ordinal_col: str | None = None,
) -> DataFrame:
    """-> (ordinal BIGINT, vector ARRAY<element_type>).

    Ordinals come from ``ordinal_col`` if the CSV has one, else from file
    order via a zipWithIndex-equivalent (single input file => deterministic
    line order; multi-file callers should carry explicit ordinals, SURVEY
    §7 "Ordinal discipline").
    """
    col_idx, has_header = _detect(path)
    raw = spark.read.option("header", str(has_header).lower()).option(
        "multiLine", "false"
    ).csv(path)
    array_col_name = raw.columns[col_idx]
    vec = F.from_json(F.col(array_col_name), f"array<{element_type}>").alias("vector")
    if ordinal_col and ordinal_col in raw.columns:
        return raw.select(F.col(ordinal_col).cast("bigint").alias("ordinal"), vec)
    # derive stable ordinals from line order: single-partition read keeps
    # file order; explicit zipWithIndex for correctness over coalesce tricks
    rdd = raw.rdd.zipWithIndex().map(lambda t: (t[1], *t[0]))
    df = spark.createDataFrame(rdd, ["ordinal", *raw.columns])
    return df.select(F.col("ordinal").cast("bigint"), vec)
