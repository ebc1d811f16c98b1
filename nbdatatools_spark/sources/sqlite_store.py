"""SQLite predicate-store ingest (S9 in SURVEY §2.1).

Reference: discovery/metadata/sqlite/SQLitePredicateBackend.java — four tables
``(ordinal INTEGER PRIMARY KEY, data BLOB)`` holding the predicate facets.
Predicate stores are metadata-sized (ordinals = query count), so ingest is
driver-side stdlib sqlite3 -> Arrow -> DataFrame; no JDBC driver needed. For
truly large sqlite files, convert to Parquet once and read natively.
"""

from __future__ import annotations

import sqlite3

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

PREDICATE_TABLES = (
    "metadata_predicates",
    "predicate_results",
    "metadata_layout",
    "metadata_content",
)


def read_sqlite_table(
    spark: SparkSession, db_path: str, table: str, batch_rows: int = 100_000
) -> DataFrame:
    """-> DataFrame with the table's columns (BLOBs become BINARY)."""
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f'SELECT * FROM "{table}"')
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    if not rows:
        # infer-less empty frame: all columns as binary-safe strings
        return spark.createDataFrame([], ", ".join(f"`{c}` STRING" for c in cols))
    arrays = [pa.array([r[i] for r in rows]) for i in range(len(cols))]
    tbl = pa.table(arrays, names=cols)
    return spark.createDataFrame(tbl.to_pandas())


def read_predicate_store(spark: SparkSession, db_path: str) -> dict[str, DataFrame]:
    """Load whichever of the four facet tables exist
    (predicates.md 'SQLite Backend')."""
    con = sqlite3.connect(db_path)
    try:
        names = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
        }
    finally:
        con.close()
    return {
        t: read_sqlite_table(spark, db_path, t) for t in PREDICATE_TABLES if t in names
    }
