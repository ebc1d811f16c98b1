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
from pyspark.sql import functions as F

# Actual backend table names (SQLitePredicateWriter.java:73-76; round 1
# guessed the TestDataKind facet names instead and matched nothing).
PREDICATE_TABLES = (
    "predicates",
    "result_indices",
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


def write_predicate_store(
    db_path: str,
    layout,
    metadata_content: "DataFrame | list[tuple[int, dict]]",
    predicates: "list[tuple[int, object]] | None" = None,
    result_indices: "DataFrame | list[tuple[int, list[int]]] | None" = None,
    ordinal: str = "ordinal",
) -> None:
    """Write a reference-consumable SQLite predicate store
    (SQLitePredicateWriter.java:73-92 DDL + blob wire formats) — the WRITE
    direction of S9, so engine-computed facets (e.g. result_indices_table
    output) round-trip into the reference toolchain.

    ``metadata_content``: DataFrame with ``ordinal`` + layout field columns,
    or pre-built (ordinal, record-dict) pairs. ``predicates``: (ordinal,
    PNode-or-JSON). ``result_indices``: DataFrame (ordinal, indices) or
    pairs. Stores are metadata-sized by contract (one row per query), so
    assembly is driver-side; compute the FACETS distributed first.
    """
    from nbdatatools_spark.predicates.pnode import parse_pnode
    from nbdatatools_spark.predicates.wire import encode_pnode
    from nbdatatools_spark.sources.metadata_codec import (
        encode_record,
        encode_result_indices,
    )

    if isinstance(metadata_content, DataFrame):
        names = [fd.name for fd in layout.fields]
        metadata_content = [
            (r[ordinal], {n: r[n] for n in names if n in r.asDict()})
            for r in metadata_content.collect()
        ]
    if isinstance(result_indices, DataFrame):
        result_indices = [
            (r[0], [int(x) for x in r[1]]) for r in result_indices.collect()
        ]
    con = sqlite3.connect(db_path)
    try:
        # reference DDL verbatim (SQLitePredicateWriter.java:73-76)
        con.execute(
            "CREATE TABLE IF NOT EXISTS predicates (ordinal INTEGER PRIMARY KEY, data BLOB)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS result_indices (ordinal INTEGER PRIMARY KEY, data BLOB)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS metadata_layout (id INTEGER PRIMARY KEY, data BLOB)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS metadata_content (ordinal INTEGER PRIMARY KEY, data BLOB)"
        )
        con.execute(
            "INSERT OR REPLACE INTO metadata_layout (id, data) VALUES (0, ?)",
            (layout.encode(),),
        )
        con.executemany(
            "INSERT OR REPLACE INTO metadata_content (ordinal, data) VALUES (?, ?)",
            [(int(o), encode_record(layout, rec)) for o, rec in metadata_content],
        )
        for o, node in predicates or []:
            if isinstance(node, (str, bytes, dict)):
                node = parse_pnode(node)
            con.execute(
                "INSERT OR REPLACE INTO predicates (ordinal, data) VALUES (?, ?)",
                (int(o), encode_pnode(node, fmt="typed")),
            )
        con.executemany(
            "INSERT OR REPLACE INTO result_indices (ordinal, data) VALUES (?, ?)",
            [(int(o), encode_result_indices(ix)) for o, ix in (result_indices or [])],
        )
        con.commit()
    finally:
        con.close()


def read_predicate_store_typed(spark: SparkSession, db_path: str) -> dict:
    """Fully-decoded predicate store (VERDICT r1 missing #1/#2):

    - ``layout``: MetadataLayout decoded from the metadata_layout blob (id 0)
    - ``metadata_content``: typed wide DataFrame (one column per field)
    - ``result_indices``: (ordinal, indices ARRAY<INT>)
    - ``predicates``: (ordinal, pnode_json STRING) — feed parse_pnode/
      compile_pnode to evaluate against metadata_content

    This is the read path from any reference-written SQLite predicate store
    to DataFrames the engine can query (SQLitePredicateBackend.java:63-78).
    """
    from nbdatatools_spark.sources.metadata_codec import (
        MetadataLayout,
        metadata_content_view,
        predicates_view,
        result_indices_view,
    )

    raw = read_predicate_store(spark, db_path)
    out: dict = {}
    layout = None
    if "metadata_layout" in raw:
        blob = (
            raw["metadata_layout"].where(F.col("id") == 0).select("data").limit(1).collect()
        )
        if blob:
            layout = MetadataLayout.decode(bytes(blob[0][0]))
            out["layout"] = layout
    if layout is not None and "metadata_content" in raw:
        out["metadata_content"] = metadata_content_view(raw["metadata_content"], layout)
    if "result_indices" in raw:
        out["result_indices"] = result_indices_view(raw["result_indices"])
    if "predicates" in raw:
        out["predicates"] = predicates_view(raw["predicates"])
    return out
