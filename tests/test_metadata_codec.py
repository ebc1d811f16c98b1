"""Predicate-store metadata codec conformance (MetadataRecordCodec.java,
FieldDescriptor.java, MetadataLayoutImpl.java, ResultIndicesDatasetView.java).

Golden byte vectors are hand-assembled from the Java wire layouts, then the
reference harness invariant (SURVEY §3.3) runs end-to-end through BOTH
backends: encode records + predicate + result_indices -> store (SQLite with
the reference DDL / slab parquet namespaces) -> typed facet views ->
compile_pnode over decoded metadata_content == stored result_indices.
"""

import sqlite3
import struct

import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.predicates import compile_pnode, parse_pnode
from nbdatatools_spark.predicates.pnode import pnode_to_dict
from nbdatatools_spark.predicates.wire import decode_pnode, encode_pnode
from nbdatatools_spark.sources.metadata_codec import (
    FieldDescriptor,
    FieldType,
    MetadataLayout,
    decode_record,
    decode_result_indices,
    encode_record,
    encode_result_indices,
    metadata_content_view,
    predicates_view,
    result_indices_view,
)

LAYOUT = MetadataLayout(
    (
        FieldDescriptor("city", FieldType.TEXT),
        FieldDescriptor("age", FieldType.INT),
        FieldDescriptor("score", FieldType.FLOAT),
        FieldDescriptor("active", FieldType.BOOL),
        FieldDescriptor("tier", FieldType.ENUM, ("bronze", "silver", "gold")),
    )
)


def test_record_golden_bytes():
    # [fieldIndex:2][fieldType:1][value], little-endian
    # (MetadataRecordCodec.java:33 doc comment)
    rec = {"city": "oslo", "age": 42, "active": True, "tier": "gold"}
    raw = encode_record(LAYOUT, rec)
    expect = (
        struct.pack("<hB", 0, 0) + struct.pack("<i", 4) + b"oslo"
        + struct.pack("<hB", 1, 1) + struct.pack("<q", 42)
        + struct.pack("<hB", 3, 3) + b"\x01"
        + struct.pack("<hB", 4, 4) + struct.pack("<i", 2)
    )
    assert raw == expect
    assert decode_record(LAYOUT, raw) == rec


def test_record_skips_none_and_missing_fields():
    raw = encode_record(LAYOUT, {"age": 7, "score": None})
    assert decode_record(LAYOUT, raw) == {"age": 7}


def test_record_float_roundtrip_exact():
    raw = encode_record(LAYOUT, {"score": 3.141592653589793})
    assert decode_record(LAYOUT, raw)["score"] == 3.141592653589793


def test_enum_value_not_allowed_raises():
    with pytest.raises(ValueError, match="enum value"):
        encode_record(LAYOUT, {"tier": "platinum"})


def test_layout_golden_bytes_and_roundtrip():
    # FieldDescriptor: [typeTag:1][nameLen:2][name](ENUM: [n:2]([len:2][v])*)
    single = MetadataLayout((FieldDescriptor("tier", FieldType.ENUM, ("a", "bb")),))
    raw = single.encode()
    expect = (
        struct.pack("<h", 1)
        + struct.pack("<Bh", 4, 4) + b"tier"
        + struct.pack("<h", 2)
        + struct.pack("<h", 1) + b"a"
        + struct.pack("<h", 2) + b"bb"
    )
    assert raw == expect
    assert MetadataLayout.decode(LAYOUT.encode()) == LAYOUT


def test_result_indices_golden_bytes():
    raw = encode_result_indices([5, 1, 9])
    assert raw == struct.pack("<iiii", 3, 5, 1, 9)
    assert decode_result_indices(raw) == [5, 1, 9]
    assert decode_result_indices(encode_result_indices([])) == []


PNODE_JSON = (
    '{"op":"AND","nodes":[{"fieldName":"age","op":"GE","values":[30]},'
    '{"fieldName":"tier","op":"IN","values":["silver","gold"]}]}'
)


def _records():
    tiers = ["bronze", "silver", "gold"]
    return [
        {
            "city": f"c{i % 5}",
            "age": 20 + (i * 7) % 40,
            "score": i / 3.0,
            "active": i % 2 == 0,
            "tier": tiers[i % 3],
        }
        for i in range(60)
    ]


def _expected_indices(recs):
    return [
        i
        for i, r in enumerate(recs)
        if r["age"] >= 30 and r["tier"] in ("silver", "gold")
    ]


def _assert_invariant(spark, store):
    """compile(stored predicate) over decoded metadata_content reproduces the
    stored result_indices facet — the reference's own harness invariant."""
    recs = _records()
    content = store["metadata_content"]
    assert set(content.columns) == {"ordinal", "city", "age", "score", "active", "tier"}
    pj = {r["ordinal"]: r["pnode_json"] for r in store["predicates"].collect()}
    node = parse_pnode(pj[0])
    got = [
        r["ordinal"]
        for r in content.where(compile_pnode(node, two_valued=False))
        .select("ordinal")
        .orderBy("ordinal")
        .collect()
    ]
    stored = {r["ordinal"]: list(r["indices"]) for r in store["result_indices"].collect()}
    assert got == stored[0] == _expected_indices(recs)
    # typed values survived the round trip exactly
    row = content.where(F.col("ordinal") == 3).collect()[0]
    assert (row["city"], row["age"], row["active"]) == ("c3", 41, False)
    assert row["score"] == 1.0 and row["tier"] == "bronze"


def test_sqlite_predicate_store_invariant(tmp_path, spark):
    from nbdatatools_spark.sources.sqlite_store import read_predicate_store_typed

    recs = _records()
    db = str(tmp_path / "store.db")
    con = sqlite3.connect(db)
    # reference DDL verbatim (SQLitePredicateWriter.java:73-76)
    con.execute("CREATE TABLE IF NOT EXISTS predicates (ordinal INTEGER PRIMARY KEY, data BLOB)")
    con.execute("CREATE TABLE IF NOT EXISTS result_indices (ordinal INTEGER PRIMARY KEY, data BLOB)")
    con.execute("CREATE TABLE IF NOT EXISTS metadata_layout (id INTEGER PRIMARY KEY, data BLOB)")
    con.execute("CREATE TABLE IF NOT EXISTS metadata_content (ordinal INTEGER PRIMARY KEY, data BLOB)")
    con.execute("INSERT INTO metadata_layout (id, data) VALUES (0, ?)", (LAYOUT.encode(),))
    for i, r in enumerate(recs):
        con.execute(
            "INSERT INTO metadata_content (ordinal, data) VALUES (?, ?)",
            (i, encode_record(LAYOUT, r)),
        )
    node = parse_pnode(PNODE_JSON)
    con.execute(
        "INSERT INTO predicates (ordinal, data) VALUES (0, ?)",
        (encode_pnode(node, fmt="typed"),),
    )
    con.execute(
        "INSERT INTO result_indices (ordinal, data) VALUES (0, ?)",
        (encode_result_indices(_expected_indices(recs)),),
    )
    con.commit()
    con.close()

    store = read_predicate_store_typed(spark, db)
    assert store["layout"] == LAYOUT
    _assert_invariant(spark, store)


def test_slab_predicate_store_invariant(tmp_path, spark):
    from nbdatatools_spark.sources.slab import SlabStore

    recs = _records()
    node = parse_pnode(PNODE_JSON)
    rows = (
        [("metadata_layout", 0, LAYOUT.encode())]
        + [("metadata_content", i, encode_record(LAYOUT, r)) for i, r in enumerate(recs)]
        + [("predicates", 0, encode_pnode(node, fmt="typed"))]
        + [("result_indices", 0, encode_result_indices(_expected_indices(recs)))]
    )
    df = spark.createDataFrame(rows, "namespace STRING, ordinal BIGINT, data BINARY")
    store = SlabStore.create(spark, str(tmp_path / "store.slab"), df)
    typed = store.read_predicate_store_typed()
    assert typed["layout"] == LAYOUT
    _assert_invariant(spark, typed)


def test_write_predicate_store_full_loop(tmp_path, spark):
    """WRITE direction of S9: engine computes the result_indices facet
    distributed, writes a reference-layout SQLite store, reads it back
    through the typed views, and the harness invariant still holds."""
    from nbdatatools_spark.operators.hybrid import result_indices_table
    from nbdatatools_spark.sources.sqlite_store import (
        read_predicate_store_typed,
        write_predicate_store,
    )

    layout = MetadataLayout(
        (
            FieldDescriptor("number", FieldType.INT),
            FieldDescriptor("category", FieldType.TEXT),
        )
    )
    meta = spark.createDataFrame(
        [(i, (i * 13) % 50, "abc"[i % 3]) for i in range(80)],
        "ordinal BIGINT, number BIGINT, category STRING",
    )
    preds = [
        (0, '{"fieldName":"number","op":"LT","values":[20]}'),
        (1, '{"op":"AND","nodes":[{"fieldName":"number","op":"GE","values":[10]},'
            '{"fieldName":"category","op":"EQ","values":["a"]}]}'),
    ]
    ri = result_indices_table(meta, preds)
    db = str(tmp_path / "engine_written.db")
    write_predicate_store(
        db, layout, meta, preds, ri.select("ordinal", "matches")
    )
    store = read_predicate_store_typed(spark, db)
    assert store["layout"] == layout
    content = store["metadata_content"]
    stored_ri = {r["ordinal"]: list(r["indices"]) for r in store["result_indices"].collect()}
    for r in store["predicates"].collect():
        node = parse_pnode(r["pnode_json"])
        got = [
            x["ordinal"]
            for x in content.where(compile_pnode(node, two_valued=False))
            .select("ordinal")
            .orderBy("ordinal")
            .collect()
        ]
        assert got == stored_ri[r["ordinal"]]
    # and the decoded predicate trees equal the originals
    assert {r["ordinal"]: parse_pnode(r["pnode_json"]) for r in store["predicates"].collect()} == {
        i: parse_pnode(p) for i, p in preds
    }


def test_pnode_wire_to_json_view_roundtrip(spark):
    node = parse_pnode(PNODE_JSON)
    blob = encode_pnode(node, fmt="typed")
    df = spark.createDataFrame([(0, blob)], "ordinal BIGINT, data BINARY")
    out = predicates_view(df).collect()[0]
    assert parse_pnode(out["pnode_json"]) == node
    # and the dict form round-trips through the parser
    assert parse_pnode(pnode_to_dict(node)) == node
