"""MNode 29-tag codec conformance (spec/metadata/MNode.java:111-142,
:1500-1535; mnode.md:87-116). Golden bytes hand-assembled from the wire
table; round-trips across every tag; widening-read and error contracts."""

import datetime as dt
import struct
import uuid as uuidlib
from decimal import Decimal

import pytest

from nbdatatools_spark.functions.ulid import ulid_encode
from nbdatatools_spark.sources.mnode import (
    TAG_ARRAY,
    TAG_ASCII,
    TAG_DATE,
    TAG_DECIMAL,
    TAG_ENUM_ORD,
    TAG_ENUM_STR,
    TAG_FLOAT32,
    TAG_HALF,
    TAG_INT32,
    TAG_LIST,
    TAG_MILLIS,
    TAG_NANOS,
    TAG_NODE,
    TAG_NULL,
    TAG_SET,
    TAG_SHORT,
    TAG_STRING,
    TAG_TEXT,
    TAG_TIME,
    TAG_TYPED_MAP,
    TAG_ULID,
    TAG_UUIDV7,
    TAG_VARINT,
    TypedArray,
    decode_mnode,
    encode_mnode,
    mnode_records_view,
    mnode_tags,
)


def test_golden_bytes_simple_record():
    # [0x01][keyCount:2] then per field [nameLen:2][name][tag:1][value]
    raw = encode_mnode({"n": 7, "s": "hi"})
    expect = (
        b"\x01" + struct.pack("<h", 2)
        + struct.pack("<h", 1) + b"n" + bytes([1]) + struct.pack("<q", 7)
        + struct.pack("<h", 1) + b"s" + bytes([0]) + struct.pack("<i", 2) + b"hi"
    )
    assert raw == expect
    assert decode_mnode(raw) == {"n": 7, "s": "hi"}


def test_dialect_leader_required():
    with pytest.raises(ValueError, match="dialect leader"):
        decode_mnode(b"\x02\x00\x00")
    with pytest.raises(ValueError, match="dialect leader"):
        decode_mnode(b"")


def test_all_29_tags_roundtrip():
    u = uuidlib.uuid4()
    ulid = ulid_encode((1469918176385).to_bytes(6, "big") + bytes(range(10)))
    record = {
        "string": "plain",
        "long": -(1 << 40),
        "double": 2.5,
        "bool": True,
        "bytes": b"\x00\xff\x10",
        "null": None,
        "enum_str": "GOLD",
        "enum_ord": 2,
        "list": [1, "two", 3.0],
        "node": {"inner": 42, "deep": {"x": "y"}},
        "text": "validated é",
        "ascii": "ascii only",
        "int32": -12345,
        "short": -7,
        "decimal": Decimal("123.450"),
        "varint": -(1 << 100),
        "float32": 0.5,
        "half": 0.25,
        "millis": dt.datetime(2021, 3, 4, 5, 6, 7, 890000, dt.timezone.utc),
        "nanos": dt.datetime(2021, 3, 4, 5, 6, 7, 123456, dt.timezone.utc),
        "date": dt.date(2024, 2, 29),
        "time": dt.time(13, 14, 15),
        "datetime": dt.datetime(2022, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc),
        "uuidv7": u,
        "ulid": ulid,
        "array": TypedArray(TAG_INT32, (1, 2, 3)),
        "set_": [9, 8],
        "map": {1: "one", 2: "two"},
    }
    tags = {
        "enum_str": TAG_ENUM_STR, "enum_ord": TAG_ENUM_ORD,
        "text": TAG_TEXT, "ascii": TAG_ASCII, "int32": TAG_INT32,
        "short": TAG_SHORT, "decimal": TAG_DECIMAL, "varint": TAG_VARINT,
        "float32": TAG_FLOAT32, "half": TAG_HALF, "millis": TAG_MILLIS,
        "nanos": TAG_NANOS, "datetime": lambda: None, "uuidv7": TAG_UUIDV7,
        "ulid": TAG_ULID, "set_": TAG_SET, "map": TAG_TYPED_MAP,
    }
    tags["datetime"] = 22  # TAG_DATETIME
    raw = encode_mnode(record, tags)
    back = decode_mnode(raw)
    assert back["string"] == "plain" and back["long"] == -(1 << 40)
    assert back["double"] == 2.5 and back["bool"] is True
    assert back["bytes"] == b"\x00\xff\x10" and back["null"] is None
    assert back["enum_str"] == "GOLD" and back["enum_ord"] == 2
    assert back["list"] == [1, "two", 3.0]
    assert back["node"] == {"inner": 42, "deep": {"x": "y"}}
    assert back["text"] == "validated é" and back["ascii"] == "ascii only"
    assert back["int32"] == -12345 and back["short"] == -7
    assert back["decimal"] == Decimal("123.450")
    assert str(back["decimal"]) == "123.450"  # scale survives exactly
    assert back["varint"] == -(1 << 100)
    assert back["float32"] == 0.5 and back["half"] == 0.25
    assert back["millis"] == record["millis"]
    assert abs((back["nanos"] - record["nanos"]).total_seconds()) < 1e-6
    assert back["date"] == record["date"] and back["time"] == record["time"]
    assert back["datetime"] == record["datetime"]
    assert back["uuidv7"] == u and back["ulid"] == ulid
    assert back["array"] == TypedArray(TAG_INT32, (1, 2, 3))
    assert back["set_"] == [9, 8]  # list order preserved (py sets encode sorted)
    assert back["map"] == {1: "one", 2: "two"}
    # schema peek names every tag without decoding values incorrectly
    t = mnode_tags(raw)
    assert t["decimal"] == "DECIMAL" and t["array"] == "ARRAY" and t["map"] == "TYPED_MAP"


def test_uuid_little_endian_quirk():
    # MNode.java:1737-1742 writes msb/lsb through an LE buffer: byte order on
    # the wire is the REVERSE of RFC 4122 big-endian within each half.
    u = uuidlib.UUID("00112233-4455-6677-8899-aabbccddeeff")
    raw = encode_mnode({"u": u}, {"u": TAG_UUIDV7})
    val = raw[-16:]
    assert val[:8] == bytes.fromhex("7766554433221100")  # msb LE
    assert val[8:] == bytes.fromhex("ffeeddccbbaa9988")  # lsb LE
    assert decode_mnode(raw)["u"] == u


def test_typed_array_golden_bytes():
    raw = encode_mnode({"a": TypedArray(TAG_INT32, (1, 2))})
    # tag ARRAY(26), elemTag INT32(12), count 2, values LE
    assert raw.endswith(bytes([26, 12]) + struct.pack("<iii", 2, 1, 2))


def test_decimal_negative_unscaled():
    raw = encode_mnode({"d": Decimal("-0.07")}, {"d": TAG_DECIMAL})
    # scale 2, BigInteger.toByteArray(-7) == b'\xf9'
    assert raw.endswith(struct.pack("<ii", 2, 1) + b"\xf9")
    assert decode_mnode(raw)["d"] == Decimal("-0.07")


def test_mnode_records_view(spark):
    rows = [
        (i, encode_mnode({"k": i, "name": f"r{i}", "flag": i % 2 == 0}))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "ordinal BIGINT, data BINARY")
    out = {r["ordinal"]: r for r in mnode_records_view(df).collect()}
    assert out[3]["record"] == {"k": "3", "name": "r3", "flag": "False"}
    assert out[3]["tags"] == {"k": "LONG", "name": "STRING", "flag": "BOOL"}
