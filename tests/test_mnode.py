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


# --- adversarial conformance (MNodeAdversarialTest.java) -------------------

class TestMNodeAdversarial:
    def _rt(self, record, tags=None):
        from nbdatatools_spark.sources.mnode import decode_mnode, encode_mnode

        return decode_mnode(encode_mnode(record, tags))

    def test_integer_extrema(self):
        from nbdatatools_spark.sources.mnode import TAG_INT32, TAG_LONG, TAG_SHORT

        rec = {
            "lmin": -(2**63), "lmax": 2**63 - 1,
            "imin": -(2**31), "imax": 2**31 - 1,
            "smin": -(2**15), "smax": 2**15 - 1,
            "zero": 0, "one": 1,
        }
        tags = {
            "lmin": TAG_LONG, "lmax": TAG_LONG,
            "imin": TAG_INT32, "imax": TAG_INT32,
            "smin": TAG_SHORT, "smax": TAG_SHORT,
            "zero": TAG_LONG, "one": TAG_LONG,
        }
        assert self._rt(rec, tags) == rec

    def test_float_specials(self):
        import math

        from nbdatatools_spark.sources.mnode import TAG_DOUBLE, TAG_FLOAT32, TAG_HALF

        for tag in (TAG_DOUBLE, TAG_FLOAT32, TAG_HALF):
            out = self._rt(
                {"nan": float("nan"), "inf": float("inf"), "ninf": float("-inf"), "nz": -0.0},
                {k: tag for k in ("nan", "inf", "ninf", "nz")},
            )
            assert math.isnan(out["nan"])
            assert out["inf"] == float("inf") and out["ninf"] == float("-inf")
            assert out["nz"] == 0.0 and math.copysign(1.0, out["nz"]) == -1.0

    def test_bigdecimal_extreme_scales_and_bigint_hundreds_of_digits(self):
        from decimal import Decimal

        from nbdatatools_spark.sources.mnode import TAG_DECIMAL, TAG_VARINT

        rec = {
            "tiny": Decimal(1).scaleb(-100),
            "huge": Decimal(123456789).scaleb(50),
            "big": int("9" * 300),
            "nbig": -int("7" * 250),
        }
        tags = {"tiny": TAG_DECIMAL, "huge": TAG_DECIMAL, "big": TAG_VARINT, "nbig": TAG_VARINT}
        out = self._rt(rec, tags)
        assert out["tiny"] == rec["tiny"] and out["huge"] == rec["huge"]
        assert out["big"] == rec["big"] and out["nbig"] == rec["nbig"]

    def test_empty_string_bytes_and_utf8_4byte(self):
        out = self._rt({"s": "", "b": b"", "emoji": "\U0001F600\U0001F680", "nul": "a\x00b"})
        assert out["s"] == "" and out["b"] == b""
        assert out["emoji"] == "\U0001F600\U0001F680" and out["nul"] == "a\x00b"

    def test_large_blob(self):
        blob = bytes(range(256)) * 512  # 128KiB
        assert self._rt({"blob": blob})["blob"] == blob

    def test_truncated_and_invalid_buffers_raise(self):
        import struct as _s

        import pytest as _pytest

        from nbdatatools_spark.sources.mnode import decode_mnode, encode_mnode

        good = encode_mnode({"name": "x", "v": 5})
        for bad in (
            b"",                      # empty
            b"\x01",                  # dialect only
            b"\x02\x01\x00",          # wrong dialect
            good[:3],                 # field count only
            good[:6],                 # truncated field name
            good[:-2],                # truncated value payload
        ):
            with _pytest.raises((ValueError, _s.error, IndexError, UnicodeDecodeError)):
                decode_mnode(bad)
        # invalid type tag
        tagged = bytearray(encode_mnode({"k": 1}))
        tagged[-9] = 0xEE  # tag byte of the long value
        with _pytest.raises((ValueError, KeyError, _s.error, IndexError)):
            decode_mnode(bytes(tagged))

    def test_fuzz_random_bytes_never_crash_interpreter(self):
        import random as _random
        import struct as _s

        from nbdatatools_spark.sources.mnode import decode_mnode

        rng = _random.Random(1234)
        for _ in range(500):
            blob = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 64)))
            try:
                decode_mnode(b"\x01" + blob)
            except (ValueError, KeyError, _s.error, IndexError, UnicodeDecodeError, OverflowError):
                pass  # controlled failure is the contract; crashes are not

    def test_deeply_nested_nodes(self):
        rec = {"leaf": 1}
        for i in range(40):
            rec = {f"n{i}": rec}
        assert self._rt(rec) == rec

    def test_empty_and_single_element_typed_arrays(self):
        from nbdatatools_spark.sources.mnode import (
            TAG_DOUBLE,
            TAG_INT32,
            TAG_LONG,
            TypedArray,
            decode_mnode,
            encode_mnode,
        )

        for tag in (TAG_LONG, TAG_INT32, TAG_DOUBLE):
            for vals in ((), (7,) if tag != TAG_DOUBLE else (7.5,)):
                rec = {"a": TypedArray(tag, tuple(vals))}
                out = decode_mnode(encode_mnode(rec))
                got = out["a"]
                assert got.elem_tag == tag and tuple(got.values) == tuple(vals)

    def test_node_with_many_fields_preserves_order(self):
        rec = {f"f{i:03d}": i for i in range(300)}
        out = self._rt(rec)
        assert list(out) == list(rec) and out == rec
