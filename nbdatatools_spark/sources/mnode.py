"""MNode 29-tag binary metadata codec — read/write interop (VERDICT r1
missing #3).

Byte-compatible with the reference's self-describing metadata record format
(spec/metadata/MNode.java:111-142 tag table, :1500-1535 framing;
spec/metadata/mnode.md:87-116). All integers little-endian.

Record framing: ``[dialect:0x01][keyCount:2]([nameLen:2][name:utf8][tag:1]
[value])*``. Nested nodes (tag 9) embed a full framed record
(length-prefixed). Value encodings follow the tag table exactly, including
the quirky ones: UUID msb/lsb are written as LITTLE-endian longs,
decimal/varint unscaled bytes are Java ``BigInteger.toByteArray()``
(big-endian two's complement), half is IEEE binary16, date/time/datetime are
length-prefixed ISO strings.

Python value mapping (Spark-friendly):
string/text/ascii/enum_str -> str · long/int/short/enum_ord/varint -> int ·
double/float/half -> float · bool -> bool · bytes -> bytes · null -> None ·
decimal -> decimal.Decimal · millis/nanos/datetime -> datetime (UTC) ·
date -> date · time -> time · uuidv1/v7 -> uuid.UUID · ulid -> 26-char str ·
list/set -> list · array -> (elem_tag, list) via TypedArray · node -> dict ·
map -> dict.

The engine's native metadata store is Parquet (SURVEY §1.1 — MNode's wire
role is replaced by Parquet encoding); this codec is the INTEROP BOUNDARY:
it reads existing reference artifacts into typed rows and writes
reference-consumable bytes, it is not the engine's hot metadata path.
"""

from __future__ import annotations

import datetime as dt
import struct
import uuid as uuidlib
from dataclasses import dataclass
from decimal import Decimal

DIALECT = 0x01

(
    TAG_STRING, TAG_LONG, TAG_DOUBLE, TAG_BOOL, TAG_BYTES, TAG_NULL,
    TAG_ENUM_STR, TAG_ENUM_ORD, TAG_LIST, TAG_NODE,
    TAG_TEXT, TAG_ASCII, TAG_INT32, TAG_SHORT, TAG_DECIMAL, TAG_VARINT,
    TAG_FLOAT32, TAG_HALF, TAG_MILLIS, TAG_NANOS, TAG_DATE, TAG_TIME,
    TAG_DATETIME, TAG_UUIDV1, TAG_UUIDV7, TAG_ULID, TAG_ARRAY, TAG_SET,
    TAG_TYPED_MAP,
) = range(29)

TAG_NAMES = [
    "STRING", "LONG", "DOUBLE", "BOOL", "BYTES", "NULL",
    "ENUM_STR", "ENUM_ORD", "LIST", "NODE",
    "TEXT", "ASCII", "INT32", "SHORT", "DECIMAL", "VARINT",
    "FLOAT32", "HALF", "MILLIS", "NANOS", "DATE", "TIME", "DATETIME",
    "UUIDV1", "UUIDV7", "ULID", "ARRAY", "SET", "TYPED_MAP",
]

# fixed element widths for typed arrays (MNode.fixedSizeOf:2181-2199)
_FIXED = {
    TAG_BOOL: 1, TAG_SHORT: 2, TAG_HALF: 2, TAG_INT32: 4, TAG_ENUM_ORD: 4,
    TAG_FLOAT32: 4, TAG_LONG: 8, TAG_DOUBLE: 8, TAG_MILLIS: 8,
    TAG_NANOS: 12, TAG_UUIDV1: 16, TAG_UUIDV7: 16, TAG_ULID: 16,
}

_ARRAY_FMT = {
    TAG_BOOL: "B", TAG_SHORT: "h", TAG_HALF: "e", TAG_INT32: "i",
    TAG_ENUM_ORD: "i", TAG_FLOAT32: "f", TAG_LONG: "q", TAG_DOUBLE: "d",
    TAG_MILLIS: "q",
}


@dataclass(frozen=True)
class TypedArray:
    """TAG_ARRAY value: homogeneous fixed-width elements."""

    elem_tag: int
    values: tuple


def _big_to_int(raw: bytes) -> int:
    return int.from_bytes(raw, "big", signed=True)


def _int_to_big(n: int) -> bytes:
    """Java BigInteger.toByteArray(): minimal big-endian two's complement,
    at least one byte."""
    length = max(1, (n.bit_length() + 8) // 8)
    return n.to_bytes(length, "big", signed=True)


def _half_to_bytes(v: float) -> bytes:
    return struct.pack("<e", v)


# --- decode ---------------------------------------------------------------

def _read_lp_str(buf: memoryview, pos: int) -> tuple[str, int]:
    (n,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n


def _decode_value(buf: memoryview, pos: int, tag: int) -> tuple[object, int]:
    if tag in (TAG_STRING, TAG_TEXT, TAG_ASCII, TAG_ENUM_STR):
        return _read_lp_str(buf, pos)
    if tag == TAG_LONG:
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if tag == TAG_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if tag == TAG_BOOL:
        return buf[pos] != 0, pos + 1
    if tag == TAG_BYTES:
        (n,) = struct.unpack_from("<i", buf, pos)
        return bytes(buf[pos + 4 : pos + 4 + n]), pos + 4 + n
    if tag == TAG_NULL:
        return None, pos
    if tag == TAG_ENUM_ORD:
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    if tag in (TAG_LIST, TAG_SET):
        (n,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        out = []
        for _ in range(n):
            etag = buf[pos]
            pos += 1
            v, pos = _decode_value(buf, pos, etag)
            out.append(v)
        return out, pos
    if tag == TAG_NODE:
        (n,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        return decode_mnode(bytes(buf[pos : pos + n])), pos + n
    if tag == TAG_INT32:
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    if tag == TAG_SHORT:
        return struct.unpack_from("<h", buf, pos)[0], pos + 2
    if tag == TAG_DECIMAL:
        (scale, n) = struct.unpack_from("<ii", buf, pos)
        pos += 8
        unscaled = _big_to_int(bytes(buf[pos : pos + n]))
        return Decimal(unscaled).scaleb(-scale), pos + n
    if tag == TAG_VARINT:
        (n,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        return _big_to_int(bytes(buf[pos : pos + n])), pos + n
    if tag == TAG_FLOAT32:
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if tag == TAG_HALF:
        return struct.unpack_from("<e", buf, pos)[0], pos + 2
    if tag == TAG_MILLIS:
        (ms,) = struct.unpack_from("<q", buf, pos)
        return dt.datetime.fromtimestamp(ms / 1000.0, dt.timezone.utc), pos + 8
    if tag == TAG_NANOS:
        (sec, nano) = struct.unpack_from("<qi", buf, pos)
        base = dt.datetime.fromtimestamp(sec, dt.timezone.utc)
        return base + dt.timedelta(microseconds=nano / 1000.0), pos + 12
    if tag == TAG_DATE:
        s, pos = _read_lp_str(buf, pos)
        return dt.date.fromisoformat(s), pos
    if tag == TAG_TIME:
        s, pos = _read_lp_str(buf, pos)
        return dt.time.fromisoformat(s), pos
    if tag == TAG_DATETIME:
        s, pos = _read_lp_str(buf, pos)
        return dt.datetime.fromisoformat(s.replace("Z", "+00:00")), pos
    if tag in (TAG_UUIDV1, TAG_UUIDV7):
        # msb/lsb written through a LITTLE-endian buffer (MNode.java:1737-1742)
        (msb, lsb) = struct.unpack_from("<qq", buf, pos)
        return uuidlib.UUID(int=((msb & (2**64 - 1)) << 64) | (lsb & (2**64 - 1))), pos + 16
    if tag == TAG_ULID:
        from nbdatatools_spark.functions.ulid import ulid_encode

        return ulid_encode(bytes(buf[pos : pos + 16])), pos + 16
    if tag == TAG_ARRAY:
        etag = buf[pos]
        (n,) = struct.unpack_from("<i", buf, pos + 1)
        pos += 5
        fmt = _ARRAY_FMT.get(etag)
        if fmt is not None:
            vals = struct.unpack_from(f"<{n}{fmt}", buf, pos)
            if etag == TAG_BOOL:
                vals = tuple(bool(v) for v in vals)
            return TypedArray(etag, tuple(vals)), pos + n * _FIXED[etag]
        out = []
        for _ in range(n):
            v, pos = _decode_value(buf, pos, etag)
            out.append(v)
        return TypedArray(etag, tuple(out)), pos
    if tag == TAG_TYPED_MAP:
        (n,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        out = {}
        for _ in range(n):
            ktag = buf[pos]
            k, pos = _decode_value(buf, pos + 1, ktag)
            vtag = buf[pos]
            v, pos = _decode_value(buf, pos + 1, vtag)
            out[k] = v
        return out, pos
    raise ValueError(f"unknown MNode tag {tag}")


def decode_mnode(data: bytes) -> dict:
    """Framed record (with 0x01 dialect leader) -> ordered dict."""
    if not data or data[0] != DIALECT:
        lead = f"0x{data[0]:02x}" if data else "empty"
        raise ValueError(f"expected MNode dialect leader 0x01, got {lead}")
    buf = memoryview(data)
    (n_keys,) = struct.unpack_from("<h", buf, 1)
    pos = 3
    out: dict = {}
    for _ in range(n_keys):
        (nlen,) = struct.unpack_from("<h", buf, pos)
        pos += 2
        name = bytes(buf[pos : pos + nlen]).decode("utf-8")
        pos += nlen
        tag = buf[pos]
        pos += 1
        out[name], pos = _decode_value(buf, pos, tag)
    return out


def mnode_tags(data: bytes) -> dict[str, str]:
    """Field name -> tag name, without materializing values (schema peek)."""
    buf = memoryview(data)
    if not data or data[0] != DIALECT:
        raise ValueError("expected MNode dialect leader 0x01")
    (n_keys,) = struct.unpack_from("<h", buf, 1)
    pos = 3
    out: dict[str, str] = {}
    for _ in range(n_keys):
        (nlen,) = struct.unpack_from("<h", buf, pos)
        pos += 2
        name = bytes(buf[pos : pos + nlen]).decode("utf-8")
        pos += nlen
        tag = buf[pos]
        pos += 1
        out[name] = TAG_NAMES[tag]
        _, pos = _decode_value(buf, pos, tag)
    return out


# --- encode ---------------------------------------------------------------

def _infer_tag(v) -> int:
    if v is None:
        return TAG_NULL
    if isinstance(v, bool):
        return TAG_BOOL
    if isinstance(v, int):
        return TAG_LONG
    if isinstance(v, float):
        return TAG_DOUBLE
    if isinstance(v, str):
        return TAG_STRING
    if isinstance(v, bytes):
        return TAG_BYTES
    if isinstance(v, Decimal):
        return TAG_DECIMAL
    if isinstance(v, dict):
        return TAG_NODE if all(isinstance(k, str) for k in v) else TAG_TYPED_MAP
    if isinstance(v, TypedArray):
        return TAG_ARRAY
    if isinstance(v, (list, tuple)):
        return TAG_LIST
    if isinstance(v, set):
        return TAG_SET
    if isinstance(v, uuidlib.UUID):
        return TAG_UUIDV7
    if isinstance(v, dt.datetime):
        return TAG_MILLIS
    if isinstance(v, dt.date):
        return TAG_DATE
    if isinstance(v, dt.time):
        return TAG_TIME
    raise ValueError(f"cannot infer MNode tag for {type(v).__name__}")


def _encode_value(out: bytearray, tag: int, v) -> None:
    if tag in (TAG_STRING, TAG_TEXT, TAG_ASCII, TAG_ENUM_STR):
        b = str(v).encode("utf-8")
        out += struct.pack("<i", len(b)) + b
    elif tag == TAG_LONG:
        out += struct.pack("<q", v)
    elif tag == TAG_DOUBLE:
        out += struct.pack("<d", v)
    elif tag == TAG_BOOL:
        out += b"\x01" if v else b"\x00"
    elif tag == TAG_BYTES:
        out += struct.pack("<i", len(v)) + bytes(v)
    elif tag == TAG_NULL:
        pass
    elif tag == TAG_ENUM_ORD:
        out += struct.pack("<i", v)
    elif tag in (TAG_LIST, TAG_SET):
        items = sorted(v, key=repr) if isinstance(v, set) else list(v)
        out += struct.pack("<i", len(items))
        for item in items:
            etag = _infer_tag(item)
            out.append(etag)
            _encode_value(out, etag, item)
    elif tag == TAG_NODE:
        payload = encode_mnode(v)
        out += struct.pack("<i", len(payload)) + payload
    elif tag == TAG_INT32:
        out += struct.pack("<i", v)
    elif tag == TAG_SHORT:
        out += struct.pack("<h", v)
    elif tag == TAG_DECIMAL:
        d = v if isinstance(v, Decimal) else Decimal(str(v))
        exp = d.as_tuple().exponent
        if exp <= 0:  # scale = digits right of the point, Java-style
            scale, unscaled = -exp, int(d.scaleb(-exp))
        else:  # positive exponent normalizes to scale 0
            scale, unscaled = 0, int(d)
        raw = _int_to_big(unscaled)
        out += struct.pack("<ii", scale, len(raw)) + raw
    elif tag == TAG_VARINT:
        raw = _int_to_big(int(v))
        out += struct.pack("<i", len(raw)) + raw
    elif tag == TAG_FLOAT32:
        out += struct.pack("<f", v)
    elif tag == TAG_HALF:
        out += struct.pack("<e", v)
    elif tag == TAG_MILLIS:
        ms = int(v.timestamp() * 1000) if isinstance(v, dt.datetime) else int(v)
        out += struct.pack("<q", ms)
    elif tag == TAG_NANOS:
        sec = int(v.timestamp())
        nano = v.microsecond * 1000
        out += struct.pack("<qi", sec, nano)
    elif tag in (TAG_DATE, TAG_TIME, TAG_DATETIME):
        s = v.isoformat().encode("utf-8")
        out += struct.pack("<i", len(s)) + s
    elif tag in (TAG_UUIDV1, TAG_UUIDV7):
        n = v.int
        msb = (n >> 64) & (2**64 - 1)
        lsb = n & (2**64 - 1)
        out += struct.pack("<qq", msb - (1 << 64) if msb >= 1 << 63 else msb,
                           lsb - (1 << 64) if lsb >= 1 << 63 else lsb)
    elif tag == TAG_ULID:
        from nbdatatools_spark.functions.ulid import ulid_decode

        out += ulid_decode(v) if isinstance(v, str) else bytes(v)
    elif tag == TAG_ARRAY:
        fmt = _ARRAY_FMT.get(v.elem_tag)
        out.append(v.elem_tag)
        out += struct.pack("<i", len(v.values))
        if fmt is not None:
            vals = [int(x) for x in v.values] if fmt in "Bhiq" else list(v.values)
            out += struct.pack(f"<{len(vals)}{fmt}", *vals)
        else:
            for item in v.values:
                _encode_value(out, v.elem_tag, item)
    elif tag == TAG_TYPED_MAP:
        out += struct.pack("<i", len(v))
        for k, val in v.items():
            ktag = _infer_tag(k)
            out.append(ktag)
            _encode_value(out, ktag, k)
            vtag = _infer_tag(val)
            out.append(vtag)
            _encode_value(out, vtag, val)
    else:
        raise ValueError(f"unknown MNode tag {tag}")


def encode_mnode(record: dict, tags: dict[str, int] | None = None) -> bytes:
    """Ordered dict -> framed MNode bytes. ``tags`` pins per-field tags
    (e.g. {"n": TAG_INT32}); untagged fields infer LONG/DOUBLE/STRING/..."""
    out = bytearray([DIALECT])
    out += struct.pack("<h", len(record))
    for name, value in record.items():
        nb = name.encode("utf-8")
        out += struct.pack("<h", len(nb)) + nb
        tag = (tags or {}).get(name, _infer_tag(value))
        out.append(tag)
        _encode_value(out, tag, value)
    return bytes(out)


def mnode_records_view(blobs, ordinal: str = "ordinal", data: str = "data"):
    """(ordinal, data BINARY) MNode blobs -> (ordinal, record MAP<STRING,
    STRING>, tags MAP<STRING, STRING>) — values stringified (MNode records
    are heterogeneous per row; project typed columns from the map, or use
    metadata_codec's fixed-layout path when a layout exists)."""
    from typing import Iterator

    import pandas as pd

    def decode_batch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            recs = [decode_mnode(bytes(b)) for b in pdf[data]]
            yield pd.DataFrame(
                {
                    ordinal: pdf[ordinal].to_numpy(),
                    "record": [{k: str(v) for k, v in r.items()} for r in recs],
                    "tags": [mnode_tags(bytes(b)) for b in pdf[data]],
                }
            )

    return blobs.select(ordinal, data).mapInPandas(
        decode_batch,
        f"{ordinal} BIGINT, record MAP<STRING, STRING>, tags MAP<STRING, STRING>",
    )
