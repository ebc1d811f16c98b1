"""Predicate-store metadata codecs + typed facet views (VERDICT r1 missing
#1/#2).

Byte-compatible with the reference's predicate-store blob formats:

- Field record codec ``[fieldIndex:2][fieldType:1][value]``, little-endian
  (discovery/metadata/MetadataRecordCodec.java:33,56,95). Values: TEXT =
  [len:4][utf8], INT = i64, FLOAT = f64, BOOL = 1 byte, ENUM = ordinal i32.
- Field types TEXT(0) INT(1) FLOAT(2) BOOL(3) ENUM(4)
  (discovery/metadata/FieldType.java:24-35).
- Field descriptor ``[typeTag:1][nameLen:2][name][enumCount:2
  [evLen:2][ev]]*`` and layout ``[fieldCount:2][field]*``
  (FieldDescriptor.java:93-115, MetadataLayoutImpl.java:93-123).
- result_indices ``[count:4][i32]*`` little-endian
  (views/ResultIndicesDatasetView.java doc comment).
- predicates blobs are PNode wire buffers (views/PredicatesDatasetView.java:85
  PNode.fromBuffer) — decoded via predicates.wire.

DataFrame views decode blob facets into typed columns with Arrow-batched
mapInPandas (records are metadata-sized; the layout rides along broadcast).
This closes the path: a reference predicate store (SQLite or slab) ->
typed ``metadata_content`` DataFrame -> compile_pnode evaluation ->
reproduce the stored ``result_indices`` (the reference harness invariant,
SURVEY §3.3).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from enum import IntEnum
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FieldType(IntEnum):
    """FieldType.java:24-35 wire tags."""

    TEXT = 0
    INT = 1
    FLOAT = 2
    BOOL = 3
    ENUM = 4


_SPARK_TYPES = {
    FieldType.TEXT: "string",
    FieldType.INT: "bigint",
    FieldType.FLOAT: "double",
    FieldType.BOOL: "boolean",
    FieldType.ENUM: "string",
}


@dataclass(frozen=True)
class FieldDescriptor:
    """FieldDescriptor.java — name, type, enum value list (ENUM only)."""

    name: str
    type: FieldType
    enum_values: tuple[str, ...] = field(default_factory=tuple)

    def encode(self) -> bytes:
        nb = self.name.encode("utf-8")
        out = bytearray()
        out += struct.pack("<Bh", int(self.type), len(nb))
        out += nb
        if self.type == FieldType.ENUM:
            out += struct.pack("<h", len(self.enum_values))
            for ev in self.enum_values:
                evb = ev.encode("utf-8")
                out += struct.pack("<h", len(evb))
                out += evb
        return bytes(out)

    @classmethod
    def decode(cls, buf: memoryview, pos: int) -> tuple["FieldDescriptor", int]:
        (tag, nlen) = struct.unpack_from("<Bh", buf, pos)
        pos += 3
        name = bytes(buf[pos : pos + nlen]).decode("utf-8")
        pos += nlen
        evs: tuple[str, ...] = ()
        if FieldType(tag) == FieldType.ENUM:
            (n_ev,) = struct.unpack_from("<h", buf, pos)
            pos += 2
            vals = []
            for _ in range(n_ev):
                (el,) = struct.unpack_from("<h", buf, pos)
                pos += 2
                vals.append(bytes(buf[pos : pos + el]).decode("utf-8"))
                pos += el
            evs = tuple(vals)
        return cls(name, FieldType(tag), evs), pos


@dataclass(frozen=True)
class MetadataLayout:
    """Ordered field schema (MetadataLayoutImpl.java)."""

    fields: tuple[FieldDescriptor, ...]

    def encode(self) -> bytes:
        out = bytearray(struct.pack("<h", len(self.fields)))
        for fd in self.fields:
            out += fd.encode()
        return bytes(out)

    @classmethod
    def decode(cls, data: bytes) -> "MetadataLayout":
        buf = memoryview(data)
        (n,) = struct.unpack_from("<h", buf, 0)
        pos = 2
        fds = []
        for _ in range(n):
            fd, pos = FieldDescriptor.decode(buf, pos)
            fds.append(fd)
        return cls(tuple(fds))

    def index_of(self, name: str) -> int:
        for i, fd in enumerate(self.fields):
            if fd.name == name:
                return i
        raise KeyError(f"field not in layout: {name}")

    def spark_schema(self, ordinal: str = "ordinal") -> str:
        cols = ", ".join(f"`{fd.name}` {_SPARK_TYPES[fd.type]}" for fd in self.fields)
        return f"{ordinal} BIGINT, {cols}"


def encode_record(layout: MetadataLayout, record: dict) -> bytes:
    """MetadataRecordCodec.encode:56-89 — None/missing fields omitted."""
    out = bytearray()
    for name, value in record.items():
        if value is None:
            continue
        idx = layout.index_of(name)
        fd = layout.fields[idx]
        out += struct.pack("<hB", idx, int(fd.type))
        if fd.type == FieldType.TEXT:
            tb = str(value).encode("utf-8")
            out += struct.pack("<i", len(tb)) + tb
        elif fd.type == FieldType.INT:
            out += struct.pack("<q", int(value))
        elif fd.type == FieldType.FLOAT:
            out += struct.pack("<d", float(value))
        elif fd.type == FieldType.BOOL:
            out += struct.pack("<B", 1 if value else 0)
        elif fd.type == FieldType.ENUM:
            try:
                ordv = fd.enum_values.index(str(value))
            except ValueError:
                raise ValueError(
                    f"enum value {value!r} not in {list(fd.enum_values)} for field {name!r}"
                ) from None
            out += struct.pack("<i", ordv)
    return bytes(out)


def decode_record(layout: MetadataLayout, data: bytes) -> dict:
    """MetadataRecordCodec.decode:95-111."""
    buf = memoryview(data)
    pos = 0
    rec: dict = {}
    while pos < len(buf):
        (idx, tag) = struct.unpack_from("<hB", buf, pos)
        pos += 3
        fd = layout.fields[idx]
        ft = FieldType(tag)
        if ft == FieldType.TEXT:
            (ln,) = struct.unpack_from("<i", buf, pos)
            pos += 4
            rec[fd.name] = bytes(buf[pos : pos + ln]).decode("utf-8")
            pos += ln
        elif ft == FieldType.INT:
            (rec[fd.name],) = struct.unpack_from("<q", buf, pos)
            pos += 8
        elif ft == FieldType.FLOAT:
            (rec[fd.name],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif ft == FieldType.BOOL:
            rec[fd.name] = buf[pos] != 0
            pos += 1
        elif ft == FieldType.ENUM:
            (ordv,) = struct.unpack_from("<i", buf, pos)
            pos += 4
            rec[fd.name] = fd.enum_values[ordv]
    return rec


def encode_result_indices(indices: list[int]) -> bytes:
    """[count:4][i32]* little-endian (ResultIndicesDatasetView)."""
    return struct.pack(f"<i{len(indices)}i", len(indices), *indices)


def decode_result_indices(data: bytes) -> list[int]:
    (n,) = struct.unpack_from("<i", data, 0)
    return list(struct.unpack_from(f"<{n}i", data, 4))


# --- DataFrame facet views -------------------------------------------------

def metadata_content_view(
    blobs: DataFrame, layout: MetadataLayout, ordinal: str = "ordinal", data: str = "data"
) -> DataFrame:
    """(ordinal, data BINARY) blob facet -> typed wide DataFrame, one column
    per layout field (missing fields NULL). Arrow-batched decode; the layout
    is tiny and serialized into the closure."""
    layout_bytes = layout.encode()
    schema = layout.spark_schema(ordinal)
    names = [fd.name for fd in layout.fields]

    def decode_batch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lay = MetadataLayout.decode(layout_bytes)
        for pdf in pdfs:
            recs = [decode_record(lay, bytes(b)) for b in pdf[data]]
            out = {ordinal: pdf[ordinal].to_numpy()}
            for nm in names:
                out[nm] = [r.get(nm) for r in recs]
            yield pd.DataFrame(out)

    return blobs.select(ordinal, data).mapInPandas(decode_batch, schema)


def result_indices_view(
    blobs: DataFrame, ordinal: str = "ordinal", data: str = "data"
) -> DataFrame:
    """(ordinal, data BINARY) -> (ordinal, indices ARRAY<INT>)."""

    def decode_batch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            yield pd.DataFrame(
                {
                    ordinal: pdf[ordinal].to_numpy(),
                    "indices": [decode_result_indices(bytes(b)) for b in pdf[data]],
                }
            )

    return blobs.select(ordinal, data).mapInPandas(
        decode_batch, f"{ordinal} BIGINT, indices ARRAY<INT>"
    )


def predicates_view(
    blobs: DataFrame, ordinal: str = "ordinal", data: str = "data", fmt: str = "typed"
) -> DataFrame:
    """(ordinal, data BINARY) PNode wire blobs -> (ordinal, pnode_json
    STRING) — JSON form feeds parse_pnode/compile_pnode directly."""
    import json

    from nbdatatools_spark.predicates.pnode import pnode_to_dict
    from nbdatatools_spark.predicates.wire import decode_pnode

    def decode_batch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            yield pd.DataFrame(
                {
                    ordinal: pdf[ordinal].to_numpy(),
                    "pnode_json": [
                        json.dumps(pnode_to_dict(decode_pnode(bytes(b), fmt=fmt)))
                        for b in pdf[data]
                    ],
                }
            )

    return blobs.select(ordinal, data).mapInPandas(
        decode_batch, f"{ordinal} BIGINT, pnode_json STRING"
    )
