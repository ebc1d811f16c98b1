"""PNode binary wire formats (P7 in SURVEY §2.2).

The reference ships two little-endian binary encodings plus a framed
wrapper (specs/predicate_protocol.md:1-18; PNode.java:34-117):

- **indexed**: positional 1-byte field indices, values as raw 8-byte longs.
  Leaf  = ``[PRED=0:1][field:1][op:1][vLen:2][v:8*n]``
  (PredicateNode.java:194-210); conjugate = ``[AND=1|OR=2:1][count:1]
  [children...]`` (ConjugateNode.java:53-76).
- **typed named**: UTF-8 field names and per-comparand type tags, matching
  the rust typed PNode format.
  Leaf = ``[PRED:1][nameLen:2][nameBytes][op:1][count:2][tagged
  comparand...]`` (PredicateNode.java:255-271); comparand tags
  int=0 (+long), float=1 (+double), text=2 (+len:2+utf8), bool=3 (+1),
  bytes=4 (+len:4+raw), null=5 (Comparand.java:40-94).

Framed wrapper: dialect leader ``0x02``; a ``0xFF`` byte after the leader
selects the typed named format, anything else is indexed
(PNode.java:37-40,85-98).

Enum ordinals on the wire: PRED=0, AND=1, OR=2 (ConjugateType); GT=0 LT=1
EQ=2 NE=3 GE=4 LE=5 IN=6 MATCHES=7 (OpType.java:23-37).
"""

from __future__ import annotations

import struct

from nbdatatools_spark.predicates.pnode import Conjugate, PNode, PredicateLeaf

DIALECT = 0x02
TYPED_MARKER = 0xFF

_OPS = ["GT", "LT", "EQ", "NE", "GE", "LE", "IN", "MATCHES"]
_OP_ORD = {op: i for i, op in enumerate(_OPS)}


# --- indexed format -------------------------------------------------------

def _encode_indexed(node: PNode, out: bytearray) -> None:
    if isinstance(node, Conjugate):
        out.append(1 if node.op == "AND" else 2)
        out.append(len(node.nodes))
        for child in node.nodes:
            _encode_indexed(child, out)
        return
    assert isinstance(node, PredicateLeaf)
    if node.field is None:
        raise ValueError("indexed wire format requires a positional field index")
    out.append(0)
    out.append(node.field)
    out.append(_OP_ORD[node.op])
    out += struct.pack("<h", len(node.values))
    for v in node.values:
        out += struct.pack("<q", int(v))


def _decode_indexed(buf: memoryview, pos: int) -> tuple[PNode, int]:
    tag = buf[pos]
    if tag in (1, 2):
        count = buf[pos + 1]
        pos += 2
        children = []
        for _ in range(count):
            child, pos = _decode_indexed(buf, pos)
            children.append(child)
        return Conjugate("AND" if tag == 1 else "OR", tuple(children)), pos
    if tag != 0:
        raise ValueError(f"unknown ConjugateType ordinal: {tag}")
    field = buf[pos + 1]
    op = _OPS[buf[pos + 2]]
    (n,) = struct.unpack_from("<h", buf, pos + 3)
    vals = struct.unpack_from(f"<{n}q", buf, pos + 5)
    return PredicateLeaf(op=op, values=tuple(vals), field=field), pos + 5 + 8 * n


# --- typed named format ---------------------------------------------------

def _encode_comparand(v, out: bytearray) -> None:
    if v is None:
        out.append(5)
    elif isinstance(v, bool):
        out.append(3)
        out.append(1 if v else 0)
    elif isinstance(v, int):
        out.append(0)
        out += struct.pack("<q", v)
    elif isinstance(v, float):
        out.append(1)
        out += struct.pack("<d", v)
    elif isinstance(v, str):
        raw = v.encode("utf-8")
        out.append(2)
        out += struct.pack("<H", len(raw))
        out += raw
    elif isinstance(v, (bytes, bytearray)):
        out.append(4)
        out += struct.pack("<i", len(v))
        out += bytes(v)
    else:
        raise ValueError(f"unsupported comparand type: {type(v)!r}")


def _decode_comparand(buf: memoryview, pos: int) -> tuple[object, int]:
    tag = buf[pos]
    pos += 1
    if tag == 0:
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if tag == 1:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if tag == 2:
        (n,) = struct.unpack_from("<H", buf, pos)
        return bytes(buf[pos + 2 : pos + 2 + n]).decode("utf-8"), pos + 2 + n
    if tag == 3:
        return buf[pos] != 0, pos + 1
    if tag == 4:
        (n,) = struct.unpack_from("<i", buf, pos)
        return bytes(buf[pos + 4 : pos + 4 + n]), pos + 4 + n
    if tag == 5:
        return None, pos
    raise ValueError(f"unknown comparand tag: {tag}")


def _encode_typed(node: PNode, out: bytearray) -> None:
    if isinstance(node, Conjugate):
        out.append(1 if node.op == "AND" else 2)
        out.append(len(node.nodes))
        for child in node.nodes:
            _encode_typed(child, out)
        return
    assert isinstance(node, PredicateLeaf)
    name = node.field_name if node.field_name is not None else f"F{node.field}"
    raw = name.encode("utf-8")
    out.append(0)
    out += struct.pack("<h", len(raw))
    out += raw
    out.append(_OP_ORD[node.op])
    out += struct.pack("<h", len(node.values))
    for v in node.values:
        _encode_comparand(v, out)


def _decode_typed(buf: memoryview, pos: int) -> tuple[PNode, int]:
    tag = buf[pos]
    if tag in (1, 2):
        count = buf[pos + 1]
        pos += 2
        children = []
        for _ in range(count):
            child, pos = _decode_typed(buf, pos)
            children.append(child)
        return Conjugate("AND" if tag == 1 else "OR", tuple(children)), pos
    if tag != 0:
        raise ValueError(f"unknown ConjugateType ordinal: {tag}")
    (nlen,) = struct.unpack_from("<h", buf, pos + 1)
    name = bytes(buf[pos + 3 : pos + 3 + nlen]).decode("utf-8")
    pos += 3 + nlen
    op = _OPS[buf[pos]]
    (count,) = struct.unpack_from("<h", buf, pos + 1)
    pos += 3
    vals = []
    for _ in range(count):
        v, pos = _decode_comparand(buf, pos)
        vals.append(v)
    return PredicateLeaf(op=op, values=tuple(vals), field_name=name), pos


# --- public API -----------------------------------------------------------

def encode_pnode(node: PNode, fmt: str = "indexed") -> bytes:
    """Encode a PNode tree in the ``indexed`` or ``typed`` wire format
    (unframed tree body)."""
    out = bytearray()
    (_encode_indexed if fmt == "indexed" else _encode_typed)(node, out)
    return bytes(out)


def decode_pnode(data: bytes, fmt: str = "indexed") -> PNode:
    """Decode an unframed PNode tree body."""
    node, pos = (_decode_indexed if fmt == "indexed" else _decode_typed)(
        memoryview(data), 0
    )
    if pos != len(data):
        raise ValueError(f"trailing bytes after predicate tree: {len(data) - pos}")
    return node


def encode_framed(node: PNode, fmt: str = "indexed") -> bytes:
    """Encode with the mixed-stream dialect leader: ``[0x02][0xFF if typed]
    [tree body]`` (PNode.java:encodeFramed / encodeTypedFramed)."""
    head = bytes([DIALECT, TYPED_MARKER]) if fmt == "typed" else bytes([DIALECT])
    return head + encode_pnode(node, fmt)


def decode_framed(data: bytes) -> PNode:
    """Decode a framed PNode, auto-detecting the format from the byte after
    the dialect leader (PNode.java:85-98)."""
    if not data or data[0] != DIALECT:
        lead = data[0] if data else None
        raise ValueError(f"expected PNode dialect leader 0x02, got {lead!r}")
    if len(data) > 1 and data[1] == TYPED_MARKER:
        return decode_pnode(data[2:], "typed")
    return decode_pnode(data[1:], "indexed")
