"""Reference ``.mref`` / ``.mrkl`` merkle-file interop (S10 read-path subset).

Byte-compatible reader/writer for the reference's merkle file format
(docs/specs/merkle_v1.md:5-60; authoritative layout from
merklev2/Merklev2Footer.java:144 — the fixed footer is 45 bytes, the spec
doc's "53" is stale — and merklev2/MerkleDataImpl.java:995-1056 save()).

Faithfully reproduced reference behaviors (bit-for-bit, even the quirky
ones):
- Chunk sizing: BaseMerkleShape.calculateOptimalChunkSize
  (BaseMerkleShape.java:253-284): <1KB -> 64B; <1MB -> next pow2 >= size
  (min 1KB); else 1MB doubling to <=64MB while chunk count > 4096.
- Tree: flat array of 2*capLeaf-1 SHA-256 nodes, leaves at offset=capLeaf-1.
- Padding leaves are 32 ZERO bytes, and internal nodes with a null
  (padding) child are SKIPPED — left null, serialized as zeros
  (MerkleDataImpl.computeInternalNodes:413-434 `continue` on null child).
  Consequently a non-power-of-2 chunk count yields a zero root in the
  reference too; cross-artifact root comparison must compare node 0
  verbatim, which this module does.
- BitSet: Java BitSet.toByteArray() semantics — LSB-first within each byte,
  trailing all-zero bytes stripped (empty array when no bit is set).
- Footer: big-endian, 45 bytes:
  chunkSize:i64, totalContentSize:i64, totalChunks:i32, leafCount:i32,
  capLeaf:i32, nodeCount:i32, offset:i32, internalNodeCount:i32,
  bitSetSize:i32, footerLength:u8(=45).

The heavy part — hashing data chunks — runs distributed via
operators.integrity.chunk_digests; file assembly is driver-side (the tree
is small: content_size/chunk_size <= 4096 leaves by construction).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

HASH_SIZE = 32
FOOTER_SIZE = 45
_MIN_CHUNK = 1 << 20
_MAX_CHUNK = 64 << 20
_MAX_PREFERRED_CHUNKS = 4096


def optimal_chunk_size(content_size: int) -> int:
    """BaseMerkleShape.calculateOptimalChunkSize:253-284, verbatim logic."""
    if content_size == 0:
        return _MIN_CHUNK
    if content_size < 1024:
        return 64
    if content_size < _MIN_CHUNK:
        c = 1024
        while c < content_size:
            c *= 2
        return c
    c = _MIN_CHUNK
    while c < _MAX_CHUNK:
        if -(-content_size // c) <= _MAX_PREFERRED_CHUNKS:
            break
        c *= 2
    return c


@dataclass(frozen=True)
class MerkleShape:
    """Tree geometry (BaseMerkleShape.java:64-92)."""

    chunk_size: int
    total_content_size: int
    total_chunks: int
    leaf_count: int
    cap_leaf: int
    node_count: int
    offset: int
    internal_node_count: int

    @classmethod
    def for_content(cls, content_size: int, chunk_size: int | None = None) -> "MerkleShape":
        if content_size < 0:
            raise ValueError(f"content size cannot be negative: {content_size}")
        cs = chunk_size or optimal_chunk_size(content_size)
        if cs <= 0 or (cs & (cs - 1)) != 0:
            raise ValueError(f"chunk size must be a positive power of 2: {cs}")
        total = 0 if content_size == 0 else -(-content_size // cs)
        cap = 1
        while cap < total:
            cap <<= 1
        node_count = 2 * cap - 1
        return cls(
            chunk_size=cs,
            total_content_size=content_size,
            total_chunks=total,
            leaf_count=total,
            cap_leaf=cap,
            node_count=node_count,
            offset=cap - 1,
            internal_node_count=node_count - total,
        )


def build_nodes(
    shape: MerkleShape, leaf_hashes: list[bytes], null_propagation: bool = True
) -> list[bytes | None]:
    """Flat node array; None marks reference-null (padding-affected) nodes,
    serialized as 32 zero bytes (MerkleDataImpl.computeInternalNodes).

    ``null_propagation=True`` is the byte-faithful reference mode: an
    internal node with a padding child stays null (so non-power-of-2 chunk
    counts have a zero root — the reference does too). ``False`` treats
    padding leaves as 32 zero bytes and hashes every internal node — a dense
    root useful for corruption detection (operators.integrity.merkle_root);
    the two modes agree exactly when total_chunks is a power of 2."""
    if len(leaf_hashes) != shape.leaf_count:
        raise ValueError(f"expected {shape.leaf_count} leaf hashes, got {len(leaf_hashes)}")
    nodes: list[bytes | None] = [None] * shape.node_count
    for i, h in enumerate(leaf_hashes):
        if len(h) != HASH_SIZE:
            raise ValueError("leaf hash must be 32 bytes")
        nodes[shape.offset + i] = h
    if not null_propagation:
        zero = b"\x00" * HASH_SIZE
        for i in range(shape.offset + shape.leaf_count, shape.node_count):
            nodes[i] = zero
    for i in range(shape.offset - 1, -1, -1):
        left = nodes[2 * i + 1]
        right = nodes[2 * i + 2] if 2 * i + 2 < shape.node_count else left
        if left is None or right is None:
            continue  # reference behavior: null child -> parent stays null
        nodes[i] = hashlib.sha256(left + right).digest()
    return nodes


def _bitset_to_bytes(bits: set[int]) -> bytes:
    """Java BitSet.toByteArray(): LSB-first, trailing zero bytes stripped."""
    if not bits:
        return b""
    n_bytes = max(bits) // 8 + 1
    arr = bytearray(n_bytes)
    for b in bits:
        arr[b // 8] |= 1 << (b % 8)
    return bytes(arr)


def _bitset_from_bytes(raw: bytes) -> set[int]:
    return {i * 8 + j for i, byte in enumerate(raw) for j in range(8) if byte >> j & 1}


def write_merkle_file(
    path: str, shape: MerkleShape, nodes: list[bytes | None], valid_chunks: set[int]
) -> None:
    """Serialize in reference save() layout: node hashes 0..nodeCount-1
    (None -> zeros), BitSet, 45-byte big-endian footer."""
    zero = b"\x00" * HASH_SIZE
    bitset = _bitset_to_bytes(valid_chunks)
    footer = struct.pack(
        ">qqiiiiiiib",
        shape.chunk_size,
        shape.total_content_size,
        shape.total_chunks,
        shape.leaf_count,
        shape.cap_leaf,
        shape.node_count,
        shape.offset,
        shape.internal_node_count,
        len(bitset),
        FOOTER_SIZE,
    )
    with open(path, "wb") as f:
        for h in nodes:
            f.write(h if h is not None else zero)
        f.write(bitset)
        f.write(footer)


def read_merkle_file(path: str) -> tuple[MerkleShape, list[bytes], set[int]]:
    """-> (shape, node hash array, valid chunk index set)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(size - FOOTER_SIZE)
        (cs, tcs, tc, lc, cap, nc, off, inc, bss, flen) = struct.unpack(
            ">qqiiiiiiib", f.read(FOOTER_SIZE)
        )
        if flen != FOOTER_SIZE:
            raise ValueError(f"{path}: bad footer length {flen} (expected {FOOTER_SIZE})")
        expected = nc * HASH_SIZE + bss + FOOTER_SIZE
        if size != expected:
            raise ValueError(f"{path}: size {size} != expected {expected}")
        shape = MerkleShape(cs, tcs, tc, lc, cap, nc, off, inc)
        f.seek(0)
        nodes = [f.read(HASH_SIZE) for _ in range(nc)]
        bits = _bitset_from_bytes(f.read(bss))
    return shape, nodes, bits


def merkle_file_root(path: str) -> str:
    """Root hash (node 0) as hex — the cross-artifact identity."""
    _, nodes, _ = read_merkle_file(path)
    return nodes[0].hex()


def leaf_hashes_df(spark: SparkSession, path: str) -> DataFrame:
    """Leaf hashes as (chunk_index BIGINT, sha256 STRING) for joins."""
    shape, nodes, _ = read_merkle_file(path)
    rows = [
        (i, nodes[shape.offset + i].hex()) for i in range(shape.leaf_count)
    ]
    return spark.createDataFrame(rows or [], "chunk_index BIGINT, sha256 STRING")


def write_mref(
    spark: SparkSession, data_path: str, mref_path: str, chunk_size: int | None = None
) -> MerkleShape:
    """Publisher flow: distributed chunk hashing -> .mref with all-1 BitSet
    (merkle_v1.md §3.2 'Reference file')."""
    from nbdatatools_spark.operators.integrity import chunk_digests

    shape = MerkleShape.for_content(os.path.getsize(data_path), chunk_size)
    if shape.total_chunks == 0:
        leaves: list[bytes] = []
    else:
        digests = chunk_digests(spark, data_path, shape.chunk_size)
        rows = digests.orderBy("chunk_index").select("chunk_index", "sha256").collect()
        leaves = [bytes.fromhex(r["sha256"]) for r in rows]
    nodes = build_nodes(shape, leaves)
    write_merkle_file(mref_path, shape, nodes, set(range(shape.leaf_count)))
    return shape


def init_mrkl(mref_path: str, mrkl_path: str) -> None:
    """Consumer flow step 2 (merkle_v1.md §3.3): copy the reference and zero
    the BitSet region in place (region size preserved)."""
    shutil.copyfile(mref_path, mrkl_path)
    size = os.path.getsize(mrkl_path)
    with open(mrkl_path, "r+b") as f:
        f.seek(size - FOOTER_SIZE)
        footer = struct.unpack(">qqiiiiiiib", f.read(FOOTER_SIZE))
        node_count, bss = footer[5], footer[8]
        if bss:
            f.seek(node_count * HASH_SIZE)
            f.write(b"\x00" * bss)


def set_chunk_valid(mrkl_path: str, chunk_index: int) -> None:
    """Flip bit ``chunk_index`` after a verified download (resume support)."""
    size = os.path.getsize(mrkl_path)
    with open(mrkl_path, "r+b") as f:
        f.seek(size - FOOTER_SIZE)
        footer = struct.unpack(">qqiiiiiiib", f.read(FOOTER_SIZE))
        node_count, leaf_count, bss = footer[5], footer[3], footer[8]
        if not (0 <= chunk_index < leaf_count):
            raise IndexError(f"chunk {chunk_index} out of range 0..{leaf_count - 1}")
        if chunk_index // 8 >= bss:
            raise ValueError(
                "BitSet region too small for chunk; file written with stripped "
                "bitset — rewrite via write_merkle_file with the full valid set"
            )
        pos = node_count * HASH_SIZE + chunk_index // 8
        f.seek(pos)
        (byte,) = f.read(1)
        f.seek(pos)
        f.write(bytes([byte | (1 << (chunk_index % 8))]))


def verify_against_merkle(
    spark: SparkSession, data_path: str, merkle_path: str
) -> DataFrame:
    """Recompute chunk digests (distributed) and return mismatching chunks
    vs the merkle file's leaves — empty result == verified. The spoilbits
    fault-injection analogue (README.md:94-95)."""
    from pyspark.sql import functions as F

    from nbdatatools_spark.operators.integrity import chunk_digests

    shape, _, _ = read_merkle_file(merkle_path)
    actual = chunk_digests(spark, data_path, shape.chunk_size)
    expected = leaf_hashes_df(spark, merkle_path)
    return (
        actual.alias("a")
        .join(expected.alias("e"), "chunk_index", "full_outer")
        .where(
            F.col("a.sha256").isNull()
            | F.col("e.sha256").isNull()
            | (F.col("a.sha256") != F.col("e.sha256"))
        )
        .select(
            "chunk_index",
            F.col("a.sha256").alias("actual_sha256"),
            F.col("e.sha256").alias("expected_sha256"),
        )
    )


# --- CLI-surface utilities (README.md merkle subcommands) ------------------

def merkle_summary(path: str) -> dict:
    """``merkle summary``: shape + validity + root digest of a merkle file."""
    shape, nodes, bits = read_merkle_file(path)
    return {
        "chunk_size": shape.chunk_size,
        "total_content_size": shape.total_content_size,
        "total_chunks": shape.total_chunks,
        "cap_leaf": shape.cap_leaf,
        "node_count": shape.node_count,
        "valid_chunks": len(bits),
        "complete": len(bits) == shape.leaf_count,
        "root": nodes[0].hex() if nodes else None,
    }


def merkle_treeview(
    path: str,
    highlight: list[int] | None = None,
    hash_length: int = 16,
    base: int = 0,
) -> str:
    """``merkle treeview`` (commandstream.md §merkle treeview): ASCII render
    of the tree — one line per node, indented by depth, hashes truncated to
    ``hash_length`` hex chars. ``highlight`` marks leaf chunk indices with
    ``*``; ``base`` offsets the printed node numbers (the reference's
    renumbering option). Padding leaves beyond leaf_count are elided."""
    shape, nodes, _ = read_merkle_file(path)
    hl = set(highlight or [])
    lines: list[str] = []

    def walk(i: int, depth: int) -> None:
        is_leaf = i >= shape.offset
        chunk = i - shape.offset if is_leaf else None
        if is_leaf and chunk >= shape.leaf_count:
            return
        mark = "*" if (is_leaf and chunk in hl) else " "
        label = f"leaf {chunk}" if is_leaf else ("root" if i == 0 else "node")
        lines.append(
            f"{mark}{'  ' * depth}[{i + base}] {label}: "
            f"{nodes[i].hex()[:hash_length]}"
        )
        if not is_leaf:
            walk(2 * i + 1, depth + 1)
            walk(2 * i + 2, depth + 1)

    if shape.node_count:
        walk(0, 0)
    return "\n".join(lines)


def merkle_diff(path_a: str, path_b: str) -> list[int]:
    """``merkle diff``: chunk indices whose leaf hashes differ (or that only
    one side has). Shapes must agree on chunk size to be comparable."""
    sa, na, _ = read_merkle_file(path_a)
    sb, nb, _ = read_merkle_file(path_b)
    if sa.chunk_size != sb.chunk_size:
        raise ValueError(
            f"incomparable trees: chunk sizes {sa.chunk_size} vs {sb.chunk_size}"
        )
    out = []
    for i in range(max(sa.leaf_count, sb.leaf_count)):
        ha = na[sa.offset + i] if i < sa.leaf_count else None
        hb = nb[sb.offset + i] if i < sb.leaf_count else None
        if ha != hb:
            out.append(i)
    return out


def merkle_path(path: str, chunk_index: int) -> list[tuple[int, str]]:
    """``merkle path``: (node_index, hash hex) from the chunk's leaf up to
    the root, following parent = (i-1)//2 (merkle_v1.md §1.2)."""
    shape, nodes, _ = read_merkle_file(path)
    if not (0 <= chunk_index < shape.leaf_count):
        raise IndexError(f"chunk {chunk_index} out of range 0..{shape.leaf_count - 1}")
    i = shape.offset + chunk_index
    out = [(i, nodes[i].hex())]
    while i > 0:
        i = (i - 1) // 2
        out.append((i, nodes[i].hex()))
    return out


def spoil_bits(data_path: str, bit_positions: list[int]) -> None:
    """``merkle spoilbits`` fault injection: flip specific BITS of the data
    file in place (bit b of byte b//8, LSB-first)."""
    with open(data_path, "r+b") as f:
        for b in bit_positions:
            f.seek(b // 8)
            (byte,) = f.read(1)
            f.seek(b // 8)
            f.write(bytes([byte ^ (1 << (b % 8))]))


def spoil_chunks(data_path: str, merkle_path_: str, chunk_indices: list[int]) -> None:
    """``merkle spoilchunks``: overwrite whole chunks (per the merkle file's
    chunk size) with a deterministic pattern, for verification testing."""
    shape, _, _ = read_merkle_file(merkle_path_)
    size = os.path.getsize(data_path)
    with open(data_path, "r+b") as f:
        for i in chunk_indices:
            lo = i * shape.chunk_size
            hi = min(lo + shape.chunk_size, size)
            if lo >= size:
                raise IndexError(f"chunk {i} beyond data size {size}")
            f.seek(lo)
            f.write(bytes([0xA5]) * (hi - lo))
