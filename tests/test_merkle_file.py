"""Reference .mref/.mrkl merkle file interop (merkle_v1.md + merklev2/*.java).

Conformance strategy: byte-level fixtures built from the spec's concrete
example (content 100 bytes -> chunkSize 64, 2 chunks, capLeaf 2), geometry
property checks against BaseMerkleShape.java's algorithm, round-trips, the
.mref -> .mrkl consumer workflow, and the spoilbits corruption check.
"""

import hashlib
import os
import struct

import pytest

from nbdatatools_spark.operators.integrity import chunk_digests, merkle_root
from nbdatatools_spark.sources.merkle_file import (
    FOOTER_SIZE,
    MerkleShape,
    build_nodes,
    init_mrkl,
    leaf_hashes_df,
    merkle_file_root,
    optimal_chunk_size,
    read_merkle_file,
    set_chunk_valid,
    verify_against_merkle,
    write_merkle_file,
    write_mref,
)


def test_optimal_chunk_size_spec_cases():
    # BaseMerkleShape.calculateOptimalChunkSize:253-284
    assert optimal_chunk_size(0) == 1 << 20
    assert optimal_chunk_size(100) == 64          # < 1KB
    assert optimal_chunk_size(1023) == 64
    assert optimal_chunk_size(1024) == 1024       # pow2 ladder from 1KB
    assert optimal_chunk_size(1500) == 2048
    assert optimal_chunk_size((1 << 20) - 1) == 1 << 20
    assert optimal_chunk_size(1 << 20) == 1 << 20
    # 4096 * 1MB boundary: above it the chunk size doubles
    assert optimal_chunk_size(4096 << 20) == 1 << 20
    assert optimal_chunk_size((4096 << 20) + 1) == 2 << 20
    # cap at 64MB no matter the size
    assert optimal_chunk_size(1 << 50) == 64 << 20


def test_shape_spec_example():
    # merkle_v1.md §4: content 100 bytes -> 2 chunks of 64, capLeaf 2
    s = MerkleShape.for_content(100)
    assert (s.chunk_size, s.total_chunks, s.cap_leaf) == (64, 2, 2)
    assert (s.node_count, s.offset) == (3, 1)
    assert s.internal_node_count == 1  # nodeCount - leafCount


def test_tree_pow2_root_is_pairwise_sha():
    data = b"x" * 100
    h0 = hashlib.sha256(data[:64]).digest()
    h1 = hashlib.sha256(data[64:]).digest()
    s = MerkleShape.for_content(100)
    nodes = build_nodes(s, [h0, h1])
    assert nodes[0] == hashlib.sha256(h0 + h1).digest()


def test_null_propagation_matches_reference_for_non_pow2():
    # 3 chunks -> capLeaf 4; reference leaves the padded subtree's parent and
    # the root null (MerkleDataImpl.computeInternalNodes:431-434)
    leaves = [hashlib.sha256(bytes([i])).digest() for i in range(3)]
    s = MerkleShape.for_content(3 * 64, chunk_size=64)
    nodes = build_nodes(s, leaves)
    assert nodes[0] is None and nodes[2] is None
    assert nodes[1] == hashlib.sha256(leaves[0] + leaves[1]).digest()
    # dense mode hashes through zero padding instead
    dense = build_nodes(s, leaves, null_propagation=False)
    zero = b"\x00" * 32
    assert dense[2] == hashlib.sha256(leaves[2] + zero).digest()
    assert dense[0] == hashlib.sha256(dense[1] + dense[2]).digest()


def test_mref_write_read_roundtrip(tmp_path, spark):
    data = os.urandom(5000)
    p = tmp_path / "vec.bin"
    p.write_bytes(data)
    mref = str(tmp_path / "vec.bin.mref")
    shape = write_mref(spark, str(p), mref)
    # 5000 bytes < 1MB -> chunk = next pow2 >= 5000 = 8192 -> ONE chunk
    assert (shape.chunk_size, shape.total_chunks) == (8192, 1)
    rs, nodes, bits = read_merkle_file(mref)
    assert rs == shape
    assert bits == {0}
    assert nodes[0] == hashlib.sha256(data).digest()
    assert merkle_file_root(mref) == hashlib.sha256(data).hexdigest()


def test_mref_file_layout_exact(tmp_path, spark):
    # byte-level layout: nodes, bitset (Java BitSet.toByteArray), BE footer
    data = b"q" * 100
    p = tmp_path / "d.bin"
    p.write_bytes(data)
    mref = str(tmp_path / "d.mref")
    write_mref(spark, str(p), mref, chunk_size=64)
    raw = open(mref, "rb").read()
    h0 = hashlib.sha256(data[:64]).digest()
    h1 = hashlib.sha256(data[64:]).digest()
    root = hashlib.sha256(h0 + h1).digest()
    assert raw[:32] == root and raw[32:64] == h0 and raw[64:96] == h1
    assert raw[96:97] == b"\x03"  # bits 0,1 set, LSB-first
    footer = raw[97:]
    assert len(footer) == FOOTER_SIZE
    assert struct.unpack(">qqiiiiiiib", footer) == (64, 100, 2, 2, 2, 3, 1, 1, 1, 45)


def test_mrkl_consumer_workflow(tmp_path, spark):
    data = os.urandom(300)
    p = tmp_path / "d.bin"
    p.write_bytes(data)
    mref = str(tmp_path / "d.mref")
    write_mref(spark, str(p), mref, chunk_size=64)  # 5 chunks
    mrkl = str(tmp_path / "d.mrkl")
    init_mrkl(mref, mrkl)
    shape, nodes_ref, bits = read_merkle_file(mrkl)
    assert bits == set()  # zeroed state
    _, nodes_m, _ = read_merkle_file(mref)
    assert nodes_m == nodes_ref  # hashes copied verbatim
    # verify chunks one by one, flipping bits (download loop)
    for i in range(shape.total_chunks):
        lo = i * shape.chunk_size
        hi = min(lo + shape.chunk_size, len(data))
        assert hashlib.sha256(data[lo:hi]).digest() == nodes_ref[shape.offset + i]
        set_chunk_valid(mrkl, i)
        _, _, bits = read_merkle_file(mrkl)
        assert bits == set(range(i + 1))
    with pytest.raises(IndexError):
        set_chunk_valid(mrkl, shape.total_chunks)


def test_verify_against_merkle_catches_spoilbits(tmp_path, spark):
    data = bytearray(os.urandom(4096))
    p = tmp_path / "d.bin"
    p.write_bytes(bytes(data))
    mref = str(tmp_path / "d.mref")
    write_mref(spark, str(p), mref, chunk_size=1024)
    assert verify_against_merkle(spark, str(p), mref).count() == 0
    data[2500] ^= 0x40  # spoil one bit in chunk 2 (README.md:94-95)
    p.write_bytes(bytes(data))
    bad = verify_against_merkle(spark, str(p), mref).collect()
    assert [r["chunk_index"] for r in bad] == [2]
    # and the leaf table exposes expected hashes for re-download
    assert leaf_hashes_df(spark, mref).count() == 4


def test_merkle_root_matches_mref_for_pow2(tmp_path, spark):
    data = os.urandom(4096)
    p = tmp_path / "d.bin"
    p.write_bytes(data)
    mref = str(tmp_path / "d.mref")
    write_mref(spark, str(p), mref, chunk_size=1024)
    root = merkle_root(chunk_digests(spark, str(p), 1024))
    assert root == merkle_file_root(mref)
