"""Byte-compatibility tests for the slabtastic v1 codec
(sources/slab_binary.py) against the published format spec
(reference design/slabtastic.md:31-150): golden-byte layout, round trips,
sparse holes, namespaces, append mode, structural checks, Spark bridge."""

import os
import struct

import pytest

from nbdatatools_spark.sources.slab_binary import (
    FOOTER_SIZE,
    HEADER_SIZE,
    MAGIC,
    PAGE_TYPE_DATA,
    PAGE_TYPE_PAGES,
    PAGE_TYPE_NAMESPACES,
    PageFooter,
    SlabBinaryReader,
    SlabBinaryWriter,
    SlabFormatError,
    decode_page,
    encode_page,
    read_slab_binary,
    write_slab_binary,
)


def _write(path, rows, **kw):
    with SlabBinaryWriter(str(path), **kw) as w:
        for row in rows:
            if len(row) == 3:
                ns, o, d = row
                w.write(o, d, ns)
            else:
                o, d = row
                w.write(o, d)
    return str(path)


# ---------------------------------------------------------------------------
# Golden bytes: the exact v1 layout from the spec, field by field
# ---------------------------------------------------------------------------


def test_golden_single_record_file(tmp_path):
    path = _write(tmp_path / "one.slab", [(0, b"hello")])
    raw = open(path, "rb").read()
    # exactly two 512-byte pages: one data page + the trailing pages page
    assert len(raw) == 1024

    # data page header: magic 'SLAB', page size 512 LE
    assert raw[0:4] == MAGIC
    assert struct.unpack("<I", raw[4:8])[0] == 512
    # record packed right after the 8-byte header
    assert raw[8:13] == b"hello"
    # fence-post offsets (N+1 = 2 entries) immediately before the footer
    offsets_start = 512 - FOOTER_SIZE - 2 * 4
    assert struct.unpack("<2i", raw[offsets_start:offsets_start + 8]) == (8, 13)
    # footer: [ordinal:5][count:3][page_size:4][type:1][ns:1][footer_len:2]
    f = raw[512 - FOOTER_SIZE:512]
    assert int.from_bytes(f[0:5], "little", signed=True) == 0
    assert int.from_bytes(f[5:8], "little") == 1
    assert struct.unpack("<iBBH", f[8:16]) == (512, PAGE_TYPE_DATA, 1, 16)

    # pages page: one [start_ordinal:8][offset:8] record pointing at offset 0
    assert raw[512:516] == MAGIC
    assert struct.unpack("<qq", raw[520:536]) == (0, 0)
    pf = PageFooter.decode(raw[1024 - FOOTER_SIZE:])
    assert pf.page_type == PAGE_TYPE_PAGES
    assert pf.record_count == 1
    assert pf.namespace_index == 1


def test_page_codec_roundtrip_and_padding():
    recs = [b"a" * 100, b"", b"b" * 313]
    page = encode_page(7, PAGE_TYPE_DATA, recs, 1)
    assert len(page) % 512 == 0
    footer, out = decode_page(page, 0)
    assert out == recs
    assert footer.start_ordinal == 7
    assert footer.record_count == 3


def test_five_byte_signed_ordinal_codec():
    for ordinal in (-(1 << 39), -1, 0, 1, (1 << 39) - 1):
        f = PageFooter(ordinal, 0, 512, PAGE_TYPE_DATA, 1)
        assert PageFooter.decode(f.encode()).start_ordinal == ordinal
    with pytest.raises(SlabFormatError):
        PageFooter(1 << 39, 0, 512, PAGE_TYPE_DATA, 1).encode()


# ---------------------------------------------------------------------------
# Writer/reader semantics
# ---------------------------------------------------------------------------


def test_multi_page_roundtrip(tmp_path):
    rows = [(i, bytes([i % 251]) * (17 * (i % 13) + 1)) for i in range(500)]
    path = _write(tmp_path / "multi.slab", rows, preferred_page_size=512)
    with SlabBinaryReader(path) as r:
        assert r.namespaces() == [""]
        assert len(r.page_entries()) > 1  # small pages force many
        assert r.count() == 500
        assert [(o, d) for _, o, d in r.iter_records()] == rows
        assert r.get(317) == rows[317][1]
        assert r.last_ordinal() == 499


def test_sparse_holes_signal_missing(tmp_path):
    path = _write(tmp_path / "sparse.slab", [(i, b"x%d" % i) for i in [0, 1, 2, 10, 11]])
    with SlabBinaryReader(path) as r:
        # the gap starts a new page; ordinals in the hole are NOT present
        assert len(r.page_entries()) == 2
        assert r.get(10) == b"x10"
        with pytest.raises(KeyError):
            r.get(7)
        assert r.get(7, default=None) is None  # explicit default only


def test_strictly_ascending_enforced(tmp_path):
    with SlabBinaryWriter(str(tmp_path / "asc.slab")) as w:
        w.write(5, b"a")
        with pytest.raises(ValueError, match="not strictly ascending"):
            w.write(5, b"b")
        with pytest.raises(ValueError, match="not strictly ascending"):
            w.write(4, b"c")
        w.write(6, b"d")


def test_namespaces_page_layout(tmp_path):
    rows = [("", 0, b"default0"), ("aux", 0, b"aux0"), ("aux", 1, b"aux1")]
    path = _write(tmp_path / "ns.slab", rows)
    raw = open(path, "rb").read()
    pf = PageFooter.decode(raw[len(raw) - FOOTER_SIZE:])
    assert pf.page_type == PAGE_TYPE_NAMESPACES
    with SlabBinaryReader(path) as r:
        assert sorted(r.namespaces()) == ["", "aux"]
        assert r.namespace_index("") == 1  # index 1 is always ""
        assert r.namespace_index("aux") == 2
        assert r.get(0) == b"default0"
        assert r.get(1, "aux") == b"aux1"


def test_default_namespace_reserved_when_named_first(tmp_path):
    path = _write(tmp_path / "named.slab", [("aux", 0, b"v")])
    with SlabBinaryReader(path) as r:
        # "" is pre-reserved at index 1 even though only "aux" has data
        assert r.namespace_index("") == 1
        assert r.namespace_index("aux") == 2
        assert r.count("aux") == 1
        assert r.count("") == 0


def test_append_mode(tmp_path):
    path = _write(tmp_path / "app.slab", [(i, b"r%d" % i) for i in range(10)])
    with SlabBinaryWriter.open_for_append(path) as w:
        with pytest.raises(ValueError, match="not strictly ascending"):
            w.write(9, b"dup")
        for i in range(10, 20):
            w.write(i, b"r%d" % i)
    with SlabBinaryReader(path) as r:
        assert r.count() == 20
        assert r.get(3) == b"r3"
        assert r.get(19) == b"r19"
        r.check()


def test_buffer_staged_create(tmp_path):
    target = str(tmp_path / "staged.slab")
    w = SlabBinaryWriter.create_with_buffer(target)
    w.write(0, b"x")
    assert not os.path.exists(target)  # only .slab.buffer exists mid-write
    assert os.path.exists(target + ".buffer")
    w.close()
    assert os.path.exists(target)
    assert not os.path.exists(target + ".buffer")


def test_check_and_analyze(tmp_path):
    path = _write(tmp_path / "chk.slab", [(i, b"z" * i) for i in range(100)],
                  preferred_page_size=1024)
    with SlabBinaryReader(path) as r:
        stats = r.check()
        assert stats["records"] == 100
        a = r.analyze()
        assert a["records"] == 100
        assert a["ordinals_contiguous"] is True
        assert a["record_bytes"]["max"] == 99
        assert 0 < a["page_utilization"]["max"] <= 1


def test_corruption_detected_with_offset(tmp_path):
    path = _write(tmp_path / "bad.slab", [(0, b"ok")])
    raw = bytearray(open(path, "rb").read())
    raw[0:4] = b"XXXX"  # clobber the data page magic
    open(path, "wb").write(bytes(raw))
    r = SlabBinaryReader(path)  # index itself still parses
    with pytest.raises(SlabFormatError, match="offset 0"):
        r.check()
    r.close()


def test_truncated_file_rejected(tmp_path):
    path = tmp_path / "tiny.slab"
    path.write_bytes(b"SLAB" + b"\x00" * 100)
    with pytest.raises(SlabFormatError):
        SlabBinaryReader(str(path))


# ---------------------------------------------------------------------------
# Spark bridge
# ---------------------------------------------------------------------------


def test_spark_read_slab_binary(spark, tmp_path):
    rows = [("", i, b"payload-%d" % i) for i in range(200)] + [
        ("aux", i, b"aux-%d" % i) for i in range(50)
    ]
    path = _write(tmp_path / "spark.slab", rows, preferred_page_size=512)
    df = read_slab_binary(spark, path)
    got = sorted(
        (r["namespace"], r["ordinal"], bytes(r["data"])) for r in df.collect()
    )
    assert got == sorted(rows)


def test_spark_write_then_native_read(spark, tmp_path):
    rows = [("", i, bytes([i])) for i in range(64)]
    df = spark.createDataFrame(
        [(ns, o, bytearray(d)) for ns, o, d in rows],
        "namespace string, ordinal bigint, data binary",
    )
    target = str(tmp_path / "out.slab")
    n = write_slab_binary(df, target)
    assert n == 64
    with SlabBinaryReader(target) as r:
        assert [(o, d) for _, o, d in r.iter_records()] == [(o, d) for _, o, d in rows]


def test_slab_cli_tour(spark, tmp_path, capsys):
    """slab import/get/namespaces/check/analyze/append/export/rewrite via
    python -m nbdatatools_spark, mirroring cli/CMD_slab_*.java."""
    import json

    from nbdatatools_spark.__main__ import main

    src = tmp_path / "lines.txt"
    src.write_text("alpha\nbeta\ngamma\n")
    slab = str(tmp_path / "tour.slab")

    assert main(["slab", "import", slab, "--from", str(src)]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["records_written"] == 3

    assert main(["slab", "get", slab, "-o", "0,2"]) == 0
    assert capsys.readouterr().out.splitlines() == ["alpha", "gamma"]
    assert main(["slab", "get", slab, "-o", "1", "--as-hex"]) == 0
    assert capsys.readouterr().out.strip() == "62 65 74 61"

    assert main(["slab", "namespaces", slab]) == 0
    ns = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert ns["namespace"] == "" and ns["records"] == 3 and ns["index"] == 1

    assert main(["slab", "check", slab]) == 0
    assert json.loads(capsys.readouterr().out.strip())["records"] == 3
    assert main(["slab", "analyze", slab]) == 0
    assert json.loads(capsys.readouterr().out.strip())["ordinals_contiguous"] is True

    # append continues after the last ordinal (auto-detected start)
    more = tmp_path / "more.txt"
    more.write_text("delta\n")
    assert main(["slab", "append", slab, "--from", str(more)]) == 0
    capsys.readouterr()
    assert main(["slab", "get", slab, "-o", "3"]) == 0
    assert capsys.readouterr().out.strip() == "delta"

    # export to parquet and lines; ranges
    pq = str(tmp_path / "exp.parquet")
    assert main(["slab", "export", slab, "--to", pq, "--format", "parquet"]) == 0
    got = {
        (r["ordinal"], bytes(r["data"]))
        for r in spark.read.parquet(pq).collect()
    }
    assert got == {(0, b"alpha"), (1, b"beta"), (2, b"gamma"), (3, b"delta")}
    out_lines = str(tmp_path / "exp.txt")
    assert main(["slab", "export", slab, "--to", out_lines, "--format", "lines",
                 "--range", "1..2"]) == 0
    assert open(out_lines, "rb").read() == b"beta\ngamma\n"

    # rewrite in place compacts and preserves content
    assert main(["slab", "rewrite", slab]) == 0
    capsys.readouterr()
    assert main(["slab", "get", slab, "-o", "0..3"]) == 0
    assert capsys.readouterr().out.splitlines() == ["alpha", "beta", "gamma", "delta"]

    # corrupt -> check exits 1 with an offset-bearing error
    raw = bytearray(open(slab, "rb").read())
    raw[0:4] = b"XXXX"
    open(slab, "wb").write(bytes(raw))
    assert main(["slab", "check", slab]) == 1
    assert "offset" in json.loads(capsys.readouterr().out.strip())["error"]


def test_slab_registered_datasource(spark, tmp_path):
    """spark.read.format('slab') / df.write.format('slab') — the X1
    registered-source surface, parity with read_slab_binary and the
    sharded-egress commit protocol (MANIFEST only on success)."""
    from nbdatatools_spark.sources.slab_binary import register_slab_source

    register_slab_source(spark)
    rows = [("", i, b"r%d" % i) for i in range(300)] + [
        ("aux", i, b"a%d" % i) for i in range(40)
    ]
    path = _write(tmp_path / "ds.slab", rows, preferred_page_size=1024)

    df = spark.read.format("slab").load(path)
    got = sorted((r["namespace"], r["ordinal"], bytes(r["data"])) for r in df.collect())
    assert got == sorted(rows)
    # namespace option prunes pages at planning time
    aux = spark.read.format("slab").option("namespace", "aux").load(path)
    assert aux.count() == 40

    # sharded write: ascending ordinals within each partition
    out_dir = str(tmp_path / "shards")
    (
        df.repartition(3, "namespace")
        .sortWithinPartitions("namespace", "ordinal")
        .write.format("slab")
        .mode("overwrite")
        .save(out_dir)
    )
    import json as _json

    manifest = _json.load(open(os.path.join(out_dir, "MANIFEST.json")))
    assert manifest["rows"] == 340
    back = []
    for shard, _n in manifest["shards"]:
        with SlabBinaryReader(os.path.join(out_dir, shard)) as r:
            back.extend(r.iter_records())
    assert sorted(back) == sorted(rows)


def test_slab_binary_to_parquet_store_bridge(spark, tmp_path):
    """.slab -> Parquet SlabStore -> .slab: the interop path a reference
    user takes to move existing artifacts onto the engine's at-scale
    layout, and back."""
    from nbdatatools_spark.sources.slab import SlabStore

    rows = [("", i, b"doc-%d" % i) for i in range(100)]
    src = _write(tmp_path / "src.slab", rows)
    store = SlabStore.create(
        spark, str(tmp_path / "store"), read_slab_binary(spark, src)
    )
    assert store.count() == 100
    back = str(tmp_path / "back.slab")
    write_slab_binary(store.df(), back)
    with SlabBinaryReader(back) as r:
        assert [(o, d) for _, o, d in r.iter_records()] == [(o, d) for _, o, d in rows]
