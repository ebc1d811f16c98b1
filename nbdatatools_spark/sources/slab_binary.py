"""Byte-compatible slabtastic (.slab) v1 codec + Spark bridge (SURVEY §2.1
S7/S8 interop; VERDICT r4 Missing #2).

The engine's at-scale slab semantics live on Parquet (``sources/slab.py``
``SlabStore``); THIS module is the binary interop layer so a user holding
real ``.slab`` artifacts from the reference toolchain can ingest them, and
can egress Spark frames back into the reference's format. Implemented from
the public format spec
(``datatools-io-slabtastic/design/slabtastic.md:31-150``) and verified
against the codec semantics of ``SlabPage.java``/``PageFooter.java``/
``SlabWriter.java:310-530``/``SlabReader.java:58,246-344``.

Format summary (all little-endian):

- page  = ``[magic 'SLAB'][page_size:4][records...][pad][offsets:(N+1)*4][footer:16]``
- footer = ``[start_ordinal:5 signed][record_count:3 unsigned][page_size:4]
  [page_type:1][namespace_index:1][footer_length:2]``
- record offsets are fence-post uint32s from page start (first is 8);
- pages are padded to a multiple of 512 bytes; max page size 2^32;
- page types: 1 = pages page (index), 2 = data page, 3 = namespaces page;
- the LAST page of the file is the authoritative index: a pages page
  (single-namespace) whose 16-byte records are ``[start_ordinal:8][file_offset:8]``
  sorted by ordinal, or a namespaces page whose records are
  ``[ns_index:1][name_len:1][name utf-8][pages_page_offset:8]``;
- ordinals are strictly ascending and contiguous within a page; ordinal
  gaps start a new page (coarse sparseness); pages not referenced by the
  authoritative index are logically deleted.

Scale posture: a .slab file is a single local artifact (reference scope).
The Spark reader parallelizes per data page — the page index is tiny
driver-side metadata (the same shape as Parquet's row-group planning) and
each task decodes only its own page byte-ranges, so ingest scales with page
count. Egress streams ``toLocalIterator`` through one writer because the
format itself is inherently single-file sequential (ordinal-contiguous
pages + one trailing index); for distributed storage use the Parquet
``SlabStore`` and convert at the edge.
"""

from __future__ import annotations

import io
import os
import struct
from dataclasses import dataclass, field

MAGIC = b"SLAB"
HEADER_SIZE = 8
FOOTER_SIZE = 16
PAGE_ALIGNMENT = 512
OFFSET_ENTRY_SIZE = 4
PAGES_PAGE_RECORD_SIZE = 16
PAGE_TYPE_INVALID = 0
PAGE_TYPE_PAGES = 1
PAGE_TYPE_DATA = 2
PAGE_TYPE_NAMESPACES = 3
NAMESPACE_DEFAULT = 1
MAX_ORDINAL = (1 << 39) - 1
MIN_ORDINAL = -(1 << 39)
MAX_RECORD_COUNT = (1 << 24) - 1
MAX_PAGE_SIZE = 0xFFFFFFFF
NAMESPACE_MAX_NAME_LENGTH = 128

_MISSING = object()


class SlabFormatError(ValueError):
    """Structural slab-file error; messages carry offsets/ordinals per the
    CLI error-template requirement (design doc: 'Error: invalid page type:
    2 is wholly unhelpful by itself')."""


def _round_up(value: int, alignment: int) -> int:
    return ((value + alignment - 1) // alignment) * alignment


@dataclass(frozen=True)
class PageFooter:
    start_ordinal: int
    record_count: int
    page_size: int
    page_type: int
    namespace_index: int
    footer_length: int = FOOTER_SIZE

    def encode(self) -> bytes:
        if not MIN_ORDINAL <= self.start_ordinal <= MAX_ORDINAL:
            raise SlabFormatError(
                f"ordinal {self.start_ordinal} outside 5-byte signed range "
                f"[{MIN_ORDINAL}, {MAX_ORDINAL}]"
            )
        if not 0 <= self.record_count <= MAX_RECORD_COUNT:
            raise SlabFormatError(
                f"record count {self.record_count} outside 3-byte unsigned range"
            )
        ord5 = (self.start_ordinal & ((1 << 40) - 1)).to_bytes(5, "little")
        return (
            ord5
            + self.record_count.to_bytes(3, "little")
            + struct.pack("<IBBH", self.page_size, self.page_type,
                          self.namespace_index, self.footer_length)
        )

    @classmethod
    def decode(cls, raw: bytes) -> "PageFooter":
        if len(raw) != FOOTER_SIZE:
            raise SlabFormatError(f"footer must be {FOOTER_SIZE} bytes, got {len(raw)}")
        ordinal = int.from_bytes(raw[0:5], "little", signed=True)
        record_count = int.from_bytes(raw[5:8], "little")
        page_size, page_type, ns_index, footer_len = struct.unpack("<IBBH", raw[8:16])
        return cls(ordinal, record_count, page_size, page_type,
                   ns_index, footer_len)

    def validate(self, offset: int = -1) -> None:
        where = f" (page at file offset {offset})" if offset >= 0 else ""
        if self.page_type not in (PAGE_TYPE_PAGES, PAGE_TYPE_DATA, PAGE_TYPE_NAMESPACES):
            raise SlabFormatError(
                f"invalid page type {self.page_type}{where}; expected 1 (pages page), "
                f"2 (data page) or 3 (namespaces page)"
            )
        if self.namespace_index == 0:
            raise SlabFormatError(f"invalid namespace index 0{where}")
        if self.footer_length < FOOTER_SIZE or self.footer_length % FOOTER_SIZE:
            raise SlabFormatError(
                f"footer length {self.footer_length}{where} must be >= 16 and a "
                f"multiple of 16"
            )
        if self.page_size < PAGE_ALIGNMENT or self.page_size % PAGE_ALIGNMENT:
            raise SlabFormatError(
                f"page size {self.page_size}{where} must be >= 512 and a multiple of 512"
            )


def encode_page(start_ordinal: int, page_type: int, records: list[bytes],
                namespace_index: int = NAMESPACE_DEFAULT) -> bytes:
    """Serialize one page exactly as ``SlabPage.toByteBuffer``: header,
    packed records, zero-fill gap, fence-post offsets, 16-byte footer;
    total padded to a 512 multiple."""
    total = sum(len(r) for r in records)
    min_size = HEADER_SIZE + total + (len(records) + 1) * OFFSET_ENTRY_SIZE + FOOTER_SIZE
    page_size = _round_up(min_size, PAGE_ALIGNMENT)
    if page_size > MAX_PAGE_SIZE:
        raise SlabFormatError(
            f"page size {page_size} exceeds max {MAX_PAGE_SIZE} "
            f"(start ordinal {start_ordinal}, {len(records)} records)"
        )
    buf = bytearray(page_size)
    buf[0:4] = MAGIC
    struct.pack_into("<I", buf, 4, page_size)
    pos = HEADER_SIZE
    offsets = [HEADER_SIZE]
    for rec in records:
        buf[pos:pos + len(rec)] = rec
        pos += len(rec)
        offsets.append(pos)
    offsets_start = page_size - FOOTER_SIZE - len(offsets) * OFFSET_ENTRY_SIZE
    for i, off in enumerate(offsets):
        struct.pack_into("<I", buf, offsets_start + i * OFFSET_ENTRY_SIZE, off)
    footer = PageFooter(start_ordinal, len(records), page_size, page_type,
                        namespace_index)
    buf[page_size - FOOTER_SIZE:] = footer.encode()
    return bytes(buf)


def decode_page(raw: bytes, file_offset: int = -1):
    """Parse one page -> (footer, records list). Mirrors ``SlabPage.parseFrom``
    with the header/footer agreement checks of ``slab check``."""
    if len(raw) < PAGE_ALIGNMENT:
        raise SlabFormatError(
            f"page at file offset {file_offset} truncated: {len(raw)} bytes < 512"
        )
    if raw[0:4] != MAGIC:
        raise SlabFormatError(
            f"bad page magic {raw[0:4]!r} at file offset {file_offset}; expected b'SLAB'"
        )
    (header_size,) = struct.unpack_from("<I", raw, 4)
    footer = PageFooter.decode(raw[len(raw) - FOOTER_SIZE:]) if len(raw) == header_size \
        else PageFooter.decode(raw[header_size - FOOTER_SIZE:header_size])
    footer.validate(file_offset)
    if header_size != footer.page_size:
        raise SlabFormatError(
            f"header page size {header_size} != footer page size {footer.page_size} "
            f"at file offset {file_offset}"
        )
    n = footer.record_count
    offsets_start = footer.page_size - footer.footer_length - (n + 1) * OFFSET_ENTRY_SIZE
    if offsets_start < HEADER_SIZE:
        raise SlabFormatError(
            f"offset array start {offsets_start} underruns header at file offset "
            f"{file_offset} ({n} records)"
        )
    offsets = struct.unpack_from(f"<{n + 1}I", raw, offsets_start)
    records = []
    for i in range(n):
        lo, hi = offsets[i], offsets[i + 1]
        if not HEADER_SIZE <= lo <= hi <= offsets_start:
            raise SlabFormatError(
                f"record {i} offsets [{lo}, {hi}) out of bounds at file offset "
                f"{file_offset}"
            )
        records.append(bytes(raw[lo:hi]))
    return footer, records


# ---------------------------------------------------------------------------
# Writer (SlabWriter.java semantics: per-namespace pages, gap/overflow flush,
# trailing pages page(s) + namespaces page, .buffer staged naming)
# ---------------------------------------------------------------------------


@dataclass
class _NsState:
    name: str
    index: int
    records: list = field(default_factory=list)
    record_bytes: int = 0
    start_ordinal: int = 0
    next_expected: int = 0
    last_written: int = 0
    has_written: bool = False
    page_index: list = field(default_factory=list)  # (start_ordinal, file_offset)


class SlabBinaryWriter:
    """Streaming .slab writer. Ordinals must be strictly ascending within a
    namespace; gaps start a new page; records that would overflow the
    preferred page size flush first. ``close()`` writes the authoritative
    index page(s). Use ``create_with_buffer`` for the spec's
    ``.slab.buffer`` -> atomic-rename discipline."""

    def __init__(self, path: str, preferred_page_size: int = 65536,
                 min_page_size: int = 512, page_alignment: bool = False,
                 _target_path: str | None = None, _append_from=None):
        if min_page_size < PAGE_ALIGNMENT:
            raise ValueError(f"min page size {min_page_size} < 512")
        self.path = path
        self._target = _target_path
        self.preferred_page_size = preferred_page_size
        self.min_page_size = min_page_size
        self.page_alignment = page_alignment
        self._ns: dict[str, _NsState] = {}
        self._next_index = NAMESPACE_DEFAULT
        self._closed = False
        if _append_from is not None:
            self._fh = open(path, "r+b")
            self._fh.seek(0, io.SEEK_END)
            self._pos = self._fh.tell()
            for name, index, entries, last in _append_from:
                st = _NsState(name, index)
                st.page_index = list(entries)
                if entries:
                    st.has_written = True
                    st.last_written = last
                    st.next_expected = last + 1
                self._ns[name] = st
                self._next_index = max(self._next_index, index + 1)
        else:
            self._fh = open(path, "wb")
            self._pos = 0

    @classmethod
    def create_with_buffer(cls, target: str, **kw) -> "SlabBinaryWriter":
        return cls(target + ".buffer", _target_path=target, **kw)

    @classmethod
    def open_for_append(cls, path: str, **kw) -> "SlabBinaryWriter":
        reader = SlabBinaryReader(path)
        try:
            states = []
            for name in reader.namespaces():
                entries = reader.page_entries(name)
                last = reader.last_ordinal(name)
                states.append((name, reader.namespace_index(name), entries, last))
        finally:
            reader.close()
        return cls(path, _append_from=states, **kw)

    def _alignment(self) -> int:
        return self.min_page_size if self.page_alignment else PAGE_ALIGNMENT

    def _ensure_ns(self, name: str) -> _NsState:
        st = self._ns.get(name)
        if st is not None:
            return st
        if len(name.encode()) > NAMESPACE_MAX_NAME_LENGTH:
            raise ValueError(f"namespace name longer than {NAMESPACE_MAX_NAME_LENGTH} bytes")
        # index 1 is always reserved for the default namespace ""
        if name and self._next_index == NAMESPACE_DEFAULT and "" not in self._ns:
            self._ns[""] = _NsState("", self._next_index)
            self._next_index += 1
        st = _NsState(name, self._next_index)
        self._next_index += 1
        self._ns[name] = st
        return st

    def write(self, ordinal: int, data: bytes, namespace: str = "") -> None:
        if self._closed:
            raise ValueError("writer is closed")
        if not MIN_ORDINAL <= ordinal <= MAX_ORDINAL:
            raise ValueError(
                f"ordinal {ordinal} outside 5-byte signed range [{MIN_ORDINAL}, {MAX_ORDINAL}]"
            )
        st = self._ensure_ns(namespace)
        if st.has_written and ordinal <= st.last_written:
            raise ValueError(
                f"ordinal {ordinal} not strictly ascending in namespace "
                f"{namespace!r} (last written: {st.last_written})"
            )
        if st.records and ordinal != st.next_expected:
            self._flush(st)  # ordinal gap -> new page (coarse sparseness)
        if not st.records:
            st.start_ordinal = ordinal
        need = (HEADER_SIZE + st.record_bytes + len(data)
                + (len(st.records) + 2) * OFFSET_ENTRY_SIZE + FOOTER_SIZE)
        if st.records and _round_up(need, self._alignment()) > self.preferred_page_size:
            self._flush(st)
            st.start_ordinal = ordinal
        st.records.append(bytes(data))
        st.record_bytes += len(data)
        st.next_expected = ordinal + 1
        st.last_written = ordinal
        st.has_written = True

    def _emit(self, page: bytes) -> int:
        off = self._pos
        self._fh.seek(self._pos)
        self._fh.write(page)
        self._pos += len(page)
        return off

    def _flush(self, st: _NsState) -> None:
        page = encode_page(st.start_ordinal, PAGE_TYPE_DATA, st.records, st.index)
        st.page_index.append((st.start_ordinal, self._emit(page)))
        st.records = []
        st.record_bytes = 0

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        try:
            for st in self._ns.values():
                if st.records:
                    self._flush(st)
            multi = len(self._ns) > 1 or (len(self._ns) == 1 and "" not in self._ns)
            if multi:
                self._ensure_ns("")
                ns_entries = []
                for st in self._ns.values():
                    recs = [
                        struct.pack("<qq", so, off) for so, off in st.page_index
                    ]
                    off = self._emit(encode_page(0, PAGE_TYPE_PAGES, recs, st.index))
                    ns_entries.append((st.index, st.name, off))
                recs = []
                for idx, name, off in ns_entries:
                    nb = name.encode()
                    recs.append(bytes([idx, len(nb)]) + nb + struct.pack("<q", off))
                self._emit(encode_page(0, PAGE_TYPE_NAMESPACES, recs, NAMESPACE_DEFAULT))
            else:
                st = self._ns.get("") or self._ensure_ns("")
                recs = [struct.pack("<qq", so, off) for so, off in st.page_index]
                self._emit(encode_page(0, PAGE_TYPE_PAGES, recs, st.index))
            self._fh.flush()
            os.fsync(self._fh.fileno())
        finally:
            self._fh.close()
        if self._target is not None:
            os.replace(self.path, self._target)
            self.path = self._target

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.close()
        else:
            self._closed = True
            self._fh.close()


# ---------------------------------------------------------------------------
# Reader (SlabReader.java semantics: trailing-index entry point, binary
# search by ordinal, explicit missing-ordinal signalling for sparse files)
# ---------------------------------------------------------------------------


class SlabBinaryReader:
    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "rb")
        self._size = os.fstat(self._fh.fileno()).st_size
        if self._size < PAGE_ALIGNMENT:
            raise SlabFormatError(f"{path}: {self._size} bytes is smaller than one page")
        tail = self._read_at(self._size - FOOTER_SIZE, FOOTER_SIZE)
        footer = PageFooter.decode(tail)
        footer.validate(self._size - footer.page_size)
        last_off = self._size - footer.page_size
        footer, records = decode_page(self._read_at(last_off, footer.page_size), last_off)
        # name -> (ns_index, sorted [(start_ordinal, offset)])
        self._index: dict[str, tuple[int, list[tuple[int, int]]]] = {}
        if footer.page_type == PAGE_TYPE_PAGES:
            self._index[""] = (footer.namespace_index, self._pp_entries(records))
        elif footer.page_type == PAGE_TYPE_NAMESPACES:
            for rec in records:
                idx, name_len = rec[0], rec[1]
                name = rec[2:2 + name_len].decode()
                (pp_off,) = struct.unpack_from("<q", rec, 2 + name_len)
                pf, precs = self._load_page(pp_off)
                if pf.page_type != PAGE_TYPE_PAGES:
                    raise SlabFormatError(
                        f"namespace {name!r} points at page type {pf.page_type} at "
                        f"file offset {pp_off}; expected 1 (pages page)"
                    )
                self._index[name] = (idx, self._pp_entries(precs))
        else:
            raise SlabFormatError(
                f"{path} does not end in a pages page or namespaces page "
                f"(trailing page type {footer.page_type} at offset {last_off})"
            )

    @staticmethod
    def _pp_entries(records: list[bytes]) -> list[tuple[int, int]]:
        entries = []
        for rec in records:
            if len(rec) != PAGES_PAGE_RECORD_SIZE:
                raise SlabFormatError(
                    f"pages-page record is {len(rec)} bytes; expected 16"
                )
            entries.append(struct.unpack("<qq", rec))
        return sorted(entries)

    def _read_at(self, offset: int, n: int) -> bytes:
        self._fh.seek(offset)
        raw = self._fh.read(n)
        if len(raw) != n:
            raise SlabFormatError(
                f"short read at file offset {offset}: wanted {n}, got {len(raw)}"
            )
        return raw

    def _load_page(self, offset: int):
        head = self._read_at(offset, HEADER_SIZE)
        if head[0:4] != MAGIC:
            raise SlabFormatError(
                f"bad page magic {head[0:4]!r} at file offset {offset}"
            )
        (page_size,) = struct.unpack("<I", head[4:8])
        return decode_page(self._read_at(offset, page_size), offset)

    # -- public API ---------------------------------------------------------
    def namespaces(self) -> list[str]:
        return list(self._index)

    def namespace_index(self, namespace: str = "") -> int:
        return self._resolve(namespace)[0]

    def page_entries(self, namespace: str = "") -> list[tuple[int, int]]:
        return list(self._resolve(namespace)[1])

    def _resolve(self, namespace: str):
        try:
            return self._index[namespace]
        except KeyError:
            raise KeyError(
                f"namespace {namespace!r} not in {self.path} "
                f"(available: {sorted(self._index)})"
            ) from None

    def get(self, ordinal: int, namespace: str = "", default=_MISSING) -> bytes:
        """Point lookup: O(log n_pages) binary search + one page read. A
        missing ordinal (sparse hole) raises KeyError unless an explicit
        ``default`` is supplied — per the spec, silently returning an empty
        buffer is not acceptable."""
        import bisect

        _, entries = self._resolve(namespace)
        i = bisect.bisect_right(entries, (ordinal, float("inf"))) - 1
        if i >= 0:
            start, off = entries[i]
            footer, records = self._load_page(off)
            if start <= ordinal < start + footer.record_count:
                return records[ordinal - start]
        if default is not _MISSING:
            return default
        raise KeyError(
            f"ordinal {ordinal} not present in namespace {namespace!r} of {self.path}"
        )

    def last_ordinal(self, namespace: str = "") -> int:
        _, entries = self._resolve(namespace)
        if not entries:
            return -1
        start, off = entries[-1]
        footer, _ = self._load_page(off)
        return start + footer.record_count - 1

    def iter_records(self, namespace: str | None = None):
        """Yield (namespace, ordinal, data) in index order."""
        names = [namespace] if namespace is not None else self.namespaces()
        for name in names:
            for start, off in self._resolve(name)[1]:
                footer, records = self._load_page(off)
                for i, rec in enumerate(records):
                    yield name, start + i, rec

    def count(self, namespace: str | None = None) -> int:
        total = 0
        names = [namespace] if namespace is not None else self.namespaces()
        for name in names:
            for _, off in self._resolve(name)[1]:
                footer, _ = self._load_page(off)
                total += footer.record_count
        return total

    def check(self) -> dict:
        """Index-driven structural validation pass (CMD_slab_check pass 1):
        magic, type, footer geometry, header/footer size agreement, offset
        bounds, per-namespace ordinal monotonicity. Raises SlabFormatError
        with offsets on the first inconsistency; returns summary stats."""
        pages = 0
        records = 0
        for name in self.namespaces():
            prev_end = None
            for start, off in self._resolve(name)[1]:
                footer, recs = self._load_page(off)  # validates structure
                if footer.page_type != PAGE_TYPE_DATA:
                    raise SlabFormatError(
                        f"index of namespace {name!r} references page type "
                        f"{footer.page_type} at file offset {off}; expected 2 (data)"
                    )
                if footer.start_ordinal != start:
                    raise SlabFormatError(
                        f"pages-page ordinal {start} != footer ordinal "
                        f"{footer.start_ordinal} at file offset {off}"
                    )
                if prev_end is not None and start < prev_end:
                    raise SlabFormatError(
                        f"page at file offset {off} starts at ordinal {start}, "
                        f"overlapping previous page end {prev_end} in namespace {name!r}"
                    )
                prev_end = start + footer.record_count
                pages += 1
                records += footer.record_count
        return {"namespaces": len(self._index), "pages": pages, "records": records,
                "file_bytes": self._size}

    def analyze(self) -> dict:
        """Layout stats (CMD_slab_analyze): record/page size min/avg/max,
        utilization, ordinal monotonicity per namespace."""
        rec_sizes: list[int] = []
        page_sizes: list[int] = []
        util: list[float] = []
        monotonic = True
        for name in self.namespaces():
            prev_end = None
            for start, off in self._resolve(name)[1]:
                footer, recs = self._load_page(off)
                page_sizes.append(footer.page_size)
                used = HEADER_SIZE + sum(len(r) for r in recs) \
                    + (len(recs) + 1) * OFFSET_ENTRY_SIZE + FOOTER_SIZE
                util.append(used / footer.page_size)
                rec_sizes.extend(len(r) for r in recs)
                if prev_end is not None and start != prev_end:
                    monotonic = False
                prev_end = start + footer.record_count

        def _stats(xs):
            return (
                {"min": min(xs), "avg": sum(xs) / len(xs), "max": max(xs)}
                if xs else {"min": 0, "avg": 0, "max": 0}
            )

        return {
            "namespaces": self.namespaces(),
            "records": len(rec_sizes),
            "record_bytes": _stats(rec_sizes),
            "page_bytes": _stats(page_sizes),
            "page_utilization": _stats(util),
            "ordinals_contiguous": monotonic,
        }

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Spark bridge
# ---------------------------------------------------------------------------

SLAB_BINARY_SCHEMA = "namespace string, ordinal bigint, data binary"


def read_slab_binary(spark, path: str):
    """.slab file -> DataFrame(namespace, ordinal, data), one task per data
    page: the driver reads only the trailing index (page count × 16 bytes —
    the Parquet-footer planning shape), executors decode their own page
    ranges. Ingest therefore parallelizes across pages exactly like row
    groups."""
    reader = SlabBinaryReader(path)
    try:
        parts = []
        for name in reader.namespaces():
            parts.extend((name, off) for _, off in reader.page_entries(name))
    finally:
        reader.close()
    if not parts:
        return spark.createDataFrame([], SLAB_BINARY_SCHEMA)

    sc = spark.sparkContext
    n_slices = min(len(parts), sc.defaultParallelism)

    def _decode(iterator):
        fh = open(path, "rb")
        try:
            for name, off in iterator:
                fh.seek(off)
                head = fh.read(HEADER_SIZE)
                (page_size,) = struct.unpack("<I", head[4:8])
                fh.seek(off)
                footer, records = decode_page(fh.read(page_size), off)
                for i, rec in enumerate(records):
                    yield name, footer.start_ordinal + i, bytearray(rec)
        finally:
            fh.close()

    rdd = sc.parallelize(parts, n_slices).mapPartitions(_decode)
    return spark.createDataFrame(rdd, SLAB_BINARY_SCHEMA)


def write_slab_binary(df, path: str, preferred_page_size: int = 65536,
                      page_alignment: bool = False) -> int:
    """DataFrame(namespace?, ordinal, data) -> one .slab file. Rows stream
    through ``toLocalIterator`` in (namespace, ordinal) order (bounded
    driver memory: one partition in flight), written with the spec's
    ``.slab.buffer`` staging + atomic rename. Returns the record count."""
    from pyspark.sql import functions as F

    cols = df.columns
    if "ordinal" not in cols or "data" not in cols:
        raise ValueError("slab export needs 'ordinal' and 'data' columns")
    if "namespace" not in cols:
        df = df.withColumn("namespace", F.lit(""))
    ordered = (
        df.select("namespace", "ordinal", "data")
        .repartition(1)
        .sortWithinPartitions("namespace", "ordinal")
    )
    n = 0
    writer = SlabBinaryWriter.create_with_buffer(
        path, preferred_page_size=preferred_page_size, page_alignment=page_alignment
    )
    try:
        for row in ordered.toLocalIterator():
            writer.write(int(row["ordinal"]), bytes(row["data"]),
                         row["namespace"] or "")
            n += 1
        writer.close()
    except BaseException:
        try:
            writer._fh.close()
        finally:
            if os.path.exists(writer.path) and writer._target is not None:
                os.unlink(writer.path)
        raise
    return n


# ---------------------------------------------------------------------------
# slab as a first-class Spark data source (Python DataSource API, Spark 4) —
# the X1 registered-reader pattern, same as sources/xvec_datasource.py:
#
#     register_slab_source(spark)
#     df = spark.read.format("slab").load("/data/file.slab")
#     df.write.format("slab").save("/data/outdir")        # sharded egress
#
# Read planning: the driver reads only the trailing index; one
# InputPartition per data page (row-group shape), executors decode their
# own byte ranges into Arrow batches. Write: one part-*.slab shard per
# partition + commit-protocol MANIFEST — ordinals must ascend per
# namespace WITHIN each partition (sortWithinPartitions upstream), the
# writer's strictly-ascending check raises a clear error otherwise.
# ---------------------------------------------------------------------------


try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )
except ImportError:  # pragma: no cover - pyspark<4 has no Python DataSource API
    DataSource = object  # type: ignore[assignment]


class SlabPagePartition(InputPartition):
    def __init__(self, path, namespace, offset):
        self.path = path
        self.namespace = namespace
        self.offset = offset


class SlabDataSourceReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("slab source requires a path: .load('/data/x.slab')")
        only_ns = options.get("namespace")
        self._parts: list[SlabPagePartition] = []
        reader = SlabBinaryReader(self._path)
        try:
            names = [only_ns] if only_ns is not None else reader.namespaces()
            for name in names:
                self._parts.extend(
                    SlabPagePartition(self._path, name, off)
                    for _, off in reader.page_entries(name)
                )
        finally:
            reader.close()

    def partitions(self):
        return self._parts or [SlabPagePartition(None, "", 0)]

    def read(self, part: SlabPagePartition):
        import pyarrow as pa

        if part.path is None:
            return
        with open(part.path, "rb") as fh:
            fh.seek(part.offset)
            head = fh.read(HEADER_SIZE)
            (page_size,) = struct.unpack("<I", head[4:8])
            fh.seek(part.offset)
            footer, records = decode_page(fh.read(page_size), part.offset)
        n = footer.record_count
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([part.namespace] * n, type=pa.string()),
                pa.array(range(footer.start_ordinal, footer.start_ordinal + n),
                         type=pa.int64()),
                pa.array(records, type=pa.binary()),
            ],
            ["namespace", "ordinal", "data"],
        )


class SlabShardCommit(WriterCommitMessage):
    def __init__(self, file, n):
        self.file = file
        self.n = n


class SlabDataSourceWriter(DataSourceWriter):
    def __init__(self, options, overwrite):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("slab writer requires a path: .save('/data/outdir')")
        self._page_size = int(options.get("preferred_page_size", 65536))

    def write(self, iterator):
        import uuid

        os.makedirs(self._dir, exist_ok=True)
        fname = os.path.join(self._dir, f"part-{uuid.uuid4().hex[:12]}.slab")
        n = 0
        writer = SlabBinaryWriter(fname, preferred_page_size=self._page_size)
        with writer:
            for row in iterator:
                ns, ordinal, data = row[0] or "", int(row[1]), bytes(row[2])
                writer.write(ordinal, data, ns)
                n += 1
        if n == 0:
            os.remove(fname)
            return SlabShardCommit(None, 0)
        return SlabShardCommit(os.path.basename(fname), n)

    def commit(self, messages):
        import json as _json

        shards = [(m.file, m.n) for m in messages if m is not None and m.file]
        with open(os.path.join(self._dir, "MANIFEST.json"), "w") as f:
            _json.dump(
                {"format": "slab", "shards": sorted(shards),
                 "rows": sum(c for _, c in shards)},
                f,
            )

    def abort(self, messages):
        for m in messages or []:
            if m is not None and getattr(m, "file", None):
                try:
                    os.remove(os.path.join(self._dir, m.file))
                except OSError:
                    pass


class SlabDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "slab"

    def schema(self) -> str:
        return SLAB_BINARY_SCHEMA

    def reader(self, schema) -> SlabDataSourceReader:
        return SlabDataSourceReader(self.options)

    def writer(self, schema, overwrite) -> SlabDataSourceWriter:
        return SlabDataSourceWriter(self.options, overwrite)


def register_slab_source(spark) -> None:
    """Register the slab format on this session:
    ``spark.read.format('slab').load(path)`` /
    ``df.write.format('slab').save(dir)``."""
    spark.dataSource.register(SlabDataSource)
