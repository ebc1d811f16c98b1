"""HTTP range-request transport — the reference's remote consumer flow
(S10), stdlib urllib only.

The reference downloads remote datasets chunk-by-chunk with HTTP range
requests, verifying each chunk's SHA-256 against the published ``.mref``
merkle file and tracking progress in a local ``.mrkl`` BitSet so transfers
resume (merklev2/ChunkedTransportClient.java, MAFileChannel.java; proven
against a live server by AccuracyTestSuite.java:30-32 via
JettyFileServerExtension). Bulk analytical IO stays on ``spark.read`` over
shared storage — this module exists for the reference's fetch-exactly-what-
the-profile-needs flow (``datasets curlify`` plans + verified download),
which is driver-side by nature (ranges are KBs-MBs, chunk trees <= 4096
leaves by construction; see merkle_file.py).
"""

from __future__ import annotations

import hashlib
import os
import urllib.request

from nbdatatools_spark.sources.merkle_file import (
    HASH_SIZE,
    init_mrkl,
    read_merkle_file,
    set_chunk_valid,
)


def fetch(url: str, lo: int | None = None, hi: int | None = None) -> bytes:
    """GET ``url``; with ``lo``/``hi`` set, an inclusive byte range
    (``Range: bytes=lo-hi`` — same convention as curl ``-r lo-hi`` and the
    curlify plans). A server ignoring Range (200 instead of 206) yields the
    full body; callers slice defensively."""
    headers = {}
    ranged = lo is not None
    if ranged:
        headers["Range"] = f"bytes={lo}-{'' if hi is None else hi}"
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=60) as r:
        body = r.read()
        if ranged and r.status == 200:
            body = body[lo : None if hi is None else hi + 1]
        return body


def content_length(url: str) -> int:
    req = urllib.request.Request(url, method="HEAD")
    with urllib.request.urlopen(req, timeout=60) as r:
        return int(r.headers["Content-Length"])


def download_verified(
    url: str,
    mref_path: str,
    out_path: str,
    mrkl_path: str | None = None,
) -> dict:
    """Chunked, verified, resumable download (merkle_v1.md §3.3 consumer
    flow): for each chunk not yet valid in the ``.mrkl`` BitSet, range-fetch
    it, check SHA-256 against the ``.mref`` leaf, write it at its offset,
    flip its bit. A hash mismatch raises immediately (the reference fails
    the chunk and surfaces the error; retry policy belongs to the caller).

    Returns {"chunks_total", "chunks_fetched", "chunks_skipped", "bytes"}.
    """
    shape, nodes, _ = read_merkle_file(mref_path)
    mrkl_path = mrkl_path or out_path + ".mrkl"
    if not os.path.exists(mrkl_path):
        init_mrkl(mref_path, mrkl_path)
    _, _, valid = read_merkle_file(mrkl_path)

    # sparse preallocation so ranged writes land at their true offsets
    if (
        not os.path.exists(out_path)
        or os.path.getsize(out_path) != shape.total_content_size
    ):
        with open(out_path, "wb") as f:
            f.truncate(shape.total_content_size)

    fetched = skipped = nbytes = 0
    with open(out_path, "r+b") as f:
        for i in range(shape.total_chunks):
            if i in valid:
                skipped += 1
                continue
            lo = i * shape.chunk_size
            hi = min(lo + shape.chunk_size, shape.total_content_size) - 1
            chunk = fetch(url, lo, hi)
            expected = nodes[shape.offset + i]
            got = hashlib.sha256(chunk).digest()
            if expected != b"\x00" * HASH_SIZE and got != expected:
                raise ValueError(
                    f"chunk {i} hash mismatch: got {got.hex()[:16]}…, "
                    f"expected {expected.hex()[:16]}… (bytes {lo}-{hi} of {url})"
                )
            f.seek(lo)
            f.write(chunk)
            set_chunk_valid(mrkl_path, i)
            fetched += 1
            nbytes += len(chunk)
    return {
        "chunks_total": shape.total_chunks,
        "chunks_fetched": fetched,
        "chunks_skipped": skipped,
        "bytes": nbytes,
    }
