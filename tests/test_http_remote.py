"""End-to-end HTTP remote-access tests against a live stdlib range-request
server — the mirror of the reference's JettyFileServerExtension harness
(AccuracyTestSuite.java:30-32): curlify byte-range plans, the verified
chunked download consumer flow, and catalog discovery over HTTP."""

import hashlib
import json
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from nbdatatools_spark.sources.dataset import curlify, load_dataset
from nbdatatools_spark.sources.discovery import TestDataSources
from nbdatatools_spark.sources.http_range import (
    content_length,
    download_verified,
    fetch,
)
from nbdatatools_spark.sources.merkle_file import (
    spoil_chunks,
    verify_against_merkle,
    write_mref,
)


class _RangeHandler(BaseHTTPRequestHandler):
    """Static file server honoring ``Range: bytes=a-b`` with 206 responses
    (the subset of RFC 7233 the reference's transport uses)."""

    root = None  # set per-server

    def _path(self):
        import os

        p = os.path.normpath(self.path.lstrip("/"))
        if p.startswith(".."):
            return None
        return str(self.root / p)

    def do_HEAD(self):
        self._serve(head=True)

    def do_GET(self):
        self._serve(head=False)

    def _serve(self, head: bool):
        import os

        path = self._path()
        if path is None or not os.path.isfile(path):
            self.send_error(404)
            return
        size = os.path.getsize(path)
        rng = self.headers.get("Range")
        lo, hi = 0, size - 1
        status = 200
        if rng and rng.startswith("bytes="):
            spec = rng[len("bytes=") :]
            a, _, b = spec.partition("-")
            lo = int(a) if a else 0
            hi = int(b) if b else size - 1
            hi = min(hi, size - 1)
            if lo > hi or lo >= size:
                self.send_error(416)
                return
            status = 206
        n = hi - lo + 1
        self.send_response(status)
        self.send_header("Accept-Ranges", "bytes")
        self.send_header("Content-Length", str(n))
        if status == 206:
            self.send_header("Content-Range", f"bytes {lo}-{hi}/{size}")
        self.end_headers()
        if head:
            return
        with open(path, "rb") as f:
            f.seek(lo)
            self.wfile.write(f.read(n))

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_root(tmp_path):
    """Golden remote dataset: windowed fvec profile + dataset.yaml +
    catalog.json, served over a live HTTP server."""
    dim, n = 8, 64
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(n, dim)).astype("<f4")
    with open(tmp_path / "base.fvec", "wb") as f:
        for row in vecs:
            f.write(struct.pack("<i", dim) + row.tobytes())
    (tmp_path / "dataset.yaml").write_text(
        "name: remoteset\n"
        f"attributes:\n  dimensions: {dim}\n  distance_function: COSINE\n"
        "profiles:\n"
        "  default:\n    base: base.fvec\n"
        "  window:\n    base: base.fvec[16..32]\n"
    )
    (tmp_path / "catalog.json").write_text(
        json.dumps(
            [
                {
                    "name": "remoteset",
                    "url": "",
                    "attributes": {"dimensions": str(dim)},
                    "profiles": {"default": {"base_vectors": "base.fvec"}},
                }
            ]
        )
    )

    handler = type("H", (_RangeHandler,), {"root": tmp_path})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield tmp_path, f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_range_fetch_matches_local_slices(http_root):
    root, url = http_root
    data = (root / "base.fvec").read_bytes()
    assert content_length(f"{url}/base.fvec") == len(data)
    assert fetch(f"{url}/base.fvec") == data
    assert fetch(f"{url}/base.fvec", 0, 3) == data[:4]
    assert fetch(f"{url}/base.fvec", 100, 299) == data[100:300]
    # open-ended range
    assert fetch(f"{url}/base.fvec", len(data) - 10) == data[-10:]


def test_curlify_plan_executes_against_live_server(http_root):
    """The byte-range math curlify emits must fetch exactly the windowed
    records when replayed as real HTTP range requests."""
    root, url = http_root
    m = load_dataset(str(root))
    cmds = curlify(m, url, profiles=["window"])
    ranged = [c for c in cmds if " -r " in c]
    assert len(ranged) == 1
    # parse "curl -fsSL -r a-b -o base.fvec <url>/base.fvec"
    spec = ranged[0].split(" -r ")[1].split()[0]
    lo, hi = map(int, spec.split("-"))
    stride = 4 + 8 * 4  # dim-prefix + 8 float32s
    assert (lo, hi) == (16 * stride, 32 * stride - 1)
    body = fetch(f"{url}/base.fvec", lo, hi)
    data = (root / "base.fvec").read_bytes()
    assert body == data[lo : hi + 1]
    # the fetched slice decodes to records 16..32
    first_dim = struct.unpack("<i", body[:4])[0]
    assert first_dim == 8 and len(body) == 16 * stride


def test_download_verified_consumer_flow(spark, http_root, tmp_path):
    """Chunked range download with per-chunk SHA-256 verification against
    the published .mref, resumable via the .mrkl BitSet."""
    root, url = http_root
    mref = str(tmp_path / "base.fvec.mref")
    write_mref(spark, str(root / "base.fvec"), mref, chunk_size=512)
    out = str(tmp_path / "fetched.fvec")

    stats = download_verified(f"{url}/base.fvec", mref, out)
    assert stats["chunks_fetched"] == stats["chunks_total"] > 1
    assert open(out, "rb").read() == (root / "base.fvec").read_bytes()
    # distributed re-verification of the downloaded artifact: no mismatches
    assert verify_against_merkle(spark, out, mref).count() == 0

    # resume: everything already valid -> zero fetches
    stats2 = download_verified(f"{url}/base.fvec", mref, out)
    assert stats2["chunks_fetched"] == 0
    assert stats2["chunks_skipped"] == stats2["chunks_total"]


def test_download_detects_corrupted_remote(spark, http_root, tmp_path):
    root, url = http_root
    mref = str(tmp_path / "base.fvec.mref")
    write_mref(spark, str(root / "base.fvec"), mref, chunk_size=512)
    # corrupt one chunk of the SERVED file after publishing the mref
    spoil_chunks(str(root / "base.fvec"), mref, [1])
    out = str(tmp_path / "fetched.fvec")
    with pytest.raises(ValueError, match="chunk 1 hash mismatch"):
        download_verified(f"{url}/base.fvec", mref, out)
    # chunk 0 was verified+committed before the failure: resume state holds
    from nbdatatools_spark.sources.merkle_file import read_merkle_file

    _, _, valid = read_merkle_file(out + ".mrkl")
    assert 0 in valid and 1 not in valid


def test_catalog_discovery_over_http(http_root):
    root, url = http_root
    cat = TestDataSources.of_url(f"{url}/catalog.json").catalog()
    assert [e.name for e in cat.entries] == ["remoteset"]
    # bare base url: catalog.json appended (Catalog.java fileFor)
    cat2 = TestDataSources.of_url(url + "/").catalog()
    assert [e.name for e in cat2.entries] == ["remoteset"]


def test_served_bytes_hash_equal(http_root):
    """Sanity: the server is byte-faithful (guards the other assertions)."""
    root, url = http_root
    local = hashlib.sha256((root / "dataset.yaml").read_bytes()).hexdigest()
    remote = hashlib.sha256(fetch(f"{url}/dataset.yaml")).hexdigest()
    assert local == remote


def test_cli_datasets_download_verified(http_root, tmp_path, spark, capsys):
    """CLI `datasets download`: chunked range-fetch with per-chunk merkle
    verification, exit 0 and a full byte-identical copy."""
    import json as _json

    from nbdatatools_spark.__main__ import main
    from nbdatatools_spark.sources.merkle_file import write_mref

    root, url = http_root
    mref = str(tmp_path / "dl.mref")
    write_mref(spark, str(root / "base.fvec"), mref, chunk_size=64)
    out = str(tmp_path / "downloaded.fvec")
    rc = main(
        [
            "datasets", "download",
            "--url", f"{url}/base.fvec",
            "--merkle", mref,
            "--out", out,
        ]
    )
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["chunks_fetched"] == rep["chunks_total"] > 0
    with open(out, "rb") as f_out, open(root / "base.fvec", "rb") as f_src:
        assert f_out.read() == f_src.read()
