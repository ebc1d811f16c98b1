"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(beyond-reference extension, SURVEY §7.8).

Media travel as ``(media_id, kind, data BINARY, meta STRUCT)`` rows; decode /
resize / feature-extract / frame-sample run as Arrow-batched mapInPandas
kernels over them.

Codec status (functions/media_codecs.py):
- REAL, dependency-free: BMP (uncompressed 24/32-bit), WAV (RIFF PCM16),
  RVID raw frame-packed video, raw uint8 bitmaps/PCM buffers, block-mean
  resize (integral-image pooling).
- Compressed formats (JPEG/PNG/...) decode through PIL WHEN IMPORTABLE;
  otherwise the operator raises NotImplementedError for them — it never
  fakes success on real media.
- ``image/fake`` is an EXPLICIT synthetic kind (content-hash-seeded pixels)
  for datagen pipelines, not a fallback.

Schemas:
  media table:   (media_id BIGINT, kind STRING, data BINARY,
                  meta STRUCT<width INT, height INT, channels INT,
                              sample_rate INT, duration_ms BIGINT>)
  features:      (media_id BIGINT, feature ARRAY<FLOAT>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nbdatatools_spark.functions.media_codecs import (
    block_mean_resize,
    decode_bmp,
    decode_rvid,
    decode_wav,
)

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, data BINARY, "
    "meta STRUCT<width INT, height INT, channels INT, sample_rate INT, duration_ms BIGINT>"
)

try:  # optional compressed-format decoder
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _fake_decode_image(data: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """EXPLICIT synthetic decoder (kind='image/fake'): pixels are a pure
    function of the content hash — deterministic datagen, not a codec."""
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "little")
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def decode_image(data: bytes, kind: str, meta) -> np.ndarray:
    """Dispatch: BMP magic -> real numpy decoder; image/raw -> meta-shaped
    uint8 buffer; image/fake -> synthetic; anything else -> PIL when
    importable, else NotImplementedError."""
    if data[:2] == b"BM":
        return decode_bmp(bytes(data))
    if kind == "image/raw":
        w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"] or 1)
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
        if arr.size != w * h * c:
            raise ValueError(f"image/raw: {arr.size} bytes != {h}x{w}x{c}")
        return arr.reshape(h, w, c)
    if kind == "image/fake":
        return _fake_decode_image(
            bytes(data), int(meta["width"] or 16), int(meta["height"] or 16),
            int(meta["channels"] or 3),
        )
    if _HAVE_PIL:
        import io

        img = np.asarray(Image.open(io.BytesIO(bytes(data))))
        return img[:, :, None] if img.ndim == 2 else img
    raise NotImplementedError(
        f"no decoder for {kind!r} in this environment (BMP/raw are built in; "
        "compressed formats need PIL)"
    )


def decode_image_features(
    media: DataFrame,
    out_size: tuple[int, int] = (8, 8),
    grayscale: bool = True,
) -> DataFrame:
    """(media_id, feature ARRAY<FLOAT>): decode -> block-mean resize ->
    flatten, one Arrow batch at a time. Resize is the vectorized
    integral-image pooling from media_codecs (no per-block Python loop)."""
    ow, oh = out_size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data, kind, meta in zip(pdf["data"], pdf["kind"], pdf["meta"]):
                img = decode_image(data, kind, meta).astype(np.float64)
                if grayscale:
                    img = img.mean(axis=2)
                pooled = block_mean_resize(img, (oh, ow))
                feats.append((pooled / 255.0).ravel().astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(run, "media_id BIGINT, feature ARRAY<FLOAT>")


def sample_audio_frames(
    media: DataFrame, frame_ms: int = 100, max_frames: int = 64
) -> DataFrame:
    """(media_id, frame_index INT, rms DOUBLE): frame-sample an audio blob.

    audio/wav decodes through the real RIFF PCM16 parser (sample rate and
    channel count from the header, channels mixed to mono); audio/pcm16 is a
    raw int16 buffer at meta.sample_rate. Compressed kinds raise
    NotImplementedError (no audio libs in this container)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, rms = [], [], []
            for mid, kind, data, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["data"], pdf["meta"]
            ):
                if kind == "audio/wav" or bytes(data[:4]) == b"RIFF":
                    samples, sr = decode_wav(bytes(data))
                    pcm = samples.astype(np.float64).mean(axis=1)
                elif kind in ("audio/pcm16", "audio"):
                    sr = int(meta["sample_rate"] or 16000)
                    pcm = np.frombuffer(bytes(data), dtype="<i2").astype(np.float64)
                else:
                    raise NotImplementedError(
                        f"audio codec for {kind!r} not available in this "
                        "environment (wav/pcm16 are built in)"
                    )
                frame_len = max(int(sr * frame_ms / 1000), 1)
                n = min(len(pcm) // frame_len, max_frames)
                for i in range(n):
                    seg = pcm[i * frame_len : (i + 1) * frame_len]
                    ids.append(mid)
                    idxs.append(i)
                    rms.append(float(np.sqrt(np.mean(seg * seg))))
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs, "rms": rms})

    return media.mapInPandas(run, "media_id BIGINT, frame_index INT, rms DOUBLE")


def sample_video_frames(
    media: DataFrame,
    every_n: int = 2,
    out_size: tuple[int, int] = (4, 4),
    max_frames: int = 32,
) -> DataFrame:
    """(media_id, frame_index INT, feature ARRAY<FLOAT>): sample every n-th
    frame of an RVID container and pool each to a grayscale feature. Real
    end-to-end for RVID; other containers raise NotImplementedError."""
    ow, oh = out_size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if bytes(data[:4]) != b"RVID":
                    raise NotImplementedError(
                        f"video codec for {kind!r} not available (RVID built in)"
                    )
                frames = decode_rvid(bytes(data))
                picked = list(range(0, len(frames), max(every_n, 1)))[:max_frames]
                for fi in picked:
                    img = frames[fi].astype(np.float64).mean(axis=2)
                    pooled = block_mean_resize(img, (oh, ow))
                    ids.append(mid)
                    idxs.append(fi)
                    feats.append((pooled / 255.0).ravel().astype(np.float32))
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs, "feature": feats})

    return media.mapInPandas(
        run, "media_id BIGINT, frame_index INT, feature ARRAY<FLOAT>"
    )


def _pack_bits_le(bits: np.ndarray) -> int:
    """Row-major bit array -> SIGNED 64-bit int (bit b = flat index b),
    wrapping bit 63 into the sign the way a JVM long does."""
    val = 0
    for b, bit in enumerate(bits.ravel()):
        if bit:
            val |= 1 << b
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def image_dhash(media: DataFrame, grid: tuple[int, int] = (8, 9)) -> DataFrame:
    """(media_id, dhash BIGINT): 64-bit difference hash (dHash — the
    row-gradient perceptual hash; cf. pHash family): decode -> grayscale
    -> block-mean resize to ``grid`` (default 8 rows x 9 cols) -> bit
    (r, c) = 1 iff block(r, c+1) > block(r, c), packed row-major (bit
    index = r * (cols-1) + c, bit 63 wraps into the long's sign).

    Engine-exact by construction for gray inputs with 2^k block pooling:
    channel mean (v+v+v)/3 and block mean (4-px sum)/4 are exact IEEE
    doubles, so the > comparisons are bit-identical across engines — the
    driver gate replays the whole hash in DuckDB SQL. Pair mining:
    dedup.hamming_near_dup_pairs over the returned column.
    """
    oh, ow = grid

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for data, kind, meta in zip(pdf["data"], pdf["kind"], pdf["meta"]):
                img = decode_image(bytes(data), kind, meta).astype(np.float64)
                gray = img.mean(axis=2)
                pooled = block_mean_resize(gray, (oh, ow)).astype(np.float64)
                bits = pooled[:, 1:] > pooled[:, :-1]
                hashes.append(_pack_bits_le(bits))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pd.array(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(run, "media_id BIGINT, dhash BIGINT")


def image_ahash(media: DataFrame, grid: tuple[int, int] = (8, 8)) -> DataFrame:
    """(media_id, ahash BIGINT): 64-bit average hash — block-mean resize
    to ``grid``, bit = 1 iff block mean > image mean (mean of the pooled
    grid — exact: 0.25-multiples summed then / 64). Same packing and
    pair-mining contract as :func:`image_dhash`; aHash is cheaper but
    weaker against brightness shifts."""
    oh, ow = grid

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for data, kind, meta in zip(pdf["data"], pdf["kind"], pdf["meta"]):
                img = decode_image(bytes(data), kind, meta).astype(np.float64)
                gray = img.mean(axis=2)
                pooled = block_mean_resize(gray, (oh, ow)).astype(np.float64)
                bits = pooled > pooled.mean()
                hashes.append(_pack_bits_le(bits))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": pd.array(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(run, "media_id BIGINT, ahash BIGINT")


def audio_fingerprint(media: DataFrame, bits: int = 64) -> DataFrame:
    """(media_id, afp BIGINT): 64-bit energy-delta audio fingerprint
    (Chromaprint-style, energy-only): decode -> mono -> split into
    ``bits + 1`` EQUAL segments (content-length invariant, unlike fixed-
    ms framing) -> RMS per segment -> bit b = 1 iff rms[b+1] > rms[b],
    packed like image_dhash. Same pair-mining contract:
    dedup.hamming_near_dup_pairs / media_near_dup_pairs(method='afp').
    wav/pcm16 decode is real; compressed kinds raise (no audio libs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for data, kind, meta in zip(pdf["data"], pdf["kind"], pdf["meta"]):
                if kind == "audio/wav" or bytes(data[:4]) == b"RIFF":
                    samples, _sr = decode_wav(bytes(data))
                    pcm = samples.astype(np.float64).mean(axis=1)
                elif kind in ("audio/pcm16", "audio"):
                    pcm = np.frombuffer(bytes(data), dtype="<i2").astype(np.float64)
                else:
                    raise NotImplementedError(
                        f"audio codec for {kind!r} not available (wav/pcm16 built in)"
                    )
                n_seg = bits + 1
                if len(pcm) < n_seg:
                    pcm = np.pad(pcm, (0, n_seg - len(pcm)))
                # equal segments via integer boundaries (same rule as
                # block_mean_resize's axis cuts)
                cuts = (np.arange(n_seg + 1) * len(pcm)) // n_seg
                rms = np.array(
                    [
                        float(np.sqrt(np.mean(pcm[cuts[i] : cuts[i + 1]] ** 2)))
                        for i in range(n_seg)
                    ]
                )
                hashes.append(_pack_bits_le(rms[1:] > rms[:-1]))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "afp": pd.array(hashes, dtype="int64")}
            )

    return media.mapInPandas(run, "media_id BIGINT, afp BIGINT")


def video_dhash(media: DataFrame, grid: tuple[int, int] = (8, 9)) -> DataFrame:
    """(media_id, vhash BIGINT): clip-level perceptual hash for RVID
    video — per-frame image dHash bits combined by MAJORITY VOTE across
    frames (bit = 1 iff more than half the frames set it), so the hash
    is stable under frame sampling/truncation. Pair mining via
    media_near_dup_pairs(method='vhash')."""
    oh, ow = grid

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for data, kind in zip(pdf["data"], pdf["kind"]):
                if bytes(data[:4]) != b"RVID":
                    raise NotImplementedError(
                        f"video codec for {kind!r} not available (RVID built in)"
                    )
                frames = decode_rvid(bytes(data))
                votes = np.zeros((oh, ow - 1), dtype=np.int64)
                for fr in frames:
                    gray = fr.astype(np.float64).mean(axis=2)
                    pooled = block_mean_resize(gray, (oh, ow)).astype(np.float64)
                    votes += (pooled[:, 1:] > pooled[:, :-1]).astype(np.int64)
                hashes.append(_pack_bits_le(votes * 2 > len(frames)))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "vhash": pd.array(hashes, dtype="int64")}
            )

    return media.mapInPandas(run, "media_id BIGINT, vhash BIGINT")


_HASHERS = {
    "dhash": image_dhash,
    "ahash": image_ahash,
    "afp": audio_fingerprint,
    "vhash": video_dhash,
}


def media_near_dup_pairs(
    media: DataFrame, max_hamming: int = 3, method: str = "dhash"
) -> DataFrame:
    """Media near-duplicate pairs — the multimodal face of the dedup
    family: a 64-bit perceptual fingerprint per modality (image dHash/
    aHash, audio energy-delta, video majority-vote dHash) + the
    pigeonhole Hamming chunk join shared with SimHash
    (dedup.hamming_near_dup_pairs). Never all-pairs; candidates scale
    with chunk-bucket occupancy. Returns (id_a, id_b, hamming INT)."""
    from nbdatatools_spark.operators.dedup import hamming_near_dup_pairs

    try:
        hashed = _HASHERS[method](media)
    except KeyError:
        raise ValueError(
            f"method must be one of {sorted(_HASHERS)}, got {method!r}"
        ) from None
    return hamming_near_dup_pairs(
        hashed,
        id_col="media_id",
        hash_col=method,  # each hasher names its column after the method
        max_hamming=max_hamming,
        n_bits=64,
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-Catalyst metadata aggregation over a media table (no decode):
    per kind: count, total bytes, avg duration."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("data")).alias("total_bytes"),
        F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
    )
