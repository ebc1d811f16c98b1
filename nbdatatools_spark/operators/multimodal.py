"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(beyond-reference extension, SURVEY §7.8).

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
UDF signatures, tested end-to-end. The codec step is STUBBED: this container
has no image/audio libraries, so ``decode`` uses a deterministic fake decoder
(content-hash-seeded pixels) unless a real backend (PIL/soundfile) imports,
in which case it is used. Downstream operators (resize, feature extraction,
frame sampling) consume the decoder's output and are fully real.

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

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, data BINARY, "
    "meta STRUCT<width INT, height INT, channels INT, sample_rate INT, duration_ms BIGINT>"
)

try:  # real decoder when available
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _fake_decode_image(data: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in for a real image codec: pixels are a pure
    function of the content hash. Keeps every downstream shape/aggregate
    testable without PIL. Marked clearly as a stub."""
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "little")
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def decode_image_features(
    media: DataFrame,
    out_size: tuple[int, int] = (8, 8),
    grayscale: bool = True,
) -> DataFrame:
    """(media_id, feature ARRAY<FLOAT>): decode -> resize -> flatten.

    mapInPandas, one Arrow batch at a time; resize via block-mean pooling
    (numpy, real); decode via PIL when importable else the deterministic
    fake (STUB — see module docstring).
    """
    ow, oh = out_size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                w = int(meta["width"] or 16)
                h = int(meta["height"] or 16)
                c = int(meta["channels"] or 3)
                if _HAVE_PIL:
                    import io

                    try:
                        img = np.asarray(Image.open(io.BytesIO(row["data"])))
                        if img.ndim == 2:
                            img = img[:, :, None]
                    except Exception:
                        img = _fake_decode_image(bytes(row["data"]), w, h, c)
                else:
                    img = _fake_decode_image(bytes(row["data"]), w, h, c)
                if grayscale:
                    img = img.mean(axis=2, keepdims=True)
                # block-mean resize to (oh, ow) — real math, no codec needed
                hh, ww = img.shape[:2]
                ys = (np.arange(oh + 1) * hh // oh).astype(int)
                xs = (np.arange(ow + 1) * ww // ow).astype(int)
                pooled = np.empty((oh, ow), dtype=np.float32)
                for yi in range(oh):
                    for xi in range(ow):
                        block = img[ys[yi] : max(ys[yi + 1], ys[yi] + 1),
                                    xs[xi] : max(xs[xi + 1], xs[xi] + 1)]
                        pooled[yi, xi] = float(block.mean())
                feats.append((pooled / 255.0).ravel().astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(run, "media_id BIGINT, feature ARRAY<FLOAT>")


def sample_audio_frames(
    media: DataFrame, frame_ms: int = 100, max_frames: int = 64
) -> DataFrame:
    """(media_id, frame_index INT, rms DOUBLE): frame-sample an audio blob.

    Audio decode is STUBBED as int16 PCM interpretation of the raw bytes
    (NotImplementedError for compressed kinds) — the framing/windowing math
    and the exploded output shape are real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, rms = [], [], []
            for _, row in pdf.iterrows():
                if row["kind"] not in ("audio/pcm16", "audio"):
                    raise NotImplementedError(
                        f"audio codec for {row['kind']!r} not available in this "
                        "environment (STUB: only raw pcm16 supported)"
                    )
                sr = int(row["meta"]["sample_rate"] or 16000)
                pcm = np.frombuffer(bytes(row["data"]), dtype="<i2").astype(np.float64)
                frame_len = max(int(sr * frame_ms / 1000), 1)
                n = min(len(pcm) // frame_len, max_frames)
                for i in range(n):
                    seg = pcm[i * frame_len : (i + 1) * frame_len]
                    ids.append(row["media_id"])
                    idxs.append(i)
                    rms.append(float(np.sqrt(np.mean(seg * seg))))
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs, "rms": rms})

    return media.mapInPandas(run, "media_id BIGINT, frame_index INT, rms DOUBLE")


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-Catalyst metadata aggregation over a media table (no decode):
    per kind: count, total bytes, avg duration."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("data")).alias("total_bytes"),
        F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
    )
