"""Pure-numpy media codecs for the multimodal column pipeline.

REAL (no external libraries, full wire-format implementations):
- BMP: uncompressed BI_RGB 24/32-bit (BITMAPINFOHEADER) — the standard
  54-byte header, 4-byte row padding, bottom-up row order, BGR(A) channel
  order. encode + decode.
- WAV: RIFF/WAVE PCM16 — fmt/data chunk walk, interleaved int16 frames.
  encode + decode.
- RVID: a raw frame-packed video container (magic 'RVID', little-endian
  header ``[w:4][h:4][c:4][n_frames:4]``, then frame-major uint8 pixels) —
  the engine's exchange format for decoded-frame test data.

Compressed formats (JPEG/PNG/MP3/MP4...) remain delegated to optional
libraries (PIL when importable) — the container here has none, so
operators raise NotImplementedError for them rather than faking success.
"""

from __future__ import annotations

import struct

import numpy as np


# --- BMP (uncompressed BI_RGB, BITMAPINFOHEADER) ---------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3|4) uint8 RGB(A) -> BMP bytes (24/32-bit BI_RGB)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    if c not in (3, 4):
        raise ValueError(f"BMP supports 3 or 4 channels, got {c}")
    bpp = c * 8
    stride = ((bpp * w + 31) // 32) * 4
    # RGB(A) -> BGR(A), bottom-up rows, pad each row to 4 bytes
    bgr = img[::-1, :, [2, 1, 0] + ([3] if c == 4 else [])]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * c] = bgr.reshape(h, w * c)
    pixel_data = rows.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + dib + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, C) uint8 RGB(A). Uncompressed 24/32-bit only."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file (missing 'BM' magic)")
    (data_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h, _planes, bpp, compression) = struct.unpack_from("<IiiHHI", data, 14)
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP not supported (24/32 only)")
    c = bpp // 8
    bottom_up = h > 0
    h = abs(h)
    stride = ((bpp * w + 31) // 32) * 4
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=data_offset)
    rows = rows.reshape(h, stride)[:, : w * c].reshape(h, w, c)
    if bottom_up:
        rows = rows[::-1]
    # BGR(A) -> RGB(A)
    return np.ascontiguousarray(rows[:, :, [2, 1, 0] + ([3] if c == 4 else [])])


# --- WAV (RIFF PCM16) ------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 -> RIFF/WAVE PCM bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes -> ((n, channels) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 WAV supported (format {audio_format}, {bits}-bit)"
        )
    s = np.frombuffer(pcm, dtype="<i2")
    return s.reshape(-1, channels), sample_rate


# --- RVID raw frame-packed video ------------------------------------------

_RVID_MAGIC = b"RVID"


def encode_rvid(frames: np.ndarray) -> bytes:
    """(n_frames, H, W, C) uint8 -> raw frame-packed container bytes."""
    f = np.asarray(frames, dtype=np.uint8)
    n, h, w, c = f.shape
    return _RVID_MAGIC + struct.pack("<iiii", w, h, c, n) + f.tobytes()


def decode_rvid(data: bytes) -> np.ndarray:
    """Raw container bytes -> (n_frames, H, W, C) uint8."""
    if data[:4] != _RVID_MAGIC:
        raise ValueError("not an RVID container")
    w, h, c, n = struct.unpack_from("<iiii", data, 4)
    return np.frombuffer(data, dtype=np.uint8, offset=20, count=n * h * w * c).reshape(
        n, h, w, c
    )


def block_mean_resize(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(H, W[, C]) -> (oh, ow[, C]) float32 by block-mean pooling —
    vectorized via cumulative sums (no per-block Python loop)."""
    oh, ow = out_hw
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ys = (np.arange(oh + 1) * h // oh).astype(np.int64)
    xs = (np.arange(ow + 1) * w // ow).astype(np.int64)
    ys[1:] = np.maximum(ys[1:], ys[:-1] + 1)  # every block >= 1 px
    xs[1:] = np.maximum(xs[1:], xs[:-1] + 1)
    ys, xs = np.minimum(ys, h), np.minimum(xs, w)
    # 2D prefix sums: block sum = inclusion-exclusion on the integral image
    integ = np.zeros((h + 1, w + 1, c))
    np.cumsum(np.cumsum(a, axis=0), axis=1, out=integ[1:, 1:])
    sums = (
        integ[ys[1:], :, :][:, xs[1:], :]
        - integ[ys[:-1], :, :][:, xs[1:], :]
        - integ[ys[1:], :, :][:, xs[:-1], :]
        + integ[ys[:-1], :, :][:, xs[:-1], :]
    )
    areas = ((ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]).astype(np.float64)
    out = sums / areas[:, :, None]
    return out.astype(np.float32) if img.ndim == 3 else out[:, :, 0].astype(np.float32)
