"""Perceptual-hash image near-dup (round 7): dHash/aHash over the real
BMP codec + the shared pigeonhole Hamming blocking.

Covers what the SQL driver gate cannot: actual BMP byte round-trips,
planted-duplicate recall with pixel noise, no false pairs on unrelated
images, and the chunk-join's equivalence to brute-force hamming."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nbdatatools_spark.functions.media_codecs import encode_bmp
from nbdatatools_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    image_ahash,
    image_dhash,
    media_near_dup_pairs,
)

GRID_H, GRID_W = 48, 54


def _img(rng: np.random.Generator) -> np.ndarray:
    # noise-dominated content: block means differ clearly between
    # unrelated images (a pure gradient saturates every dHash bit to 1)
    return rng.integers(0, 256, size=(GRID_H, GRID_W), dtype=np.int64).astype(
        np.uint8
    )


@pytest.fixture(scope="module")
def media(spark):
    """40 distinct RGB-from-gray BMPs; ids 100..119 duplicated at 200..219
    with light pixel noise (near-dups); 300..309 fully independent."""
    rng = np.random.Generator(np.random.Philox(key=7))
    rows = []
    originals = {}
    for i in range(20):
        img = _img(rng)
        originals[100 + i] = img
        rows.append((100 + i, "image/bmp", encode_bmp(img), None))
    for i in range(20):
        noisy = originals[100 + i].astype(np.int32)
        mask = rng.random(noisy.shape) < 0.01  # 1% of pixels jittered
        noisy[mask] += rng.integers(-8, 9, size=int(mask.sum()))
        rows.append(
            (200 + i, "image/bmp", encode_bmp(np.clip(noisy, 0, 255).astype(np.uint8)), None)
        )
    for i in range(10):
        rows.append((300 + i, "image/bmp", encode_bmp(_img(rng)), None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_dhash_deterministic_and_64bit(spark, media):
    h1 = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    h2 = {r["media_id"]: r["dhash"] for r in image_dhash(media.repartition(5)).collect()}
    assert h1 == h2
    assert len(h1) == 50
    # distinct images should not share a hash
    assert len({h1[300 + i] for i in range(10)}) == 10


def test_planted_near_dup_recall_and_precision(spark, media):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_near_dup_pairs(media, max_hamming=6).collect()
    }
    planted = {(100 + i, 200 + i) for i in range(20)}
    found_planted = planted & set(pairs)
    assert len(found_planted) >= 18  # >=90% recall at 1% pixel jitter
    # nothing unrelated: every reported pair is a planted one
    assert set(pairs) <= planted


def test_chunk_join_matches_bruteforce(spark, media):
    hashed = image_dhash(media)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in media_near_dup_pairs(media, max_hamming=10).collect()
    }
    rows = hashed.collect()
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            ham = bin((a["dhash"] ^ b["dhash"]) & ((1 << 64) - 1)).count("1")
            if ham <= 10:
                x, y = sorted((a["media_id"], b["media_id"]))
                want.add((x, y, ham))
    assert got == want


def test_ahash_brightness_invariance_weaker_than_dhash(spark, media):
    a = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    assert len(a) == 50
    # exact duplicates of the hash pipeline: same image -> same hash
    img = _img(np.random.Generator(np.random.Philox(key=11)))
    two = spark.createDataFrame(
        [(1, "image/bmp", encode_bmp(img), None), (2, "image/bmp", encode_bmp(img), None)],
        MEDIA_SCHEMA,
    )
    ha = image_ahash(two).collect()
    hd = image_dhash(two).collect()
    assert ha[0]["ahash"] == ha[1]["ahash"]
    assert hd[0]["dhash"] == hd[1]["dhash"]


def test_media_near_dup_validation(spark, media):
    with pytest.raises(ValueError):
        media_near_dup_pairs(media, method="phash-dct")


def _wav(rng, n=16000, amp_profile=None):
    from nbdatatools_spark.functions.media_codecs import encode_wav

    t = np.arange(n)
    base = np.sin(2 * np.pi * 440 * t / 16000)
    env = amp_profile if amp_profile is not None else rng.random(8)
    gain = np.repeat(env, int(np.ceil(n / len(env))))[:n]
    samples = (base * gain * 20000).astype(np.int16)
    return encode_wav(samples, 16000)


def test_audio_fingerprint_near_dups(spark):
    from nbdatatools_spark.operators.multimodal import (
        audio_fingerprint,
        media_near_dup_pairs,
    )

    rng = np.random.Generator(np.random.Philox(key=5))
    env_a = rng.random(64)
    env_b = rng.random(64)
    rows = [
        (1, "audio/wav", _wav(rng, amp_profile=env_a), None),
        # same envelope, mild perturbation -> near-dup
        (2, "audio/wav", _wav(rng, amp_profile=env_a + rng.normal(0, 0.01, 64)), None),
        (3, "audio/wav", _wav(rng, amp_profile=env_b), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fp = {r["media_id"]: r["afp"] for r in audio_fingerprint(media).collect()}
    assert len(fp) == 3
    pairs = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup_pairs(media, max_hamming=6, method="afp").collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs and (2, 3) not in pairs
    # content-length invariance: truncating 10% keeps the hash close
    short = spark.createDataFrame(
        [(9, "audio/wav", _wav(rng, n=14400, amp_profile=env_a), None)],
        MEDIA_SCHEMA,
    )
    fp9 = audio_fingerprint(short).collect()[0]["afp"]
    ham = bin((fp9 ^ fp[1]) & ((1 << 64) - 1)).count("1")
    assert ham <= 16


def test_video_dhash_majority_vote(spark):
    from nbdatatools_spark.functions.media_codecs import encode_rvid
    from nbdatatools_spark.operators.multimodal import media_near_dup_pairs, video_dhash

    rng = np.random.Generator(np.random.Philox(key=13))
    base = rng.integers(0, 256, size=(16, 18, 3), dtype=np.int64).astype(np.uint8)
    clip_a = np.stack([base] * 8)  # static clip
    # same content, one corrupted frame -> majority vote absorbs it
    noisy_frame = rng.integers(0, 256, size=(16, 18, 3), dtype=np.int64).astype(np.uint8)
    clip_b = np.stack([base] * 7 + [noisy_frame])
    other = np.stack(
        [rng.integers(0, 256, size=(16, 18, 3), dtype=np.int64).astype(np.uint8)] * 8
    )
    rows = [
        (1, "video/rvid", encode_rvid(clip_a), None),
        (2, "video/rvid", encode_rvid(clip_b), None),
        (3, "video/rvid", encode_rvid(other), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    h = {r["media_id"]: r["vhash"] for r in video_dhash(media).collect()}
    assert h[1] == h[2]  # 1 bad frame of 8 cannot flip a majority bit
    assert h[1] != h[3]
    pairs = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup_pairs(media, max_hamming=3, method="vhash").collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs
