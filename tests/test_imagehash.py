"""Perceptual image hashing (operators/imagehash): CPython replay pin
of dhash60, recall ground truth on planted re-encode / resize /
brightness twins, the banding completeness guarantee, and the per-row
reject contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators import multimodal as M
from etl_python_sqlite_spark.operators.imagehash import (
    DHASH_BITS,
    dhash60,
    dhash_near_dups,
    image_dhash,
)


def _rng_pixels(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _dhash_reference(px: np.ndarray) -> int:
    """Independent transcription of the documented rules (module
    docstring of operators/imagehash): 8x9 floor-boundary grid over the
    r+g+b gray, cross-multiplied average comparison, row-major bits
    0..59."""
    h, w = px.shape[0], px.shape[1]
    gray = px.astype(np.int64).sum(axis=2)
    out = 0
    cells = {}
    for i in range(8):
        for j in range(9):
            blk = gray[
                i * h // 8 : (i + 1) * h // 8,
                j * w // 9 : (j + 1) * w // 9,
            ]
            cells[i, j] = (int(blk.sum()), blk.size)
    for i in range(8):
        for j in range(8):
            k = i * 8 + j
            if k >= DHASH_BITS:
                continue
            (sl, cl), (sr, cr) = cells[i, j], cells[i, j + 1]
            if sl * cr > sr * cl:
                out |= 1 << k
    return out


def test_dhash60_matches_independent_transcription():
    for seed, h, w in [(1, 24, 32), (2, 16, 18), (3, 8, 9), (4, 50, 7)]:
        px = _rng_pixels(seed, h, w)
        got = dhash60(px)
        assert got == _dhash_reference(px)
        assert 0 <= got < (1 << DHASH_BITS)


def test_dhash60_invariances():
    # grid-multiple dims (h % 8 == 0, w % 9 == 0): only then do the
    # floor cell boundaries scale exactly with the image, making the
    # 2x upscale a per-cell pixel replication
    px = _rng_pixels(7, 16, 18)
    base = dhash60(px)
    # 2x nearest-neighbor upscale keeps every grid cell's pixel
    # MULTISET (each pixel replicated 4x within its own cell when
    # dims are grid multiples) -> identical averages, identical hash
    up = px.repeat(2, axis=0).repeat(2, axis=1)
    assert dhash60(up) == base
    # brightness shift without clamping flips no COMPARISON
    dim = (px // 2 + 10).astype(np.uint8)  # values <= 137, no wrap
    shifted = (dim + 40).astype(np.uint8)
    assert dhash60(shifted) == dhash60(dim)


def test_image_dhash_decodes_and_routes_rejects(spark):
    px = _rng_pixels(11, 16, 18)
    rows = [
        (1, bytearray(M.encode_png(px))),
        (2, bytearray(M.encode_bmp(px))),
        (3, bytearray(b"\xffJUNK not an image")),
        (4, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in image_dhash(media).collect()}
    expected = dhash60(px)
    assert got[1]["decode_ok"] and got[1]["dhash"] == expected
    assert got[2]["decode_ok"] and got[2]["dhash"] == expected
    assert got[1]["width"] == 18 and got[1]["height"] == 16
    assert not got[3]["decode_ok"] and got[3]["dhash"] is None
    assert not got[4]["decode_ok"]


def test_near_dups_recall_on_planted_twins(spark):
    """Ground truth: re-encoded, 2x-resized and brightness-shifted twins
    of dissimilar base images are all recovered; no cross-base pair is
    reported at max_hamming=6 on 60-bit hashes of independent images."""
    rows = []
    n_base = 20
    for i in range(n_base):
        # keep values in [10, 137] so the +40 brightness twin can't wrap
        px = (_rng_pixels(100 + i, 16, 18) // 2 + 10).astype(np.uint8)
        rows.append((i, bytearray(M.encode_png(px))))
        rows.append((1000 + i, bytearray(M.encode_bmp(px))))  # re-encode
        rows.append(
            (
                2000 + i,
                bytearray(
                    M.encode_ppm(px.repeat(2, axis=0).repeat(2, axis=1))
                ),
            )
        )  # 2x resize
        rows.append(
            (3000 + i, bytearray(M.encode_png((px + 40).astype(np.uint8))))
        )  # brightness
    media = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = dhash_near_dups(image_dhash(media), max_hamming=6, n_bands=4)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    for i in range(n_base):
        group = [i, 1000 + i, 2000 + i, 3000 + i]
        for a in group:
            for b in group:
                if a < b:
                    assert got.get((a, b)) == 0, (a, b, got.get((a, b)))
    # no pair across different bases (independent 60-bit hashes)
    for (a, b) in got:
        assert a % 1000 == b % 1000


def test_banding_guarantee_catches_small_hamming(spark):
    """Every pair within Hamming distance < n_bands is guaranteed a
    band match: plant hash-level neighbors by flipping <=3 bits and
    assert the banded pipeline reports them all (hashes injected
    directly -- this pins the LSH layer in isolation)."""
    rng = np.random.default_rng(42)
    rows = []
    truth = []
    for i in range(50):
        h = int(rng.integers(0, 1 << 60))
        rows.append((i, h))
        flip = h
        for bit in rng.choice(60, size=int(rng.integers(1, 4)), replace=False):
            flip ^= 1 << int(bit)
        rows.append((10_000 + i, flip))
        truth.append((i, 10_000 + i, bin(h ^ flip).count("1")))
    hashes = spark.createDataFrame(rows, "media_id long, dhash long")
    pairs = dhash_near_dups(hashes, max_hamming=6, n_bands=4)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    for a, b, d in truth:
        assert got.get((a, b)) == d


def test_bad_band_config_raises(spark):
    hashes = spark.createDataFrame([(1, 5)], "media_id long, dhash long")
    with pytest.raises(ValueError):
        dhash_near_dups(hashes, n_bands=7)
