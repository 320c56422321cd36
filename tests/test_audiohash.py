"""Perceptual audio hashing (operators/audiohash): CPython replay pin
of energy_dhash60, the exact volume-scaling invariance, bounded-edit
robustness, recall on planted twins, and the per-row reject contract."""

from __future__ import annotations

import numpy as np

from etl_python_sqlite_spark.operators import multimodal as M
from etl_python_sqlite_spark.operators.audiohash import (
    SEGMENTS,
    audio_energy_hash,
    audio_near_dups,
    energy_dhash60,
)
from etl_python_sqlite_spark.operators.imagehash import DHASH_BITS


def _rng_samples(seed: int, n: int = 488, ch: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-128, 128, size=(n, ch)).astype(np.int16)


def _reference(samples: np.ndarray) -> int:
    """Independent transcription of the documented rules."""
    mono = samples.astype(np.int64).sum(axis=1)
    n = len(mono)
    e = np.abs(mono)
    segs = []
    for i in range(SEGMENTS):
        blk = e[i * n // SEGMENTS : (i + 1) * n // SEGMENTS]
        segs.append((int(blk.sum()), len(blk)))
    out = 0
    for k in range(DHASH_BITS):
        (sl, cl), (sr, cr) = segs[k], segs[k + 1]
        if sl * cr > sr * cl:
            out |= 1 << k
    return out


def test_energy_dhash60_matches_independent_transcription():
    for seed, n, ch in [(1, 488, 1), (2, 1000, 2), (3, 61, 1), (4, 40, 1)]:
        s = _rng_samples(seed, n, ch)
        got = energy_dhash60(s)
        assert got == _reference(s)
        assert 0 <= got < (1 << DHASH_BITS)


def test_energy_dhash60_volume_invariance():
    s = _rng_samples(7)
    base = energy_dhash60(s)
    assert energy_dhash60(s * 2) == base
    assert energy_dhash60(s * 4) == base
    # one-sample edit touches one segment -> at most 2 bits
    s2 = s.copy()
    s2[255, 0] = 127
    assert bin(energy_dhash60(s2) ^ base).count("1") <= 2


def test_audio_energy_hash_decodes_and_routes_rejects(spark):
    s = _rng_samples(11)
    rows = [
        (1, bytearray(M.encode_wav(s, 8000))),
        (2, bytearray(M.encode_wav(s * 2, 16000))),  # louder + resampled
        (3, bytearray(b"\xffnot audio at all")),
        (4, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in audio_energy_hash(media).collect()}
    expected = energy_dhash60(s)
    assert got[1]["decode_ok"] and got[1]["ahash"] == expected
    assert got[2]["decode_ok"] and got[2]["ahash"] == expected  # invariant
    assert got[1]["sample_rate"] == 8000 and got[1]["n_frames"] == 488
    assert not got[3]["decode_ok"] and got[3]["ahash"] is None
    assert not got[4]["decode_ok"]


def test_audio_near_dups_recall_on_planted_twins(spark):
    rows = []
    n_base = 20
    for i in range(n_base):
        s = _rng_samples(100 + i)
        rows.append((i, bytearray(M.encode_wav(s, 8000))))
        rows.append((1000 + i, bytearray(M.encode_wav(s * 2, 8000))))
        edited = s.copy()
        edited[7, 0] = -128
        rows.append((2000 + i, bytearray(M.encode_wav(edited, 8000))))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = audio_near_dups(audio_energy_hash(media), max_hamming=6)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    for i in range(n_base):
        assert got.get((i, 1000 + i)) == 0          # volume twin exact
        assert got.get((i, 2000 + i), 99) <= 2      # edit twin close
    # no cross-base pair (independent 60-bit hashes)
    for (a, b) in got:
        assert a % 1000 == b % 1000
