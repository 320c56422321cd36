"""Perceptual audio hashing — energy-envelope difference hash over
decoded PCM, the audio sibling of ``operators/imagehash`` (extends the
multimodal dedup surface from images to audio; the reference engine has
no audio path at all).

The hash is the dHash idea applied to the temporal energy envelope
(the shape acoustic-fingerprinting literature builds on — cf. Haitsma
& Kalker's "A Highly Robust Audio Fingerprint System", ISMIR 2002,
which thresholds energy DIFFERENCES across bands/frames; this
implementation keeps the repo's exact-integer discipline instead of
filterbanks):

* decode WAV PCM with the real stdlib decoder
  (``multimodal.decode_audio``), mono-ize by summing channels per
  frame (exact integer);
* split the frame sequence into ``SEGMENTS = 61`` floor-boundary
  segments; each segment's energy is the exact Σ|sample|;
* bit k (0..59) is set iff segment k's MEAN energy strictly exceeds
  segment k+1's, compared cross-multiplied (``sum_l·cnt_r >
  sum_r·cnt_l``) so no division ever rounds.

60 bits for the same reason as ``imagehash.dhash60`` (DuckDB's checked
``<<`` refuses bit 63; the repo's portable-hash convention is 60-bit).
The hash is EXACTLY invariant under volume scaling (all segment sums
scale by the same positive factor, so every cross-multiplied
comparison is unchanged — integer-exact for ×2^k, and the contract
query's planted twins exploit that), and robust to few-sample edits
(one changed sample touches one segment → at most 2 bits).

Candidate generation + verification reuse the generic Hamming-band
machinery (``imagehash.dhash_near_dups`` operates on any (id, 60-bit
hash) frame): 4×15-bit bands — complete for Hamming distance < 4 —
then exact ``bit_count(XOR)``. Scale shape: one Arrow decode+hash pass
over the binary column, band equi-join, id-keyed verify joins — the
image pipeline's, unchanged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .imagehash import DHASH_BITS

#: energy-envelope segments: 61 segments -> 60 adjacent comparisons
SEGMENTS = DHASH_BITS + 1


def energy_dhash60(samples: "np.ndarray") -> int:
    """60-bit energy-envelope difference hash of an (n_frames, ch)
    integer PCM array (module docstring pins every rule). Degenerate
    but deterministic below 61 frames (empty segments lose every
    strict comparison)."""
    mono = np.asarray(samples, dtype=np.int64).reshape(
        len(samples), -1
    ).sum(axis=1)
    n = len(mono)
    energy = np.abs(mono)
    sums = np.zeros(SEGMENTS, np.int64)
    cnts = np.zeros(SEGMENTS, np.int64)
    edges = [i * n // SEGMENTS for i in range(SEGMENTS + 1)]
    for i in range(SEGMENTS):
        seg = energy[edges[i] : edges[i + 1]]
        sums[i] = int(seg.sum())
        cnts[i] = len(seg)
    # compare in PYTHON ints: np.int64 products wrap silently past
    # 2^63 (hours of 48 kHz audio make segment-sum x count exceed it —
    # code-review r10, repro'd), and a wrapped product flips hash bits
    psums, pcnts = sums.tolist(), cnts.tolist()
    out = 0
    for k in range(DHASH_BITS):
        if psums[k] * pcnts[k + 1] > psums[k + 1] * pcnts[k]:
            out |= 1 << k
    return out


def audio_energy_hash(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """(id, ahash, sample_rate, n_frames, decode_ok) — the real WAV
    decoder feeding :func:`energy_dhash60` in ONE Arrow-batched pass;
    undecodable rows route to ``decode_ok=false`` with a NULL hash
    (the multimodal per-row reject contract)."""
    from .multimodal import decode_audio

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, srs, nfs, oks = [], [], [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                ids.append(mid)
                try:
                    aud = decode_audio(
                        bytes(content) if content is not None else b""
                    )
                    hs.append(energy_dhash60(aud.samples))
                    srs.append(aud.sample_rate)
                    nfs.append(aud.n_frames)
                    oks.append(True)
                except Exception:  # noqa: BLE001 — per-row reject
                    hs.append(None)
                    srs.append(None)
                    nfs.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "ahash": pd.array(hs, dtype="Int64"),
                    "sample_rate": pd.array(srs, dtype="Int32"),
                    "n_frames": pd.array(nfs, dtype="Int64"),
                    "decode_ok": oks,
                }
            )

    return media.select(id_col, content_col).mapInPandas(
        _hash,
        schema=(
            f"{id_col} long, ahash long, sample_rate int, n_frames long,"
            " decode_ok boolean"
        ),
    )


def audio_near_dups(
    hashes: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 4,
    id_col: str = "media_id",
) -> DataFrame:
    """(id_a, id_b, hamming) — banded candidates + exact verify over
    energy hashes; delegates to the generic Hamming machinery
    (``imagehash.dhash_near_dups`` is hash-agnostic)."""
    from .imagehash import dhash_near_dups

    return dhash_near_dups(
        hashes, max_hamming, n_bands, id_col, hash_col="ahash"
    )
