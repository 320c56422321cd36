"""Perceptual video near-duplicate detection — per-frame dHash
fingerprints + shared-fingerprint pairing, completing the multimodal
dedup trio (images: ``imagehash``, audio: ``audiohash``; the reference
engine has no media path at all).

The standard production shape (cf. content-ID-style systems and the
frame-fingerprint literature): sample frames, fingerprint each frame
with a perceptual hash, and call two videos near-duplicates when they
share at least ``min_shared`` distinct frame fingerprints. Matching on
fingerprint IDENTITY keeps the pairing an equi-join (uniform key, no
all-pairs); robustness to re-encoding/resizing lives INSIDE the frame
hash (dHash), and robustness to cuts/reorders lives in the set
semantics — a reordered or truncated copy still shares most frame
fingerprints.

Scale shape: one Arrow-batched pass splits the container (byte
arithmetic, only sampled frames pay a pixel decode) and hashes frames;
the pair stage is DISTINCT (id, hash) → self-equi-join on the hash →
pair-count aggregate — the ``winnowing_overlap_pairs`` plan over frame
fingerprints instead of text shingles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tie
from .imagehash import dhash60


def video_frame_hashes(
    media: DataFrame,
    every_n: int = 1,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """(id, frame_idx, fhash, decode_ok) — every ``every_n``-th frame
    of each concatenated-BMP video (multimodal.split_bmv_frames; real
    decoders) fingerprinted with :func:`imagehash.dhash60`. Corrupt
    containers route to one ``decode_ok=false`` row (frame_idx −1),
    corrupt frames to per-frame reject rows — never a stage abort."""
    import struct as _struct

    from .multimodal import decode_image, split_bmv_frames

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                mid = int(mid)
                try:
                    frames = split_bmv_frames(
                        bytes(content) if content is not None else b""
                    )
                except (ValueError, _struct.error):
                    rows.append((mid, -1, None, False))
                    continue
                for idx in range(0, len(frames), every_n):
                    try:
                        img = decode_image(frames[idx])
                        rows.append((mid, idx, dhash60(img.pixels), True))
                    except Exception:  # noqa: BLE001 — per-frame reject
                        rows.append((mid, idx, None, False))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "fhash", "decode_ok"]
            ).astype({"fhash": "Int64"})

    return media.select(id_col, content_col).mapInPandas(
        _hash,
        schema=f"{id_col} long, frame_idx int, fhash long, decode_ok boolean",
    )


def video_near_dups(
    frame_hashes: DataFrame,
    min_shared: int = 2,
    id_col: str = "media_id",
    hash_col: str = "fhash",
) -> DataFrame:
    """(id_a, id_b, n_shared) — video pairs sharing ≥ ``min_shared``
    DISTINCT frame fingerprints. Set semantics (duplicate frames within
    one video count once), so reordered/truncated copies pair by
    construction. The fingerprint frame is persisted for the self-join
    (re-inlining rule) and tied to the result."""
    fp = (
        frame_hashes.filter(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("vid"), F.col(hash_col).alias("h"))
        .distinct()
        .persist()
    )
    a = fp.select(F.col("vid").alias("id_a"), "h")
    b = fp.select(F.col("vid").alias("id_b"), "h")
    out = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return tie(out, fp)
