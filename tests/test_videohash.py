"""Video frame-fingerprint near-dup detection (operators/videohash):
recall on reordered/truncated/re-encoded copies, set semantics,
threshold behavior, and the per-row reject contract."""

from __future__ import annotations

import numpy as np

from etl_python_sqlite_spark.operators import multimodal as M
from etl_python_sqlite_spark.operators.imagehash import dhash60
from etl_python_sqlite_spark.operators.videohash import (
    video_frame_hashes,
    video_near_dups,
)


def _frames(seed: int, n: int = 4) -> list:
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, size=(16, 18, 3), dtype=np.uint8)
        for _ in range(n)
    ]


def test_frame_hashes_match_dhash_and_route_rejects(spark):
    fr = _frames(1)
    rows = [
        (1, bytearray(M.encode_bmv(fr))),
        (2, bytearray(b"XX not a container")),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = video_frame_hashes(media).collect()
    by_key = {(r["media_id"], r["frame_idx"]): r for r in got}
    for i, f in enumerate(fr):
        r = by_key[(1, i)]
        assert r["decode_ok"] and r["fhash"] == dhash60(f)
    bad = by_key[(2, -1)]
    assert not bad["decode_ok"] and bad["fhash"] is None


def test_near_dups_recall_reorder_truncate_dupframes(spark):
    rows = []
    n_base = 12
    for i in range(n_base):
        fr = _frames(100 + i)
        rows.append((i, bytearray(M.encode_bmv(fr))))
        rows.append((1000 + i, bytearray(M.encode_bmv(fr[::-1]))))
        rows.append((2000 + i, bytearray(M.encode_bmv(fr[:-1]))))
        # duplicated frames: set semantics must count each hash once
        rows.append((3000 + i, bytearray(M.encode_bmv(fr + fr[:2]))))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = video_near_dups(video_frame_hashes(media), min_shared=2)
    got = {(r["id_a"], r["id_b"]): r["n_shared"] for r in pairs.collect()}
    for i in range(n_base):
        assert got[(i, 1000 + i)] == 4       # reorder: full set match
        assert got[(i, 2000 + i)] == 3       # truncate: 3 shared
        assert got[(i, 3000 + i)] == 4       # dup frames count once
    for (a, b) in got:
        assert a % 1000 == b % 1000  # no cross-base pairs


def test_min_shared_threshold(spark):
    fr_a = _frames(7)
    fr_b = _frames(8)
    # one shared frame only -> below min_shared=2
    mixed = [fr_a[0]] + fr_b[1:]
    media = spark.createDataFrame(
        [
            (1, bytearray(M.encode_bmv(fr_a))),
            (2, bytearray(M.encode_bmv(mixed))),
        ],
        "media_id long, content binary",
    )
    pairs = video_near_dups(video_frame_hashes(media), min_shared=2)
    assert pairs.count() == 0
    pairs1 = video_near_dups(video_frame_hashes(media), min_shared=1)
    got = {(r["id_a"], r["id_b"]): r["n_shared"] for r in pairs1.collect()}
    assert got == {(1, 2): 1}
