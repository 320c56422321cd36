"""Multimodal plumbing tests: the Spark-side machinery is real even though
media decoding is stubbed."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    frame_sample_plan,
    resize_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes(range(256)), "image/png", (64, 64, None, None)),
        (2, "image", b"\x00" * 1024, "image/png", (32, 32, None, None)),
        (3, "audio", b"\x11\x22" * 500, "audio/wav", (None, None, 5000, 16000)),
        (4, "video", b"frame" * 100, "video/mp4", (640, 480, 3500, None)),
        (5, "image", None, "image/png", (8, 8, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_batch_shape(spark, media):
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(feats) == 5
    # uniform bytes 0..255 → flat histogram, max entropy (log2 16 buckets)
    assert feats[1]["n_bytes"] == 256
    assert feats[1]["byte_entropy"] == pytest.approx(4.0)
    assert feats[1]["histogram"] == pytest.approx([1 / 16] * 16)
    # constant bytes → zero entropy, all mass in bucket 0
    assert feats[2]["byte_entropy"] == pytest.approx(0.0)
    assert feats[2]["histogram"][0] == pytest.approx(1.0)
    # null payload handled
    assert feats[5]["n_bytes"] == 0 and feats[5]["byte_entropy"] is None


def test_metadata_only_query_prunes_content(spark, media, tmp_path):
    """Column pruning: a metadata query over the parquet table must not
    read the binary column (ReadSchema check)."""
    path = str(tmp_path / "media")
    media.write.parquet(path)
    q = spark.read.parquet(path).select("media_id", "modality", "meta.width")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "content" not in read_schema


def test_frame_sampling_fanout(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # one video of 3500ms → frames at 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_decode_stub_raises(spark, media):
    with pytest.raises(NotImplementedError):
        decode_image(b"not-a-real-png")
    with pytest.raises(Exception):  # surfaced through the Spark job
        resize_stub(media.limit(1), 8, 8).collect()
