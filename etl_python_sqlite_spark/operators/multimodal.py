"""Multimodal column plumbing (EXT): image/audio/video as opaque binary.

Real Spark-side machinery — schema, partitioning, Arrow batch shape,
``mapInPandas`` signatures — with the actual media decoding STUBBED
(image/audio libraries are not in this container). The deterministic
byte-level feature extractor exercises the identical execution path a
real decoder would take, so swapping in PIL/ffmpeg later only changes
the inner function.

Scale notes:

* binary payloads ride in the same parquet row group as their metadata —
  one scan, no side-channel fetches; column pruning drops the (large)
  ``content`` column for metadata-only queries.
* ``mapInPandas`` streams Arrow record batches; memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob
  size skew. Repartition by a uniform key before heavy decode stages so
  stragglers don't serialize the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),   # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("histogram", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_image(content: bytes) -> "object":
    """Stub — image decoding requires PIL/opencv, not in this container.

    A production build replaces this body with e.g.
    ``PIL.Image.open(io.BytesIO(content))``; everything around it
    (schema, batching, partitioning) is already real.
    """
    raise NotImplementedError("image decoding not available in this environment")


def decode_audio(content: bytes) -> "object":
    """Stub — audio decoding requires soundfile/ffmpeg (see decode_image)."""
    raise NotImplementedError("audio decoding not available in this environment")


def _byte_features(content: bytes | None) -> tuple[int, float | None, list[float]]:
    """Deterministic fake 'decode': byte histogram (16 buckets, L1-normed)
    + Shannon entropy. Stands in for a real feature extractor with the
    same per-row contract (bytes → fixed-width vector)."""
    import math

    if content is None:
        return 0, None, [0.0] * 16
    n = len(content)
    hist = [0] * 16
    for b in content:
        hist[b >> 4] += 1
    probs = [h / n for h in hist] if n else [0.0] * 16
    entropy = -sum(p * math.log2(p) for p in probs if p > 0) if n else None
    return n, entropy, probs


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps whole record batches in flight (vs row-at-a-time
    UDF); output schema is fixed so downstream plans stay columnar.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_byte_features(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [f[0] for f in feats],
                    "byte_entropy": [f[1] for f in feats],
                    "histogram": [f[2] for f in feats],
                }
            )

    return media.select("media_id", "modality", "content").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Plan-level frame sampling for video rows: explode the timeline into
    per-frame tasks (timestamps only — the actual frame grab lives behind
    ``decode_image``). Demonstrates fan-out partitioning: one row per
    sampled frame, repartitionable downstream."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pipeline stub: passes payloads through ``mapInPandas`` with
    the real batch plumbing; the inner transform raises until an image
    library is available."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                decode_image(bytes(pdf["content"].iloc[0] or b""))
            yield pdf

    return media.mapInPandas(_resize, schema=media.schema)
