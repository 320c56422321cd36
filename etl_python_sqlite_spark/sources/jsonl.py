"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
training-data pipelines (one document per line).

Scale rules baked in:

- **Always pass an explicit schema on read.** Spark's JSON schema
  inference is a FULL extra pass over the data (or a sample with
  ``samplingRatio``, which can silently miss rare fields) — at 100 TB
  that is a second 100 TB scan before the first real one. Readers here
  take a required schema; ``infer_documents_schema`` exists for
  exploration only and says so.
- **Corrupt-line routing, not job failure.** PERMISSIVE mode with a
  ``_corrupt_record`` column mirrors the reference's reject-routing
  contract (reference scr/etl_batch.py:48-64 routes bad rows, never
  aborts the batch): bad lines land in a reject frame with their raw
  text preserved verbatim, good lines flow on.
- **Line-splittable by construction.** Uncompressed / zstd-seekable
  JSONL splits on newlines, so one 1 TB file still fans out across
  executors; the reader never coalesces.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the canonical training-document line shape: {"doc_id": 1, "text": ...,
#: "lang": "en", "source": "web", "meta": {...}} — meta kept as a raw JSON
#: string so schema drift in nested metadata never breaks the scan
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str | Path,
    schema: T.StructType,
) -> DataFrame:
    """JSONL scan with an explicit schema and corrupt-line capture.

    Returns the schema's columns plus ``_corrupt_record`` (null for good
    lines, the raw line for bad ones). Callers split with
    ``split_rejects``.
    """
    # NOTE: StructType.add mutates the receiver — build a fresh StructType
    # so the caller's (often module-level) schema object stays pristine
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(str(path))
    )


def split_rejects(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, rejects): good rows lose the corrupt column; rejects carry
    the raw line verbatim (reference reject-CSV parity: raw values, not
    parsed ones).

    The parsed frame is persisted first: Spark (since 2.3) refuses plans
    that reference ONLY the internal corrupt-record column of a raw JSON
    scan, and the two outputs would otherwise re-parse the files twice —
    one cached pass feeds both splits, which is also the right shape at
    scale (split once, route twice). The cache is scoped to the two
    returned frames (``operators.cache.tie_shared``): it is released as
    soon as the caller drops both, so per-file batch loops don't
    accumulate cached blocks across a long session."""
    from etl_python_sqlite_spark.operators.cache import tie_shared

    df = df.persist()
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    rejects = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    good, rejects = tie_shared([good, rejects], df)
    return good, rejects


def infer_documents_schema(spark: SparkSession, path: str | Path) -> T.StructType:
    """EXPLORATION ONLY — runs inference (an extra full pass). Never call
    this in a production scan path; freeze the result into code instead."""
    return spark.read.json(str(path)).schema


def write_jsonl(
    df: DataFrame,
    path: str | Path,
    max_records_per_file: int = 100_000,
) -> None:
    """Write JSONL with bounded file sizes (shard-friendly: downstream
    loaders want many same-ish-sized files, not one giant or thousands of
    tiny ones). Partition count stays whatever the plan produced —
    ``maxRecordsPerFile`` bounds size without a coalesce barrier."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .json(str(path))
    )
