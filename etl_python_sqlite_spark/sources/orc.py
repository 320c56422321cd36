"""ORC source/sink — the second columnar format next to parquet.

Spark's ORC reader has the same pushdown machinery as parquet (predicate
pushdown via ``spark.sql.orc.filterPushdown``, column pruning, partition
pruning on directory layouts), so the engine's scan-quality guarantees
carry over format-for-format; ``tests/test_bucketing.py`` asserts the
pushed filters appear in the ORC scan plan the same way the parquet plan
gates do.

Avro, for contrast, is an *external* Spark module (spark-avro jar) — not
loadable in this offline environment. Both directions now route through
the pure-stdlib Python DataSource in ``sources/avro_py.py``: reads one
partition per file (the r5 jar-gap closure, same trick as
``sqlite_ds.py``) and, as of r6, WRITES distributed too
(``avro_py.write_avro_dataset`` — per-task container files, temp-name +
driver-commit rename). No jar gate remains on the Avro path.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def read_orc(
    spark: SparkSession,
    path: str | Path,
    columns: list[str] | None = None,
) -> DataFrame:
    # NOTE: predicate pushdown rides the session default
    # (spark.sql.orc.filterPushdown, true since Spark 2.4) — deliberately
    # NOT forced here: a read helper must not mutate shared session
    # config behind the caller's back.
    df = spark.read.orc(str(path))
    return df.select(*columns) if columns else df


def write_orc(
    df: DataFrame,
    path: str | Path,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Size-bounded ORC files; directory-partitioned when asked — the
    layout partition pruning needs (same contract as the parquet sink)."""
    w = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(str(path))


def write_avro(df: DataFrame, path: str | Path) -> None:
    """Jar-free distributed Avro write via the pure-stdlib writer
    (``avro_py.write_avro_dataset``: per-task container files, temp-name
    + driver-commit rename). With the external spark-avro jar this would
    be ``df.write.format('avro')`` — same on-disk format, so swapping in
    the jar later changes nothing for readers."""
    from etl_python_sqlite_spark.sources.avro_py import write_avro_dataset

    write_avro_dataset(df, str(path))


def read_avro(spark: SparkSession, path: str | Path) -> DataFrame:
    """Jar-free Avro read via the pure-stdlib Python DataSource."""
    from etl_python_sqlite_spark.sources.avro_py import read_avro as _ra

    return _ra(spark, str(path))
