"""CSV sources with csv.DictReader parity (all-string schema-on-read).

The reference reads CSVs with ``csv.DictReader`` — every value a string,
header-driven columns (reference scr/etl_from_csv.py:9-12). Spark's CSV
reader without ``inferSchema`` already yields all-string columns; we keep
that and expose per-file and whole-directory scans.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: DictReader yields '' for an empty field and None only for fields missing
#: from a short row. Spark's default nullValue="" would turn empty fields
#: into null and misroute them to the None-validation reject branch, so we
#: point nullValue at a sentinel that never occurs in real data; short rows
#: still yield genuine nulls.
_NULL_SENTINEL = "\x00\x00"


def read_csv_all_string(spark: SparkSession, path: str | Path) -> DataFrame:
    """One CSV file → all-string DataFrame (DictReader semantics)."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("nullValue", _NULL_SENTINEL)
        .csv(str(path))
    )


def read_csv_directory(spark: SparkSession, glob: str | Path) -> DataFrame:
    """Directory scan with per-file lineage via ``input_file_name()``.

    Single multi-file read — the scan parallelizes across files; the
    ``source_file`` column preserves the reference's per-file audit
    granularity (scr/etl_batch.py:183-195) without a driver-side loop.
    """
    df = (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("nullValue", _NULL_SENTINEL)
        .csv(str(glob))
    )
    return df.withColumn(
        "source_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )


def list_csv_files(data_in: str | Path) -> list[Path]:
    """Sorted enumeration — reference scr/etl_batch.py:175."""
    return sorted(Path(data_in).glob("*.csv"))
