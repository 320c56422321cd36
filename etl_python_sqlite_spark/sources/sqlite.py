"""SQLite source/sink bridge.

The reference's storage layer is an embedded SQLite file (reference
scr/etl_batch.py:181). On Spark the first-choice connector is JDBC
(``spark.read.format("jdbc")`` with the xerial sqlite-jdbc driver), which
distributes partitioned reads across executors. That driver jar is not
present in this environment, so the bridge degrades gracefully:

1. **JDBC path** (used when the driver class is reachable — session.py
   probes ``$SPARK_GRAFT_SQLITE_JDBC_JAR``): predicate pushdown +
   ``partitionColumn/lowerBound/upperBound/numPartitions`` for parallel
   scans.
2. **Python DataSource path** (``sources/sqlite_ds.py``, Spark 4
   ``pyspark.sql.datasource`` — no jar needed): DISTRIBUTED rowid-range
   partitioned scans + conjunctive filter pushdown over stdlib
   ``sqlite3``, read-only URI connections per task. The default in this
   jar-less environment.
3. **Driver-side bridge** (last resort): ``sqlite3`` → Arrow-backed
   ``createDataFrame``. Single-node read — appropriate for
   dimension-sized tables only, which is exactly what the reference's
   SQLite databases hold (its README scopes the project to small data).
   Large fact data belongs in parquet.
"""

from __future__ import annotations

import sqlite3
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

JDBC_DRIVER = "org.sqlite.JDBC"


def _jdbc_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(JDBC_DRIVER)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_sqlite(
    spark: SparkSession,
    db_path: str | Path,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Read one SQLite table as a DataFrame.

    Strategy: JDBC if the driver jar is reachable, else the distributed
    Python DataSource (rowid-partitioned, filter-pushdown), else the
    driver-side pandas bridge.
    """
    if _jdbc_available(spark):
        reader = (
            spark.read.format("jdbc")
            .option("url", f"jdbc:sqlite:{db_path}")
            .option("dbtable", table)
            .option("driver", JDBC_DRIVER)
        )
        if partition_column:
            con = sqlite3.connect(str(db_path))
            lo, hi = con.execute(
                f"SELECT MIN({partition_column}), MAX({partition_column}) FROM {table}"
            ).fetchone()
            con.close()
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("lowerBound", str(lo or 0))
                .option("upperBound", str(hi or 1))
                .option("numPartitions", str(num_partitions))
            )
        return reader.load()

    try:
        from etl_python_sqlite_spark.sources.sqlite_ds import (
            FORMAT_NAME,
            register_sqlite_source,
        )

        register_sqlite_source(spark)
        return (
            spark.read.format(FORMAT_NAME)
            .option("path", str(db_path))
            .option("table", table)
            .option("numPartitions", str(num_partitions))
            .load()
        )
    except Exception:
        # datasource API unavailable (pre-Spark-4 session) — last resort
        pass

    con = sqlite3.connect(str(db_path))
    try:
        pdf = pd.read_sql_query(f"SELECT * FROM {table}", con)
    finally:
        con.close()
    return spark.createDataFrame(pdf)


def write_sqlite(
    df: DataFrame,
    db_path: str | Path,
    table: str,
    mode: str = "append",
    if_exists_unique_keys: list[str] | None = None,
    max_rows: int = 5_000_000,
    force: bool = False,
) -> int:
    """Write a DataFrame into a SQLite table.

    ``if_exists_unique_keys`` emulates INSERT OR IGNORE: rows whose key
    already exists are skipped (reference scr/etl_batch.py:139-146).
    Driver-side by design — SQLite is a single-writer embedded store, so a
    distributed write would serialize on the file lock anyway. Returns the
    number of rows actually inserted.

    Because the write MATERIALIZES the frame on the driver
    (``toPandas``), a frame bigger than driver memory would OOM the JVM
    instead of failing cleanly — so the write collects AT MOST
    ``max_rows + 1`` rows in ONE action (``limit`` bounds driver memory
    without a separate count that would execute the upstream lineage
    twice — code-review r10) and refuses if the limit was hit, unless
    ``force=True``. Callers shipping genuinely huge frames to a
    single-writer SQLite file are making a scale mistake this guard is
    meant to surface, not hide.
    """
    if force:
        pdf = df.toPandas()
    else:
        pdf = df.limit(max_rows + 1).toPandas()
        if len(pdf) > max_rows:
            raise ValueError(
                f"write_sqlite: frame exceeds max_rows={max_rows}; a "
                "driver-side SQLite write would materialize all of it "
                "in driver memory. Pass force=True if you really mean "
                "it, or write parquet and bulk-load instead."
            )
    con = sqlite3.connect(str(db_path))
    try:
        cur = con.cursor()
        cols = list(pdf.columns)
        col_list = ", ".join(cols)
        placeholders = ", ".join("?" for _ in cols)
        if mode == "overwrite":
            cur.execute(f"DROP TABLE IF EXISTS {table}")
        ddl_cols = ", ".join(f"{c}" for c in cols)
        unique = (
            f", UNIQUE({', '.join(if_exists_unique_keys)})"
            if if_exists_unique_keys
            else ""
        )
        cur.execute(f"CREATE TABLE IF NOT EXISTS {table} ({ddl_cols}{unique})")
        before = cur.execute(f"SELECT COUNT(*) FROM {table}").fetchone()[0]
        verb = "INSERT OR IGNORE" if if_exists_unique_keys else "INSERT"
        cur.executemany(
            f"{verb} INTO {table} ({col_list}) VALUES ({placeholders})",
            [tuple(r) for r in pdf.itertuples(index=False, name=None)],
        )
        con.commit()
        after = cur.execute(f"SELECT COUNT(*) FROM {table}").fetchone()[0]
        return after - before
    finally:
        con.close()


def list_tables(db_path: str | Path) -> list[str]:
    """sqlite_master introspection — reference scr/etl_incremental_audit.py:116-120."""
    con = sqlite3.connect(str(db_path))
    try:
        rows = con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name"
        ).fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()
