"""Source connectors: parquet star schema, all-string CSV, SQLite bridge."""

from etl_python_sqlite_spark.sources.parquet import load_table

__all__ = ["load_table"]
