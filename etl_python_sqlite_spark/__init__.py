"""etl_python_sqlite_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL project ``Guma265/etl-python-sqlite``
(CSV extract → per-row validation/normalization with reject routing →
idempotent load into a star schema with run auditing), extended with the
operators a large-scale training-data pipeline needs (dedup, similarity
search, text analysis, multimodal column plumbing).

Design notes
------------
* Everything is declared through the DataFrame / SQL API so Catalyst gets
  predicate pushdown, column pruning, join planning and AQE for free.
* The only genuinely custom machinery (idempotent append, surrogate-key
  dimension upsert, exact-Python normalization semantics) lives as library
  code *above* the DataFrame API — no custom Catalyst rules are needed.
* Python UDFs are avoided in hot paths; where Python is unavoidable the
  code uses Arrow-batched pandas UDFs / ``mapInPandas``.
"""

from etl_python_sqlite_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
