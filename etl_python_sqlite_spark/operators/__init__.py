"""Relational + pipeline operators built on the DataFrame API."""

from etl_python_sqlite_spark.operators.idempotent import (
    idempotent_append,
    upsert_dimension,
)
from etl_python_sqlite_spark.operators.transform import (
    REJECT_REASONS,
    annotate_rejections,
    transform_with_rejections,
)

__all__ = [
    "transform_with_rejections",
    "annotate_rejections",
    "REJECT_REASONS",
    "idempotent_append",
    "upsert_dimension",
]
