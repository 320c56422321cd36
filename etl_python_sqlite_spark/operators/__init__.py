"""Relational + pipeline operators built on the DataFrame API."""

from etl_python_sqlite_spark.operators.transform import (
    REJECT_REASONS,
    transform_with_rejections,
)

__all__ = ["transform_with_rejections", "REJECT_REASONS"]
