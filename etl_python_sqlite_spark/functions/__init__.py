"""Column-expression library (JVM-side, whole-stage-codegen friendly)."""

from etl_python_sqlite_spark.functions.normalize import (
    py_capitalize,
    py_title,
    sanitize_token,
    strict_int,
)

__all__ = ["py_capitalize", "py_title", "strict_int", "sanitize_token"]
