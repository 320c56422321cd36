"""Golden vectors for exact-Python-semantics normalization (FIXTURES.md §5).

Every expectation below is computed by the corresponding Python string
method — the source of truth the reference uses row-at-a-time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.functions.normalize import (
    py_capitalize,
    py_title,
    sanitize_token,
    strict_int,
)

CAP_CASES = [
    "  guillermo ", "NOEMI", "Naomi ", "ana maría", "SAN LUIS", " san juan",
    "querétaro", "", "  ", "o'brien", "123abc", "ñandú grande",
]

TITLE_CASES = [
    " san juan", "SAN LUIS", "san luis potosí", "ana maría", "o'brien",
    "ciudad  de   méxico", "x", "", "don't stop", "a1b c2d", "québec",
]

INT_CASES = [
    ("26", 26), (" 26 ", 26), ("26 ", 26), ("+7", 7), ("-30", -30),
    ("error", None), ("26.5", None), ("", None), (" ", None),
    ("1e3", None), ("0x1A", None), ("12 3", None), ("--5", None),
]


def _run_one(spark, expr, value: str) -> str:
    return (
        spark.createDataFrame([(value,)], "v: string")
        .select(expr.alias("out"))
        .first()["out"]
    )


@pytest.mark.parametrize("raw", CAP_CASES)
def test_py_capitalize_matches_python(spark, raw):
    expected = raw.strip().lower().capitalize()
    assert _run_one(spark, py_capitalize("v"), raw) == expected


@pytest.mark.parametrize("raw", TITLE_CASES)
def test_py_title_matches_python(spark, raw):
    expected = raw.strip().lower().title()
    assert _run_one(spark, py_title("v"), raw) == expected


@pytest.mark.parametrize("raw,expected", INT_CASES)
def test_strict_int_matches_python(spark, raw, expected):
    # source of truth: int(raw) with ValueError → None
    try:
        truth = int(raw)
    except ValueError:
        truth = None
    assert truth == expected, f"test vector wrong for {raw!r}"
    assert _run_one(spark, strict_int("v"), raw) == expected


def test_sanitize_token_matches_python(spark):
    raw = "archivo-01 (v2).csv"
    expected = "".join(ch if ch.isalnum() else "_" for ch in raw)
    assert _run_one(spark, sanitize_token("v"), raw) == expected
