"""The motivo cascade vs the reference's transform_with_rejections.

Fixture = the canonical dirty rows (reference data/in/personas_crudas.csv
patterns + FIXTURES.md §1), expectations derived from executing the
reference semantics (scr/etl_relational.py:18-94) by hand.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.transform import transform_with_rejections

RAW_SCHEMA = "nombre string, edad string, ciudad string"

DIRTY_ROWS = [
    ("  guillermo ", "26", "san luis"),        # valid, whitespace noise
    ("NOEMI", "52", "SAN LUIS"),               # valid, case noise
    ("Naomi ", "23", " san juan"),             # reject: Edad < 25
    ("Pedro", "error", "Querétaro"),           # reject: Edad no convertible a int
    ("ana maría", "31", "san luis potosí"),    # valid, multi-word city
    (None, "40", "Lima"),                      # reject: None value
    ("Luis", "26 ", "Bogotá"),                 # valid: int('26 ') == 26
    ("Eva", "26.5", "Quito"),                  # reject: int('26.5') raises
]


def test_valid_and_reject_split(spark):
    raw = spark.createDataFrame(DIRTY_ROWS, RAW_SCHEMA)
    valid, rejects = transform_with_rejections(raw, edad_min=25)

    got_valid = {tuple(r) for r in valid.collect()}
    assert got_valid == {
        ("Guillermo", 26, "San Luis"),
        ("Noemi", 52, "San Luis"),
        ("Ana maría", 31, "San Luis Potosí"),   # capitalize ≠ title
        ("Luis", 26, "Bogotá"),
    }

    got_rejects = {(r["nombre"], r["edad"], r["motivo"]) for r in rejects.collect()}
    assert got_rejects == {
        ("Naomi ", "23", "Edad < 25"),
        ("Pedro", "error", "Edad no convertible a int"),
        ("", "40", "Valor None en campo requerido"),
        ("Eva", "26.5", "Edad no convertible a int"),
    }


def test_check_order_none_beats_bad_int(spark):
    # a row with BOTH a None field and an uncastable edad must take the
    # earlier check's reason (reference check order, scr/etl_relational.py:48-79)
    raw = spark.createDataFrame([("Ana", "error", None)], RAW_SCHEMA)
    _, rejects = transform_with_rejections(raw)
    assert rejects.first()["motivo"] == "Valor None en campo requerido"


def test_missing_required_column_rejects_all(spark):
    raw = spark.createDataFrame([("Ana", "30")], "nombre string, edad string")
    valid, rejects = transform_with_rejections(raw)
    assert valid.count() == 0
    rows = rejects.collect()
    assert all(r["motivo"] == "Faltan columnas requeridas" for r in rows)
    # rejected rows carry '' for the absent column (reference
    # scr/etl_relational.py:35-40 row.get(col, ""))
    assert rows[0]["ciudad"] == ""


def test_underage_boundary(spark):
    raw = spark.createDataFrame(
        [("A", "24", "X"), ("B", "25", "X")], RAW_SCHEMA
    )
    valid, rejects = transform_with_rejections(raw, edad_min=25)
    assert [r["nombre"] for r in valid.collect()] == ["B"]
    assert rejects.first()["motivo"] == "Edad < 25"
