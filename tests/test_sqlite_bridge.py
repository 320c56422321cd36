"""SQLite bridge roundtrip tests (driver-side fallback path)."""

from __future__ import annotations

import sqlite3

from etl_python_sqlite_spark.sources.sqlite import (
    list_tables,
    read_sqlite,
    write_sqlite,
)


def test_read_roundtrip(spark, tmp_path):
    db = str(tmp_path / "ref.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE ciudades (ciudad_id INTEGER PRIMARY KEY, nombre TEXT)")
    con.executemany(
        "INSERT INTO ciudades VALUES (?, ?)", [(1, "Lima"), (2, "Quito")]
    )
    con.commit()
    con.close()

    df = read_sqlite(spark, db, "ciudades")
    assert {(r["ciudad_id"], r["nombre"]) for r in df.collect()} == {
        (1, "Lima"),
        (2, "Quito"),
    }
    assert list_tables(db) == ["ciudades"]


def test_write_with_insert_or_ignore(spark, tmp_path):
    db = str(tmp_path / "out.db")
    df = spark.createDataFrame(
        [("Ana", 30), ("Luis", 40)], "nombre string, edad long"
    )
    n1 = write_sqlite(df, db, "personas", if_exists_unique_keys=["nombre", "edad"])
    assert n1 == 2
    # idempotent re-write: INSERT OR IGNORE semantics
    n2 = write_sqlite(df, db, "personas", if_exists_unique_keys=["nombre", "edad"])
    assert n2 == 0

    back = read_sqlite(spark, db, "personas")
    assert back.count() == 2
