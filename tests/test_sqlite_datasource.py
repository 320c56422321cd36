"""Distributed SQLite Python DataSource (sources/sqlite_ds.py): rowid
partitioning, filter pushdown translation, parity with the driver-side
bridge, and the read_sqlite strategy ladder."""

from __future__ import annotations

import pytest
import sqlite3

from pyspark.sql import functions as F

from etl_python_sqlite_spark.sources.sqlite import read_sqlite
from etl_python_sqlite_spark.sources.sqlite_ds import (
    FORMAT_NAME,
    SqliteScanReader,
    _push_one,
    _table_schema,
    register_sqlite_source,
)


def _make_db(path: str, n: int = 100) -> None:
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE medidas (id INTEGER PRIMARY KEY, nombre TEXT,"
        " valor REAL, payload BLOB)"
    )
    con.executemany(
        "INSERT INTO medidas VALUES (?, ?, ?, ?)",
        [
            (i, f"n{i % 7}", i * 1.5, bytes([i % 256, 1]))
            for i in range(1, n + 1)
        ],
    )
    con.commit()
    con.close()


def test_schema_inference_affinity_mapping(tmp_path):
    db = str(tmp_path / "a.db")
    _make_db(db)
    sch = _table_schema(db, "medidas")
    assert [(f.name, f.dataType.simpleString()) for f in sch.fields] == [
        ("id", "bigint"),
        ("nombre", "string"),
        ("valor", "double"),
        ("payload", "binary"),
    ]


def test_distributed_read_partitioned_and_parity(spark, tmp_path):
    db = str(tmp_path / "b.db")
    _make_db(db, n=250)
    register_sqlite_source(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .option("path", db)
        .option("table", "medidas")
        .option("numPartitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    got = {(r["id"], r["nombre"], r["valor"]) for r in df.collect()}
    assert len(got) == 250
    assert (1, "n1", 1.5) in got and (250, f"n{250 % 7}", 375.0) in got
    # blob column round-trips as bytes
    one = df.filter(F.col("id") == 3).select("payload").first()[0]
    assert bytes(one) == bytes([3, 1])


def test_filters_are_pushed_and_results_correct(spark, tmp_path):
    db = str(tmp_path / "c.db")
    _make_db(db, n=100)
    register_sqlite_source(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .option("path", db)
        .option("table", "medidas")
        .option("numPartitions", "4")
        .load()
    )
    out = df.filter((F.col("id") > 90) & (F.col("nombre") == "n6")).collect()
    want = {i for i in range(91, 101) if i % 7 == 6}
    assert {r["id"] for r in out} == want
    out2 = df.filter(F.col("nombre").startswith("n1")).count()
    assert out2 == sum(1 for i in range(1, 101) if f"n{i % 7}".startswith("n1"))


def test_push_one_translation_table():
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNull,
        Not,
        StringStartsWith,
    )

    assert _push_one(EqualTo(("a",), 3)) == ('"a" = ?', [3])
    assert _push_one(GreaterThan(("b",), 1.5)) == ('"b" > ?', [1.5])
    frag, params = _push_one(In(("c",), (1, 2)))
    assert frag == '"c" IN (?, ?)' and params == [1, 2]
    assert _push_one(IsNull(("d",))) == ('"d" IS NULL', [])
    frag, params = _push_one(StringStartsWith(("e",), "x%_y"))
    assert frag == '"e" LIKE ? ESCAPE \'\\\'' and params == ["x\\%\\_y%"]
    # unsupported → None (returned to Spark unpushed)
    assert _push_one(Not(EqualTo(("a",), 1))) is None


def test_reader_partitions_rowid_ranges(tmp_path):
    db = str(tmp_path / "d.db")
    _make_db(db, n=10)
    reader = SqliteScanReader(
        {"path": db, "table": "medidas", "numpartitions": "4"},
        _table_schema(db, "medidas"),
    )
    parts = reader.partitions()
    assert len(parts) == 4
    covered = sorted((p.lo, p.hi) for p in parts)
    assert covered[0][0] == 1 and covered[-1][1] == 10
    # contiguous, non-overlapping
    for (lo1, hi1), (lo2, _) in zip(covered, covered[1:]):
        assert lo2 == hi1 + 1


def test_read_sqlite_prefers_distributed_path(spark, tmp_path):
    """In this jar-less env read_sqlite must route through the Python
    DataSource (multi-partition plan), not the 1-partition pandas
    bridge."""
    db = str(tmp_path / "e.db")
    _make_db(db, n=50)
    df = read_sqlite(spark, db, "medidas", num_partitions=5)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 50


@pytest.mark.slow  # >8 s e2e/fuzz (default tier deselects)
def test_north_star_sqlite_to_target_pipeline(spark, tmp_path):
    """The north-star flow end-to-end on the distributed source:
    DataFrame read FROM SQLITE (rowid-partitioned Python DataSource) →
    the reference's motivo validation/normalization cascade → idempotent
    parquet target + audit row written BACK to SQLite (OR-IGNORE). A
    reference user's whole pipeline, no JDBC jar required."""
    from etl_python_sqlite_spark.operators.idempotent import idempotent_append
    from etl_python_sqlite_spark.operators.transform import (
        transform_with_rejections,
    )
    from etl_python_sqlite_spark.sources.sqlite import write_sqlite

    src_db = str(tmp_path / "ref_src.db")
    con = sqlite3.connect(src_db)
    con.execute(
        "CREATE TABLE personas (nombre TEXT, edad TEXT, ciudad TEXT)"
    )
    con.executemany(
        "INSERT INTO personas VALUES (?, ?, ?)",
        [
            ("ana maria", "30", "lima"),
            ("LUIS", "40", "quito"),
            ("pepe", "20", "bogota"),      # under edad_min -> reject
            ("rosa", "treinta", "cali"),   # bad int -> reject
            ("ana maria", "30", "lima"),   # duplicate -> OR-IGNORE drop
        ],
    )
    con.commit()
    con.close()

    raw = read_sqlite(spark, src_db, "personas", num_partitions=3)
    assert raw.rdd.getNumPartitions() == 3  # distributed read engaged

    valid, rejects = transform_with_rejections(raw)

    target = str(tmp_path / "personas_fact")
    res = idempotent_append(
        spark,
        valid.select("nombre", "edad", "ciudad"),
        target,
        keys=["nombre", "edad", "ciudad"],
    )
    assert res.inserted_new == 2  # dup collapsed in-batch
    assert rejects.count() == 2

    # re-run: INSERT OR IGNORE semantics on the target
    res2 = idempotent_append(
        spark,
        valid.select("nombre", "edad", "ciudad"),
        target,
        keys=["nombre", "edad", "ciudad"],
    )
    assert res2.inserted_new == 0

    # audit written back to SQLite, idempotently keyed
    audit_db = str(tmp_path / "audit.db")
    audit = spark.createDataFrame(
        [("run-1", res.inserted_new, 2)], "run_id string, inserted long, rejected long"
    )
    assert write_sqlite(audit, audit_db, "etl_runs",
                        if_exists_unique_keys=["run_id"]) == 1
    assert write_sqlite(audit, audit_db, "etl_runs",
                        if_exists_unique_keys=["run_id"]) == 0

    rows = {
        (r["nombre"], r["ciudad"])
        for r in spark.read.parquet(target).collect()
    }
    assert rows == {("Ana maria", "Lima"), ("Luis", "Quito")}


def test_sqlite_stream_tail_incremental(spark, tmp_path):
    """Structured-Streaming tail of a SQLite table by rowid: the first
    availableNow run drains the current rows; rows inserted AFTER it
    are picked up incrementally by a resumed run (same checkpoint) —
    none re-read, none missed."""
    from etl_python_sqlite_spark.sources.sqlite_ds import read_sqlite_stream

    db = str(tmp_path / "tail.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE feed (id INTEGER PRIMARY KEY, v TEXT)")
    con.executemany(
        "INSERT INTO feed VALUES (?, ?)", [(i, f"v{i}") for i in range(1, 6)]
    )
    con.commit()
    con.close()

    out = str(tmp_path / "tail_out")
    ckpt = str(tmp_path / "tail_ckpt")

    def drain():
        q = (
            read_sqlite_stream(spark, db, "feed")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(out)
        )
        q.awaitTermination(120)

    drain()
    assert {r["id"] for r in spark.read.parquet(out).collect()} == set(
        range(1, 6)
    )

    con = sqlite3.connect(db)
    con.executemany(
        "INSERT INTO feed VALUES (?, ?)", [(i, f"v{i}") for i in range(6, 9)]
    )
    con.commit()
    con.close()

    drain()  # resume: only rowids 6-8 are new
    rows = [r["id"] for r in spark.read.parquet(out).collect()]
    assert sorted(rows) == list(range(1, 9))  # no dup, no gap
