"""Compliance purge (operators/purge.purge_keys): partition-pruned
delete semantics, untouched-partition file immutability, the
fully-purged-partition hazard, and the audit contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.purge import purge_keys


def _write(spark, path):
    rows = [
        (uid, f"evt{uid}_{i}", uid % 4)  # partitions 0..3, 3 rows/user
        for uid in range(12)
        for i in range(3)
    ]
    (
        spark.createDataFrame(rows, "user_id long, payload string, part int")
        .repartition(4)
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(path)
    )


def _files(path):
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


def test_purge_deletes_only_matching_rows(spark, tmp_path):
    path = str(tmp_path / "ds")
    _write(spark, path)
    before = _files(path)
    # purge users 1 and 5 — both live in partition part=1
    keys = spark.createDataFrame(
        [(1, 1), (5, 1)], "user_id long, part int"
    )
    audit = purge_keys(spark, path, keys, ["user_id"], "part")
    assert audit == {
        "partitions_rewritten": 1,
        "rows_deleted": 6,
        "rows_kept": 3,  # user 9 stays in part=1
    }
    got = spark.read.parquet(path)
    assert got.filter(F.col("user_id").isin(1, 5)).count() == 0
    assert got.count() == 36 - 6
    # untouched partitions' files are BYTE-identical (never rewritten)
    after = _files(path)
    untouched_before = {
        p: m for p, m in before.items() if "part=1" not in p
    }
    untouched_after = {
        p: m for p, m in after.items() if "part=1" not in p
    }
    assert untouched_before == untouched_after


def test_fully_purged_partition_is_removed(spark, tmp_path):
    """Dynamic overwrite only replaces partitions PRESENT in the
    output — with every row of part=2 doomed there are no survivor
    rows for it, and without the explicit directory delete the doomed
    rows would silently survive."""
    path = str(tmp_path / "ds2")
    _write(spark, path)
    # users 2, 6, 10 are ALL of partition part=2
    keys = spark.createDataFrame(
        [(2, 2), (6, 2), (10, 2)], "user_id long, part int"
    )
    audit = purge_keys(spark, path, keys, ["user_id"], "part")
    assert audit["rows_deleted"] == 9
    assert audit["rows_kept"] == 0
    got = spark.read.parquet(path)
    assert got.filter(F.col("part") == 2).count() == 0
    assert got.count() == 36 - 9
    assert not os.path.isdir(os.path.join(path, "part=2"))


def test_empty_key_set_is_a_noop(spark, tmp_path):
    path = str(tmp_path / "ds3")
    _write(spark, path)
    before = _files(path)
    keys = spark.createDataFrame([], "user_id long, part int")
    audit = purge_keys(spark, path, keys, ["user_id"], "part")
    assert audit == {
        "partitions_rewritten": 0,
        "rows_deleted": 0,
        "rows_kept": 0,
    }
    assert _files(path) == before


def test_purge_is_idempotent(spark, tmp_path):
    """Replaying the same purge (the compliance job's retry case)
    deletes nothing further and leaves identical content."""
    path = str(tmp_path / "ds4")
    _write(spark, path)
    keys = spark.createDataFrame([(3, 3)], "user_id long, part int")
    a1 = purge_keys(spark, path, keys, ["user_id"], "part")
    assert (a1["rows_deleted"], a1["rows_kept"]) == (3, 6)
    a2 = purge_keys(spark, path, keys, ["user_id"], "part")
    assert (a2["rows_deleted"], a2["rows_kept"]) == (0, 6)
    assert spark.read.parquet(path).count() == 33


def test_verify_catches_stale_partition_mapping(spark, tmp_path):
    """A subject with rows in a partition the keys frame did NOT list
    must fail loudly (default verify_complete=True) — a compliance
    delete that silently misses rows is the worst failure mode."""
    import pytest

    path = str(tmp_path / "ds5")
    _write(spark, path)
    # user 1 lives in part=1; claim (wrongly) they are only in part=0
    keys = spark.createDataFrame([(1, 0)], "user_id long, part int")
    with pytest.raises(RuntimeError, match="purge incomplete"):
        purge_keys(spark, path, keys, ["user_id"], "part")
    # opting out skips the complement scan and trusts the caller
    audit = purge_keys(
        spark, path, keys, ["user_id"], "part", verify_complete=False
    )
    assert audit["rows_deleted"] == 0  # nothing matched inside part=0


def test_nonexistent_partition_value_not_counted_as_work(spark, tmp_path):
    path = str(tmp_path / "ds6")
    _write(spark, path)
    # part=99 does not exist; part=1 does and holds user 1
    keys = spark.createDataFrame(
        [(1, 1), (777, 99)], "user_id long, part int"
    )
    audit = purge_keys(
        spark, path, keys, ["user_id"], "part", verify_complete=False
    )
    assert audit["partitions_rewritten"] == 1  # only part=1 held rows
    assert audit["rows_deleted"] == 3


def test_purge_that_empties_every_partition(spark, tmp_path):
    """ADVICE r9: a purge that dooms EVERY row must not crash the
    verify pass on the then-empty root, and must leave an empty-dataset
    end state (no partition dirs)."""
    path = str(tmp_path / "ds_all")
    _write(spark, path)
    keys = spark.createDataFrame(
        [(uid, uid % 4) for uid in range(12)], "user_id long, part int"
    )
    audit = purge_keys(
        spark, path, keys, ["user_id"], "part", verify_complete=True
    )
    assert audit["rows_deleted"] == 36 and audit["rows_kept"] == 0
    assert audit["partitions_rewritten"] == 4
    # no partition dirs remain
    assert not [
        d for d in os.listdir(path) if d.startswith("part=")
    ]
