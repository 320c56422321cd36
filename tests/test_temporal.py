"""As-of and range join operators vs hand-computed ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.temporal import asof_join, range_join_within


def test_asof_join_basic(spark):
    trades = spark.createDataFrame(
        [("A", 10, "t1"), ("A", 25, "t2"), ("B", 5, "t3"), ("A", 3, "t4")],
        "sym string, t long, trade_id string",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 10, 101.0), ("A", 20, 102.0), ("B", 9, 50.0)],
        "sym string, t long, px double",
    )
    out = {
        r["trade_id"]: r["px_asof"]
        for r in asof_join(
            trades, quotes, by="sym", left_time="t", right_time="t",
            right_payload=["px"],
        ).collect()
    }
    assert out["t1"] == 101.0   # equal timestamp → inclusive match
    assert out["t2"] == 102.0   # latest at-or-before 25
    assert out["t3"] is None    # B has no quote ≤ 5
    assert out["t4"] is None    # before any A quote


def test_asof_join_tie_break(spark):
    left = spark.createDataFrame([("A", 10, "x")], "k string, t long, lid string")
    right = spark.createDataFrame(
        [("A", 10, 1), ("A", 10, 7), ("A", 10, 3)], "k string, t long, rid int"
    )
    out = asof_join(
        left, right, by="k", left_time="t", right_time="t", right_payload=["rid"]
    ).first()
    assert out["rid_asof"] == 7  # max payload id wins deterministically


def test_range_join_matches_brute_force(spark):
    import random

    rng = random.Random(5)
    rows = [
        (rng.randrange(3), i, rng.randrange(0, 10_000)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long")
    got = {
        (r["user_id"], r["id_a"], r["id_b"], r["gap_s"])
        for r in range_join_within(
            df, by="user_id", time_col="ts", max_gap_s=500, id_col="event_id"
        ).collect()
    }
    expected = {
        (u1, i1, i2, t2 - t1)
        for (u1, i1, t1) in rows
        for (u2, i2, t2) in rows
        if u1 == u2 and 0 < t2 - t1 <= 500
    }
    assert got == expected


def test_gap_fill_interpolate_basic(spark):
    from etl_python_sqlite_spark.operators.temporal import gap_fill_interpolate

    obs = spark.createDataFrame(
        [
            (1, 10, 100), (1, 13, 400),          # gap 11,12 → 200, 300
            (2, 5, 1000), (2, 7, -200),          # negative slope: 6 → 400
            (3, 42, 7),                          # single obs → no gaps
        ],
        "user_id long, hr long, v_micro long",
    )
    got = {
        (r["user_id"], r["hr"]): (r["v_micro"], r["filled"])
        for r in gap_fill_interpolate(obs).collect()
    }
    assert got == {
        (1, 10): (100, False), (1, 11): (200, True),
        (1, 12): (300, True), (1, 13): (400, False),
        (2, 5): (1000, False), (2, 6): (400, True), (2, 7): (-200, False),
        (3, 42): (7, False),
    }


def test_gap_fill_interpolate_truncation_matches_duckdb(spark):
    """Uneven span: interpolated values hit the truncating-div corner on
    both engines identically (negative delta, non-divisible span)."""
    import duckdb

    from etl_python_sqlite_spark.operators.temporal import gap_fill_interpolate

    duck_con = duckdb.connect()

    obs = spark.createDataFrame(
        [(1, 0, 10), (1, 7, -10)],
        "user_id long, hr long, v_micro long",
    )
    got = sorted(
        (r["user_id"], r["hr"], r["v_micro"], r["filled"])
        for r in gap_fill_interpolate(obs).collect()
    )
    exp = duck_con.execute(
        """
        WITH spine AS (SELECT 1 AS user_id, unnest(range(0, 8)) AS hr),
        j AS (SELECT s.user_id, s.hr,
                     CASE WHEN s.hr = 0 THEN 10
                          WHEN s.hr = 7 THEN -10 END AS v
              FROM spine s)
        SELECT user_id, hr,
               COALESCE(v, 10 + ((-10 - 10) * (hr - 0)) // (7 - 0)) AS v_micro,
               v IS NULL AS filled
        FROM j ORDER BY user_id, hr
        """
    ).fetchall()
    assert got == [tuple(r) for r in exp]
