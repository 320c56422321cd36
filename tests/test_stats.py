"""Exact OLS (operators/stats.ols_by_group) pinned against an independent
CPython big-int re-derivation, and against the real-valued estimator."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.stats import ols_by_group


def _py_ols(rows):
    """Independent re-derivation with CPython unbounded ints."""
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    sxx = sum(x * x for x, _ in rows)
    sxy = sum(x * y for x, y in rows)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    slope = (num * 1_000_000) // den  # CPython // IS floor division
    intercept = (sy * 1_000_000 - slope * sx) // n
    return n, sx, sy, slope, intercept


def _run(spark, data):
    df = spark.createDataFrame(data, "g string, x long, y long")
    out = ols_by_group(df, ["g"], F.col("x"), F.col("y")).orderBy("g")
    return {
        r["g"]: (r["n"], r["sum_x"], r["sum_y"], r["slope_micro"],
                 r["intercept_micro"])
        for r in out.collect()
    }


def test_ols_matches_cpython_rederivation(spark):
    rng = random.Random(7)
    data = []
    groups = {}
    for g, slope, icept in (("up", 3.5, 100.0), ("down", -2.25, 9000.0),
                            ("flat", 0.0, 42.0)):
        rows = []
        for _ in range(200):
            x = rng.randrange(1, 5000)
            noise = rng.randrange(-500, 501)
            y = int(slope * x + icept) + noise
            rows.append((x, y))
            data.append((g, x, y))
        groups[g] = rows
    got = _run(spark, data)
    for g, rows in groups.items():
        assert got[g] == _py_ols(rows), g


def test_ols_recovers_planted_slope(spark):
    # noise-free exact line: y = 7x + 13 in micro-units must be exact
    data = [("g", x, 7 * x + 13) for x in range(1, 100)]
    got = _run(spark, data)
    n, sx, sy, slope, intercept = got["g"]
    assert slope == 7_000_000
    assert intercept == 13_000_000


def test_ols_negative_slope_floor_semantics(spark):
    # a descending line whose numerator is negative exercises the
    # portable floor-division identity (truncation would round UP here)
    data = [("g", x, 1000 - 3 * x) for x in range(1, 50)]
    got = _run(spark, data)
    assert got["g"] == _py_ols([(x, y) for _, x, y in data])
    assert got["g"][3] == -3_000_000


def test_ols_constant_x_group_yields_null_not_crash(spark):
    """A constant-x group (den = 0) must surface NULL slope/intercept —
    under ANSI mode an unguarded decimal divide-by-zero would abort the
    WHOLE query for one degenerate group (ADVICE r4). Healthy groups in
    the same frame stay exact."""
    data = [("const", 5, y) for y in (10, 20, 30)] + [
        ("ok", x, 7 * x + 13) for x in range(1, 20)
    ]
    got = _run(spark, data)
    n, sx, sy, slope, intercept = got["const"]
    assert (n, sx, sy) == (3, 15, 60)
    assert slope is None and intercept is None
    assert got["ok"][3] == 7_000_000
