"""Two-level distributed rank selection (operators/selection.py): the
coarse/fine form must return EXACTLY the same order statistics as the
naive full-histogram cumulative sum, on randomized and adversarial
histograms, and its windows must only ever see bounded row sets."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.selection import (
    grouped_rank_select,
    grouped_rank_select_naive,
)

RANKS = {
    "median": "(n + 1) div 2",
    "p01": "(10000 * n + 999999) div 1000000",
    "p99": "(990000 * n + 999999) div 1000000",
}


def _py_rank(values: list[int], k: int) -> int:
    return sorted(values)[k - 1]


@pytest.fixture(scope="module")
def hist(spark):
    rng = random.Random(42)
    rows = []
    for grp in ["a", "b", "c"]:
        for _ in range(2000):
            rows.append((grp, rng.randrange(0, 1_000_000), rng.randrange(1, 4)))
    # adversarial: group with every value inside ONE coarse band
    for _ in range(500):
        rows.append(("narrow", 8192 + rng.randrange(0, 100), 1))
    # group with a single row
    rows.append(("single", 777, 5))
    df = spark.createDataFrame(rows, "g string, v long, cnt long")
    return df.groupBy("g", "v").agg(F.sum("cnt").alias("cnt"))


def test_two_level_equals_naive(spark, hist):
    fast = {
        r["g"]: r
        for r in grouped_rank_select(
            hist, "g", "v", "cnt", RANKS, coarse_step=4096
        ).collect()
    }
    ref = {
        r["g"]: r
        for r in grouped_rank_select_naive(hist, "g", "v", "cnt", RANKS).collect()
    }
    assert set(fast) == set(ref)
    for g in ref:
        for name in [*RANKS, "n"]:
            assert fast[g][name] == ref[g][name], (g, name)


def test_matches_python_reference(spark, hist):
    rows = hist.collect()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["g"], []).extend([r["v"]] * r["cnt"])
    out = {
        r["g"]: r
        for r in grouped_rank_select(hist, "g", "v", "cnt", RANKS).collect()
    }
    for g, values in by_g.items():
        n = len(values)
        assert out[g]["n"] == n
        assert out[g]["median"] == _py_rank(values, (n + 1) // 2)
        assert out[g]["p01"] == _py_rank(values, (10000 * n + 999999) // 1000000)
        assert out[g]["p99"] == _py_rank(values, (990000 * n + 999999) // 1000000)


def test_degenerate_step_one_and_huge_step(spark, hist):
    """step=1 (every value its own band) and a step larger than the
    domain (single band) are both degenerate but must stay exact."""
    ref = {
        r["g"]: r
        for r in grouped_rank_select_naive(
            hist, "g", "v", "cnt", {"median": "(n + 1) div 2"}
        ).collect()
    }
    for step in (1, 10_000_000):
        got = {
            r["g"]: r
            for r in grouped_rank_select(
                hist, "g", "v", "cnt", {"median": "(n + 1) div 2"}, step
            ).collect()
        }
        for g in ref:
            assert got[g]["median"] == ref[g]["median"], (step, g)
