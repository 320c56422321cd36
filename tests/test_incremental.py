"""Incremental aggregate maintenance (operators/incremental.py): the
merge of partial states must equal a from-scratch rebuild — on any
split of the rows, under any merge grouping (pairwise / hierarchical /
all-at-once), because every carried statistic is a monoid. Also pins
the read-time mean finalization to the integer half-up formula and the
SCD1 latest-wins merge (operators/snapshot.scd1_merge)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.incremental import (
    build_agg_state,
    finalize_avg_micro,
    merge_agg_states,
)
from etl_python_sqlite_spark.operators.snapshot import scd1_merge


@pytest.fixture(scope="module")
def rows(spark):
    rng = random.Random(7)
    data = [
        (rng.choice("abc"), rng.choice("xy"), rng.randrange(-500, 10_000))
        for _ in range(5000)
    ]
    return spark.createDataFrame(data, "k1 string, k2 string, v long")


def _as_dict(state):
    return {
        (r["k1"], r["k2"]): (r["n"], r["sum"], r["min"], r["max"])
        for r in state.collect()
    }


def test_merge_equals_rebuild(spark, rows):
    full = _as_dict(build_agg_state(rows, ["k1", "k2"], "v"))
    # three disjoint splits by hash — arbitrary, covers empty-ish groups
    parts = [
        build_agg_state(rows.filter(F.pmod(F.xxhash64("v"), F.lit(3)) == i), ["k1", "k2"], "v")
        for i in range(3)
    ]
    assert _as_dict(merge_agg_states(*parts)) == full
    # associativity: pairwise then merge-in-the-rest
    ab = merge_agg_states(parts[0], parts[1])
    assert _as_dict(merge_agg_states(ab, parts[2])) == full
    # idempotent shape: merging a single state is the state
    assert _as_dict(merge_agg_states(parts[0])) == _as_dict(parts[0])


def test_merge_with_disjoint_key_sets(spark):
    a = spark.createDataFrame([("a", "x", 5), ("a", "x", 7)], "k1 string, k2 string, v long")
    b = spark.createDataFrame([("b", "y", -3)], "k1 string, k2 string, v long")
    sa, sb = (build_agg_state(d, ["k1", "k2"], "v") for d in (a, b))
    m = _as_dict(merge_agg_states(sa, sb))
    assert m == {("a", "x"): (2, 12, 5, 7), ("b", "y"): (1, -3, -3, -3)}


def test_merge_rejects_schema_mismatch(spark, rows):
    s = build_agg_state(rows, ["k1", "k2"], "v")
    bad = s.withColumnRenamed("k2", "zz")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_agg_states(s, bad)
    with pytest.raises(ValueError, match="at least one"):
        merge_agg_states()


def test_finalize_avg_micro_integer_half_up(spark):
    d = spark.createDataFrame([("a", 1), ("a", 2)], "k string, v long")
    st = finalize_avg_micro(build_agg_state(d, ["k"], "v"))
    # mean 1.5 → half-up in micro-units = 1_500_000
    assert st.collect()[0]["avg_micro"] == 1_500_000
    d2 = spark.createDataFrame([("a", 1), ("a", 1), ("a", 2)], "k string, v long")
    st2 = finalize_avg_micro(build_agg_state(d2, ["k"], "v"))
    # 4/3 = 1.333333(3) → floor at half-up micro = 1_333_333
    assert st2.collect()[0]["avg_micro"] == 1_333_333


def test_scd1_merge_latest_wins(spark):
    target = spark.createDataFrame(
        [(1, "old", 10), (2, "keep", 20)], "k long, s string, ord long"
    )
    updates = spark.createDataFrame(
        [(1, "new", 15), (3, "ins", 5)], "k long, s string, ord long"
    )
    out = {
        r["k"]: r["s"]
        for r in scd1_merge(target, updates, ["k"], ["ord"]).collect()
    }
    # update overwrites, absent key survives, new key inserts
    assert out == {1: "new", 2: "keep", 3: "ins"}
    # an older update must NOT overwrite a newer target row
    stale = spark.createDataFrame([(1, "stale", 5)], "k long, s string, ord long")
    out2 = {
        r["k"]: r["s"] for r in scd1_merge(target, stale, ["k"], ["ord"]).collect()
    }
    assert out2[1] == "old"


def test_scd1_merge_validates_args(spark):
    d = spark.createDataFrame([(1, "a", 1)], "k long, s string, ord long")
    with pytest.raises(ValueError, match="key"):
        scd1_merge(d, d, [], ["ord"])
    with pytest.raises(ValueError, match="order"):
        scd1_merge(d, d, ["k"], [])


def test_scd1_merge_single_shuffle_no_join(spark):
    d1 = spark.createDataFrame([(1, "a", 1)], "k long, s string, ord long")
    d2 = spark.createDataFrame([(1, "b", 2)], "k long, s string, ord long")
    plan = scd1_merge(d1, d2, ["k"], ["ord"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # window over union, not a join-based upsert
