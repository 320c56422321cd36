"""Accuracy + mergeability contracts for the sketch rollups (estimates
are engine-internal, so the driver check is rows-only and THESE tests
pin the numbers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.sketch import (
    distinct_rollup_with_exact,
    hll_merge_rollup,
    hll_sketch_by,
    kll_quantiles_by,
)
from etl_python_sqlite_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


def test_hll_two_level_merge_accuracy(spark, events):
    """Day-level sketches unioned per event_type estimate within the
    published HLL bound (lgK=12 → ~1.6% RSE; assert 3σ ≈ 5%)."""
    ev = events.withColumn("day", F.date_trunc("day", "ts"))
    out = distinct_rollup_with_exact(
        ev, ["event_type", "day"], ["event_type"], "user_id", lgk=12
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_sketches_merged"] > 1  # a real multi-sketch merge
        rel = abs(r["distinct_estimate"] - r["distinct_exact"]) / r["distinct_exact"]
        assert rel <= 0.05, (r["event_type"], rel)


def test_hll_merge_equals_oneshot(spark, events):
    """Mergeability law: union of per-day sketches ≡ one-shot sketch of
    the whole column (identical binary → identical estimate)."""
    ev = events.withColumn("day", F.date_trunc("day", "ts"))
    merged = {
        r["event_type"]: r["distinct_estimate"]
        for r in hll_merge_rollup(
            hll_sketch_by(ev, ["event_type", "day"], "user_id"), ["event_type"]
        ).collect()
    }
    oneshot = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert merged == oneshot


def test_kll_quantiles_bracket_exact(spark, events):
    """KLL p50/p95 of value per event_type within rank tolerance of the
    exact percentile (k=200 → ~1.7% rank error; assert via exact
    quantiles at ±5% rank)."""
    qs = kll_quantiles_by(events, ["event_type"], "value", [0.5, 0.95]).collect()
    exact = {
        r["event_type"]: (r["lo50"], r["hi50"], r["lo95"], r["hi95"])
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.45)").alias("lo50"),
            F.expr("percentile(value, 0.55)").alias("hi50"),
            F.expr("percentile(value, 0.90)").alias("lo95"),
            F.expr("percentile(value, 0.999)").alias("hi95"),
        )
        .collect()
    }
    assert len(qs) > 0
    for r in qs:
        lo50, hi50, lo95, hi95 = exact[r["event_type"]]
        assert lo50 <= r["p50"] <= hi50
        assert lo95 <= r["p95"] <= hi95
