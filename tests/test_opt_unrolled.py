"""Round-11-opt: hard-negative mining's norm hoist must be REAL.

Catalyst's projection collapse re-inlines derived columns across a
join unless a materialization barrier (persist) sits between — the
executed plan then folds a_nrm/c_nrm PER PAIR instead of per vector
(3 zip_with folds per pair; measured 2.6 s vs ~0.9 s for the scored
stage at sf0.1). These tests pin (a) the plan shape — exactly ONE
zip_with fold (the dot) in the post-join stages — and (b) the full
query result against a row-by-row sequential-fold replay."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_hard_negative_plan_folds_norms_once(spark):
    from etl_python_sqlite_spark.plans import ext as E

    df = E.ext_hard_negative_mining(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only per-pair fold is the dot: everything above the first
    # InMemoryRelation is the pair stage (join + windows); the norm and
    # nonzero folds live below the cache barrier, printed only inside
    # the two InMemoryTableScan subtrees
    pair_stage = plan.split("InMemoryRelation")[0]
    assert pair_stage.count("zip_with") == 1, pair_stage
    assert plan.count("InMemoryTableScan") == 2, plan


def test_hard_negative_mining_matches_fold_replay(spark):
    """The declared query at sf0.001 equals a row-by-row sequential-fold
    replay of the same arithmetic."""
    from etl_python_sqlite_spark.plans import ext as E

    out = E.ext_hard_negative_mining(spark, "/root/testdata/sf0.001").collect()
    assert out, "sf0.001 must produce anchors"

    embs = E._embs(spark, "/root/testdata/sf0.001").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    rows = {r["vec_id"]: r for r in embs.collect()}

    def fold_dot(x, y):
        acc = 0.0
        for xi, yi in zip(x, y):
            acc = acc + xi * yi
        return acc

    import collections

    nonzero = {i: r for i, r in rows.items() if any(x != 0.0 for x in r["v"])}
    by_anchor = collections.defaultdict(list)
    for i, r in nonzero.items():
        if i % 10 != 1:
            continue
        an = math.sqrt(fold_dot(r["v"], r["v"]))
        for j, c in nonzero.items():
            if c["label"] == r["label"]:
                continue
            cn = math.sqrt(fold_dot(c["v"], c["v"]))
            cos = round(fold_dot(r["v"], c["v"]) / (an * cn), 6)
            by_anchor[i].append((cos, j, c["label"]))
    for row in out:
        cands = by_anchor[row["anchor_id"]]
        assert row["n_candidates"] == len(cands)
        # row_number orders (cos DESC, cand_id ASC); python round() is
        # banker's vs Spark's HALF_UP, so allow one 6dp ulp of slack on
        # the score itself (the argmax pick is the real assertion)
        best = sorted(cands, key=lambda t: (-t[0], t[1]))[0]
        assert row["negative_id"] == best[1]
        assert row["neg_cos"] == pytest.approx(best[0], abs=2e-6)
