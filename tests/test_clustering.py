"""kmeans_lloyd (operators/clustering.py): pure-Python replay pin,
partitioning invariance, dead-centroid rule, quantizer parity, and the
zero-per-iteration-exchange plan property."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.clustering import (
    _quantize_py,
    kmeans_lloyd,
)
from etl_python_sqlite_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replay(Q: dict[int, list[int]], k: int, iters: int):
    """Reference CPython implementation of the documented algorithm."""
    ids = sorted(Q, key=lambda v: (_ph(str(v)), v))[:k]
    cents = {i: list(Q[v]) for i, v in enumerate(ids)}

    def assign(cents):
        out = {}
        for v, q in Q.items():
            best = None
            for cid in sorted(cents):
                dd = sum((a - b) * (a - b) for a, b in zip(q, cents[cid]))
                if best is None or dd < best[1]:
                    best = (cid, dd)
            out[v] = best
        return out

    for _ in range(iters):
        groups: dict[int, list[list[int]]] = {}
        for v, (cid, _) in assign(cents).items():
            groups.setdefault(cid, []).append(Q[v])
        cents = {
            cid: [sum(col) // len(vs) for col in zip(*vs)]
            for cid, vs in groups.items()
        }
    agg: dict[int, tuple[int, int]] = {}
    for v, (cid, dd) in assign(cents).items():
        n, i = agg.get(cid, (0, 0))
        agg[cid] = (n + 1, i + dd)
    return sorted(
        (cid, n, i, sum(cents[cid])) for cid, (n, i) in agg.items()
    )


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_matches_python_replay(spark, embs):
    got = [tuple(r) for r in kmeans_lloyd(embs, k=8, iters=2).collect()]
    data = embs.select("vec_id", "embedding").collect()
    Q = {
        int(r["vec_id"]): [_quantize_py(x) for x in r["embedding"]]
        for r in data
    }
    assert got == _replay(Q, k=8, iters=2)


def test_partitioning_invariance(spark, embs):
    base = [tuple(r) for r in kmeans_lloyd(embs, k=4, iters=1).collect()]
    shuffled = embs.repartition(13)
    assert [
        tuple(r) for r in kmeans_lloyd(shuffled, k=4, iters=1).collect()
    ] == base


def test_quantizer_parity_with_spark(spark, embs):
    """_quantize_py (used for the driver-side seed quantization) must
    be bit-identical to the Spark expression on real values."""
    rows = embs.select(
        F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v"),
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>),"
            " x -> CAST(floor((x + 1.0D) * 1000000.0D) AS BIGINT))"
        ).alias("q"),
    ).limit(20).collect()
    for r in rows:
        assert [_quantize_py(x) for x in r["v"]] == list(r["q"])


def test_dead_centroids_drop_out(spark):
    """k seeds over identical vectors: every vector ties to cid 0 and
    the other clusters receive no update row — they must vanish, not
    crash or emit empty rows."""
    df = spark.createDataFrame(
        [(i, [0.25, -0.5, 0.125]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    rows = kmeans_lloyd(df, k=4, iters=2).collect()
    assert len(rows) == 1
    assert rows[0]["cluster"] == 0
    assert rows[0]["n_vecs"] == 10
    assert rows[0]["inertia"] == 0


def test_corpus_rides_broadcast_joins_single_action(spark, embs):
    """The whole unrolled chain is ONE plan: centroid frames ride
    broadcast joins (the corpus side never shuffles for the distance
    computation), nothing collects, and no cartesian appears. The only
    exchanges of vector-count-sized data are the assignment aggregates."""
    res = kmeans_lloyd(embs, k=4, iters=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # r9 fused argmin: the per-iteration assignment is two back-to-back
    # HashAggregates on the flat frame's hash(vid) distribution — the
    # encoded min(dist·ENC + cid) must never fall back to SortAggregate
    # (struct-min would) nor re-sort/re-exchange n·k assignment rows
    assert "SortAggregate" not in plan, plan
    assert "Sort [vid" not in plan, plan
    # the corpus (InMemoryTableScan of the flat frame) must never sit
    # directly under an Exchange — its distribution is reused as built
    live = plan.split("InMemoryRelation")[0]
    for a, b in zip(live.splitlines(), live.splitlines()[1:]):
        if "InMemoryTableScan" in b:
            assert "Exchange" not in a, plan


def test_single_action_job_count(spark, embs):
    """The literal-re-entry ancestor spent 4 sequential DRIVER actions
    on collects (each a full job with scheduling overhead); the
    single-plan form is one action whose AQE stage materializations
    surface as ~20 cheap sub-jobs (measured 23 at k=8/iters=2 — wall
    3.7 s → 1.5 s at sf0.1). This is a runaway backstop, not a tight
    bound: a regression back to per-iteration collect-loops over MANY
    iterations would blow past it."""
    sc = spark.sparkContext
    sc.setJobGroup("km_probe", "kmeans job count")
    try:
        kmeans_lloyd(embs, k=8, iters=2).write.format("noop").mode(
            "overwrite"
        ).save()
    finally:
        sc.setJobGroup(None, None)
    ids = sc.statusTracker().getJobIdsForGroup("km_probe")
    assert 0 < len(ids) <= 40, ids
