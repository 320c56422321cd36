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


def test_no_per_iteration_exchange_of_corpus(spark, embs):
    """The flat frame is hash-partitioned by vec_id once at build; the
    final plan (window + summary) must not re-exchange it by vid — only
    the k-sized cid aggregation and the output sort may shuffle."""
    res = kmeans_lloyd(embs, k=4, iters=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the one vid exchange lives INSIDE the cached relation's build plan
    # (REPARTITION_BY_COL below InMemoryRelation); the live plan above it
    # must consume InMemoryTableScan with no new vid exchange
    live = plan.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in live, plan
    assert "Exchange hashpartitioning(vid" not in live, plan
