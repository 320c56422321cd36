"""Portable Bloom filter (operators/bloom.py): membership law, CPython
bit-replay of the hash family, and constant bitmap size."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.bloom import (
    WORD_BITS,
    bloom_build,
    bloom_probe,
)

M, K = 1024, 3


def _py_probes(s: str):
    d = hashlib.md5(s.encode()).hexdigest()
    h1, h2 = int(d[:15], 16) % M, int(d[15:30], 16) % M
    for i in range(K):
        idx = (h1 + i * h2) % M
        yield idx // WORD_BITS, idx % WORD_BITS


def _py_bloom(keys):
    words: dict[int, int] = {}
    for s in keys:
        for w, b in _py_probes(s):
            words[w] = words.get(w, 0) | (1 << b)
    return words


def test_no_false_negatives_and_cpython_bit_replay(spark):
    keys = [f"member-{i}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "text string")
    bloom = bloom_build(df, "text", M, K)
    got = {r["word"]: r["bits"] for r in bloom.collect()}
    assert got == _py_bloom(keys)  # exact bitmap replay

    probes = [f"member-{i}" for i in range(0, 300, 7)] + [
        f"absent-{i}" for i in range(100)
    ]
    pdf = spark.createDataFrame([(k,) for k in probes], "text string")
    res = {
        r["text"]: r["bloom_maybe"]
        for r in bloom_probe(pdf, "text", bloom, M, K).collect()
    }
    # membership law: every member flagged (false negatives impossible)
    for k in probes:
        if k.startswith("member-"):
            assert res[k], k
        else:
            # absent keys: must match the CPython filter's own verdict
            words = _py_bloom(keys)
            expect = all(
                (words.get(w, 0) >> b) & 1 for w, b in _py_probes(k)
            )
            assert res[k] == expect, k


def test_bitmap_size_constant_in_corpus_cardinality(spark):
    small = spark.createDataFrame([(f"s{i}",) for i in range(10)], "text string")
    large = spark.createDataFrame(
        [(f"l{i}",) for i in range(5000)], "text string"
    )
    cap = (M + WORD_BITS - 1) // WORD_BITS
    assert bloom_build(small, "text", M, K).count() <= cap
    assert bloom_build(large, "text", M, K).count() <= cap  # saturates, never grows


def _plan(df, spark):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_probe_scalar_path_is_join_free(spark):
    """Small bitmaps embed as one array literal: the probe plan must be
    a pure projection — zero joins, zero exchanges, the probed row
    untouched (r4 VERDICT #6's fused probe)."""
    df = spark.createDataFrame([(f"k{i}",) for i in range(50)], "text string")
    bloom = bloom_build(df, "text", M, K).localCheckpoint(eager=True)
    plan = _plan(bloom_probe(df, "text", bloom, M, K), spark)
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_probe_join_path_is_broadcast_only_and_equivalent(spark):
    """Above the literal cap (forced: cap=0) the fallback is k broadcast
    joins — no shuffle of the probed side — and both strategies must
    agree flag-for-flag."""
    keys = [f"k{i}" for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], "text string")
    probes = keys[:20] + [f"x{i}" for i in range(30)]
    pdf = spark.createDataFrame([(k,) for k in probes], "text string")
    bloom = bloom_build(df, "text", M, K).localCheckpoint(eager=True)
    joined = bloom_probe(pdf, "text", bloom, M, K, max_literal_words=0)
    plan = _plan(joined, spark)
    assert plan.count("BroadcastHashJoin") == K
    assert "SortMergeJoin" not in plan
    scalar = bloom_probe(pdf, "text", bloom, M, K)
    want = {r["text"]: r["bloom_maybe"] for r in scalar.collect()}
    got = {r["text"]: r["bloom_maybe"] for r in joined.collect()}
    assert got == want
