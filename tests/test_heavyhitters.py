"""Two-pass Misra-Gries heavy hitters (operators/heavyhitters.py)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.heavyhitters import (
    heavy_hitters_topn,
    misra_gries_partition_candidates,
)


def _token_df(spark, tokens: list[str], partitions: int = 4):
    return spark.createDataFrame(
        [(t,) for t in tokens], "term string"
    ).repartition(partitions)


def test_topn_equals_full_groupby_on_skewed_stream(spark):
    # vocabulary (5000) far exceeds the MG budget (k=64): the long tail
    # must be pruned partition-side while the planted heavy terms survive
    tokens = [f"tail{i}" for i in range(5000)]
    tokens += ["alpha"] * 400 + ["beta"] * 300 + ["gamma"] * 200
    df = _token_df(spark, tokens)
    got = heavy_hitters_topn(df, top_n=3, k=64).collect()
    truth = Counter(tokens).most_common(3)
    assert [(r["term"], r["n_occurrences"]) for r in got] == truth
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert all(r["mg_guarantee_ok"] for r in got)


def test_candidates_superset_of_guaranteed_heavy(spark):
    tokens = ["hot"] * 500 + [f"cold{i}" for i in range(2000)]
    df = _token_df(spark, tokens)
    cands = {
        r["term"]
        for r in misra_gries_partition_candidates(df, k=32).collect()
    }
    # freq(hot) = 500 > N/k = 2500/32 → must be a candidate
    assert "hot" in cands


def test_guarantee_flag_false_when_k_too_small(spark):
    # near-uniform stream: rank-2 count cannot exceed N/k for tiny k,
    # so the operator must SAY the guarantee doesn't hold
    tokens = [f"t{i % 50}" for i in range(500)]
    df = _token_df(spark, tokens)
    got = heavy_hitters_topn(df, top_n=2, k=3).collect()
    assert got and not got[0]["mg_guarantee_ok"]


def test_tie_break_is_lexicographic(spark):
    tokens = ["b"] * 10 + ["a"] * 10 + ["c"] * 5
    got = heavy_hitters_topn(_token_df(spark, tokens, 2), top_n=2, k=64).collect()
    assert [(r["rank"], r["term"]) for r in got] == [(1, "a"), (2, "b")]
