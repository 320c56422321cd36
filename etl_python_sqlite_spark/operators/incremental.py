"""Incremental aggregate maintenance — merge a delta partition's partial
aggregate into a stored rollup state without rescanning history.

The 100 TB shape this models: a warehouse keeps a per-(key) rollup table
(the "materialized view") over years of fact data. A nightly partition
lands; recomputing the rollup from scratch rescans the full history —
O(corpus) I/O for an O(delta) change. Every statistic the state carries
is a **commutative monoid** (count, sum, min, max — and, elsewhere in
this repo, HLL/KLL sketches via ``operators/sketch.py``), so the correct
plan aggregates ONLY the delta and merges states:

    new_state = merge(old_state, partial_agg(delta))

Merge is itself one tiny groupBy over ``|groups_old| + |groups_delta|``
rows — independent of history size. Spark executes the delta's partial
aggregation map-side before its shuffle, and the merge's shuffle key is
the group key (uniform by assumption of the rollup design). Nothing in
the plan touches the historical fact table.

Derived, non-mergeable statistics (avg, stddev) are carried as their
mergeable components (sum+count / sum+sumsq+count) and finalized at read
time — the standard MV discipline; ``finalize_avg_micro`` shows the
integer-exact finalization used by the repo's oracle queries.

No reference counterpart (the reference recomputes its audit aggregates
per run — scr/etl_incremental_audit.py recounts the full table each
call); this operator is the scale-correct generalization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: state column -> (build aggregator over raw rows, merge aggregator
#: over state rows).  Sums/counts re-sum; min/max re-min/re-max.
_MERGE_FN = {"n": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def build_agg_state(
    rows: DataFrame,
    keys: Sequence[str],
    value: Column | str,
) -> DataFrame:
    """Partial-aggregate ``rows`` into the mergeable rollup state
    ``keys + (n, sum, min, max)`` over an exact-integer ``value``
    column (quantize floats to cents/micros BEFORE calling — state
    columns must be drift-free under repeated merging, so they are
    BIGINT, never float).
    """
    v = F.col(value) if isinstance(value, str) else value
    return rows.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(v).cast("long").alias("sum"),
        F.min(v).cast("long").alias("min"),
        F.max(v).cast("long").alias("max"),
    )


def merge_agg_states(*states: DataFrame) -> DataFrame:
    """Merge any number of rollup states (same schema: key columns
    followed by the ``_MERGE_FN`` statistic columns) into one.

    union → groupBy(keys) with the per-statistic merge function.  Cost
    is O(Σ|groups|): the historical FACT rows are never touched, which
    is the whole point.  Associative and commutative, so states can be
    merged pairwise, hierarchically (per-day → per-month → total), or
    all at once — ``tests/test_incremental.py`` pins
    ``merge(a, merge(b, c)) ≡ merge(a, b, c) ≡ build(a∪b∪c)``.
    """
    if not states:
        raise ValueError("merge_agg_states needs at least one state")
    first = states[0]
    keys = [c for c in first.columns if c not in _MERGE_FN]
    unioned = first
    for s in states[1:]:
        if s.columns != first.columns:
            raise ValueError(
                f"state schema mismatch: {s.columns} vs {first.columns}"
            )
        unioned = unioned.unionByName(s)
    aggs = [
        fn(c).cast("long").alias(c)
        for c, fn in _MERGE_FN.items()
        if c in first.columns
    ]
    return unioned.groupBy(*keys).agg(*aggs)


def finalize_avg_micro(state: DataFrame) -> DataFrame:
    """Read-time finalization of the non-mergeable mean: half-up-rounded
    mean in micro-units of the state's value unit, from the exact
    (sum, n) components — the same all-integer formula as
    ``plans/relational._avg_expr`` (Spark ``div`` ≡ DuckDB ``//`` on
    positives), so the result is bit-identical on any engine with
    integer division. Never float division: that reintroduces the ulp
    drift the integer state exists to avoid.
    """
    avg_micro = F.expr("(`sum` * 2000000 + `n`) div (2 * `n`)")
    return state.withColumn("avg_micro", avg_micro)
