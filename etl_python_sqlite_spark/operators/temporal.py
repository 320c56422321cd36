"""Temporal join operators Spark lacks as built-ins: as-of and range joins.

Both are composed from shuffle-friendly primitives (union + window, or
time-bucketing + equi-join) rather than inequality-join nested loops —
the shapes that survive 100 TB:

* **as-of join** — "for each left row, the latest right row at or before
  its timestamp (per key)". Implemented as the classic union-sort-window:
  tag both sides, union, one shuffle on the key, per-key time order,
  ``last(right_payload, ignorenulls)`` carried forward. O(n log n) per
  key, no cross product, no per-key driver loops.
* **range join** — "pairs within ``max_gap`` seconds (per key)".
  Implemented by bucketing time into ``max_gap``-sized cells and
  equi-joining each cell with itself and its successor, then filtering
  exactly — turns an inequality join into 2 equi-joins on uniform keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join: each left row gains the payload of
    the right row with the greatest ``right_time`` ≤ ``left_time`` within
    the same ``by`` key (NULLs when no prior right row exists).

    Ties on ``right_time`` are broken deterministically by the ordering of
    ``right_payload[0]`` (callers should pass a unique id first).
    """
    l_tag = left.select(
        F.col(by),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c != by],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in right_payload],
    )
    r_tag = right.select(
        F.col(by),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != by],
        *[F.col(c).alias(c + suffix) for c in right_payload],
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows sort BEFORE left rows at equal _t (backward-INCLUSIVE);
    # among right ties the last in (_t, payload[0]) order wins
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("_t"), F.col("_is_left"), F.col(right_payload[0] + suffix))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(c + suffix), ignorenulls=True).over(w).alias(c + suffix + "_f")
            for c in right_payload
        ],
    )
    out_cols = (
        [by]
        + [c for c in left.columns if c != by]
        + [F.col(c + suffix + "_f").alias(c + suffix) for c in right_payload]
    )
    return carried.filter(F.col("_is_left") == 1).select(*out_cols)


def range_join_within(
    df: DataFrame,
    by: str,
    time_col: str,
    max_gap_s: int,
    id_col: str,
) -> DataFrame:
    """All ordered pairs (a, b) with ``0 < t_b − t_a ≤ max_gap_s`` within
    the same ``by`` key.

    Time is bucketed into ``max_gap_s`` cells; a qualifying pair is always
    in the same or adjacent cells, so two equi-joins on (key, cell) cover
    the space and the exact predicate prunes the rest — no inequality
    nested loop.
    """
    cell = (F.col(time_col).cast("long") / max_gap_s).cast("long")
    base = df.select(
        F.col(by),
        F.col(id_col),
        F.col(time_col).cast("long").alias("_ts"),
        cell.alias("_cell"),
    )
    a = base.alias("a")
    joined = []
    for shift in (0, 1):
        b = base.withColumn("_cell", F.col("_cell") - shift).alias("b")
        joined.append(
            a.join(
                b,
                (F.col(f"a.{by}") == F.col(f"b.{by}"))
                & (F.col("a._cell") == F.col("b._cell")),
            )
            .filter(
                (F.col("b._ts") > F.col("a._ts"))
                & (F.col("b._ts") - F.col("a._ts") <= max_gap_s)
            )
            .select(
                F.col(f"a.{by}").alias(by),
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                (F.col("b._ts") - F.col("a._ts")).alias("gap_s"),
            )
        )
    return joined[0].unionByName(joined[1]).distinct()
