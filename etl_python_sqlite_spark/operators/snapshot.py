"""Snapshot diff — dataset-iteration tooling: compare two versions of a
keyed table and classify every key as added / removed / changed /
unchanged.

The shape is ONE full-outer shuffle join on the key plus a null-safe
column compare — no collects, no window sorts — so it scales to any
snapshot pair whose key space hashes uniformly. Payload comparison uses
``<=>`` (null-safe equality) per column, so NULL→value and value→NULL
transitions count as changes and NULL==NULL does not.

This is the engine-level primitive under "what changed between dataset
v1 and v2" audits in a training-data pipeline (new docs, dropped docs,
re-crawled docs whose content moved) — pair it with the dedup family to
answer "how much of v2 is genuinely new".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of snapshot ``a`` (old) vs ``b`` (new): returns
    key columns + ``status`` ∈ {added, removed, changed, unchanged}."""
    if not keys:
        # an empty join condition would silently degenerate the
        # full-outer join into a cross join
        raise ValueError("snapshot_diff requires at least one key column")
    sa = a.select(
        *[F.col(k).alias(f"k_{k}") for k in keys],
        *[F.col(c).alias(f"a_{c}") for c in compare_cols],
        F.lit(1).alias("_in_a"),
    )
    sb = b.select(
        *[F.col(k).alias(f"bk_{k}") for k in keys],
        *[F.col(c).alias(f"b_{c}") for c in compare_cols],
        F.lit(1).alias("_in_b"),
    )
    cond = [F.col(f"k_{k}").eqNullSafe(F.col(f"bk_{k}")) for k in keys]
    joined = sa.join(sb, cond, "full_outer")
    # no compare columns = presence-only diff: matched keys are unchanged
    same_payload = F.lit(True)
    for c in compare_cols:
        same_payload = same_payload & F.col(f"a_{c}").eqNullSafe(
            F.col(f"b_{c}")
        )
    status = (
        F.when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_in_b").isNull(), F.lit("removed"))
        .when(same_payload, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"k_{k}"), F.col(f"bk_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
    )


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """Per-status row counts of a ``snapshot_diff`` frame."""
    return diff.groupBy("status").agg(F.count("*").alias("n_rows"))
