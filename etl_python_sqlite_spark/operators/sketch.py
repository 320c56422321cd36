"""Mergeable-sketch rollups: HLL distinct counts, KLL quantiles.

The 100 TB pattern these encode: build small fixed-size sketches once
per fine partition (day, file, shard), PERSIST THE SKETCHES, then answer
any coarser rollup by merging sketches — never rescanning the raw data.
That's what makes incremental / hypertable-style distinct-count and
quantile rollups possible: yesterday's sketch is immutable, today's
batch adds one more, the monthly number is a union of 30 byte arrays.

Built on Spark 4's native Apache DataSketches expressions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``kll_sketch_*``) — JVM-side,
codegen-friendly, no UDFs. Estimates are engine-internal (no DuckDB
twin), so the driver check is rows-only; `tests/test_sketch.py` pins the
accuracy contract instead: HLL relative error ≤ the published bound for
the chosen lgK, and two-level merge ≡ one-shot sketch of the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch_by(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per key — the fine-grained build
    pass. Map-side partial aggregation applies: each task sketches its
    partition locally and the shuffle carries ~(keys × 2^lgK bytes),
    independent of row count."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll_sketch")
    )


def hll_merge_rollup(
    sketches: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Coarser rollup from STORED sketches: union per group, estimate.
    This is the no-rescan path — input is the sketch table, not raw data."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias(
            "distinct_estimate"
        ),
        F.count("*").alias("n_sketches_merged"),
    )


def kll_quantiles_by(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    quantiles: list[float],
    k: int = 200,
) -> DataFrame:
    """Mergeable KLL quantile sketch per key, evaluated at ``quantiles``.
    Same build-once/merge-anywhere property as the HLL path."""
    sk = df.groupBy(*key_cols).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("kll")
    )
    def _label(q: float) -> str:
        # full-precision labels: int(q*100) would collide 0.99/0.999
        # into one 'p99' column (review finding) — keep every decimal,
        # '.'→'_' for a valid identifier (0.999 → p99_9)
        s = f"{q * 100:g}".replace(".", "_")
        return f"p{s}"

    labels = [_label(q) for q in quantiles]
    if len(set(labels)) != len(labels):
        raise ValueError(f"quantile labels collide: {labels}")
    cols = [
        F.kll_sketch_get_quantile_double("kll", F.lit(q)).alias(lab)
        for q, lab in zip(quantiles, labels)
    ]
    return sk.select(*key_cols, *cols)


def distinct_rollup_with_exact(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Two-level HLL rollup next to the exact answer (for SF-scale
    verification; at warehouse scale you'd drop the exact branch):

    raw → per-``fine_keys`` sketches → union to ``coarse_keys`` →
    estimate, joined with exact COUNT(DISTINCT) per coarse key.
    """
    fine = hll_sketch_by(df, fine_keys, value_col, lgk)
    merged = hll_merge_rollup(fine, coarse_keys)
    exact = df.groupBy(*coarse_keys).agg(
        F.countDistinct(value_col).alias("distinct_exact")
    )
    return merged.join(exact, coarse_keys).select(
        *coarse_keys,
        F.col("distinct_estimate").cast("long").alias("distinct_estimate"),
        "distinct_exact",
        "n_sketches_merged",
    )
