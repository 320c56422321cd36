"""Distributed exact rank selection — order statistics per group without
any per-group full sort.

``plans.relational.robust_price_stats`` / ``mad_outlier_scan`` select
ranks with a per-group cumulative sum over the distinct-value histogram:
one window sort of |distinct values| rows per group. That is the right
shape until a single group's distinct-value count itself outgrows one
task. This module is the documented upgrade path for that regime — the
classic two-level (coarse/fine) selection:

1. bucket the histogram into coarse value bands (``value div step``) —
   the per-group BAND histogram is tiny (value_range/step rows), so its
   cumulative sum is a trivially small window;
2. locate, per group, the single band containing the requested rank and
   the cumulative count BELOW that band (one small aggregation);
3. cumulative-sum ONLY the rows of the chosen band (per group, at most
   ``step`` distinct values) and pick the value where the running count
   crosses the rank.

Every stage is a uniform groupBy or a window over a bounded row set; no
stage ever sorts a whole group. This is distributed quickselect with one
fixed split level — O(1) extra passes, exact result, any data
distribution (a pathological band still bounds the fine window by the
band's distinct-value count, and ``step`` tunes that directly).

The selected VALUE is identical to the naive cumulative-sum selection
(tests/test_selection.py proves equality on randomized inputs), so
contract-query oracles are unaffected by which form computes them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_rank_select(
    hist: DataFrame,
    group_col: str,
    value_col: str,
    cnt_col: str,
    ranks: dict[str, str],
    coarse_step: int = 4096,
) -> DataFrame:
    """Select order statistics from a per-group value HISTOGRAM
    (``group_col``, integer ``value_col``, ``cnt_col`` rows).

    ``ranks`` maps output column name → a SQL expression for the 1-based
    rank in terms of ``n`` (the group's total count), e.g.
    ``{"median": "(n + 1) div 2", "p99": "(990000 * n + 999999) div 1000000"}``.
    Returns one row per group: (group_col, <name>... , n).

    Each requested rank costs one coarse aggregation + one band-bounded
    fine pass; the input histogram is scanned once per rank — persist it
    when selecting many ranks from an expensive lineage.
    """
    g = group_col
    v = value_col
    c = cnt_col
    wall = Window.partitionBy(g)
    coarse = (
        hist.groupBy(g, F.expr(f"{v} div {coarse_step}").alias("_cb"))
        .agg(F.sum(c).alias("_ccnt"))
    )
    ccum = coarse.select(
        g,
        "_cb",
        "_ccnt",
        F.sum("_ccnt").over(wall.orderBy("_cb")).alias("_ccum"),
        F.sum("_ccnt").over(wall).alias("n"),
    )
    out = None
    for name, rank_sql in ranks.items():
        k = F.expr(rank_sql)
        band = ccum.groupBy(g).agg(
            F.min(
                F.when(
                    (F.col("_ccum") >= k)
                    & (F.col("_ccum") - F.col("_ccnt") < k),
                    F.col("_cb"),
                )
            ).alias("_cb_k"),
            F.min(
                F.when(
                    (F.col("_ccum") >= k)
                    & (F.col("_ccum") - F.col("_ccnt") < k),
                    F.col("_ccum") - F.col("_ccnt"),
                )
            ).alias("_base_k"),
            F.max("n").alias("n"),
        )
        fine = hist.join(F.broadcast(band), g).filter(
            F.expr(f"{v} div {coarse_step}") == F.col("_cb_k")
        )
        fcum = fine.select(
            g,
            v,
            c,
            "_base_k",
            "n",
            F.sum(c).over(wall.orderBy(v)).alias("_fcum"),
        )
        sel = fcum.groupBy(g).agg(
            F.min(
                F.when(
                    (F.col("_base_k") + F.col("_fcum") >= k)
                    & (F.col("_base_k") + F.col("_fcum") - F.col(c) < k),
                    F.col(v),
                )
            ).alias(name),
        )
        # re-anchor on the band frame (one row per group even when the
        # rank selected NO band, e.g. k outside [1, n]) so a group with
        # a NULL statistic is KEPT — matching grouped_rank_select_naive,
        # which the equality contract promises
        picked = band.select(g, "n").join(sel, g, "left")
        out = picked if out is None else out.drop("n").join(picked, g)
    return out


def grouped_rank_select_naive(
    hist: DataFrame,
    group_col: str,
    value_col: str,
    cnt_col: str,
    ranks: dict[str, str],
) -> DataFrame:
    """Reference form: one cumulative-sum window over the whole per-group
    histogram (the shape the contract queries use). Same output contract
    as :func:`grouped_rank_select`; used by tests to prove equality."""
    g, v, c = group_col, value_col, cnt_col
    wall = Window.partitionBy(g)
    cum = hist.select(
        g,
        v,
        c,
        F.sum(c).over(wall.orderBy(v)).alias("_cum"),
        F.sum(c).over(wall).alias("n"),
    )
    aggs = []
    for name, rank_sql in ranks.items():
        k = F.expr(rank_sql)
        aggs.append(
            F.min(
                F.when(
                    (F.col("_cum") >= k)
                    & (F.col("_cum") - F.col(c) < k),
                    F.col(v),
                )
            ).alias(name)
        )
    return cum.groupBy(g).agg(*aggs, F.max("n").alias("n"))
