"""Exact per-group bivariate statistics — OLS regression without floats.

``ols_by_group`` fits y = a + b·x per group with the closed-form
least-squares estimator, computed ENTIRELY in integer arithmetic so a
SQL oracle on another engine replays every output bit-for-bit:

    slope     b = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
    intercept a = (Σy − b·Σx) / n

Inputs are integer-unit columns (cents, micro-units — the caller picks
the quantization, which *defines* the statistic; see CLAUDE.md's float
discipline). Per-row products stay in **longs** (the hot path — no
BigDecimal tax: x,y ≤ ~10^7 units keeps x·y < 2^63), while the
**aggregate accumulators** are DECIMAL(38,0) (HUGEINT on the DuckDB
side), where exact wide arithmetic belongs. The division is the
portable floor-division identity

    floor(p/q) = (p − ((p % q) + q) % q) / q          (q > 0)

because Spark ``div``/DuckDB ``//`` truncate toward zero and the
numerator can be negative (Spark and DuckDB both give ``%`` the sign of
the dividend, so the double-pmod forms the canonical non-negative
residue on both engines). The denominator n·Σxx − Σx² is the scaled
variance of x: ≥ 0 always, and 0 exactly when x is CONSTANT within the
group — that degenerate group yields NULL slope/intercept (``NULLIF``
on both engines) instead of aborting the whole query under ANSI mode's
decimal divide-by-zero (ADVICE r4: one single-distinct-x slice in
regenerated testdata must flag a row, not crash the pipeline).

Scale: one map-side-combined ``groupBy`` over the fact table — the same
single-shuffle shape as any Spark aggregate. Headroom: at SF100
(6·10^8 rows/group, units ≤ 10^7) the widest term n·Σxy·10^6 is
~1.8·10^34 < 10^38, inside DECIMAL(38) with four orders of margin.

No reference counterpart (the reference's only aggregate is
COUNT/AVG — scr/etl_relational.py:197-204); this extends §2.4 with the
regression/correlation family a training-data warehouse needs (mixture
weight fitting, quality-vs-length trend audits).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 10^6 — slopes/intercepts are reported in integer micro-units.
MICRO = 1_000_000

_D38 = "decimal(38,0)"


def _floor_div(num: Column, den: Column) -> Column:
    """Exact floor(num/den) for den > 0, portable across engines."""
    residue = ((num % den) + den) % den
    return (num - residue) / den


def ols_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-group exact OLS of integer-unit ``y`` on integer-unit ``x``.

    Returns one row per group::

        group_cols…, n (long), sum_x (long), sum_y (long),
        slope_micro (long), intercept_micro (long)

    ``slope_micro``  = floor(10^6 · b)   (b in y-units per x-unit)
    ``intercept_micro`` = floor((10^6·Σy − slope_micro·Σx) / n) — the
    intercept evaluated with the *already-floored* slope, so the whole
    pipeline stays in integers (the spec is the quantized estimator,
    identical on every engine, within 1 micro-unit of the real-valued
    one).
    """
    xl = x.cast("long")
    yl = y.cast("long")
    agg = df.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(xl).cast("long").alias("sum_x"),
        F.sum(yl).cast("long").alias("sum_y"),
        # per-row long products, DECIMAL(38) accumulators
        F.sum((xl * xl).cast(_D38)).alias("sxx"),
        F.sum((xl * yl).cast(_D38)).alias("sxy"),
    )
    n = F.col("n").cast(_D38)
    sx = F.col("sum_x").cast(_D38)
    sy = F.col("sum_y").cast(_D38)
    num = n * F.col("sxy") - sx * sy
    # NULLIF: constant-x groups (den = 0) → NULL slope/intercept, which
    # then propagates through the intercept arithmetic below
    den = F.nullif(n * F.col("sxx") - sx * sx, F.lit(0).cast(_D38))
    slope = _floor_div(num * F.lit(MICRO).cast(_D38), den).cast(_D38)
    intercept = _floor_div(
        sy * F.lit(MICRO).cast(_D38) - slope * sx, n
    )
    return agg.select(
        *group_cols,
        "n",
        "sum_x",
        "sum_y",
        slope.cast("long").alias("slope_micro"),
        intercept.cast("long").alias("intercept_micro"),
    )


#: DuckDB twin of the whole estimator — format with the table/column
#: exprs. SUM(BIGINT) is HUGEINT (128-bit, exact); `//` truncates like
#: Spark `div`; the floor-division identity is spelled out verbatim.
OLS_SQL = """
    SELECT {groups},
           n,
           CAST(sum_x AS BIGINT) AS sum_x,
           CAST(sum_y AS BIGINT) AS sum_y,
           CAST(
             (nm - (((nm % den) + den) % den)) // den
           AS BIGINT) AS slope_micro,
           CAST(
             (ni - (((ni % n) + n) % n)) // n
           AS BIGINT) AS intercept_micro
    FROM (
        SELECT {groups}, n, sum_x, sum_y, den,
               nm,
               sum_y * 1000000
                 - ((nm - (((nm % den) + den) % den)) // den) * sum_x
                 AS ni
        FROM (
            SELECT {groups},
                   COUNT(*) AS n,
                   SUM(x) AS sum_x,
                   SUM(y) AS sum_y,
                   (COUNT(*) * SUM(x*y) - SUM(x)*SUM(y)) * 1000000 AS nm,
                   NULLIF(COUNT(*) * SUM(x*x) - SUM(x)*SUM(x), 0) AS den
            FROM ({rows})
            GROUP BY {groups}
        )
    )
"""
