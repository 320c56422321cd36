"""Fast-exact promo variant: round(x*100) long math, trunc-month group
key, post-agg string formatting. A/B vs base + value equality."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.appName("probe_promo_fast")
    .master("local[32]")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
from etl_python_sqlite_spark.plans.relational import table, _frac_expr

li = table(spark, sf_dir, "lineitem")
part = table(spark, sf_dir, "part")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timeit(tag, build, n=5):
    ts = []
    for _ in range(n):
        df = build()
        t0 = time.perf_counter()
        noop(df)
        ts.append(time.perf_counter() - t0)
    print(f"{tag:10} " + " ".join(f"{t:.3f}" for t in ts), flush=True)


def base():
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    dd = F.col("l_discount").cast("decimal(4,2)")
    rev = (ep * (F.lit(1) - dd)).cast("decimal(28,4)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(28,4)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(F.sum(promo).alias("_p"), F.sum(rev).alias("_t"))
        .select(
            "ship_month",
            F.col("_p").cast("double").alias("promo_revenue"),
            F.col("_t").cast("double").alias("total_revenue"),
            _frac_expr("CAST(_p * 10000 AS BIGINT)", "CAST(_t * 10000 AS BIGINT)").alias("promo_frac"),
        )
        .orderBy("ship_month")
    )


def fast():
    cents = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    dbp = F.expr("CAST(round(l_discount * 100) AS BIGINT)")
    rev4 = cents * (F.lit(100) - dbp)  # exact 1e-4 units, long
    promo4 = F.when(F.col("p_type") == "PROMO", rev4).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.trunc("l_shipdate", "MM").alias("_m"))
        .agg(F.sum(promo4).alias("_p4"), F.sum(rev4).alias("_t4"))
        .select(
            F.date_format("_m", "yyyy-MM").alias("ship_month"),
            (F.col("_p4").cast("double") / F.lit(10000.0)).alias("promo_revenue"),
            (F.col("_t4").cast("double") / F.lit(10000.0)).alias("total_revenue"),
            _frac_expr("_p4", "_t4").alias("promo_frac"),
        )
        .orderBy("ship_month")
    )


noop(base()); noop(fast())
timeit("base", base)
timeit("fast", fast)

a = [tuple(r) for r in base().collect()]
b = [tuple(r) for r in fast().collect()]
import math
same = len(a) == len(b) and all(
    x[0] == y[0] and all(
        (isinstance(u, float) and (u == v or (math.isnan(u) and math.isnan(v)))) or u == v
        for u, v in zip(x[1:], y[1:])
    )
    for x, y in zip(a, b)
)
print("values identical:", same)
if not same:
    for x, y in zip(a, b):
        if x != y:
            print("DIFF", x, y)
spark.stop()
