"""Session-4 probe: the single-row-group scan serializes the per-row
decimal work of every lineitem query onto ONE task. A/B on
promo_revenue_ratio-shaped work:

  base     — current query shape (1-task scan+join+agg)
  scan     — bare scan+project noop (isolates parquet decode cost)
  repart   — repartition(32) between scan and join/agg
  longrev  — per-row revenue in LONG 1e-4 units, sum as long (sizes the
             BigDecimal tax; value-compared against base)
  replong  — repartition + long rev
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.appName("probe_scanpar_s4")
    .master("local[32]")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"

from etl_python_sqlite_spark.plans.relational import table

li = table(spark, sf_dir, "lineitem")
part = table(spark, sf_dir, "part")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timeit(tag, build, n=4):
    best = []
    for _ in range(n):
        df = build()
        t0 = time.perf_counter()
        noop(df)
        best.append(time.perf_counter() - t0)
    print(f"{tag:10} " + " ".join(f"{t:.3f}" for t in best), flush=True)


def base():
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    dd = F.col("l_discount").cast("decimal(4,2)")
    rev = (ep * (F.lit(1) - dd)).cast("decimal(28,4)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(28,4)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(F.sum(promo).alias("_p"), F.sum(rev).alias("_t"))
        .orderBy("ship_month")
    )


def scan_only():
    return li.select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")


def repart():
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    dd = F.col("l_discount").cast("decimal(4,2)")
    rev = (ep * (F.lit(1) - dd)).cast("decimal(28,4)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(28,4)"))
    return (
        li.select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
        .repartition(32)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(F.sum(promo).alias("_p"), F.sum(rev).alias("_t"))
        .orderBy("ship_month")
    )


def longrev():
    # rev in 1e-4 units: cents * (100 - disc_cents), exact integers
    cents = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
    dbp = (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long")
    rev = cents * (F.lit(100) - dbp)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(F.sum(promo).alias("_p4"), F.sum(rev).alias("_t4"))
        .orderBy("ship_month")
    )


def replong():
    cents = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
    dbp = (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long")
    rev = cents * (F.lit(100) - dbp)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
        .repartition(32)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(F.sum(promo).alias("_p4"), F.sum(rev).alias("_t4"))
        .orderBy("ship_month")
    )


# warm everything once
for b in (base, scan_only, repart, longrev, replong):
    noop(b())

for tag, b in [("base", base), ("scan", scan_only), ("repart", repart),
               ("longrev", longrev), ("replong", replong)]:
    timeit(tag, b)

# value equality: long path * 1e-4 == decimal path
a = {r["ship_month"]: (str(r["_p"]), str(r["_t"])) for r in base().collect()}
b = {r["ship_month"]: (r["_p4"], r["_t4"]) for r in longrev().collect()}
ok = all(
    a[k][0] == f"{b[k][0]//10000}.{b[k][0]%10000:04d}" and
    a[k][1] == f"{b[k][1]//10000}.{b[k][1]%10000:04d}"
    for k in a
) and set(a) == set(b)
print("long==decimal values:", ok)
spark.stop()
