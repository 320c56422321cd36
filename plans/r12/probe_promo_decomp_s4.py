"""Decompose promo_revenue_ratio's ~1.4 s: which component costs?"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.appName("probe_promo_decomp")
    .master("local[32]")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
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
    ts = []
    for _ in range(n):
        df = build()
        t0 = time.perf_counter()
        noop(df)
        ts.append(time.perf_counter() - t0)
    print(f"{tag:26} " + " ".join(f"{t:.3f}" for t in ts), flush=True)


ep = lambda: F.col("l_extendedprice").cast("decimal(12,2)")
dd = lambda: F.col("l_discount").cast("decimal(4,2)")
rev = lambda: (ep() * (F.lit(1) - dd())).cast("decimal(28,4)")

cases = {
    "scan": lambda: li.select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate"),
    "scan+datefmt": lambda: li.select(F.date_format("l_shipdate", "yyyy-MM").alias("m")),
    "scan+grp_datefmt_count": lambda: li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("m")).count(),
    "scan+grp_month_count": lambda: li.groupBy(F.trunc("l_shipdate", "MM").alias("m")).count(),
    "join_only_project": lambda: li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select("p_type"),
    "join+grp_count": lambda: li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("m")).count(),
    "nojoin_decimal_agg": lambda: li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("m"))
        .agg(F.sum(rev()).alias("_t")),
    "join_decimal_agg_noorder": lambda: li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("m"))
        .agg(F.sum(F.when(F.col("p_type") == "PROMO", rev()).otherwise(F.lit(0).cast("decimal(28,4)"))).alias("_p"),
             F.sum(rev()).alias("_t")),
    "bcast_build_only": lambda: spark.range(1).join(F.broadcast(part), F.lit(True)).select("p_type"),
}

for tag, b in cases.items():
    noop(b())  # warm
for tag, b in cases.items():
    timeit(tag, b)
spark.stop()
