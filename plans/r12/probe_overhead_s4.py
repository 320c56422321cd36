"""Session-4 probe: decompose warm per-invocation wall for the 1.0-1.5 s
mid-class queries into (a) Python frame construction + analysis,
(b) noop execution, and job-level structure (n jobs, per-job wall,
sum-of-task-time vs wall) via the UI REST API.

Usage: python plans/r12/probe_overhead_s4.py [query ...]
Writes one JSON line per query to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

QUERIES = sys.argv[1:] or [
    "groupby_count_avg",        # 0.25 s control
    "filter_projection",        # 0.13 s control
    "promo_revenue_ratio",      # 1.44
    "nation_market_share",      # 1.10
    "large_volume_customers",   # 1.23
    "important_stock_parts",    # 1.07
    "sole_failing_supplier",    # 1.35
    "mad_outlier_scan",         # 1.60
    "ts_gap_fill_interpolate",  # 1.18
    "cheapest_supplier_per_part",  # 1.32
    "supplier_profit_by_nation",   # 1.25
    "regression_price_trend",   # 1.32
    "ext_bloom_prefilter",      # 1.16
    "scd2_apply_changes_events",  # 2.34
    "ext_kmeans_par_seeded",    # 2.28
]

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("probe_overhead_s4")
    .master("local[32]")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.scheduler.mode", "FAIR")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4099")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"

import __spark_entry__ as entrymod

queries = entrymod.queries()
app_id = spark.sparkContext.applicationId


def rest(path: str):
    url = f"http://localhost:4099/api/v1/applications/{app_id}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def jobs_since(job_floor: int):
    out = []
    for j in rest("/jobs"):
        if j["jobId"] >= job_floor:
            out.append(j)
    return sorted(out, key=lambda j: j["jobId"])


for name in QUERIES:
    fn = queries[name]
    # warm-up twice (codegen + memo stages off the clock)
    for _ in range(2):
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    # measured run
    existing = rest("/jobs")
    job_floor = (max(j["jobId"] for j in existing) + 1) if existing else 0
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t_build = time.perf_counter() - t0
    t1 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    t_exec = time.perf_counter() - t1
    jl = jobs_since(job_floor)
    job_summ = []
    total_job_wall = 0.0
    for j in jl:
        st = j.get("submissionTime")
        ct = j.get("completionTime")
        dur = None
        if st and ct:
            from datetime import datetime

            def p(x):
                return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f")

            dur = (p(ct) - p(st)).total_seconds()
            total_job_wall += dur
        job_summ.append(
            {
                "id": j["jobId"],
                "dur": round(dur, 3) if dur is not None else None,
                "stages": len(j.get("stageIds", [])),
                "tasks": j.get("numCompletedTasks"),
            }
        )
    print(
        json.dumps(
            {
                "query": name,
                "t_build": round(t_build, 3),
                "t_exec": round(t_exec, 3),
                "n_jobs": len(jl),
                "job_wall_sum": round(total_job_wall, 3),
                "gap": round(t_exec - total_job_wall, 3),
                "jobs": job_summ,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )

spark.stop()
