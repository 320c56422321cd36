"""Standalone warm-latency probe for a named set of queries.

Usage: python plans/r12/probe_s3.py q1 q2 ... [--reps N]
One local[32] session, each query run REPS times via the noop sink
(bench methodology); prints every rep so swings stay visible.
"""
from __future__ import annotations

import os
import sys
import time


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("probe_s3")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.environ.get("SPARK_GRAFT_REPO", "/root/repo"))
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    for name in names:
        fn = queries[name]
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {ts}  best={min(ts[1:]) if len(ts) > 1 else ts[0]}",
              flush=True)


if __name__ == "__main__":
    main()
