"""Per-query optimization probe (round-11 optimization phase).

Measures a named subset of the declared queries exactly the way
bench.py does — same session configs, same noop sink, warm-up pass
then best-of-N — and optionally dumps ``explain("formatted")`` for
each query to ``plans/r11/<query>_<suffix>.txt`` (the judge-facing
plan evidence).

Usage:
    python opt_probe.py --queries part_triangle_stats,mad_outlier_scan \
        [--reps 3] [--plans before|after|<none>] [--sf-dir DIR]

Timing discipline (CLAUDE.md): run only on an otherwise idle box;
single-shot numbers swing 2-4x, so best-of-N with a warm-up pass is
reported alongside every rep.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="suffix for plan dumps")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("opt_probe")
        .master(f"local[{args.cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").limit(1).collect()

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r11")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        df = fn(spark, args.sf_dir)
        if args.plans:
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            txt = df._jdf.queryExecution().explainString(mode)
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(txt)
        # warm-up (codegen compile off the clock, like bench pass 0)
        df.write.mode("overwrite").format("noop").save()
        reps = []
        for _ in range(args.reps):
            d2 = fn(spark, args.sf_dir)
            t0 = time.perf_counter()
            d2.write.mode("overwrite").format("noop").save()
            reps.append(round(time.perf_counter() - t0, 3))
        results[name] = {"best": min(reps), "reps": reps}
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"probe": results}, separators=(",", ":")))


if __name__ == "__main__":
    main()
