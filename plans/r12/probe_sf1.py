"""sf1 scaling spot-probe (VERDICT r11 next #7): top-10 bench queries
at ~10x sf0.1 (~sf1), 8 vs 32 cores.

Replication keeps workload shape honest per family:
- lineitem: BOTH keys offset per copy (l_orderkey*f+i, l_partkey*f+i) —
  f disjoint co-occurrence graphs, so basket/triangle/pagerank work
  scales exactly f (the scale_probe.py discipline);
- events: user_id/event_id offset — f disjoint CDC histories;
- documents: per-copy salt token between every word pair — n-gram and
  repetition density stays natural (verbatim copies would inflate
  cross-copy matches);
- embeddings: vec_id offset (kmeans assignment is linear in n; the
  geometric pair-search families are deliberately NOT probed this way —
  identical replicated vectors would measure match volume, not scale).

Usage: SPARK_GRAFT_CPUS=32 python plans/r12/probe_sf1.py [factor]
Writes one JSON line per query to stdout; the replicated dataset is
materialized once under .probe_tmp/sf1rep_f{factor} and reused.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from functools import reduce

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(ROOT, ".probe_tmp", f"sf1rep_f{FACTOR}")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (
    SparkSession.builder.appName(f"probe-sf1-c{CPUS}")
    .master(f"local[{CPUS}]")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, ROOT)

from etl_python_sqlite_spark.functions.text import WS_CLASS  # noqa: E402
from etl_python_sqlite_spark.sources.parquet import load_table  # noqa: E402


def build() -> None:
    if os.path.exists(os.path.join(OUT, "_DONE")):
        return
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    f = FACTOR

    def reps(df, exprs):
        return reduce(
            lambda a, b: a.unionAll(b), (df.select(*exprs(i)) for i in range(f))
        )

    li = load_table(spark, SRC, "lineitem")
    cols = [c for c in li.columns if c not in ("l_orderkey", "l_partkey")]
    reps(li, lambda i: [
        (F.col("l_orderkey") * f + i).alias("l_orderkey"),
        (F.col("l_partkey") * f + i).alias("l_partkey"), *cols,
    ]).repartition(int(CPUS)).write.parquet(f"{OUT}/lineitem.parquet")

    ev = load_table(spark, SRC, "events")
    ecols = [c for c in ev.columns if c not in ("user_id", "event_id")]
    reps(ev, lambda i: [
        (F.col("user_id") * f + i).alias("user_id"),
        (F.col("event_id") * f + i).alias("event_id"), *ecols,
    ]).repartition(int(CPUS)).write.parquet(f"{OUT}/events.parquet")

    docs = load_table(spark, SRC, "documents")
    reps(docs, lambda i: [
        (F.col("doc_id") * f + i).alias("doc_id"),
        F.regexp_replace("text", f"{WS_CLASS}+", f" s{i} ").alias("text"),
        "lang", "source",
    ]).repartition(int(CPUS)).write.parquet(f"{OUT}/documents.parquet")

    em = load_table(spark, SRC, "embeddings")
    mcols = [c for c in em.columns if c != "vec_id"]
    reps(em, lambda i: [
        (F.col("vec_id") * f + i).alias("vec_id"), *mcols,
    ]).repartition(int(CPUS)).write.parquet(f"{OUT}/embeddings.parquet")

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        load_table(spark, SRC, t).write.parquet(f"{OUT}/{t}.parquet")
    open(os.path.join(OUT, "_DONE"), "w").close()


build()

import __spark_entry__ as E  # noqa: E402

qs = E.queries()
NAMES = [
    "agg_pricing_summary",
    "part_basket_pairs",
    "part_cooccurrence_pagerank",
    "part_triangle_stats",
    "scd2_apply_changes_events",
    "scd2_rebuild_late_events",
    "ext_bigram_lm_score",
    "ext_trigram_lm_score",
    "ext_repetition_filter",
    "ext_kmeans_par_seeded",
]


def run(name: str) -> float:
    t0 = time.perf_counter()
    qs[name](spark, OUT).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


for name in NAMES:  # warm-up: codegen + shared stage builds off the clock
    spark.sparkContext.setJobDescription(f"warmup {name}")
    run(name)
for name in NAMES:
    spark.sparkContext.setJobDescription(f"timed {name}")
    wall = min(run(name), run(name))
    print(json.dumps({"q": name, "cpus": int(CPUS), "factor": FACTOR,
                      "best_of_2_sec": wall}))
