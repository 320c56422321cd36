"""sf1 scaling spot-probe for the round-12 SESSION-2 touched queries
(shared simhash/raw-words/ANN stages, prefix-join persists, AQE-off
kmeans): ~10x sf0.1, 8 vs 32 cores. Reuses probe_sf1.py's replicated
dataset (same per-family discipline — salted documents keep shingle /
fingerprint match density natural, so the pair joins measure SCALE,
not inflated cross-copy matches).

Usage: SPARK_GRAFT_CPUS={8,32} python plans/r12/probe_sf1_session2.py [factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(ROOT, ".probe_tmp", f"sf1rep_f{FACTOR}")

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.appName(f"probe-sf1s2-c{CPUS}")
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

if not os.path.exists(os.path.join(OUT, "_DONE")):
    raise SystemExit(
        f"replicated dataset missing under {OUT} — run probe_sf1.py first"
    )

import __spark_entry__ as E  # noqa: E402

qs = E.queries()
NAMES = [
    "ext_simhash_fingerprints",
    "ext_simhash_near_dups",
    "ext_setsim_prefix_join",
    "ext_containment_join",
    "ext_winnowing_pairs",
    "ext_heavy_hitters",
    "ext_tfidf_top_terms",
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
