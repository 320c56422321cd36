"""Process-interleaved A/B: for each round, run the OLD tree
(/tmp/old_tree) then the NEW tree (repo) in separate processes, each
timing the named queries (noop sink, warm best-of-N in-process).
Usage: python ab_time_s4.py <sf_dir> <rounds> <q1> <q2> ..."""
from __future__ import annotations

import json
import os
import subprocess
import sys

sf_dir = sys.argv[1]
rounds = int(sys.argv[2])
names = sys.argv[3:]

RUNNER = r'''
import json, sys, time
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.appName("ab").master("local[32]")
         .config("spark.driver.memory", "24g")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.scheduler.mode", "FAIR")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.python.filterPushdown.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em
qs = em.queries()
out = {}
for n in sys.argv[3:]:
    fn = qs[n]
    fn(spark, sys.argv[2]).write.mode("overwrite").format("noop").save()  # warm
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sys.argv[2]).write.mode("overwrite").format("noop").save()
        best.append(round(time.perf_counter() - t0, 3))
    out[n] = best
print("RESULT::" + json.dumps(out))
spark.stop()
'''


def run(tree):
    r = subprocess.run(
        [sys.executable, "-c", RUNNER, tree, sf_dir, *names],
        capture_output=True, text=True, timeout=2400,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[8:])
    print(r.stdout[-1500:], r.stderr[-2500:])
    raise SystemExit("runner failed for " + tree)


repo = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
acc = {n: {"old": [], "new": []} for n in names}
for i in range(rounds):
    for tag, tree in (("old", "/tmp/old_tree"), ("new", repo)):
        res = run(tree)
        for n in names:
            acc[n][tag].extend(res[n])
        print(f"round {i} {tag}: " + " ".join(f"{n}={min(res[n]):.2f}" for n in names), flush=True)
print()
for n in names:
    o, w = min(acc[n]["old"]), min(acc[n]["new"])
    print(f"{n:32} old_best={o:.3f} new_best={w:.3f} speedup={o/w:.2f}x  old={acc[n]['old']} new={acc[n]['new']}")
