"""Collect-compare old (HEAD snapshot at /tmp/old_tree) vs new (working
tree) results for named queries at a given SF — exact equality, floats
compared bit-for-bit. Runs the two trees in SEPARATE processes via
subprocess to keep imports clean; this driver diffs the JSON dumps."""
from __future__ import annotations

import json
import os
import subprocess
import sys

names = sys.argv[2:]
sf_dir = sys.argv[1]

RUNNER = r'''
import json, os, sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.appName("cmp").master("local[16]")
         .config("spark.driver.memory", "12g")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.python.filterPushdown.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em
out = {}
for n in sys.argv[3:]:
    df = em.queries()[n](spark, sys.argv[2])
    rows = [[repr(v) for v in r] for r in df.collect()]
    out[n] = {"cols": sorted(df.columns), "rows": sorted(map(tuple, rows))}
print("RESULT::" + json.dumps(out, default=str))
spark.stop()
'''


def run(tree):
    r = subprocess.run(
        [sys.executable, "-c", RUNNER, tree, sf_dir, *names],
        capture_output=True, text=True, timeout=1200,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[8:])
    print(r.stdout[-2000:], r.stderr[-3000:])
    raise SystemExit("runner failed for " + tree)


old = run("/tmp/old_tree")
new = run(os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
ok = True
for n in names:
    same = old[n] == new[n]
    print(n, "IDENTICAL" if same else "DIFF")
    if not same:
        ok = False
        o, w = old[n], new[n]
        if o["cols"] != w["cols"]:
            print("  cols:", o["cols"], "vs", w["cols"])
        for a, b in zip(o["rows"], w["rows"]):
            if a != b:
                print("  ", a, "\n  ", b)
                break
print("ALL IDENTICAL" if ok else "MISMATCH FOUND")
