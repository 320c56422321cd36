"""Dump .explain('formatted') for named queries to plans/r12/<q>_<tag>.txt."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

tag = sys.argv[1]
names = sys.argv[2:]
# optional: dump from a different tree (e.g. the HEAD snapshot) for
# before-plans — output still lands next to this script
tree = os.environ.get("DUMP_TREE")
if tree:
    sys.path.insert(0, tree)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("dump_plans_s4")
    .master("local[32]")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"

import __spark_entry__ as entrymod

queries = entrymod.queries()
outdir = os.path.dirname(os.path.abspath(__file__))
for n in names:
    df = queries[n](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    with open(os.path.join(outdir, f"{n}_{tag}.txt"), "w") as fh:
        fh.write(txt)
    print(n, "->", f"{n}_{tag}.txt", flush=True)
spark.stop()
