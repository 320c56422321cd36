"""Dump .explain('formatted') for the r12-touched queries.

Usage: python plans/r12/capture_plans.py <repo_root> <suffix> <out_dir> [q1,q2,...]
(suffix = 'before' run against the git-archive snapshot of the round-start
commit, 'after' against the working tree — same data, same session conf).
"""
import os
import sys

root, suffix, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4].split(",") if len(sys.argv) > 4 else [
    "ext_bigram_lm_score",
    "ext_trigram_lm_score",
    "ext_fivegram_lm_score",
    "ext_dsir_importance",
    "scd2_apply_changes_events",
    "scd2_rebuild_late_events",
    "ext_semantic_dedup",
    "ext_semantic_contamination",
    "ext_ann_knn_join",
    "ext_embedding_near_dups",
    "ext_webdataset_roundtrip",
]
sys.path.insert(0, root)
os.chdir(root)

from pyspark.sql import SparkSession  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.appName(f"plans-{suffix}")
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

import __spark_entry__ as E  # noqa: E402

qs = E.queries()
mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
for name in names:
    try:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
    except Exception as exc:  # noqa: BLE001
        txt = f"EXPLAIN FAILED: {exc}"
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(txt)
    print(name, suffix, "ok")
spark.stop()
