"""Targeted row deletion (right-to-be-forgotten / compliance purge)
over a partitioned parquet dataset — rewrite ONLY the partitions that
contain the doomed keys, leave every other partition's files untouched.

The reference engine has no delete path at all (its idempotent loader
only ever INSERTs — reference ``scr/etl_batch.py:139-154``), but any
real pipeline that ingests user data needs one: GDPR/CCPA erasure is a
recurring batch job, and at 100 TB a naive read-all→anti-join→rewrite
is a full-dataset shuffle for what is usually a handful of keys.

The scale design:

* The key set is the SMALL side (thousands of subjects, not rows) —
  its distinct partition values are a bounded collect (the sanctioned
  literal-re-entry class), and become an ``isin`` predicate that
  PARTITION-PRUNES the scan: untouched partitions are never read,
  never written, their files stay byte-identical (asserted in
  tests/test_purge.py by comparing file listings + mtimes).
* Affected partitions are rewritten with a broadcast LEFT-ANTI join on
  the key columns and dynamic partition overwrite — only the affected
  ``part=`` directories are replaced; the write is atomic per
  partition under Spark's commit protocol.
* Returns an AUDIT dict (rows scanned / deleted / kept, partitions
  rewritten) the way compliance jobs must log their effect. Counts
  come from ONE pass over the affected slice (conditional aggregation,
  no second scan).

Deliberately parquet-native: with a transactional table format (Delta,
Iceberg) this is a `MERGE ... DELETE`; those need external jars this
environment excludes, and the partition-pruned rewrite is exactly what
their copy-on-write delete does under the hood.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cache import _release_frame


def purge_keys(
    spark: SparkSession,
    path: str | Path,
    keys: DataFrame,
    key_cols: list[str],
    partition_col: str,
    verify_complete: bool = True,
) -> dict:
    """Delete every row of the dataset at ``path`` whose ``key_cols``
    match a row of ``keys``. The dataset must be directory-partitioned
    by ``partition_col``; ``keys`` must carry ``partition_col`` too
    (the compliance request always knows the subject's partition — by
    construction of the ingest layout, or from an index lookup the
    caller does first). Returns the audit dict.

    ``verify_complete`` (DEFAULT ON — a compliance delete that silently
    misses rows is the worst failure mode): after the rewrite, scan the
    COMPLEMENT partitions for any row matching the doomed keys and
    raise if found (a stale index / late re-ingest put a subject's rows
    in a partition the request didn't list). This is one extra pass
    over the untouched data — callers at extreme scale who maintain a
    trustworthy key→partition index can opt out, and then own that
    guarantee themselves (the trade-off is explicit, never silent)."""
    path = str(path)
    key_cols = list(key_cols)
    # bounded collect: DISTINCT partition values of the doomed keys —
    # subjects-sized, not data-sized
    parts = [
        r[0] for r in keys.select(partition_col).distinct().collect()
    ]
    if not parts:
        return {
            "partitions_rewritten": 0,
            "rows_deleted": 0,
            "rows_kept": 0,
        }
    affected = spark.read.parquet(path).filter(
        F.col(partition_col).isin(parts)  # partition-pruned scan
    )
    doomed = keys.select(*key_cols).distinct()
    # localCheckpoint, NOT persist: the survivors are written over the
    # SAME path they were read from. A plain cache keeps lineage to the
    # source files live — if cached blocks are lost mid-write (executor
    # loss / eviction at cluster scale) Spark would recompute from the
    # parquet being overwritten: silent corruption in a compliance
    # delete. The eager checkpoint severs that lineage before the first
    # byte of the rewrite; blocks are released explicitly below.
    flagged = affected.join(
        F.broadcast(doomed.withColumn("_doomed", F.lit(1))),
        key_cols,
        "left",
    ).localCheckpoint(eager=True)
    # ONE pass for the PER-PARTITION audit counts (bounded: |parts|
    # rows collected); the cache then feeds the rewrite. Per-partition,
    # not global, because a FULLY-purged partition is a correctness
    # hazard: dynamic overwrite only replaces partitions PRESENT in the
    # output, so a partition with zero survivors would be silently left
    # intact — doomed rows and all. Those are deleted explicitly below.
    per_part = {
        r[partition_col]: (int(r["deleted"]), int(r["kept"]))
        for r in flagged.groupBy(partition_col)
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_doomed") == 1, F.lit(1))), F.lit(0)
            ).alias("deleted"),
            F.coalesce(
                F.sum(F.when(F.col("_doomed").isNull(), F.lit(1))),
                F.lit(0),
            ).alias("kept"),
        )
        .collect()
    }
    survivors = flagged.filter(F.col("_doomed").isNull()).drop("_doomed")
    (
        survivors.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    _release_frame(flagged)  # checkpoint blocks: free now, not on GC
    # emptied partitions: scheme-aware directory delete via the Hadoop
    # FileSystem API (never Path.glob — the compact_files lesson)
    emptied = [
        p for p, (_, kept) in per_part.items() if kept == 0
    ]
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if emptied:
        for p in emptied:
            # simple scalar partition values only (str/int — the ingest
            # layout's contract); exotic values need the caller to
            # pre-escape as Spark's partition dir naming does
            d = jvm.org.apache.hadoop.fs.Path(
                path, f"{partition_col}={p}"
            )
            if fs.exists(d):
                fs.delete(d, True)
    if verify_complete:
        # A purge that emptied EVERY partition leaves no parquet under
        # the root (dynamic overwrite wrote nothing; the emptied dirs
        # were just deleted) — reading it would throw "unable to infer
        # schema". No remaining partition dirs ⇒ no complement rows ⇒
        # stray is 0 by construction: short-circuit instead of reading.
        # The empty-dataset end state is a bare root directory (plus
        # Spark's _SUCCESS marker); later readers must treat it as an
        # empty dataset or re-create it.
        remaining_dirs = [
            s
            for s in fs.listStatus(root)
            if s.isDirectory()
            and s.getPath().getName().startswith(f"{partition_col}=")
        ]
        stray = 0
        if remaining_dirs:
            stray = (
                spark.read.parquet(path)
                .filter(~F.col(partition_col).isin(parts))
                .join(F.broadcast(doomed), key_cols, "left_semi")
                .count()
            )
        if stray:
            raise RuntimeError(
                f"purge incomplete: {stray} row(s) matching the doomed "
                "keys exist OUTSIDE the partitions the keys frame "
                "listed — the key->partition mapping is stale; re-run "
                "with the correct partitions (affected rows were NOT "
                "touched by this job)"
            )
    return {
        # partitions that actually held rows and were rewritten (or
        # removed) — a listed-but-nonexistent partition value is not
        # counted as work done
        "partitions_rewritten": len(per_part),
        "rows_deleted": sum(d for d, _ in per_part.values()),
        "rows_kept": sum(k for _, k in per_part.values()),
    }
