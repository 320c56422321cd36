"""The batch ETL pipeline: extract → transform/reject → load → audit.

End-to-end re-expression of the reference's flagship entry point
``etl_batch.main()`` (reference scr/etl_batch.py:174-199) plus the
incremental/migration behaviors of scr/etl_incremental_audit.py, on a
parquet warehouse:

    data_in/*.csv ─► all-string read ─► motivo cascade ─► rejects → CSV sink
                                              │
                                              └► valid ─► dim upsert (set-based)
                                                     ─► fact idempotent append
                                                     ─► audit row (etl_runs)

Tables (warehouse_dir/):
    ciudades/          ciudad_id, nombre                    (dim)
    personas_limpias/  persona_id, nombre, edad, ciudad_id,
                       processed_at, run_id                 (fact)
    etl_runs/          run_id, started_at, source_file, valid_count,
                       rejected_count, inserted_new, ignored_duplicates

The per-file driver loop is retained intentionally: the reference's audit
contract is one row per (run, file) with its own run_id
(scr/etl_batch.py:132,156-163). Each file's DAG is still fully
distributed; at scale you raise throughput by processing files into one
combined read with ``read_csv_directory`` + groupBy(source_file) for
metrics — provided as ``run_directory_combined``.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass, field
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_python_sqlite_spark.operators.idempotent import (
    idempotent_append,
    read_or_empty,
    upsert_dimension,
)
from etl_python_sqlite_spark.operators.transform import transform_with_rejections
from etl_python_sqlite_spark.sources.csv import list_csv_files, read_csv_all_string

FACT_SCHEMA = T.StructType(
    [
        T.StructField("persona_id", T.LongType(), True),
        T.StructField("nombre", T.StringType(), False),
        T.StructField("edad", T.IntegerType(), False),
        T.StructField("ciudad_id", T.LongType(), False),
        T.StructField("processed_at", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
    ]
)

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("started_at", T.StringType(), False),
        T.StructField("source_file", T.StringType(), False),
        T.StructField("valid_count", T.LongType(), False),
        T.StructField("rejected_count", T.LongType(), False),
        T.StructField("inserted_new", T.LongType(), False),
        T.StructField("ignored_duplicates", T.LongType(), False),
    ]
)

#: natural key = idempotency contract (UNIQUE(nombre,edad,ciudad_id),
#: reference scr/etl_batch.py:100)
FACT_NATURAL_KEY = ["nombre", "edad", "ciudad_id"]

MIGRATION_BACKFILL_TS = "1970-01-01T00:00:00Z"
MIGRATION_BACKFILL_RUN = "MIGRATION"


def make_run_id(source_file: str, now: datetime | None = None) -> str:
    """UTC µs timestamp + sanitized filename — reference scr/etl_batch.py:24-28.

    ``now`` injectable for deterministic tests.
    """
    ts = (now or datetime.now(timezone.utc)).strftime("%Y%m%dT%H%M%S%fZ")
    safe = "".join(ch if ch.isalnum() else "_" for ch in source_file)
    return f"{ts}_{safe}"


@dataclass
class PipelineConfig:
    data_in: str
    data_rejected: str
    warehouse: str
    edad_min: int = 25
    #: catalog table name for the fact — when set, the warehouse default is
    #: the BUCKETED layout (``idempotent_append_bucketed``): the accumulated
    #: fact is bucketed by the natural key, so each batch's anti-join
    #: consumes the bucket layout with NO exchange over the target. This is
    #: the 100 TB path; the path-parquet layout (``fact_table=None``) stays
    #: as the zero-setup default for small warehouses.
    fact_table: str | None = None
    fact_buckets: int = 16
    #: which reference script's reject strings to reproduce byte-for-byte:
    #: "relational" (scr/etl_relational.py:30-92, granular per-failure
    #: messages) or "batch" (scr/etl_batch.py:48-64, whose single
    #: try/except collapses None/text/int failures into one message).
    message_style: str = "relational"

    @property
    def dim_path(self) -> str:
        return str(Path(self.warehouse) / "ciudades")

    @property
    def fact_path(self) -> str:
        return str(Path(self.warehouse) / "personas_limpias")

    @property
    def audit_path(self) -> str:
        return str(Path(self.warehouse) / "etl_runs")


def read_fact(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """The accumulated fact table under either warehouse layout."""
    if cfg.fact_table is not None:
        if spark.catalog.tableExists(cfg.fact_table):
            return spark.table(cfg.fact_table)
        return spark.createDataFrame([], FACT_SCHEMA)
    return read_or_empty(spark, cfg.fact_path, FACT_SCHEMA)


def _append_fact(
    spark: SparkSession,
    cfg: PipelineConfig,
    batch: DataFrame,
    id_start: int,
    group_col: str | None = None,
):
    """Route a fact batch to the configured warehouse layout."""
    if cfg.fact_table is not None:
        from etl_python_sqlite_spark.operators.idempotent import (
            idempotent_append_bucketed,
        )

        return idempotent_append_bucketed(
            spark,
            batch,
            cfg.fact_table,
            FACT_NATURAL_KEY,
            buckets=cfg.fact_buckets,
            target_schema=FACT_SCHEMA,
            id_col="persona_id",
            id_start=id_start,
            group_col=group_col,
        )
    return idempotent_append(
        spark,
        batch,
        cfg.fact_path,
        FACT_NATURAL_KEY,
        target_schema=FACT_SCHEMA,
        id_col="persona_id",
        id_start=id_start,
        group_col=group_col,
    )


@dataclass
class FileRunResult:
    source_file: str
    run_id: str
    valid_count: int
    rejected_count: int
    inserted_new: int
    ignored_duplicates: int


@dataclass
class BatchResult:
    files: list[FileRunResult] = field(default_factory=list)


def write_rejects_csv(rejects: DataFrame, out_path: str | Path) -> int:
    """Reject sink: header CSV, raw columns + motivo — reference
    scr/etl_relational.py:97-102. Returns reject count.

    Written as a single CSV file (coalesce(1)) for reference parity —
    rejects are a small fraction by contract; at scale drop the coalesce
    and write a directory.
    """
    n = rejects.count()
    if not n:
        return 0
    tmp = str(out_path) + "._spark_tmp"
    (
        rejects.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        # Spark's CSV WRITER strips cell whitespace by default; the reference
        # writes the original raw values verbatim (scr/etl_relational.py:97-102)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(tmp)
    )
    part = next(Path(tmp).glob("part-*.csv"))
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    shutil.move(str(part), str(out_path))
    shutil.rmtree(tmp)
    return n


def write_rejects_csv_by_file(
    rejects: DataFrame, out_dir: str | Path, file_col: str = "source_file"
) -> dict[str, int]:
    """Reject sink for combined multi-file runs: ONE partitioned write
    produces every per-file ``rejected_<name>.csv`` (vs a driver loop of
    N jobs). ``partitionBy`` routes each source file's rows to its own
    directory; ``repartition(file_col)`` guarantees exactly one part file
    (hence exactly one CSV header) per source file. Returns per-file
    reject counts.
    """
    counts = {r[0]: r[1] for r in rejects.groupBy(file_col).count().collect()}
    if not counts:
        return {}
    out_dir = Path(out_dir)
    tmp = str(out_dir / "._spark_rejects_tmp")
    (
        rejects.repartition(F.col(file_col))
        .write.mode("overwrite")
        .option("header", True)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .partitionBy(file_col)
        .csv(tmp)
    )
    from urllib.parse import unquote

    out_dir.mkdir(parents=True, exist_ok=True)
    for d in Path(tmp).glob(f"{file_col}=*"):
        fname = unquote(d.name.split("=", 1)[1])
        part = next(d.glob("part-*.csv"))
        shutil.move(str(part), str(out_dir / f"rejected_{fname}"))
    shutil.rmtree(tmp)
    return counts


def load_file(
    spark: SparkSession,
    cfg: PipelineConfig,
    valid: DataFrame,
    source_file: str,
    rejected_count: int,
    now: datetime | None = None,
) -> FileRunResult:
    """Load one file's valid rows — reference ``load_batch``
    (scr/etl_batch.py:123-168), set-based."""
    run_id = make_run_id(source_file, now)
    started_at = (now or datetime.now(timezone.utc)).isoformat()
    processed_at = started_at

    valid = valid.persist()
    try:
        valid_count = valid.count()

        # dimension upsert (set-based J3) + broadcast key resolution
        dim = upsert_dimension(
            spark, valid.select(F.col("ciudad").alias("nombre")), cfg.dim_path
        )
        resolved = valid.join(
            F.broadcast(dim), valid.ciudad == dim.nombre, "inner"
        ).select(
            valid.nombre, valid.edad.cast("int").alias("edad"), dim.ciudad_id
        )

        # surrogate persona_id start: AUTOINCREMENT parity — max existing + 1;
        # ids are assigned inside idempotent_append AFTER the anti-join so
        # IGNOREd duplicates don't consume ids (dense like SQLite)
        existing = read_fact(spark, cfg)
        start = (existing.agg(F.max("persona_id")).first()[0] or 0) + 1
        batch = (
            resolved.withColumn("processed_at", F.lit(processed_at))
            .withColumn("run_id", F.lit(run_id))
        )

        res = _append_fact(spark, cfg, batch, id_start=start)

        audit_row = spark.createDataFrame(
            [
                (
                    run_id,
                    started_at,
                    source_file,
                    valid_count,
                    rejected_count,
                    res.inserted_new,
                    res.ignored_duplicates,
                )
            ],
            AUDIT_SCHEMA,
        )
        audit_row.write.mode("append").parquet(cfg.audit_path)
    finally:
        valid.unpersist()

    return FileRunResult(
        source_file=source_file,
        run_id=run_id,
        valid_count=valid_count,
        rejected_count=rejected_count,
        inserted_new=res.inserted_new,
        ignored_duplicates=res.ignored_duplicates,
    )


def run_batch(
    spark: SparkSession, cfg: PipelineConfig, now: datetime | None = None
) -> BatchResult:
    """Process every CSV in ``cfg.data_in`` — reference ``etl_batch.main()``
    (scr/etl_batch.py:174-199)."""
    result = BatchResult()
    for csv_file in list_csv_files(cfg.data_in):
        raw = read_csv_all_string(spark, csv_file)
        valid, rejects = transform_with_rejections(
            raw, edad_min=cfg.edad_min, message_style=cfg.message_style
        )
        n_rejects = write_rejects_csv(
            rejects, Path(cfg.data_rejected) / f"rejected_{csv_file.name}"
        )
        result.files.append(
            load_file(spark, cfg, valid, csv_file.name, n_rejects, now=now)
        )
    return result


# ---------------------------------------------------------------------------
# Schema introspection + migration (S7/S8)
# ---------------------------------------------------------------------------

def table_has_column(spark: SparkSession, path: str, col: str) -> bool:
    """PRAGMA table_info parity — reference scr/etl_incremental_audit.py:106-109."""
    try:
        return col in spark.read.parquet(path).columns
    except Exception:
        return False


def migrate_fact_if_needed(spark: SparkSession, fact_path: str) -> bool:
    """Add lineage columns to a legacy fact table, backfilling
    ``1970-01-01T00:00:00Z`` / ``MIGRATION`` — reference
    scr/etl_incremental_audit.py:112-155 (create-copy-drop-rename, here a
    rewrite + atomic directory swap). Returns True if migration ran.
    """
    if not Path(fact_path).exists():
        return False
    old = spark.read.parquet(fact_path)
    if "processed_at" in old.columns and "run_id" in old.columns:
        return False

    migrated = old
    if "processed_at" not in old.columns:
        migrated = migrated.withColumn("processed_at", F.lit(MIGRATION_BACKFILL_TS))
    if "run_id" not in migrated.columns:
        migrated = migrated.withColumn("run_id", F.lit(MIGRATION_BACKFILL_RUN))
    migrated = migrated.select([f.name for f in FACT_SCHEMA.fields])

    tmp = fact_path + "._migrating"
    migrated.write.mode("overwrite").parquet(tmp)
    bak = fact_path + "._pre_migration"
    shutil.move(fact_path, bak)
    shutil.move(tmp, fact_path)
    shutil.rmtree(bak)
    return True


# ---------------------------------------------------------------------------
# Scale path: whole-directory combined run (single read, per-file metrics)
# ---------------------------------------------------------------------------

def run_directory_combined(
    spark: SparkSession, cfg: PipelineConfig, now: datetime | None = None
) -> DataFrame:
    """One multi-file scan with ``input_file_name()`` lineage: the scan,
    cascade, dim upsert and fact append each run ONCE over all files —
    per-file audit metrics come from a groupBy(source_file) instead of a
    driver loop. This is the 1000-executor-shaped version of
    ``run_batch``; run_id embeds the file name per the reference contract.

    Returns the audit DataFrame that was appended.

    Audit parity with the per-file loop: rejects are routed to one
    ``rejected_<file>.csv`` per source file (single partitioned write),
    and ``inserted_new`` / ``ignored_duplicates`` are computed PER FILE
    from the anti-join survivors (``idempotent_append(group_col=...)``),
    not stamped batch-global onto every row.
    """
    from etl_python_sqlite_spark.operators.transform import annotate_rejections
    from etl_python_sqlite_spark.sources.csv import read_csv_directory

    raw = read_csv_directory(spark, str(Path(cfg.data_in) / "*.csv"))
    ts = (now or datetime.now(timezone.utc)).strftime("%Y%m%dT%H%M%S%fZ")
    started_at = (now or datetime.now(timezone.utc)).isoformat()

    # the cascade runs with source_file carried through row-wise, so one
    # scan feeds the load, the reject sink and the per-file audit metrics;
    # persist: three consumers, one materialization
    ann = annotate_rejections(
        raw, edad_min=cfg.edad_min, message_style=cfg.message_style
    ).persist()
    try:
        raw_cols = [
            c
            for c in ann.columns
            if c not in ("motivo", "nombre_norm", "ciudad_norm", "edad_int", "source_file")
        ]
        rejects = ann.filter(F.col("motivo").isNotNull()).select(
            *[F.coalesce(F.col(c), F.lit("")).alias(c) for c in raw_cols],
            "motivo",
            "source_file",
        )
        write_rejects_csv_by_file(rejects, cfg.data_rejected)

        valid = ann.filter(F.col("motivo").isNull())
        dim = upsert_dimension(
            spark, valid.select(F.col("ciudad_norm").alias("nombre")), cfg.dim_path
        )
        resolved = valid.join(F.broadcast(dim), valid.ciudad_norm == dim.nombre).select(
            F.col("nombre_norm").alias("nombre"),
            F.col("edad_int").cast("int").alias("edad"),
            "ciudad_id",
            "source_file",
        )
        existing = read_fact(spark, cfg)
        start = (existing.agg(F.max("persona_id")).first()[0] or 0) + 1
        batch = (
            resolved.withColumn("processed_at", F.lit(started_at))
            .withColumn(
                "run_id",
                F.concat(
                    F.lit(ts + "_"),
                    F.regexp_replace("source_file", r"[^\p{L}\p{N}]", "_"),
                ),
            )
        )
        res = _append_fact(spark, cfg, batch, id_start=start, group_col="source_file")

        # per_group is already a tiny DISTRIBUTED frame — join it straight
        # into the audit, no driver round trip
        per_file = res.per_group
        audit = (
            ann.groupBy("source_file")
            .agg(
                F.sum(F.when(F.col("motivo").isNull(), 1).otherwise(0)).alias(
                    "valid_count"
                ),
                F.sum(F.when(F.col("motivo").isNotNull(), 1).otherwise(0)).alias(
                    "rejected_count"
                ),
            )
            .join(F.broadcast(per_file), on="source_file", how="left")
            .select(
                F.concat(
                    F.lit(ts + "_"),
                    F.regexp_replace("source_file", r"[^\p{L}\p{N}]", "_"),
                ).alias("run_id"),
                F.lit(started_at).alias("started_at"),
                "source_file",
                F.col("valid_count").cast("long"),
                F.col("rejected_count").cast("long"),
                F.coalesce("inserted_new", F.lit(0)).cast("long").alias("inserted_new"),
                F.coalesce("ignored_duplicates", F.lit(0))
                .cast("long")
                .alias("ignored_duplicates"),
            )
        )
        audit.write.mode("append").parquet(cfg.audit_path)
    finally:
        ann.unpersist()
    return spark.read.schema(AUDIT_SCHEMA).parquet(cfg.audit_path)
