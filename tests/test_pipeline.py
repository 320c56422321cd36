"""End-to-end batch pipeline vs the reference's etl_batch.main() contract."""

from __future__ import annotations

import csv
from datetime import datetime, timezone
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.pipeline import (
    AUDIT_SCHEMA,
    FACT_SCHEMA,
    PipelineConfig,
    make_run_id,
    migrate_fact_if_needed,
    run_batch,
    run_directory_combined,
)

DIRTY = [
    ["nombre", "edad", "ciudad"],
    ["  guillermo ", "26", "san luis"],
    ["NOEMI", "52", "SAN LUIS"],
    ["Naomi ", "23", " san juan"],
    ["Pedro", "error", "Querétaro"],
    ["sofia", "29", "san luis"],
]

CLEAN = [
    ["nombre", "edad", "ciudad"],
    ["Marta", "33", "Lima"],
    ["guillermo", "26", "San Luis"],   # post-normalization dupe of DIRTY row 1
]


def _write_csv(path: Path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w", newline="", encoding="utf-8") as f:
        csv.writer(f).writerows(rows)


@pytest.fixture()
def cfg(tmp_path):
    c = PipelineConfig(
        data_in=str(tmp_path / "in"),
        data_rejected=str(tmp_path / "rejected"),
        warehouse=str(tmp_path / "wh"),
    )
    _write_csv(Path(c.data_in) / "a_dirty.csv", DIRTY)
    _write_csv(Path(c.data_in) / "b_clean.csv", CLEAN)
    return c


NOW = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)


def test_run_id_format():
    rid = make_run_id("archivo final.csv", NOW)
    assert rid == "20240601T120000000000Z_archivo_final_csv"


def test_batch_end_to_end(spark, cfg):
    result = run_batch(spark, cfg, now=NOW)
    by_file = {r.source_file: r for r in result.files}

    a = by_file["a_dirty.csv"]
    assert (a.valid_count, a.rejected_count) == (3, 2)
    assert (a.inserted_new, a.ignored_duplicates) == (3, 0)

    b = by_file["b_clean.csv"]
    assert (b.valid_count, b.rejected_count) == (2, 0)
    # 'guillermo,26,San Luis' normalizes to the same natural key as the
    # dirty file's first row → ignored as cross-file duplicate
    assert (b.inserted_new, b.ignored_duplicates) == (1, 1)

    fact = spark.read.parquet(cfg.fact_path)
    assert fact.count() == 4
    # lineage columns attached
    assert {"processed_at", "run_id"} <= set(fact.columns)
    # AUTOINCREMENT parity: dense ids — IGNOREd duplicates consume none
    assert sorted(r["persona_id"] for r in fact.collect()) == [1, 2, 3, 4]

    # reject CSV written with motivo, one per dirty file only
    rej = Path(cfg.data_rejected)
    assert (rej / "rejected_a_dirty.csv").exists()
    assert not (rej / "rejected_b_clean.csv").exists()
    with (rej / "rejected_a_dirty.csv").open() as f:
        rows = list(csv.DictReader(f))
    assert {r["motivo"] for r in rows} == {"Edad < 25", "Edad no convertible a int"}
    # raw values preserved verbatim (incl. whitespace) like the reference
    naomi = next(r for r in rows if r["motivo"] == "Edad < 25")
    assert naomi["nombre"] == "Naomi " and naomi["ciudad"] == " san juan"

    # audit table: one row per file with the same metrics
    audit = {r["source_file"]: r for r in spark.read.parquet(cfg.audit_path).collect()}
    assert audit["a_dirty.csv"]["inserted_new"] == 3
    assert audit["b_clean.csv"]["ignored_duplicates"] == 1


@pytest.mark.slow  # >8 s e2e/fuzz (default tier deselects)
def test_rerun_is_idempotent(spark, cfg):
    run_batch(spark, cfg, now=NOW)
    result2 = run_batch(spark, cfg, now=NOW)
    assert all(r.inserted_new == 0 for r in result2.files)
    assert all(r.ignored_duplicates == r.valid_count for r in result2.files)
    assert spark.read.parquet(cfg.fact_path).count() == 4
    # audit keeps appending: 2 files × 2 runs
    assert spark.read.parquet(cfg.audit_path).count() == 4


def test_dim_fact_join_roundtrip(spark, cfg):
    """The reference's validation join (scr/etl_relational.py:182-194)."""
    run_batch(spark, cfg, now=NOW)
    fact = spark.read.parquet(cfg.fact_path)
    dim = spark.read.parquet(cfg.dim_path)
    joined = (
        fact.join(F.broadcast(dim), "ciudad_id")
        .select("persona_id", fact.nombre, "edad", dim.nombre.alias("ciudad"))
        .orderBy("persona_id")
    )
    got = {(r["nombre"], r["edad"], r["ciudad"]) for r in joined.collect()}
    assert got == {
        ("Guillermo", 26, "San Luis"),
        ("Noemi", 52, "San Luis"),
        ("Sofia", 29, "San Luis"),
        ("Marta", 33, "Lima"),
    }


def test_migration_backfill(spark, tmp_path):
    """Legacy fact without lineage columns gains them with reference
    backfill values (scr/etl_incremental_audit.py:144-151)."""
    fact_path = str(tmp_path / "fact_legacy")
    legacy = spark.createDataFrame(
        [(1, "Ana", 30, 1)], "persona_id long, nombre string, edad int, ciudad_id long"
    )
    legacy.write.parquet(fact_path)

    assert migrate_fact_if_needed(spark, fact_path) is True
    migrated = spark.read.parquet(fact_path)
    row = migrated.first()
    assert row["processed_at"] == "1970-01-01T00:00:00Z"
    assert row["run_id"] == "MIGRATION"
    # idempotent: second call is a no-op
    assert migrate_fact_if_needed(spark, fact_path) is False


def test_combined_directory_run_matches_per_file(spark, cfg, tmp_path):
    """The scale-path single-scan variant produces the same warehouse state
    AND the same per-(run,file) audit/reject contract as the driver loop."""
    audit = run_directory_combined(spark, cfg, now=NOW)
    fact = spark.read.parquet(cfg.fact_path)
    assert fact.count() == 4
    rows = {r["source_file"]: r for r in audit.collect()}
    assert rows["a_dirty.csv"]["valid_count"] == 3
    assert rows["a_dirty.csv"]["rejected_count"] == 2
    assert rows["b_clean.csv"]["valid_count"] == 2

    # per-FILE insert accounting (not batch-global stamped on every row):
    # the cross-file duplicate resolves to the first file in sorted order
    a, b = rows["a_dirty.csv"], rows["b_clean.csv"]
    assert (a["inserted_new"], a["ignored_duplicates"]) == (3, 0)
    assert (b["inserted_new"], b["ignored_duplicates"]) == (1, 1)

    # rejects routed per source file, raw values verbatim
    rej = Path(cfg.data_rejected)
    assert (rej / "rejected_a_dirty.csv").exists()
    assert not (rej / "rejected_b_clean.csv").exists()
    with (rej / "rejected_a_dirty.csv").open() as f:
        rrows = list(csv.DictReader(f))
    assert {r["motivo"] for r in rrows} == {"Edad < 25", "Edad no convertible a int"}
    naomi = next(r for r in rrows if r["motivo"] == "Edad < 25")
    assert naomi["nombre"] == "Naomi " and naomi["ciudad"] == " san juan"


@pytest.mark.slow  # >8 s e2e/fuzz (default tier deselects)
def test_bucketed_warehouse_run_batch_parity(spark, tmp_path):
    """fact_table set → the warehouse default is the bucketed catalog
    layout: same end state and audit metrics as the path layout, and the
    per-batch anti-join consumes the bucket layout (no Exchange over the
    accumulated fact)."""
    from pyspark.sql import functions as F

    spark.sql("DROP TABLE IF EXISTS personas_limpias_bt")
    cfg = PipelineConfig(
        data_in=str(tmp_path / "in"),
        data_rejected=str(tmp_path / "rejected"),
        warehouse=str(tmp_path / "wh"),
        fact_table="personas_limpias_bt",
        fact_buckets=4,
    )
    _write_csv(Path(cfg.data_in) / "a_dirty.csv", DIRTY)
    _write_csv(Path(cfg.data_in) / "b_clean.csv", CLEAN)

    result = run_batch(spark, cfg, now=NOW)
    by_file = {r.source_file: r for r in result.files}
    assert (by_file["a_dirty.csv"].inserted_new, by_file["a_dirty.csv"].ignored_duplicates) == (3, 0)
    assert (by_file["b_clean.csv"].inserted_new, by_file["b_clean.csv"].ignored_duplicates) == (1, 1)

    fact = spark.table(cfg.fact_table)
    assert fact.count() == 4
    assert sorted(r["persona_id"] for r in fact.collect()) == [1, 2, 3, 4]

    # idempotent re-run against the bucketed table
    result2 = run_batch(spark, cfg, now=NOW)
    assert all(r.inserted_new == 0 for r in result2.files)
    assert spark.table(cfg.fact_table).count() == 4

    # plan assertion: anti-join's TARGET side reads the bucket layout with
    # no Exchange — only the tiny probe batch shuffles
    probe = (
        spark.createDataFrame([("Zoe", 28, 1)], "nombre string, edad int, ciudad_id long")
        .hint("merge")
        .join(
            spark.table(cfg.fact_table).select("nombre"),
            on="nombre",
            how="left_anti",
        )
    )
    probe.collect()
    final_plan = (
        probe._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    )
    assert "Bucketed: true" in final_plan
    assert final_plan.count("Exchange hashpartitioning") == 1, final_plan[:800]
    spark.sql("DROP TABLE IF EXISTS personas_limpias_bt")


def test_edge_empty_and_all_reject_files(spark, tmp_path):
    """Header-only files and 100%-reject files must flow through without
    errors, with correct audit metrics."""
    cfg = PipelineConfig(
        data_in=str(tmp_path / "in"),
        data_rejected=str(tmp_path / "rej"),
        warehouse=str(tmp_path / "wh"),
    )
    _write_csv(Path(cfg.data_in) / "empty.csv", [["nombre", "edad", "ciudad"]])
    _write_csv(
        Path(cfg.data_in) / "allbad.csv",
        [["nombre", "edad", "ciudad"], ["A", "error", "X"], ["B", "12", "Y"]],
    )
    result = run_batch(spark, cfg, now=NOW)
    by_file = {r.source_file: r for r in result.files}
    assert (by_file["empty.csv"].valid_count, by_file["empty.csv"].rejected_count) == (0, 0)
    assert (by_file["allbad.csv"].valid_count, by_file["allbad.csv"].rejected_count) == (0, 2)
    assert by_file["allbad.csv"].inserted_new == 0
    # no fact table written at all (zero valid rows anywhere)
    import os
    assert not os.path.exists(cfg.fact_path)
    # audit has both rows regardless
    assert spark.read.parquet(cfg.audit_path).count() == 2


def test_edge_extra_columns_pass_through_to_rejects(spark, tmp_path):
    """Extra CSV columns survive into the reject file (reference keeps
    them via {**row}, scr/etl_batch.py:52)."""
    cfg = PipelineConfig(
        data_in=str(tmp_path / "in"),
        data_rejected=str(tmp_path / "rej"),
        warehouse=str(tmp_path / "wh"),
    )
    _write_csv(
        Path(cfg.data_in) / "extra.csv",
        [["nombre", "edad", "ciudad", "nota"],
         ["Ana", "30", "Lima", "ok-row"],
         ["Eva", "error", "Quito", "bad-row"]],
    )
    run_batch(spark, cfg, now=NOW)
    with (Path(cfg.data_rejected) / "rejected_extra.csv").open() as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["nota"] == "bad-row"
    assert rows[0]["motivo"] == "Edad no convertible a int"
    # valid row loaded normally
    assert spark.read.parquet(cfg.fact_path).count() == 1


def test_cli_main_end_to_end(spark, tmp_path):
    """`python -m etl_python_sqlite_spark` parity path: main() drives the
    same run_batch over a dirty CSV and reports the audit line."""
    import etl_python_sqlite_spark.__main__ as cli

    data_in = tmp_path / "in"
    data_in.mkdir()
    (data_in / "personas.csv").write_text(
        "nombre,edad,ciudad\nana,30,madrid\nbob,17,paris\ncarla,abc,roma\n"
    )
    # reuse the session the suite already has: main() creates via
    # getOrCreate, so it binds to the active session rather than a new JVM
    rc = cli.main(
        [
            "--data-in", str(data_in),
            "--data-rejected", str(tmp_path / "rej"),
            "--warehouse", str(tmp_path / "wh"),
        ]
    )
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "wh" / "personas_limpias"))
    assert out.count() == 1  # only ana survives (bob underage, carla bad int)
