"""End-state parity with the reference's own fixture files.

Row data mirrors /root/reference/data/in/personas.csv:1-4 and
personas_crudas.csv:1-7 (cited, not copied code); expectations are the
reference semantics executed by hand: sorted file order
(scr/etl_batch.py:175), EDAD_MIN=25, INSERT OR IGNORE with
UNIQUE(nombre,edad,ciudad_id), dense AUTOINCREMENT ids.
"""

from __future__ import annotations

import csv
from datetime import datetime, timezone
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.pipeline import PipelineConfig, run_batch

# personas.csv — clean file, but Naomi is under the age threshold
PERSONAS = [
    ["nombre", "edad", "ciudad"],
    ["Guillermo", "26", "San Luis"],
    ["Noemi", "52", "San Luis"],
    ["Naomi", "23", "San Juan"],
]

# personas_crudas.csv — the dirty file
PERSONAS_CRUDAS = [
    ["nombre", "edad", "ciudad"],
    ["  guillermo ", "26", "san luis"],
    ["NOEMI", "52", "SAN LUIS"],
    ["Naomi ", "23", " san juan"],
    ["Pedro", "error", "Querétaro"],
    ["  luis ", "30", "san juan"],
]

NOW = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)


def _write(path: Path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w", newline="", encoding="utf-8") as f:
        csv.writer(f).writerows(rows)


def test_reference_fixture_end_state(spark, tmp_path):
    cfg = PipelineConfig(
        data_in=str(tmp_path / "in"),
        data_rejected=str(tmp_path / "rejected"),
        warehouse=str(tmp_path / "wh"),
    )
    _write(Path(cfg.data_in) / "personas.csv", PERSONAS)
    _write(Path(cfg.data_in) / "personas_crudas.csv", PERSONAS_CRUDAS)

    result = run_batch(spark, cfg, now=NOW)
    by_file = {r.source_file: r for r in result.files}

    # sorted order: personas.csv processed first
    assert [r.source_file for r in result.files] == [
        "personas.csv",
        "personas_crudas.csv",
    ]
    p = by_file["personas.csv"]
    assert (p.valid_count, p.rejected_count) == (2, 1)      # Naomi: Edad < 25
    assert (p.inserted_new, p.ignored_duplicates) == (2, 0)

    c = by_file["personas_crudas.csv"]
    assert (c.valid_count, c.rejected_count) == (3, 2)
    # guillermo + NOEMI normalize onto already-loaded natural keys
    assert (c.inserted_new, c.ignored_duplicates) == (1, 2)

    # final fact ⋈ dim state = what the reference's SQLite would hold
    fact = spark.read.parquet(cfg.fact_path)
    dim = spark.read.parquet(cfg.dim_path)
    rows = {
        (r["persona_id"], r["nombre"], r["edad"], r["ciudad"])
        for r in fact.join(dim, "ciudad_id")
        .select("persona_id", fact.nombre, "edad", dim.nombre.alias("ciudad"))
        .collect()
    }
    assert rows == {
        (1, "Guillermo", 26, "San Luis"),
        (2, "Noemi", 52, "San Luis"),
        (3, "Luis", 30, "San Juan"),
    }
    # dimension: two cities, stable ids
    assert {(r["ciudad_id"], r["nombre"]) for r in dim.collect()} == {
        (1, "San Luis"),
        (2, "San Juan"),
    }

    # reject files: one per input, exact reasons
    rej_dir = Path(cfg.data_rejected)
    with (rej_dir / "rejected_personas.csv").open() as f:
        r1 = list(csv.DictReader(f))
    assert [(r["nombre"], r["motivo"]) for r in r1] == [("Naomi", "Edad < 25")]
    with (rej_dir / "rejected_personas_crudas.csv").open() as f:
        r2 = {(r["nombre"], r["motivo"]) for r in csv.DictReader(f)}
    assert r2 == {
        ("Naomi ", "Edad < 25"),
        ("Pedro", "Edad no convertible a int"),
    }


# personas_crudas plus a short row (csv.DictReader fills the missing
# ``ciudad`` with None → reference scr/etl_batch.py:55 .strip() raises →
# the coarse message)
PERSONAS_CRUDAS_BATCH = PERSONAS_CRUDAS + [["Ana", "40"]]

# header missing ``ciudad`` entirely → scr/etl_batch.py:50 issubset fails
SIN_CIUDAD = [
    ["nombre", "edad"],
    ["Bruno", "33"],
]


@pytest.mark.slow  # >8 s e2e/fuzz (default tier deselects)
def test_etl_batch_message_style_byte_parity(spark, tmp_path):
    """Replay scr/etl_batch.py:42-69 fixtures with message_style="batch"
    and assert the EXACT ``motivo`` strings that script emits: its single
    try/except collapses None-value, bad-text and bad-int failures into
    "Normalización o tipo inválido", and its missing-columns message is
    the shorter "Faltan columnas" (no "requeridas")."""
    cfg = PipelineConfig(
        data_in=str(tmp_path / "in"),
        data_rejected=str(tmp_path / "rejected"),
        warehouse=str(tmp_path / "wh"),
        message_style="batch",
    )
    _write(Path(cfg.data_in) / "personas.csv", PERSONAS)
    _write(Path(cfg.data_in) / "personas_crudas.csv", PERSONAS_CRUDAS_BATCH)
    _write(Path(cfg.data_in) / "sin_ciudad.csv", SIN_CIUDAD)

    result = run_batch(spark, cfg, now=NOW)
    by_file = {r.source_file: r for r in result.files}

    # validity split is IDENTICAL to relational style — only strings differ
    assert (by_file["personas.csv"].valid_count, by_file["personas.csv"].rejected_count) == (2, 1)
    assert (by_file["personas_crudas.csv"].valid_count, by_file["personas_crudas.csv"].rejected_count) == (3, 3)
    assert (by_file["sin_ciudad.csv"].valid_count, by_file["sin_ciudad.csv"].rejected_count) == (0, 1)

    rej_dir = Path(cfg.data_rejected)
    with (rej_dir / "rejected_personas.csv").open() as f:
        assert [(r["nombre"], r["motivo"]) for r in csv.DictReader(f)] == [
            ("Naomi", "Edad < 25")
        ]
    with (rej_dir / "rejected_personas_crudas.csv").open() as f:
        got = {(r["nombre"], r["motivo"]) for r in csv.DictReader(f)}
    assert got == {
        ("Naomi ", "Edad < 25"),
        ("Pedro", "Normalización o tipo inválido"),   # int("error")
        ("Ana", "Normalización o tipo inválido"),     # None ciudad
    }
    with (rej_dir / "rejected_sin_ciudad.csv").open() as f:
        assert {(r["nombre"], r["motivo"]) for r in csv.DictReader(f)} == {
            ("Bruno", "Faltan columnas")
        }


def test_message_style_unknown_raises(spark):
    from etl_python_sqlite_spark.operators.transform import annotate_rejections

    df = spark.createDataFrame([("a", "1", "x")], ["nombre", "edad", "ciudad"])
    with pytest.raises(KeyError):
        annotate_rejections(df, message_style="nope")
