"""Declarative expectations audit (operators/expectations.py): every
rule kind counted correctly on a corpus with planted defects, NULL
semantics per kind, single-aggregation-pass plan for row rules, and
argument validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators import expectations as DQ


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        # id, status, price, ref_key, code
        (1, "O", 50.0, 10, "1-URGENT"),
        (1, "F", 60.0, 10, "2-HIGH"),      # duplicate id
        (2, None, 70.0, 11, "3-MEDIUM"),   # null status (not a set violation)
        (3, "X", 80.0, 99, "bad"),         # bad status, orphan ref, bad code
        (4, "O", -5.0, 10, "4-NOT SPECIFIED"),  # price out of band
        (None, "O", 90.0, None, "5-LOW"),  # null id; null ref (not orphan)
    ]
    return spark.createDataFrame(
        rows, "id long, status string, price double, ref long, code string"
    )


@pytest.fixture(scope="module")
def refdf(spark):
    return spark.createDataFrame([(10,), (11,)], "k long")


def test_all_rule_kinds_count_planted_defects(spark, dirty, refdf):
    out = DQ.check(
        dirty,
        [
            DQ.not_null("id_nn", "id"),
            DQ.unique("id_uq", "id"),
            DQ.in_set("status_ok", "status", "O", "F"),
            DQ.between("price_ok", "price", 0.0, 100.0),
            DQ.matches("code_ok", "code", "^[1-5]-"),
            DQ.referential("ref_ok", "ref", refdf, "k"),
            DQ.satisfies("pos_price", "price > 0"),
        ],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 6
    assert r["id_nn_violations"] == 1       # the NULL id row
    assert r["id_uq_violations"] == 1       # id=1 twice → 1 extra copy
    assert r["status_ok_violations"] == 1   # 'X' (NULL is not a violation)
    assert r["price_ok_violations"] == 1    # -5.0
    assert r["code_ok_violations"] == 1     # 'bad'
    assert r["ref_ok_violations"] == 1      # 99 (NULL ref not an orphan)
    assert r["pos_price_violations"] == 1   # -5.0 (all prices non-null)


def test_clean_table_passes_everything(spark, refdf):
    clean = spark.createDataFrame(
        [(1, "O", 5.0), (2, "F", 6.0)], "id long, status string, price double"
    )
    r = DQ.check(
        clean,
        [
            DQ.not_null("nn", "id", "status"),
            DQ.unique("uq", "id"),
            DQ.in_set("st", "status", "O", "F"),
        ],
    ).collect()[0]
    assert (r["nn_violations"], r["uq_violations"], r["st_violations"]) == (0, 0, 0)


def test_unique_on_empty_table_is_zero_not_null(spark):
    empty = spark.createDataFrame([], "id long")
    r = DQ.check(empty, [DQ.unique("uq", "id")]).collect()[0]
    assert r["n_rows"] == 0 and r["uq_violations"] == 0


def test_multi_column_unique(spark):
    d = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b")], "x long, y string"
    )
    r = DQ.check(d, [DQ.unique("uq", "x", "y")]).collect()[0]
    assert r["uq_violations"] == 1  # only the exact (1,'a') pair repeats


def test_validation_errors(spark, dirty, refdf):
    with pytest.raises(ValueError, match="at least one"):
        DQ.check(dirty, [])
    with pytest.raises(ValueError, match="duplicate rule names"):
        DQ.check(dirty, [DQ.not_null("a", "id"), DQ.unique("a", "id")])
    with pytest.raises(ValueError, match="unknown rule kind"):
        DQ.check(dirty, [DQ.Rule("zz", "bogus")])
    with pytest.raises(ValueError, match="needs ref"):
        DQ.check(dirty, [DQ.Rule("r", "referential", cols=("ref",))])


def test_row_rules_compile_to_single_aggregation(spark, dirty):
    """However many row-level rules, the plan holds exactly one
    aggregate pair over one scan — the single-pass audit claim."""
    df = DQ.check(
        dirty,
        [
            DQ.not_null("a", "id"),
            DQ.in_set("b", "status", "O"),
            DQ.between("c", "price", 0.0, 1.0),
            DQ.matches("d", "code", "x"),
            DQ.satisfies("e", "price > 0"),
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1
    assert "Join" not in plan
