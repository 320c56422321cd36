"""Driver-gate rehearsal: every queries() entry vs its oracle_sql() twin.

Runs at sf0.001 by default (fast inner loop); set
SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 to rehearse the real gate.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE, compare_frames, duck_con

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", SF_SMOKE)

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES), (
        "oracle_sql keys must be a subset of queries keys"
    )


@pytest.mark.parametrize("qname", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, qname):
    """Non-SQL-expressible queries: the driver's weaker rows-only check."""
    df = QUERIES[qname](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("qname", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, qname):
    q = QUERIES[qname]
    sdf = q(spark, SF_DIR)
    con = duck_con(SF_DIR)
    try:
        rel = con.sql(ORACLES[qname])
        compare_frames(sdf, rel, qname)
    finally:
        con.close()
