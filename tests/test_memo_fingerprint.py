"""Stale-data guard for memoized frames (VERDICT r6 "What's wrong #1").

The shared-stage memos (`plans/relational._flag_cents_hist`,
`_cooccurrence_edges`) and the table-frame cache
(`sources/parquet.load_table`) key on a file-listing fingerprint
(names + sizes + mtimes). Rewriting the parquet under an unchanged path
— exactly what per-round testdata regeneration does — must rebuild the
frame, never serve a cached stage of the OLD data.
"""

from __future__ import annotations

from pyspark.sql import Row


def _write_lineitem(spark, sf_dir: str, prices: list[float]) -> None:
    rows = [
        Row(
            l_orderkey=i // 2,
            l_partkey=i % 5,
            l_returnflag="A",
            l_extendedprice=p,
        )
        for i, p in enumerate(prices)
    ]
    (
        spark.createDataFrame(rows)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{sf_dir}/lineitem.parquet")
    )


def test_load_table_rebuilds_on_rewrite(spark, tmp_path):
    from etl_python_sqlite_spark.sources.parquet import load_table

    d = str(tmp_path)
    _write_lineitem(spark, d, [1.0, 2.0, 3.0])
    t1 = load_table(spark, d, "lineitem")
    assert t1.count() == 3
    # unchanged files -> same cached frame object (no re-plan)
    assert load_table(spark, d, "lineitem") is t1

    _write_lineitem(spark, d, [10.0, 20.0, 30.0, 40.0])
    t2 = load_table(spark, d, "lineitem")
    assert t2 is not t1
    assert t2.count() == 4


def test_flag_cents_hist_rebuilds_on_rewrite(spark, tmp_path):
    from etl_python_sqlite_spark.plans import relational as R

    R.release_shared_histograms()
    d = str(tmp_path)
    _write_lineitem(spark, d, [1.00, 2.00, 2.00])
    h1 = R._flag_cents_hist(spark, d)
    got1 = {(r["l_returnflag"], r["c"]): r["cnt"] for r in h1.collect()}
    assert got1 == {("A", 100): 1, ("A", 200): 2}
    assert R._flag_cents_hist(spark, d) is h1  # stable data -> memo hit

    # rewrite the dataset mid-session: the memo must serve a REBUILT,
    # correct histogram (the old key ages out of the LRU)
    _write_lineitem(spark, d, [5.00, 5.00, 7.50, 7.50])
    h2 = R._flag_cents_hist(spark, d)
    assert h2 is not h1
    got2 = {(r["l_returnflag"], r["c"]): r["cnt"] for r in h2.collect()}
    assert got2 == {("A", 500): 2, ("A", 750): 2}
    R.release_shared_histograms()


def test_cooccurrence_edges_rebuild_on_rewrite(spark, tmp_path):
    from etl_python_sqlite_spark.plans import relational as R

    R.release_shared_histograms()
    d = str(tmp_path)
    _write_lineitem(spark, d, [1.0] * 4)  # orders {0,1} x parts {0..3}
    e1 = R._cooccurrence_edges(spark, d)
    n1 = e1.count()
    assert n1 == 2  # (0,1) from order 0, (2,3) from order 1
    _write_lineitem(spark, d, [1.0] * 6)  # 3 orders x 2 parts each
    e2 = R._cooccurrence_edges(spark, d)
    assert e2 is not e1
    assert e2.count() == 3
    R.release_shared_histograms()
