"""Portable 60-bit hash (functions/portable.py) and the operators built
on it. The heavy cross-engine verification lives in
tests/test_queries_oracle.py (DuckDB replays every pipeline); these
tests pin the hash definition itself to an independent CPython md5
reference and the operators' basic laws, so an engine-side regression is
caught even without DuckDB present.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_python_sqlite_spark.functions.portable import phash60, phash60_salted
from etl_python_sqlite_spark.operators import dedup as D

SAMPLES = [
    "",
    "hello world",
    "a b c",
    "tab\tand\nnewline",
    "unicode: héllo wörld ünïcode",  # UTF-8 multibyte
    "0123456789" * 20,
]


def _ref(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def test_phash60_matches_cpython_md5(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", phash60(F.col("s")).alias("h")).collect()}
    for s in SAMPLES:
        assert got[s] == _ref(s), s
        assert 0 <= got[s] < 2**60


def test_phash60_salted_matches_reference(spark):
    df = spark.createDataFrame([(7, 123456789)], "s int, h long")
    (row,) = df.select(
        phash60_salted(F.col("h"), F.col("s")).alias("p")
    ).collect()
    assert row["p"] == _ref("7:123456789")


def test_simhash_portable_range_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "zzz qqq")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["simhash"] for r in D.simhash_portable(docs).collect()}
    assert rows[1] == rows[2]  # identical text → identical fingerprint
    assert rows[1] != rows[3]
    for v in rows.values():
        assert 0 <= v < 2**60


def test_minhash_portable_identical_docs_full_jaccard(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_micro"]
        for r in D.minhash_near_dups_portable(docs, threshold_micro=500_000).collect()
    }
    assert pairs == {(1, 2): 1_000_000}  # identical docs, exact J = 1


def test_simhash_near_dups_portable_pigeonhole(spark):
    # identical docs → hamming 0; guaranteed found (distance ≤ 3 tier)
    docs = spark.createDataFrame(
        [(1, "same text body"), (2, "same text body"), (3, "other content")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_dups_portable(docs, max_hamming=3).collect()
    }
    assert got.get((1, 2)) == 0
