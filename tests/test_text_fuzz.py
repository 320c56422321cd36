"""Fuzz the text-metric column expressions against pure-Python reference
implementations of the same definitions.

The EXT text surface (word counts, token counts, dup-word fraction,
shingles) claims exact, engine-independent semantics — these tests pin
that claim on generated strings covering the corners the synthetic
corpus never hits: empty/whitespace-only text, unicode words, runs of
punctuation, single words, words shorter than the shingle width.
"""

from __future__ import annotations

import random
import re
import string

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.functions import text as X
from etl_python_sqlite_spark.operators.dedup import exploded_shingles

TOKEN_RE = re.compile(r"[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]")

PIECES = [
    "word", "Word", "WORD", "w0rd", "123", "!?", "...", "a",
    "áccénts", "中文", "x-y", "it's", "", " ", "\t", "\n",
    # \x0B is the Java-\s vs RE2-\s divergence char (ADVICE r2): the
    # explicit WS class must treat it as whitespace on both engines,
    # matching Python str.split()
    "\x0B", "\f", "\r",
]


def _rand_text(rng: random.Random) -> str:
    n = rng.randrange(0, 30)
    return " ".join(rng.choice(PIECES) for _ in range(n))


def _py_words(s: str) -> list[str]:
    return s.split()


def _py_shingles(words: list[str], k: int) -> list[str]:
    """word_shingles / exploded_shingles contract: one truncated
    whole-doc shingle for short docs, complete windows otherwise;
    DISTINCT set."""
    if len(words) < k:
        return [" ".join(words)]
    return list(dict.fromkeys(
        " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
    ))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(4321)
    rows = [(i, _rand_text(rng)) for i in range(300)]
    # pin the corners explicitly
    rows += [
        (1000, ""),
        (1001, "   "),
        (1002, "one"),
        (1003, "one two"),
        (1004, "tab\tsep\nnewline"),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_n_words_matches_python_split(corpus):
    rows, df = corpus
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", X.n_words(F.col("text")).alias("n")).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == len(_py_words(text)), repr(text)


def test_token_count_matches_python_regex(corpus):
    rows, df = corpus
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(X.regex_tokens(F.col("text"))).alias("n")
        ).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == len(TOKEN_RE.findall(text)), repr(text)


def test_dup_word_frac_matches_python(corpus):
    rows, df = corpus
    got = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", X.dup_word_frac(F.col("text")).alias("f")
        ).collect()
    }
    for doc_id, text in rows:
        words = _py_words(text)
        want = 1.0 - len(set(words)) / len(words) if words else 0.0
        assert abs(got[doc_id] - want) < 1e-12, repr(text)


@pytest.mark.parametrize("k", [3, 5])
def test_exploded_shingles_match_python_sets(corpus, k):
    rows, df = corpus
    out: dict[int, set] = {}
    for r in exploded_shingles(df, k=k).collect():
        out.setdefault(r["doc_id"], set()).add(r["shingle"])
    for doc_id, text in rows:
        # exploded_shingles emits over Python-split words; '' text yields
        # the single empty whole-doc shingle
        want = set(_py_shingles(_py_words(text), k)) or {""}
        if not _py_words(text):
            want = {""}
        assert out.get(doc_id, set()) == want, repr(text)


def test_x0b_word_split_cross_engine(spark):
    """\\x0B (vertical tab) is whitespace to Java regex \\s but NOT to
    RE2's — the explicit WS class must make Spark and DuckDB agree on
    word counts for \\x0B-bearing text (ADVICE r2)."""
    import duckdb

    import __spark_entry__ as entry

    samples = ["a\x0Bb", "\x0Bword\x0B", "x \x0B y", "\x0B", "a\fb\rc"]
    sdf = spark.createDataFrame([(s,) for s in samples], "t string")
    spark_counts = [
        r["n"]
        for r in sdf.select(X.n_words(F.col("t")).alias("n"), "t")
        .orderBy("t")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE s(t VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?)", [(s,) for s in samples])
    duck_counts = [
        r[0]
        for r in con.execute(
            f"SELECT {entry._N_WORDS.format(c='t')} AS n FROM s ORDER BY t"
        ).fetchall()
    ]
    py_counts = [len(s.split()) for s in sorted(samples)]
    assert spark_counts == duck_counts == py_counts


def test_nfc_normalize_composes(spark):
    """Decomposed combining sequences compose under NFC; composed text
    and NULLs pass through (functions/text.nfc_normalize — the
    Arrow-batched UCD path; cross-engine parity is the contract
    query's oracle)."""
    from pyspark.sql import functions as F

    from etl_python_sqlite_spark.functions.text import nfc_normalize

    rows = [
        (1, "café"),      # cafe + combining acute
        (2, "가"),         # Hangul jamo
        (3, "café"),            # already composed
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string").select(
        "id", nfc_normalize("t").alias("n"), F.length("t").alias("lr"),
        F.length(nfc_normalize("t")).alias("ln"),
    )
    got = {r["id"]: (r["n"], r["lr"], r["ln"]) for r in df.collect()}
    assert got[1] == ("café", 5, 4)
    assert got[2] == ("가", 2, 1)
    assert got[3] == ("café", 4, 4)
    assert got[4] == (None, None, None)
