"""Blocked edit-distance join: completeness vs brute force + semantics."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.editdist import edit_distance_pairs


def _brute_pairs(words):
    def ed(a, b):
        # classic DP, unit costs
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    out = set()
    ws = sorted(words)
    for i, a in enumerate(ws):
        for b in ws[i + 1 :]:
            if abs(len(a) - len(b)) <= 1 and ed(a, b) == 1:
                out.add((a, b))
    return out


def test_blocking_complete_vs_brute(spark):
    """Random typo-cloud vocabulary: every true distance-1 pair must
    survive the pigeonhole blocking (zero false negatives), and nothing
    else comes back (the verify step removes block-collisions)."""
    rng = random.Random(42)
    alphabet = "abcdefg"
    seeds = ["".join(rng.choice(alphabet) for _ in range(rng.randint(4, 9)))
             for _ in range(40)]
    vocab = set(seeds)
    for s in seeds:  # substitutions, deletions, insertions around seeds
        for _ in range(3):
            p = rng.randrange(len(s))
            vocab.add(s[:p] + rng.choice(alphabet) + s[p + 1 :])
            if len(s) > 4:
                vocab.add(s[:p] + s[p + 1 :])
            vocab.add(s[:p] + rng.choice(alphabet) + s[p:])
    vocab = {w for w in vocab if len(w) >= 4}

    df = spark.createDataFrame([(w,) for w in vocab], "word string")
    got = {
        (r["w_a"], r["w_b"])
        for r in edit_distance_pairs(df, "word", min_len=4).collect()
    }
    want = _brute_pairs(vocab)
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )
    assert want, "degenerate fixture: no true pairs generated"


def test_carry_columns_and_threshold(spark):
    df = spark.createDataFrame(
        [("abcd", 10), ("abce", 20), ("abcdef", 5), ("zzzz", 1)],
        "word string, df long",
    )
    rows = edit_distance_pairs(df, "word", carry_cols=["df"]).collect()
    assert [(r["w_a"], r["w_b"], r["df_a"], r["df_b"], r["dist"]) for r in rows] == [
        ("abcd", "abce", 10, 20, 1)
    ]


def test_min_len_filter(spark):
    df = spark.createDataFrame([("ab",), ("ac",), ("abcd",)], "word string")
    assert edit_distance_pairs(df, "word", min_len=4).count() == 0
