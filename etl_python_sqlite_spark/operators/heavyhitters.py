"""Distributed heavy hitters: per-partition Misra-Gries candidates +
exact verification (two passes, bounded shuffle).

A full ``explode → groupBy(term) → count`` finds exact term frequencies
but shuffles one row per DISTINCT term per partition — at 100 TB the
vocabulary (typos, ids, urls) can be billions of keys, and the shuffle
is dominated by the long tail nobody asked about. The classic fix is a
mergeable frequency summary:

* **pass 1** — every partition runs the Misra-Gries algorithm (Misra &
  Gries, "Finding repeated elements", Science of Computer Programming
  1982) with ``k`` counters over its local token stream, a single
  sequential scan in O(k) memory. The union of per-partition candidate
  sets is a SUPERSET of every term with global frequency > N/k: a term
  with global count > N/k must exceed n_p/k in at least one partition
  (averaging argument), and MG(k) never drops a local item with count >
  n_p/k. Candidates shuffled: ≤ k·partitions rows, independent of
  vocabulary size.
* **pass 2** — the candidate set broadcasts back and filters the token
  stream map-side; an ordinary groupBy counts ONLY candidates exactly.
  Results are exact counts (no sketch error), so the operator is fully
  oracle-checkable — the approximation only ever widens the candidate
  set.

The same two-pass shape is the standard production heavy-hitters plan
(e.g. for vocabulary building and stopword discovery over web corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def misra_gries_partition_candidates(
    tokens: DataFrame, term_col: str = "term", k: int = 8192
) -> DataFrame:
    """Distinct candidate terms from running MG(k) over every partition
    of ``tokens`` (one column of terms). O(k) memory per task, one pass,
    no shuffle until the ≤ k·partitions candidates are deduped."""

    def mg(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for t in pdf[term_col]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({term_col: list(counters.keys())})

    return tokens.mapInPandas(mg, schema=f"{term_col} string").distinct()


def heavy_hitters_topn(
    tokens: DataFrame,
    top_n: int = 20,
    k: int = 8192,
    term_col: str = "term",
) -> DataFrame:
    """Exact top-``top_n`` terms by frequency via the two-pass MG plan.

    Correctness guard: the MG guarantee covers terms with frequency >
    N/k. Every row carries ``mg_guarantee_ok`` = "the rank-``top_n``
    count is > N/k" — when true, the candidate set provably contains
    every true top-``top_n`` term and the output equals the full-groupBy
    answer; when false, size ``k`` up. Emitting it as a column keeps the
    plan lazy (no driver-side collect) and lets the driver's oracle gate
    pin the guarantee itself.
    Output: (rank, term, n_occurrences, mg_guarantee_ok), ties by term.
    """
    cands = misra_gries_partition_candidates(tokens, term_col, k)
    exact = (
        tokens.join(F.broadcast(cands), term_col)
        .groupBy(term_col)
        .agg(F.count("*").alias("n_occurrences"))
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc(term_col))
    top = (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("rank", term_col, "n_occurrences")
    )
    totals = tokens.agg(F.count("*").alias("_n_total"))
    floor_count = top.agg(F.min("n_occurrences").alias("_floor"))
    return (
        top.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(floor_count))
        .select(
            "rank",
            term_col,
            "n_occurrences",
            (F.col("_floor") * k > F.col("_n_total")).alias("mg_guarantee_ok"),
        )
    )
