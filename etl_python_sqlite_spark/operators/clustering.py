"""Distributed k-means (Lloyd's algorithm) over an embedding column —
integer-exact, iteration-unrolled, literal-centroid re-entry.

The reference engine has no vector operators at all (SURVEY §2.5 —
``scr/etl_basic.py:20-22`` is its entire scalar surface), so this is EXT
surface: the clustering primitive the repo's ANN family samples its way
around (IVF picks centroids by deterministic sampling,
``similarity.ivf_topk``; SemDeDup assigns to sampled centroids once).
Lloyd refinement is the standard way those centroids get GOOD: assign →
re-estimate → repeat, each round one distributed pass.

Scale design (the 100 TB shape, not a driver loop over rows):

* The corpus never leaves the cluster. Each iteration is ONE job over a
  flat (vec_id, dim, q) frame hash-partitioned by vec_id ONCE at build
  time — the per-iteration window (partitionBy vec_id) reuses that
  distribution with zero exchanges; only the k×dim centroid update
  aggregate (map-side combined: ≤ k·dim rows per input partition)
  crosses the wire.
* Centroids are the only driver-side state: k·dim integers per round
  (bounded collect, the sanctioned literal re-entry pattern — same
  discipline as the BPE vocab loop and the ≤3-row rank picks). They
  re-enter the next round as ≤256-element array literals
  (``bloom.MAX_LITERAL_WORDS`` discipline: 64 < 256), so the distance
  expressions are pure whole-stage-codegen long arithmetic — no join, no
  broadcast, no Python in the hot path.
* Integer-exact cross-engine parity: elements are floor-quantized to
  NON-NEGATIVE micro-units ``q = floor((x + 1) · 10⁶)`` (|x| < 1 for
  the embeddings contract), distances are Σ(q−c)² in BIGINT (≤ 64 ·
  (2·10⁶)² ≈ 2.6·10¹⁴ — no overflow), and the centroid mean is the
  FLOOR integer division ``Σq // n``, identical on Spark (``div``) and
  DuckDB (``//``) *because* the shift keeps every operand non-negative
  (the two engines disagree on negative integer division: truncation vs
  floor). Argmin ties break to the lowest cluster id. Every step is
  deterministic, so the DuckDB twin replays the whole algorithm
  bit-exactly from the parquet — no fixture, no tolerance.
* Seeding: the k vectors with the smallest portable 60-bit hash of
  their id (``phash60``, ties by id) — deterministic, uniformly spread,
  replayable in SQL. Cluster ids are the seed ranks (0..k−1).
* Empty clusters drop out (receive no update row) on both engines —
  the standard "dead centroid" rule, stated rather than patched.

Overflow discipline at real scale: per-vector distances are ≤ ~3·10¹⁴,
so a BIGINT inertia sum holds to ~30k vectors per cluster per 10¹⁸ —
the final inertia aggregates through a DECIMAL(38,0) accumulator (the
CLAUDE.md rule: exact decimal for AGGREGATE accumulators, longs for
per-row math) and casts back to BIGINT for the contract schema.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_python_sqlite_spark.functions.portable import phash60
from etl_python_sqlite_spark.operators.cache import tie

#: Micro-unit shift — embeddings are unit-normalized-ish floats in
#: (−1, 1); +1 keeps every quantized value strictly positive so integer
#: division is engine-portable (see module docstring).
_SHIFT = 1.0
_SCALE = 1_000_000


def _quantize_py(x: float) -> int:
    """CPython replay of the Spark quantizer — same IEEE double ops in
    the same order: widen, add 1.0, scale, floor."""
    return math.floor((float(x) + _SHIFT) * _SCALE)


def _dist_expr(centroid: list[int]) -> Column:
    """Σ(q − c_d)² over one vec_id window partition, BIGINT throughout."""
    diff = F.col("q") - F.element_at(
        F.lit(centroid).cast("array<long>"), F.col("d") + 1
    )
    return F.sum(diff * diff).over(Window.partitionBy("vid"))


def _least(cols: list[Column]) -> Column:
    """F.least that tolerates a single operand (one surviving cluster)."""
    return cols[0] if len(cols) == 1 else F.least(*cols)


def _argmin_expr(dist_cols: list[tuple[int, Column]]) -> Column:
    """Lowest-cid argmin over the per-centroid window sums (first WHEN
    match wins, and the list is in ascending cid order)."""
    m = _least([c for _, c in dist_cols])
    expr = F.when(dist_cols[0][1] == m, F.lit(dist_cols[0][0]).cast("long"))
    for cid, c in dist_cols[1:]:
        expr = expr.when(c == m, F.lit(cid).cast("long"))
    return expr


def kmeans_lloyd(
    embs: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Run ``iters`` Lloyd updates from phash60-seeded centroids and
    return the final per-cluster summary:

    ``(cluster, n_vecs, inertia, centroid_l1)`` — cluster = seed rank,
    inertia = Σ min-distance (micro-unit², BIGINT via a decimal
    accumulator), centroid_l1 = Σ_d of the final centroid (an exact
    integer checksum of the centroid the cluster converged to).
    """
    flat = embs.select(
        F.col(id_col).cast("long").alias("vid"),
        F.posexplode(F.expr(f"CAST({vec_col} AS ARRAY<DOUBLE>)")).alias(
            "d", "x"
        ),
    ).select(
        "vid",
        "d",
        F.floor((F.col("x") + F.lit(_SHIFT)) * F.lit(float(_SCALE)))
        .cast("long")
        .alias("q"),
    )
    # hash-partition by vec_id ONCE; every iteration's window reuses the
    # distribution (zero per-iteration exchanges of the corpus)
    flat = (
        flat.repartition(n_partitions, "vid")
        if n_partitions
        else flat.repartition("vid")
    ).persist()
    flat.count()  # eager: 2+iters actions consume this frame

    # --- seeding: k smallest phash60(id), quantized driver-side -------
    seed_rows = (
        embs.select(
            F.col(id_col).cast("long").alias("vid"),
            F.expr(f"CAST({vec_col} AS ARRAY<DOUBLE>)").alias("v"),
        )
        .orderBy(phash60(F.col("vid").cast("string")), "vid")
        .limit(k)
        .collect()
    )
    centroids: dict[int, list[int]] = {
        cid: [_quantize_py(x) for x in row["v"]]
        for cid, row in enumerate(seed_rows)
    }

    def _assign(cents: dict[int, list[int]]) -> tuple[DataFrame, Column]:
        dist_cols = [(cid, _dist_expr(c)) for cid, c in sorted(cents.items())]
        assigned = flat.select(
            "vid",
            "d",
            "q",
            _argmin_expr(dist_cols).alias("cid"),
            _least([c for _, c in dist_cols]).alias("dmin"),
        )
        return assigned, dist_cols

    for _ in range(iters):
        assigned, _ = _assign(centroids)
        upd = (
            assigned.groupBy("cid", "d")
            .agg(F.sum("q").alias("sq"), F.count("*").alias("cnt"))
            .collect()
        )
        # k·dim bounded collect — build dense per-cid vectors
        dim = 1 + max(int(r["d"]) for r in upd)
        nxt: dict[int, list[int]] = {
            cid: [0] * dim for cid in {int(r["cid"]) for r in upd}
        }
        for r in upd:
            nxt[int(r["cid"])][int(r["d"])] = int(r["sq"]) // int(r["cnt"])
        centroids = nxt  # empty clusters drop out here, on both engines

    final, _ = _assign(centroids)
    l1 = {cid: sum(c) for cid, c in centroids.items()}
    l1_expr = F.when(F.col("cid") == -1, F.lit(None).cast("long"))
    for cid, s in sorted(l1.items()):
        l1_expr = l1_expr.when(F.col("cid") == cid, F.lit(s))
    result = (
        final.filter(F.col("d") == 0)  # one row per vector
        .groupBy("cid")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.col("dmin").cast("decimal(38,0)"))
            .cast("long")
            .alias("inertia"),
        )
        .select(
            F.col("cid").alias("cluster"),
            "n_vecs",
            "inertia",
            l1_expr.alias("centroid_l1"),
        )
        .orderBy("cluster")
    )
    return tie(result, flat)
