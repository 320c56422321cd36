"""Product quantization (PQ) ANN — compressed-domain similarity search
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the FAISS baseline index family).

Why PQ at 100 TB: a 64-dim float32 embedding is 256 bytes; its PQ code
(m sub-vectors × 1 byte) is m bytes — a 32× compression at m=8 — so a
billion-vector corpus's search structure fits in a fraction of the
executor memory the raw vectors need, and candidate scoring reads ONLY
the code column (column pruning does the rest). The asymmetric distance
computation (ADC) scores a query against codes via an m×ksub lookup
table — no decompression.

Spark shape:

* **Training is bounded**: codebooks fit on a deterministic lowest-id
  sample (default 256 vectors) and run driver-side in numpy — O(sample ·
  ksub · iters) work independent of corpus size, the standard practice
  (FAISS trains on a sample too). No RNG: k-means init takes the first
  ksub sample sub-vectors, Lloyd iterations are a fixed count with
  argmin ties broken by index — same codebook on every run/cluster.
* **Encoding is one narrow Arrow pass**: per sub-space argmin against
  the broadcast (tiny) codebook; output `array<int>` codes. At
  warehouse scale this is the materialized index column.
* **Search is map-only + TakeOrderedAndProject**: the query's ADC
  table is built driver-side (m×ksub floats, broadcast in the UDF
  closure); scoring a code is m table lookups; the shortlist re-rank
  (exact cosine on ``rerank`` candidates) touches only those rows via
  an equi-join on id. No shuffle anywhere except the final top-k merge.

Determinism contract: training, encoding and ADC all run in float64
numpy with fixed iteration order, so results are machine-independent
for the recall-invariant audits; exact re-rank uses the same
``zip_with``/``aggregate`` sequential fold as the rest of the
similarity family (bit-identical to the DuckDB ``list_reduce`` twin).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.similarity import (
    _as_double_array,
    cosine,
)


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    sample: int = 256,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train ``m`` sub-space codebooks of ``ksub`` centroids each on the
    ``sample`` lowest-id vectors. Returns float64 array (m, ksub, dsub).

    Deterministic Lloyd: init = first ksub sub-vectors of the sample,
    fixed ``iters`` rounds, argmin ties → lowest centroid index, empty
    cells keep their previous centroid (no re-seeding randomness).
    """
    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    )
    if not rows:
        raise ValueError("train_pq_codebooks: empty input")
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        k = min(ksub, len(S))
        C = S[:k].copy()
        for _ in range(iters):
            # (n, k) squared L2 distances; argmin ties -> lowest index
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        if k < ksub:  # degenerate tiny corpus: pad by repeating
            C = np.vstack([C, np.repeat(C[:1], ksub - k, axis=0)])
        books[j] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector to its ``m`` nearest-sub-centroid indices —
    one Arrow-batched numpy pass, codebooks ride the UDF closure
    (broadcast; m·ksub·dsub doubles ≈ KBs)."""
    from pyspark.sql.functions import pandas_udf

    books = codebooks
    m, ksub, dsub = books.shape

    @pandas_udf("array<int>")
    def _enc(s: pd.Series) -> pd.Series:
        M = np.vstack(s.to_numpy()).astype(np.float64)
        out = np.empty((len(M), m), dtype=np.int32)
        for j in range(m):
            S = M[:, j * dsub : (j + 1) * dsub]
            d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j] = d2.argmin(axis=1)
        return pd.Series(list(out))

    emb = _as_double_array(vec_col)
    return df.select(
        F.col(id_col), emb.alias("v"), _enc(emb).alias("pq_code")
    )


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 64,
    codebooks: np.ndarray | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: score codes against the query's (m×ksub) inner-product
    table, shortlist ``rerank`` candidates, exact-cosine re-rank to the
    final ``k`` — the standard PQ search pipeline. Returns
    (vec_id, cos_sim) like ``cosine_topk`` (same rounding), so exact and
    PQ results are directly comparable.

    The approximate phase ranks by asymmetric cosine: ADC inner product
    over the reconstruction norm (Σ sub-centroid norms²) — good enough
    to shortlist; the exact re-rank removes reconstruction bias from the
    final order.
    """
    from pyspark.sql.functions import pandas_udf

    books = (
        codebooks
        if codebooks is not None
        else train_pq_codebooks(df, m, ksub, vec_col=vec_col, id_col=id_col)
    )
    m, ksub, dsub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    # ADC tables: per sub-space inner products and codeword energies
    ip_tab = np.stack(
        [books[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # (m, ksub)
    n2_tab = (books**2).sum(axis=2)  # (m, ksub)

    @pandas_udf("double")
    def _adc(codes: pd.Series) -> pd.Series:
        C = np.vstack(codes.to_numpy())  # (n, m)
        rows = np.arange(m)
        ip = ip_tab[rows, C].sum(axis=1)
        n2 = n2_tab[rows, C].sum(axis=1)
        return pd.Series(ip / np.sqrt(np.maximum(n2, 1e-30)))

    encoded = pq_encode(df, books, vec_col, id_col)
    shortlist = (
        encoded.select(F.col(id_col), "v", _adc("pq_code").alias("_adc"))
        .orderBy(F.desc("_adc"), F.asc(id_col))
        .limit(rerank)
    )
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        shortlist.select(
            F.col(id_col), F.round(cosine(F.col("v"), qcol), 6).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
