"""Sparse lexical retrieval — BM25-saturation top-k scoring, exact
integer arithmetic end-to-end.

The training-data use case: given a (small) set of probe terms — a
benchmark query, a topic filter, a contamination probe — rank the corpus
by lexical relevance and keep the top-k.  This is the retrieval half of
RAG / data-curation-by-query, complementing the repo's TF-IDF top-terms
(per-doc keyword extraction) with per-QUERY document ranking.

Scoring.  Classic BM25 is ``Σ_t idf(t) · sat(tf, dl)`` with the
saturation ``sat = tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``.  Two
portability adaptations, both documented contract, not approximation
bugs:

* **Saturation is exact-rational.**  With k1 = 6/5, b = 3/4 and
  avgdl = S/N (S = Σ word counts, N = docs), multiplying through by
  20·S clears every fraction:  ``sat_micro = (10^6·22·tf·S) div
  (10·tf·S + 3·S + 9·dl·N)`` — pure BIGINT, bit-identical on any
  engine with integer division.  (Numerator bound: 2.2e7·tf·S must fit
  int64 — holds through S ≈ 4·10^10 total corpus words at tf ≤ 10^4;
  past that, scale the micro factor down.)
* **The idf is the log-free rational surrogate** ``w_micro =
  (10^6·(N−df+1)) div (df+1)`` — positive, strictly decreasing in df,
  same ranking ORDER as Robertson idf for any fixed corpus.  ``ln()``
  is deliberately avoided: Java's ``Math.log`` (HotSpot intrinsic) and
  C libm are not guaranteed bit-identical, and a floor-quantized log
  can flip on the last ulp — the repo's cross-engine float discipline
  (see functions/portable.py) forbids it.  Same precedent as
  ``ext_word_rarity_score``.

Scale shape: one explode pass builds (doc, word); the probe-term set is
tiny and **broadcast**, so tf/df computation is a map-side semi-filter
of the exploded stream followed by uniform-key partial aggregations.
The one-row (S, N) global total rides a broadcast nested-loop join
(1×M, the repo's audited one-row-total pattern).  Top-k is
TakeOrderedAndProject — no global sort.  Nothing is quadratic; the
score join touches only (matched doc × probe term) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    n_probe_terms: int = 3,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_arr: DataFrame | None = None,
) -> DataFrame:
    """Rank ``docs`` by exact-integer BM25-saturation score against the
    corpus's own ``n_probe_terms`` most frequent words (a deterministic,
    regeneration-proof probe query: ties broken by word ascending).
    Returns the top ``k`` rows ``(doc_id, n_terms, score_units)``,
    ordered by score desc then id — fully hash-checkable.

    ``words_arr``: an already-tokenized LOWERCASED (id_col, ws) word-
    array frame (the ``doc_words`` contract): explode it instead of
    re-tokenizing — identical rows since ``ws`` is the same expression,
    and the word frame here feeds FOUR subtrees (doc lengths, probe
    pick, df, tf), so a cached source saves the pass per subtree. The
    operator neither persists nor releases it (a session memo owns it).
    """
    from etl_python_sqlite_spark.functions.text import words as _words

    if words_arr is not None:
        w = words_arr.select(
            F.col(id_col), F.explode("ws").alias("word")
        ).filter(F.col("word") != "")
    else:
        w = (
            docs.select(
                F.col(id_col),
                F.explode(_words(F.lower(F.col(text_col)))).alias("word"),
            )
            .filter(F.col("word") != "")
        )
    dl = w.groupBy(id_col).agg(F.count("*").alias("dl"))
    tot = dl.agg(
        F.sum("dl").cast("long").alias("S"), F.count("*").cast("long").alias("N")
    )
    probe = (
        w.groupBy("word")
        .agg(F.count("*").alias("occ"))
        .orderBy(F.desc("occ"), F.asc("word"))
        .limit(n_probe_terms)
        .select("word")
    )
    matched = w.join(F.broadcast(probe), "word")
    df_t = matched.groupBy("word").agg(
        F.countDistinct(id_col).alias("df")
    )
    tf = matched.groupBy(id_col, "word").agg(F.count("*").alias("tf"))
    scored = (
        tf.join(F.broadcast(df_t), "word")
        .join(dl, id_col)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(id_col),
            (
                F.expr("(1000000 * (N - df + 1)) div (df + 1)")
                * F.expr(
                    "(1000000 * 22 * tf * S) div (10*tf*S + 3*S + 9*dl*N)"
                )
            ).alias("ts"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("ts").cast("long").alias("score_units"),
        )
        .orderBy(F.desc("score_units"), F.asc(id_col))
        .limit(k)
    )
