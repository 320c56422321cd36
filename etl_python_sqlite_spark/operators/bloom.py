"""Portable Bloom filter — constant-memory set prefilter, exact on both
engines.

``ext_incremental_dedup`` prefilters a batch with the corpus's DISTINCT
8-byte hash set — O(#corpus keys) broadcast bytes. This module provides
the true Bloom-filter alternative whose broadcast size is a CONSTANT
``m_bits/8`` bytes regardless of corpus cardinality — the shape that
still broadcasts when the corpus has 10^11 keys and the exact key set
no longer fits (Bloom 1970; the standard ingest-dedup prefilter).

Representation: the bit array lives in a tiny DataFrame of
``(word: long, bits: long)`` rows, 60 bits per word (bit index ≤ 59
keeps ``1 << bit`` strictly positive — no sign games on either engine;
see CLAUDE.md on shift portability). Word packing is exact FLOOR
division on both engines (``(idx - idx % 60) / 60`` in Spark,
``idx // 60`` in DuckDB — both operands non-negative, so truncation ≡
floor): the bitmap itself is bit-identical across engines, not merely
boolean-equivalent (ADVICE r4 — a bare ``CAST(x / 60 AS BIGINT)``
ROUNDS in DuckDB while Spark truncates, so (word, bits) rows would
diverge for idx % 60 ≥ 30 even though probe booleans survive).

Building is one map-side-combined ``groupBy(word).agg(bit_or(...))``
over k probe rows per key. Probing has two strategies, picked by bitmap
size (``bloom_probe``):

* **scalar** (bitmap ≤ ``max_literal_words`` words): the materialized
  bitmap is embedded as ONE dense array literal and each row tests its
  k bits via ``element_at`` + ``bit_get`` — zero joins, zero shuffle,
  the probed row is completely untouched (r4 VERDICT #6's fusion). The
  driver-side collect is bounded by construction (≤ the word cap).
* **join** (larger bitmaps): k broadcast hash joins + a bit test —
  still zero shuffle of the probed side; at warehouse scale the batch
  never moves, and the bitmap stays distributed.

Hash family: double hashing (Kirsch–Mitzenmacher 2006) over the two
independent 60-bit halves of one md5 digest
(``functions/portable.phash60``/``phash60b``):

    probe_i(x) = (h1(x) mod m + i · (h2(x) mod m)) mod m ,  i = 0..k-1

Both operands are reduced mod m BEFORE the multiply so every
intermediate stays < 2^40 — no overflow under ANSI mode, and a DuckDB
oracle replays every bit of the bitmap (the filter is fully
deterministic: no seed, no session state). False positives are a
bounded, *reproducible* function of (m, k, key set); false negatives
are impossible — the contract query asserts that invariant on both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_python_sqlite_spark.functions.portable import phash60, phash60b

#: bits packed per bitmap word (≤ 59 keeps 1 << bit positive in int64)
WORD_BITS = 60

#: default cap for the scalar-literal probe strategy. Measured (r5,
#: local[32], 6.4M-row probe batch): at 2^20 bits (17k words) the
#: fused forms LOSE big — the literal array costs ~5× over k joins
#: (and a 1-row crossJoin bitmap column is copied into every joined
#: row: 14.6 s vs 3.1 s) — while at the contract's 4096 bits
#: (69 words) scalar ≈ k-join with a simpler, join-free plan. 256
#: words (~15k bits) keeps only genuinely tiny bitmaps scalar.
MAX_LITERAL_WORDS = 256


def _word_of(idx: Column) -> Column:
    """Exact floor(idx / WORD_BITS) for non-negative idx, portable.

    ``idx - idx % 60`` is an exact multiple of 60 and < 2^40, so the
    double division is exact and the cast is the true integer quotient
    — matching DuckDB ``//`` bit-for-bit.
    """
    return ((idx - idx % WORD_BITS) / WORD_BITS).cast("long")


def _probe_cols(col: str, m_bits: int, k: int):
    """k (word, bit) probe positions for the key column ``col``."""
    h1 = phash60(F.col(col)) % m_bits
    h2 = phash60b(F.col(col)) % m_bits
    out = []
    for i in range(k):
        idx = (h1 + i * h2) % m_bits
        out.append((_word_of(idx), idx % WORD_BITS))
    return out


def bloom_build(df: DataFrame, col: str, m_bits: int, k: int) -> DataFrame:
    """Aggregate the Bloom bitmap of ``df[col]``'s value set.

    Returns ``(word: long, bits: long)`` — only words with at least one
    set bit are materialized (missing word ≡ all-zero). One exchange of
    at most ``ceil(m_bits/60)`` keys after map-side combine.
    """
    probes = _probe_cols(col, m_bits, k)
    per_probe = [
        df.select(w.alias("word"), b.alias("bit")) for w, b in probes
    ]
    rows = per_probe[0]
    for p in per_probe[1:]:
        rows = rows.unionAll(p)
    return rows.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
        .alias("bits")
    )


def _probe_scalar(
    df: DataFrame, col: str, bloom: DataFrame, m_bits: int, k: int
) -> DataFrame:
    """Fused probe: the whole bitmap as one dense array literal.

    One bounded collect (≤ ceil(m_bits/60) rows) at plan-build time,
    then a pure projection — no joins, no shuffle, no extra columns.
    """
    n_words = (m_bits + WORD_BITS - 1) // WORD_BITS
    dense = [0] * n_words
    for row in bloom.select("word", "bits").collect():
        dense[int(row["word"])] = int(row["bits"])
    arr = F.lit(dense)  # array<bigint> literal, constant size m_bits/8 B
    maybe = None
    for w, b in _probe_cols(col, m_bits, k):
        word_bits = F.element_at(arr, (w + 1).cast("int"))
        flag = F.bit_get(word_bits, b.cast("int")) == 1
        maybe = flag if maybe is None else (maybe & flag)
    return df.withColumn("bloom_maybe", maybe)


def _probe_join(
    df: DataFrame, col: str, bloom: DataFrame, m_bits: int, k: int
) -> DataFrame:
    """k broadcast joins against the distributed bitmap (large-m path)."""
    probes = _probe_cols(col, m_bits, k)
    out = df
    flags = []
    for i, (w, b) in enumerate(probes):
        bt = bloom.select(
            F.col("word").alias(f"_bw{i}"), F.col("bits").alias(f"_bb{i}")
        )
        out = (
            out.withColumn(f"_pw{i}", w)
            .withColumn(f"_pb{i}", b)
            .join(F.broadcast(bt), F.col(f"_pw{i}") == F.col(f"_bw{i}"), "left")
        )
        flags.append(
            F.expr(
                f"coalesce((shiftright(_bb{i}, CAST(_pb{i} AS INT)) & 1) = 1,"
                " false)"
            )
        )
    maybe = flags[0]
    for fl in flags[1:]:
        maybe = maybe & fl
    drop = [c for i in range(k) for c in (f"_pw{i}", f"_pb{i}", f"_bw{i}", f"_bb{i}")]
    return out.withColumn("bloom_maybe", maybe).drop(*drop)


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int,
    max_literal_words: int = MAX_LITERAL_WORDS,
) -> DataFrame:
    """Append ``bloom_maybe`` (true ⇔ all k probe bits set) to ``df``.

    Bitmaps up to ``max_literal_words`` words take the fused scalar
    path (zero joins — the probed row is untouched); larger bitmaps
    fall back to k broadcast joins. Either way the probed side is never
    shuffled. ``bloom_maybe = false`` is a *certain* non-member.
    """
    n_words = (m_bits + WORD_BITS - 1) // WORD_BITS
    if n_words <= max_literal_words:
        return _probe_scalar(df, col, bloom, m_bits, k)
    return _probe_join(df, col, bloom, m_bits, k)


#: DuckDB twins. Format with the key expression / relation texts.
#: BLOOM_PROBES_SQL yields (word, bits); `//` is DuckDB integer
#: division ≡ the Spark side's exact-floor `_word_of` (both operands
#: non-negative), so the packed bitmap is bit-identical across engines.
BLOOM_PROBES_SQL = """
    SELECT {key} AS key,
           CAST(((CAST('0x' || substr(md5({key}), 1, 15) AS BIGINT) % {m}
                  + i.i * (CAST('0x' || substr(md5({key}), 16, 15) AS BIGINT)
                           % {m})) % {m}) // {wb} AS BIGINT) AS word,
           ((CAST('0x' || substr(md5({key}), 1, 15) AS BIGINT) % {m}
             + i.i * (CAST('0x' || substr(md5({key}), 16, 15) AS BIGINT)
                      % {m})) % {m}) % {wb} AS bit
    FROM ({rel}) CROSS JOIN ({ivals}) AS i(i)
"""


def bloom_probes_sql(key: str, rel: str, m_bits: int, k: int) -> str:
    """DuckDB SQL producing one (key, word, bit) row per probe."""
    ivals = " UNION ALL ".join(f"SELECT {i} AS i" for i in range(k))
    return BLOOM_PROBES_SQL.format(
        key=key, rel=rel, m=m_bits, wb=WORD_BITS, ivals=ivals
    )
