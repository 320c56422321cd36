"""Blocked edit-distance similarity join — typo/near-miss pair mining.

The curation use-case: misspelling discovery over a corpus vocabulary
(OCR noise, tokenizer-hostile typos), fuzzy key matching between dirty
dimension feeds, entity near-miss detection. All need "pairs within
Levenshtein distance k" WITHOUT the O(n²) all-pairs scan.

Blocking is the segment-pigeonhole idea behind PassJoin (Li, Deng &
Feng, "PassJoin: a partition-based method for similarity joins", 2011 —
public literature), specialized to k=1 (the typo case) where it has a
tight closed form: if ed(s, t) ≤ 1 and len(s) = L, then either the
length-⌊L/2⌋ PREFIXES agree, or the length-(L−⌊L/2⌋) SUFFIXES agree —
whichever half the single edit did NOT touch survives verbatim (an
insertion/deletion shifts only the half it lands in, because the
surviving half is anchored to its own end of the string).

Execution shape (scale-first):

* every word emits 2 INDEX keys (role, own-length, half) and up to 6
  PROBE keys (role, partner-length ∈ {L−1, L, L+1}, half computed at
  the PARTNER's split point — the shifted-anchor subtlety that makes
  the pigeonhole exact);
* candidates are equi-join buckets on (role, length, half) — never a
  cartesian; block sizes are vocabulary statistics, not corpus size;
* verification is a bounded ``levenshtein(a, b, k)`` on candidates
  only (Spark's thresholded form stops the DP early).

Everything is plain string/integer expressions, so a SQL oracle replays
the identical blocking + verify (``__spark_entry__.ext_vocab_edit_pairs``);
completeness vs brute force is pinned in tests/test_editdist.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _half_keys(word: str, role_probe: bool) -> F.Column:
    """Array of (role, lk, part) structs for one side of the join."""
    L = F.length(word)
    if not role_probe:  # index keys: split at own length
        return F.array(
            F.struct(
                F.lit("P").alias("role"),
                L.alias("lk"),
                F.expr(f"substring({word}, 1, length({word}) div 2)").alias("part"),
            ),
            F.struct(
                F.lit("S").alias("role"),
                L.alias("lk"),
                F.expr(
                    f"substring({word}, length({word}) div 2 + 1)"
                ).alias("part"),
            ),
        )
    # probe keys: split at each PARTNER length L2 ∈ {L-1, L, L+1}; the
    # prefix is taken from the string's left end, the suffix from its
    # right end (the anchor that survives an indel in the other half)
    entries = []
    for d in (-1, 0, 1):
        l2 = f"(length({word}) + ({d}))"
        entries.append(
            f"named_struct('role', 'P', 'lk', {l2}, "
            f"'part', substring({word}, 1, {l2} div 2))"
        )
        entries.append(
            f"named_struct('role', 'S', 'lk', {l2}, "
            f"'part', substring({word}, length({word}) - ({l2} - {l2} div 2) + 1))"
        )
    return F.expr("array(" + ", ".join(entries) + ")")


def edit_distance_pairs(
    vocab: DataFrame,
    word_col: str = "word",
    min_len: int = 4,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """All pairs of distinct ``vocab`` rows with Levenshtein distance
    exactly 1 (the typo radius), as (w_a < w_b) with ``dist`` and any
    ``carry_cols`` suffixed _a/_b. ``min_len`` drops short tokens whose
    unit-distance neighborhoods are linguistic noise (and whose empty
    half-keys would degenerate into giant blocks).

    Input is a VOCABULARY (distinct words + per-word stats), not the
    corpus: the expensive explode/distinct happened upstream once; this
    operator's cost is vocabulary-sized regardless of corpus size.
    """
    carry = carry_cols or []
    base = vocab.filter(F.length(F.col(word_col)) >= min_len).select(
        F.col(word_col).alias("w"), *[F.col(c) for c in carry]
    )
    idx = base.select(
        "*", F.explode(_half_keys("w", role_probe=False)).alias("k")
    )
    prb = base.select(
        F.col("w").alias("w2"),
        *[F.col(c).alias(f"{c}2") for c in carry],
        F.explode(_half_keys("w", role_probe=True)).alias("k"),
    ).filter(F.col("k.lk") >= F.lit(min_len))
    cands = (
        idx.join(prb, ["k"])
        .filter(F.col("w") < F.col("w2"))
        .select(
            "w",
            "w2",
            *[F.col(c) for c in carry],
            *[F.col(f"{c}2") for c in carry],
        )
        .distinct()
    )
    out = cands.select(
        F.col("w").alias("w_a"),
        F.col("w2").alias("w_b"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
        *[F.col(f"{c}2").alias(f"{c}_b") for c in carry],
        F.levenshtein("w", "w2", 1).alias("dist"),
    )
    return out.filter(F.col("dist") == 1)
