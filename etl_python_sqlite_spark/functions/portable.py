"""Cross-engine deterministic 60-bit hashing (Spark ⇄ DuckDB).

The fast dedup/fingerprint operators key on ``xxhash64`` — ideal inside
one engine, but engine-internal: no other SQL engine reproduces it, so
queries built on it can only get the driver's weaker rows-only check.
This module defines a *portable* hash both engines compute bit-for-bit
identically, making MinHash/SimHash/winnowing pipelines fully
oracle-checkable:

    P(x) = int(md5(utf8(x)).hexdigest()[:15], 16)     # 60 bits

* Spark:  ``conv(substring(md5(x), 1, 15), 16, 10)`` cast to long —
  all JVM codegen expressions, no UDFs.
* DuckDB: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.

15 hex digits = 60 bits < 2^63, so the BIGINT cast can never overflow
(ANSI mode on the Spark side would otherwise raise). md5 on both engines
hashes the UTF-8 bytes of the string and prints lowercase hex, so the
derived integer is identical by construction. The salted family re-hashes
the *decimal string* of a base hash with a salt prefix — md5 over a short
ASCII string, far cheaper than re-hashing the original text per salt.

md5 is ~2-4× slower than xxhash64 per call; production paths keep
xxhash64 (see operators/dedup.py), the ``*_portable`` variants trade
that margin for cross-engine verifiability and are still pure codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB SQL twin of ``phash60`` — format with the column/expression text.
PHASH60_SQL = "CAST('0x' || substr(md5({c}), 1, 15) AS BIGINT)"

#: DuckDB SQL twin of ``phash60_salted`` — format with salt + hash exprs.
PHASH60_SALTED_SQL = PHASH60_SQL.format(
    c="CAST({s} AS VARCHAR) || ':' || CAST({h} AS VARCHAR)"
)

#: second independent 60-bit value from the SAME md5 (hex digits 16-30).
PHASH60B_SQL = "CAST('0x' || substr(md5({c}), 16, 15) AS BIGINT)"

#: Mersenne prime 2^61−1 — the modulus of the universal salt family.
MINHASH_MOD_P = (1 << 61) - 1

#: DuckDB twin of ``universal_hash``: exact wide-integer arithmetic via
#: HUGEINT (Spark side uses DECIMAL(38,0) — both exact, both < 2^121).
UNIVERSAL_HASH_SQL = (
    f"CAST((CAST({{h}} AS HUGEINT) * {{a}} + {{b}}) % {MINHASH_MOD_P} AS BIGINT)"
)


def phash60(c: Column) -> Column:
    """Portable 60-bit hash of a string column (see module docstring)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def phash60b(c: Column) -> Column:
    """Second 60-bit hash from the SAME md5 digest (hex chars 16..30) —
    independent of :func:`phash60` bits, zero extra digest cost."""
    return F.conv(F.substring(F.md5(c), 16, 15), 16, 10).cast("long")


def phash60_salted(h: Column, s: Column) -> Column:
    """Portable salted re-hash of an integer hash ``h`` with salt ``s``:
    ``P(str(s) || ':' || str(h))``. Both operands are rendered as decimal
    strings (identical text on both engines). One md5 per (value, salt) —
    prefer :func:`double_hash_family` when many salts are evaluated per
    value (one md5 total)."""
    return phash60(F.concat_ws(":", s.cast("string"), h.cast("string")))


def universal_salt_constants(num: int) -> list[tuple[int, int, int]]:
    """(s, a_s, b_s) triples for the 2-universal salt family — fixed,
    RNG-free (derived from md5 of the salt index in CPython at plan-build
    time, then embedded as LITERALS in both the Spark plan and the SQL
    twin, so no cross-engine hash agreement is even needed for them).
    ``a_s`` is forced odd/nonzero and < 2^60 < p."""
    import hashlib

    out = []
    for s in range(num):
        a = int(hashlib.md5(f"minhash-a-{s}".encode()).hexdigest()[:15], 16) | 1
        b = int(hashlib.md5(f"minhash-b-{s}".encode()).hexdigest()[:15], 16)
        out.append((s, a, b))
    return out


def universal_hash(h: Column, a: Column, b: Column) -> Column:
    """``(a·h + b) mod (2^61−1)`` — the textbook Carter-Wegman universal
    family over a Mersenne prime, evaluated in EXACT wide-integer
    arithmetic (DECIMAL(38,0); products < 2^121 < 10^38) so Spark and
    DuckDB (HUGEINT) agree bit-for-bit.

    Why not something cheaper: a first cut used the affine-in-s
    Kirsch-Mitzenmacher form ``h1 + s·h2`` WITHOUT a modulus — but min
    over affine functions of s is a lower envelope, so whenever two
    shingles' (h1, h2) orderings agree (probability ½) the same shingle
    is the argmin for EVERY salt. Signature diversity collapses, LSH
    band collisions go quadratic, and the 64× scale probe filled the
    disk with a candidate-join spill. The mod-p wraparound is exactly
    what restores per-salt independence; small-SF oracle gates can NOT
    catch that failure class (both engines compute the same degenerate
    signatures), only the scale probe did."""
    return ((h.cast("decimal(38,0)") * a + b) % F.lit(MINHASH_MOD_P)).cast(
        "long"
    )
