"""Exact-Python-semantics normalization as native Column expressions.

The reference normalizes row-at-a-time with Python string methods
(reference scr/etl_relational.py:57-72, scr/etl_basic.py:20-22). We
reproduce those semantics with built-in Spark SQL expressions so the hot
path stays inside whole-stage codegen — no Python UDFs.

Semantics worth being exact about:

* ``str.capitalize()`` uppercases ONLY the first character of the whole
  string and lowercases the rest ("san luis" → "San luis"), unlike Spark's
  ``initcap`` which capitalizes every word.
* ``str.title()`` capitalizes the first letter of every run of letters —
  apostrophes/digits break words ("o'brien" → "O'Brien"), unlike
  ``initcap`` which only splits on whitespace ("o'brien" → "O'brien").
* ``int(x)`` accepts surrounding whitespace but NOT decimals ("26.5"
  raises), while Spark's ``cast('int')`` truncates "26.5" → 26. We guard
  with a strict integer regex after trimming.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Maximum string length Spark's substring accepts; used for "rest of string".
_MAX_LEN = 2147483647

#: Strict Python-``int()`` literal: optional sign then digits only.
#: (Python also allows ``_`` digit separators — deliberately excluded; the
#: reference data never uses them and the oracle SQL must stay portable.)
_INT_RE = r"^[+-]?[0-9]+$"


def py_capitalize(col: Column | str) -> Column:
    """``s.strip().lower().capitalize()`` — reference scr/etl_relational.py:58.

    First char uppercased, ALL remaining chars lowercased. Null-safe.
    """
    t = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    return F.concat(F.upper(F.substring(t, 1, 1)), F.substring(t, 2, _MAX_LEN))


#: marker that cannot occur in real text (unit separator control char)
_TITLE_MARK = "\x1f "


def py_title(col: Column | str) -> Column:
    """``s.strip().lower().title()`` — reference scr/etl_relational.py:59.

    Python ``str.title()`` uppercases the first letter of every maximal
    run of cased letters (apostrophes/digits break words, unlike
    ``initcap`` which only splits on whitespace).

    Implementation stays in flat codegen expressions (an earlier
    split-into-array + per-piece ``transform`` was interpreted per
    element and ~10× slower at scan width):

    1. append a marker+space after EVERY non-letter char — now every
       letter-run starts a whitespace-separated token;
    2. ``initcap`` — capitalizes each token's first letter (input is
       already lowercased, so the rest is untouched);
    3. strip the marker+space pairs back out.
    """
    t = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    marked = F.regexp_replace(t, r"([^\p{L}])", "$1" + _TITLE_MARK)
    return F.regexp_replace(F.initcap(marked), _TITLE_MARK, "")


def strict_int(col: Column | str, target: str = "int") -> Column:
    """Python-``int()`` cast: trims whitespace, then requires ``[+-]?digits``.

    Returns NULL where Python would raise ValueError (reference
    scr/etl_relational.py:71-79 routes those rows to rejects). Unlike a
    bare Spark cast this rejects decimals ("26.5") and partial garbage.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(c.rlike(_INT_RE), c.cast(target))


def sanitize_token(col: Column | str) -> Column:
    """Replace every non-alphanumeric char with ``_`` — the reference's
    run_id filename sanitizer (scr/etl_batch.py:27, ``ch.isalnum()``).
    Python ``isalnum`` is unicode-aware, hence ``[^\\p{L}\\p{N}]``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[^\p{L}\p{N}]", "_")
