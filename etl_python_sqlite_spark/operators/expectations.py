"""Declarative data-quality expectations — a Deequ-shaped constraint
audit evaluated in as few passes as the constraint mix allows.

The reference hard-codes its checks row-by-row (scr/etl_relational.py's
validation loop: required fields, int casts); production pipelines state
them declaratively and evaluate them in bulk. This operator takes a list
of rules and returns ONE row of (violations, passed) per rule:

* **row-level rules** (`not_null`, `in_set`, `between`, `matches`,
  `satisfies`) compile to conditional-count aggregates in a SINGLE
  aggregation pass over the table — one scan, map-side combined,
  however many rules;
* **`unique`** needs the key-grouped duplicate count: one groupBy on
  the key (uniform shuffle), counted down to one row;
* **`referential`** is a broadcast/left-anti join against the (small)
  referenced key set, counted to one row.

The one-row partial results crossJoin back together (broadcast
nested-loop of single rows — the repo's audited one-row-totals
pattern), so the output is a single audit row whatever the input size.
Column naming: ``<rule_name>_violations`` (BIGINT) per rule, plus
``n_rows`` — flat columns, hash-checkable by the oracle twin.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, in_set, between, matches,
    satisfies, unique, referential}; ``name`` becomes the output column
    prefix."""

    name: str
    kind: str
    cols: tuple[str, ...] = ()
    values: tuple = ()
    pattern: str = ""
    predicate: str = ""  # SQL boolean for `satisfies` (TRUE = ok)
    ref: DataFrame | None = field(default=None, compare=False)
    ref_col: str = ""


def not_null(name: str, *cols: str) -> Rule:
    return Rule(name, "not_null", cols=tuple(cols))


def in_set(name: str, col: str, *values) -> Rule:
    return Rule(name, "in_set", cols=(col,), values=tuple(values))


def between(name: str, col: str, lo, hi) -> Rule:
    return Rule(name, "between", cols=(col,), values=(lo, hi))


def matches(name: str, col: str, pattern: str) -> Rule:
    return Rule(name, "matches", cols=(col,), pattern=pattern)


def satisfies(name: str, predicate: str) -> Rule:
    return Rule(name, "satisfies", predicate=predicate)


def unique(name: str, *cols: str) -> Rule:
    return Rule(name, "unique", cols=tuple(cols))


def referential(name: str, col: str, ref: DataFrame, ref_col: str) -> Rule:
    return Rule(name, "referential", cols=(col,), ref=ref, ref_col=ref_col)


def _row_violation(rule: Rule) -> Column:
    """Boolean column: TRUE where the row VIOLATES the rule. NULL
    handling is explicit per kind: a NULL value violates not_null but
    none of the others (state absence and range are different defects —
    combine rules to demand both)."""
    if rule.kind == "not_null":
        v = F.lit(False)
        for c in rule.cols:
            v = v | F.col(c).isNull()
        return v
    if rule.kind == "in_set":
        c = F.col(rule.cols[0])
        return c.isNotNull() & ~c.isin(*rule.values)
    if rule.kind == "between":
        c = F.col(rule.cols[0])
        lo, hi = rule.values
        return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    if rule.kind == "matches":
        c = F.col(rule.cols[0])
        return c.isNotNull() & ~c.rlike(rule.pattern)
    if rule.kind == "satisfies":
        return ~F.coalesce(F.expr(rule.predicate), F.lit(False))
    raise ValueError(f"not a row-level rule: {rule.kind}")


_ROW_KINDS = {"not_null", "in_set", "between", "matches", "satisfies"}


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns ONE row:
    ``n_rows`` + ``<name>_violations`` per rule (column order = rule
    order). Raises on duplicate rule names (they'd collide in the
    output schema)."""
    if not rules:
        raise ValueError("check() needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    aggs = [F.count("*").cast("long").alias("n_rows")]
    for rule in rules:
        if rule.kind in _ROW_KINDS:
            aggs.append(
                F.sum(_row_violation(rule).cast("long"))
                .cast("long")
                .alias(f"{rule.name}_violations")
            )
    out = df.agg(*aggs)

    for rule in rules:
        if rule.kind == "unique":
            dup = (
                df.groupBy(*rule.cols)
                .agg(F.count("*").alias("_c"))
                .agg(
                    F.coalesce(F.sum(F.col("_c") - 1), F.lit(0))
                    .cast("long")
                    .alias(f"{rule.name}_violations")
                )
            )
            out = out.crossJoin(F.broadcast(dup))
        elif rule.kind == "referential":
            if rule.ref is None:
                raise ValueError(f"rule {rule.name}: referential needs ref")
            orphans = (
                df.filter(F.col(rule.cols[0]).isNotNull())
                .join(
                    F.broadcast(
                        rule.ref.select(
                            F.col(rule.ref_col).alias(rule.cols[0])
                        ).distinct()
                    ),
                    rule.cols[0],
                    "left_anti",
                )
                .agg(
                    F.count("*").cast("long").alias(
                        f"{rule.name}_violations"
                    )
                )
            )
            out = out.crossJoin(F.broadcast(orphans))
        elif rule.kind not in _ROW_KINDS:
            raise ValueError(f"unknown rule kind: {rule.kind}")

    # restore declared rule order in the output schema
    return out.select(
        "n_rows", *[f"{r.name}_violations" for r in rules]
    )
