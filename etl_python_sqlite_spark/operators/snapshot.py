"""Snapshot diff — dataset-iteration tooling: compare two versions of a
keyed table and classify every key as added / removed / changed /
unchanged.

The shape is ONE full-outer shuffle join on the key plus a null-safe
column compare — no collects, no window sorts — so it scales to any
snapshot pair whose key space hashes uniformly. Payload comparison uses
``<=>`` (null-safe equality) per column, so NULL→value and value→NULL
transitions count as changes and NULL==NULL does not.

This is the engine-level primitive under "what changed between dataset
v1 and v2" audits in a training-data pipeline (new docs, dropped docs,
re-crawled docs whose content moved) — pair it with the dedup family to
answer "how much of v2 is genuinely new".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of snapshot ``a`` (old) vs ``b`` (new): returns
    key columns + ``status`` ∈ {added, removed, changed, unchanged}."""
    if not keys:
        # an empty join condition would silently degenerate the
        # full-outer join into a cross join
        raise ValueError("snapshot_diff requires at least one key column")
    sa = a.select(
        *[F.col(k).alias(f"k_{k}") for k in keys],
        *[F.col(c).alias(f"a_{c}") for c in compare_cols],
        F.lit(1).alias("_in_a"),
    )
    sb = b.select(
        *[F.col(k).alias(f"bk_{k}") for k in keys],
        *[F.col(c).alias(f"b_{c}") for c in compare_cols],
        F.lit(1).alias("_in_b"),
    )
    cond = [F.col(f"k_{k}").eqNullSafe(F.col(f"bk_{k}")) for k in keys]
    joined = sa.join(sb, cond, "full_outer")
    # no compare columns = presence-only diff: matched keys are unchanged
    same_payload = F.lit(True)
    for c in compare_cols:
        same_payload = same_payload & F.col(f"a_{c}").eqNullSafe(
            F.col(f"b_{c}")
        )
    status = (
        F.when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_in_b").isNull(), F.lit("removed"))
        .when(same_payload, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"k_{k}"), F.col(f"bk_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
    )


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """Per-status row counts of a ``snapshot_diff`` frame."""
    return diff.groupBy("status").agg(F.count("*").alias("n_rows"))


def scd1_merge(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Type-1 slowly-changing-dimension upsert: merge ``updates`` into
    ``target`` keeping exactly ONE row per key — the latest by
    ``order_cols`` (ties impossible when the caller includes a unique
    tiebreaker, the repo convention). Updates overwrite, new keys
    insert, absent keys survive — classic MERGE INTO semantics as a
    pure-frame transform.

    Shape: unionByName → one row_number window over a single
    (key)-partitioned sort — ONE shuffle on the key, no join at all
    (a join-based upsert shuffles both sides AND re-shuffles the
    anti-join; the window form halves that). The descending order puts
    the winner at rn=1 regardless of which input it came from: the
    deduplicate-by-recency idiom used at CDC compaction scale.
    Pair with ``operators/idempotent.idempotent_append`` for the sink
    side; this operator is the state-computation half.
    """
    if not keys:
        raise ValueError("scd1_merge requires at least one key column")
    if not order_cols:
        raise ValueError(
            "scd1_merge requires order_cols (latest-wins needs an order)"
        )
    unioned = target.unionByName(updates)
    w = Window.partitionBy(*keys).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    state_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event stream:
    collapse each key's consecutive runs of equal ``state_col`` into
    validity intervals (key, state, valid_from, valid_to, is_current).

    The classic warehouse CDC shape (Kimball SCD type 2) as pure window
    functions: a change flag (``state != lag(state)``), kept change rows,
    and ``valid_to = lead(valid_from)`` — two passes over ONE
    key-partitioned sort, no self-joins. ``valid_to`` is NULL on the
    open (current) interval.

    ``order_cols`` breaks timestamp ties deterministically (repo events
    convention: (ts, event_id)). Timestamps stay in the engine's
    timestamp type here; contract queries render ISO strings (the repo's
    no-DATE-columns output invariant).

    Scale: both windows share the identical (key, ts, order) partitioning
    — Catalyst plans ONE Exchange + sort and reuses it; per-key history
    lives on one executor, exactly how a 100 TB CDC log is consumed.
    """
    extra = list(order_cols or [])
    order = [F.col(ts_col)] + [F.col(c) for c in extra]
    w = Window.partitionBy(key).orderBy(*order)
    # both windows order by the SAME attributes (ts is renamed to
    # valid_from only in the final projection): the planner then proves
    # the change rows are already sorted and plans ONE Exchange + ONE
    # Sort for the whole operator. The previous mid-stream rename made
    # the second window re-Sort — ordering propagation does not see
    # through the alias (r12-opt, guide §2.4; plan diff in plans/r12).
    # The tie-break (two change rows CAN share a timestamp) is the same
    # order list, so lead() stays deterministic.
    flagged = df.select(
        key,
        state_col,
        ts_col,
        *extra,
        (
            F.lag(state_col).over(w).isNull()
            | (F.lag(state_col).over(w) != F.col(state_col))
        ).alias("_chg"),
    )
    changes = flagged.filter("_chg").drop("_chg")
    return changes.select(
        key,
        state_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def scd2_apply_changes(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    state_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
    validate: bool = True,
) -> DataFrame:
    """INCREMENTALLY merge a batch of new change events into an existing
    SCD2 history (the apply-changes half of warehouse CDC — the
    companion to :func:`scd2_intervals`, which builds history from
    scratch). Closed intervals are NEVER rescanned or rewritten; only
    each affected key's single OPEN interval re-enters the window, so
    per-batch cost is O(changes + affected keys) — the same
    O(delta)-not-O(history) discipline as
    ``operators/incremental.merge_agg_states``.

    Contract (the standard append-only CDC assumption): every change
    event's ``ts_col`` is strictly LATER than the open interval's
    ``valid_from`` for its key — i.e. batches arrive in time order.
    Under it, **merge ≡ rebuild**: the result is bit-identical to
    ``scd2_intervals`` over the concatenated event log (the contract
    query's oracle proves this against a full-history SQL twin) —
    including the collapse case where a change carries the SAME state
    as the open interval (no new row; the open interval's original
    ``valid_from`` survives, because the open interval re-enters the
    window as an event at its own ``valid_from``, which sorts first).
    Late (out-of-order) data would need a closed-interval split and is
    out of scope here — route it to a full rebuild of the affected
    keys. A violated contract would SILENTLY diverge from the rebuild,
    so ``validate=True`` (default) runs one bounded count — per-key
    min change ts joined against the affected open intervals — and
    raises instead; pass ``validate=False`` only on a hot path whose
    producer already guarantees time-ordered batches.

    Shape: affected open intervals are selected by a semi-join on the
    (uniform) change-key set; the re-windowed union is bounded by the
    batch; untouched history passes through with zero shuffles.
    """
    extra = list(order_cols or [])
    ckeys = changes.select(key).distinct()
    open_ = history.filter(F.col("is_current"))
    open_aff = open_.join(ckeys, key, "left_semi")
    if validate:
        # bounded: ≤ one row per changed key on each side
        cmin = changes.groupBy(key).agg(F.min(ts_col).alias("_min_ts"))
        n_late = (
            cmin.join(open_aff.select(key, "valid_from"), key)
            .filter(F.col("_min_ts") <= F.col("valid_from"))
            .count()
        )
        if n_late:
            raise ValueError(
                f"scd2_apply_changes: {n_late} key(s) have change events "
                "at or before their open interval's valid_from — "
                "out-of-order batch violates the append-only contract "
                "(rebuild the affected keys instead)"
            )
    untouched = history.filter(~F.col("is_current")).unionByName(
        open_.join(ckeys, key, "left_anti")
    )
    # the open interval re-enters as an event at its own valid_from;
    # _src=0 sorts it before any change event (change ts are strictly
    # later anyway under the contract — the tiebreak is belt-and-braces)
    ctypes = dict(changes.dtypes)
    hist_events = open_aff.select(
        key,
        state_col,
        F.col("valid_from").alias(ts_col),
        F.lit(0).alias("_src"),
        *[F.lit(None).cast(ctypes[c]).alias(c) for c in extra],
    )
    chg_events = changes.select(
        key, state_col, ts_col, F.lit(1).alias("_src"), *extra
    )
    piece = scd2_intervals(
        hist_events.unionByName(chg_events),
        key=key,
        state_col=state_col,
        ts_col=ts_col,
        order_cols=["_src"] + extra,
    )
    return untouched.unionByName(piece)


def scd2_rebuild_keys(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    state_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
    keys: DataFrame | None = None,
) -> DataFrame:
    """Out-of-order escape hatch for :func:`scd2_apply_changes`: rebuild
    ONLY the affected keys' interval sets from their retained change
    points plus the (late) batch, leaving every other key untouched —
    the "rebuild the affected keys instead" the validator's error
    message demands, shipped (VERDICT r5 #8).

    A late event may land INSIDE a closed interval; splitting it is
    exactly a per-key re-run of :func:`scd2_intervals` over that key's
    interval-boundary events ∪ the batch, so closed-interval split,
    same-state collapse, and open-interval extension all fall out of
    one code path instead of bespoke interval surgery.

    Precision of the contract (what "rebuild" means here): SCD2 history
    is LOSSY by design — consecutive same-state events collapse into
    one interval and their interior timestamps are not retained. The
    rebuild is therefore exact with respect to the RETAINED change
    points: it is bit-identical to ``scd2_intervals`` over
    (per-key interval ``valid_from`` boundary events) ∪ (batch events).
    If the original raw log is still available and interior-point
    fidelity matters, rebuild from the raw log instead — this helper is
    for the warehouse case where the history table IS the source of
    truth.

    ``keys`` optionally restricts the rebuild to a subset (e.g. only
    the validator's violating keys, letting the in-order remainder take
    the O(delta) fast path); default: every key present in ``changes``.

    Determinism: history boundary events carry NULL ``order_cols`` (the
    interval table does not retain them), so two boundaries of one key
    at the SAME timestamp would tie; the state value itself is appended
    as the final tiebreaker — a documented, engine-portable total order
    (binary string compare on both Spark and DuckDB). Data whose
    retained change points never share a per-key timestamp is unaffected.

    Scale: affected keys' history is selected by one semi-join on the
    uniform key; the re-windowed union is O(affected history + batch);
    untouched keys pass through an anti-join with no window. Cost is
    O(touched keys' intervals), never O(full history rescan).
    """
    extra = list(order_cols or [])
    rkeys = (keys if keys is not None else changes.select(key)).select(
        key
    ).distinct()
    untouched = history.join(rkeys, key, "left_anti")
    ctypes = dict(changes.dtypes)
    hist_events = history.join(rkeys, key, "left_semi").select(
        key,
        state_col,
        F.col("valid_from").alias(ts_col),
        F.lit(0).alias("_src"),
        *[F.lit(None).cast(ctypes[c]).alias(c) for c in extra],
        F.col(state_col).alias("_st"),
    )
    chg_events = changes.join(rkeys, key, "left_semi").select(
        key, state_col, ts_col, F.lit(1).alias("_src"), *extra,
        F.col(state_col).alias("_st"),
    )
    piece = scd2_intervals(
        hist_events.unionByName(chg_events),
        key=key,
        state_col=state_col,
        ts_col=ts_col,
        order_cols=["_src"] + extra + ["_st"],
    )
    return untouched.unionByName(piece)
