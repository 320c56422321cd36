"""Scoped persist lifecycle — cache intermediates for exactly as long as
the result that needs them.

Several operators persist derived frames because Catalyst re-inlines a
non-cached subplan into BOTH sides of a self-join (the measured hazards
are documented at each call site).  A bare ``.persist()`` is correct for
the query but wrong for the session: the CacheManager holds the entry
until an explicit ``unpersist()``, so in a long-lived multi-tenant
session every dedup/LSH call pins executor storage forever — unbounded
storage-memory growth and eviction pressure at warehouse scale.

``tie(result, *cached)`` scopes the cache to the RESULT's lifetime
instead: a ``weakref.finalize`` on the returned DataFrame unpersists the
intermediates the moment the caller drops the result (CPython refcounting
makes that prompt), or immediately via ``release(result)``.  The
intermediates stay strongly referenced by the finalizer until then, so
the cached plans remain valid for every action the caller runs.

Eager ``localCheckpoint`` vs tied lazy persist is a measured per-site
choice. The dedup candidate sets use a build-time checkpoint (the
narrowest stage; same-session A/B: downstream plans over the
materialized RDD beat re-analyzed full-lineage trees by ~25% at sf0.1),
and ``tie`` frees the checkpoint blocks deterministically on drop via
the LogicalRDD backing handle (``_release_frame``) — without that, only
the ASYNC ContextCleaner reclaims them. The cost of a checkpoint is
plan OPACITY: everything upstream becomes "Scan ExistingRDD" to any
later ``.explain``, so the plan-quality gates cover the pre-checkpoint
join shapes through dedicated subplan tests
(tests/test_plan_quality.py::test_checkpointed_candidate_subplans)
rather than the contract query's executed plan. Operators whose frames
are consumed within a single action keep tied lazy persists — free at
build time, full Catalyst plan visible.

Composition rule: an operator that derives a new frame from a tied
result must keep the tied result alive as long as its own output —
pass it via ``keepalive=`` so the chain of finalizers unwinds outward-in.
"""

from __future__ import annotations

import weakref
from collections.abc import Iterable

from pyspark.sql import DataFrame

_RELEASE_ATTR = "_spark_graft_release"


def _release_frame(f: DataFrame) -> None:
    """Free a tied frame's storage now: unpersist its cache entry AND,
    for ``localCheckpoint`` frames, the checkpoint RDD's blocks.

    Checkpoint blocks are otherwise reclaimed only by the ASYNC
    ContextCleaner after a JVM GC — minutes of dangling storage in a
    long-lived session, which the deterministic-release gate
    (tests/test_cache_lifecycle.py) rightly rejects. A checkpoint
    frame's analyzed plan is a LogicalRDD whose backing RDD we can
    unpersist directly; for every other plan shape the attribute probe
    fails and we fall through silently (the cache unpersist above
    already handled it). Only ever called once nothing references the
    frame, so invalidating the checkpoint is safe."""
    try:
        f.unpersist()
    except Exception:
        pass  # session already stopped — nothing left to release
    try:
        f._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # not a LogicalRDD-backed frame (or session gone)


def tie(
    result: DataFrame,
    *cached: DataFrame,
    keepalive: Iterable[DataFrame] = (),
) -> DataFrame:
    """Unpersist ``cached`` when ``result`` is garbage-collected (or on
    ``release(result)``).  ``keepalive`` frames are merely held — their
    own finalizers fire once this result lets go of them."""
    frames = tuple(cached)
    keep = tuple(keepalive)

    def _release(_frames=frames, _keep=keep) -> None:
        for f in _frames:
            _release_frame(f)

    fin = weakref.finalize(result, _release)
    # the JVM gateway may already be gone at interpreter shutdown; skip
    # the atexit sweep and let the process teardown reclaim everything
    fin.atexit = False
    setattr(result, _RELEASE_ATTR, fin)
    return result


def tie_shared(
    results: Iterable[DataFrame], *cached: DataFrame
) -> list[DataFrame]:
    """Like ``tie`` for operators returning SEVERAL frames over the same
    cached parent (e.g. a good/reject split): the parent is unpersisted
    only after the LAST surviving result is dropped."""
    out = list(results)
    frames = tuple(cached)
    remaining = {"n": len(out)}

    def _release_one(_frames=frames, _remaining=remaining) -> None:
        _remaining["n"] -= 1
        if _remaining["n"] <= 0:
            for f in _frames:
                try:
                    f.unpersist()
                except Exception:
                    pass

    for r in out:
        fin = weakref.finalize(r, _release_one)
        fin.atexit = False
        setattr(r, _RELEASE_ATTR, fin)
    return out


def tie_stage_table(frame: DataFrame, drop_cb) -> DataFrame:
    """Run ``drop_cb`` (the DROP of a bucketed stage table) when the
    LAST consumer of a table-backed memo handle lets go. LRU eviction
    of a stage-table entry must only drop the REFERENCE — an immediate
    DROP TABLE under a still-live consumer frame fails that consumer's
    next action with FileNotFound (the cache-tier eviction rule,
    extended to tables). Explicit release paths may still drop
    immediately; ``drop_cb`` must be idempotent (DROP TABLE IF
    EXISTS). Uses a DIFFERENT attribute than :func:`tie` so
    ``release(frame)`` on the handle stays a no-op — the immediate
    drop belongs to the tier's own release function."""

    def _cb(_drop=drop_cb) -> None:
        try:
            _drop()
        except Exception:
            pass  # session already stopped

    fin = weakref.finalize(frame, _cb)
    fin.atexit = False
    setattr(frame, "_spark_graft_table_release", fin)
    return frame


def release(df: DataFrame) -> None:
    """Explicitly run a frame's tied cleanup now (idempotent, optional —
    dropping the frame has the same effect)."""
    fin = getattr(df, _RELEASE_ATTR, None)
    if fin is not None:
        fin()
