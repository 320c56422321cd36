"""Custom stateful streaming operator via ``applyInPandasWithState``.

The brief's example of an operator Spark's built-ins can't express: a
per-user *session accumulator* that maintains arbitrary Python state
across micro-batches — running totals, open-session event buffers, and a
session counter keyed by gap timeouts — emitting one row per closed
session. Built-in windowed aggregation can't do "emit on gap close with
custom payload"; ``applyInPandasWithState`` can.

State is per-key (user_id), Arrow-serialized between batches, evicted by
timeout. The same ``_track_sessions`` function also powers a batch-mode
equivalence test (fed one batch, then flushed) so the logic is testable
without a live stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_python_sqlite_spark.protoshim import ensure_protobuf

# Import-time, deliberately: python WORKERS import this module when they
# unpickle our StatefulProcessor subclasses, and the shim must be on
# sys.path before pyspark's state clients lazily `import google.protobuf`
# (see protoshim.py). No-op when the real package exists.
ensure_protobuf()

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_n", T.IntegerType()),
        T.StructField("n_events", T.IntegerType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("started_epoch", T.LongType()),
        T.StructField("ended_epoch", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_n", T.IntegerType()),
        T.StructField("n_events", T.IntegerType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("started_epoch", T.LongType()),
        T.StructField("last_epoch", T.LongType()),
    ]
)


def track_sessions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Session accumulator for one user: close a session (emit a row)
    whenever a >30 min gap appears; keep the open session in state."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            sn, n, tot, st, last = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_n": sn,
                        "n_events": n,
                        "total_value": tot,
                        "started_epoch": st,
                        "ended_epoch": last,
                    }
                ]
            )
        return

    events = pd.concat(list(pdfs)).sort_values("epoch_s")
    if state.exists:
        sn, n, tot, st, last = state.get
    else:
        sn, n, tot, st, last = 0, 0, 0.0, None, None

    out = []
    for _, ev in events.iterrows():
        e = int(ev["epoch_s"])
        if last is not None and e - last > SESSION_GAP_S:
            out.append(
                {
                    "user_id": user_id,
                    "session_n": sn,
                    "n_events": n,
                    "total_value": tot,
                    "started_epoch": st,
                    "ended_epoch": last,
                }
            )
            sn, n, tot, st = sn + 1, 0, 0.0, e
        if st is None:
            st = e
        n += 1
        tot += float(ev["value"])
        last = e

    state.update((sn, n, tot, st, last))
    state.setTimeoutDuration(SESSION_GAP_S * 1000)
    if out:
        yield pd.DataFrame(out)


def sessionized_stream(events: DataFrame) -> DataFrame:
    """Wire the accumulator onto a (streaming or batch-test) events frame
    with columns (user_id long, epoch_s long, value double)."""
    return events.groupBy("user_id").applyInPandasWithState(
        track_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor stateful API
# ---------------------------------------------------------------------------

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user RUNNING totals across micro-batches via Spark 4's
    ``transformWithStateInPandas`` — the typed-state successor to
    ``applyInPandasWithState`` (explicit ValueState handles, per-state
    TTL support, multiple named states per key). Emits the updated
    cumulative (n_events, total_value) for every user seen in each
    micro-batch — the "lifetime counters" shape that watermarked window
    aggregation cannot express (no window: state lives forever or to
    TTL).

    Scale: state is per-key in the state store (RocksDB in production
    conf), updates are Arrow-batched per key; key distribution is the
    stream's user_id distribution — salt upstream if a hot user exists.

    RUNTIME NOTE: the new API's state-server protocol needs
    ``google.protobuf``; when the real package is absent the repo's
    pure-stdlib shim (``protoshim.py``) satisfies it, so this runs for
    real in this container (test_skew_stateful exercises the full
    python↔JVM protocol). The state store must be RocksDB
    (``spark.sql.streaming.stateStore.providerClass``) — the default
    HDFS-backed provider rejects TWS's multiple column families.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n_events BIGINT, total_value DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, tot = 0, 0.0
            if self._state.exists():
                prev_n, prev_tot = self._state.get()
                n, tot = int(prev_n), float(prev_tot)
            for pdf in rows:
                n += len(pdf)
                tot += float(pdf["value"].sum())
            self._state.update((n, tot))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [tot]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_types", T.IntegerType()),
        T.StructField("top_type", T.StringType()),
        T.StructField("recent_sum", T.DoubleType()),
    ]
)

#: ListState event buffer cap — keeps per-key state O(1) regardless of
#: how many events a hot user produces.
PROFILE_RECENT_K = 8


def user_event_profile_stream(events: DataFrame) -> DataFrame:
    """Per-user behavioral profile across micro-batches, exercising ALL
    THREE typed-state primitives of ``transformWithStateInPandas`` in
    one operator (columns: user_id long, event_type string, value
    double):

    * **ValueState** ``total`` — lifetime event count, with a TTL (the
      per-state retention the old API couldn't express; also the
      protocol's ``StateCallCommand.ttl`` path);
    * **MapState** ``counts`` — event-type → count (typed user keys in
      the state store, not a serialized dict blob: point lookups and
      updates without rewriting the whole map);
    * **ListState** ``recent`` — the last ``PROFILE_RECENT_K`` values
      (bounded buffer: append per event, trim by rewrite when over cap).

    Emits one row per user per micro-batch with the updated profile.
    Scale: state is per-key in RocksDB; the map/list sizes are bounded
    by the type-domain and the buffer cap, so a hot key's state stays
    O(types + K) — the skew concern is shuffle volume, not state size.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class EventProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # ONE retention policy for the whole profile: if any piece
            # expires, all pieces expire together — a TTL on `total`
            # alone would reset n_events to 0 while n_types/top_type/
            # recent_sum still reflected lifetime history (internally
            # inconsistent rows, ADVICE r5).
            ttl = 7 * 24 * 3600 * 1000
            self._total = handle.getValueState("total", "n BIGINT", ttlDurationMs=ttl)
            self._counts = handle.getMapState(
                "counts", "etype STRING", "n BIGINT", ttlDurationMs=ttl
            )
            self._recent = handle.getListState(
                "recent", "v DOUBLE", ttlDurationMs=ttl
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n = int(self._total.get()[0]) if self._total.exists() else 0
            for pdf in rows:
                n += len(pdf)
                for etype, value in zip(pdf["event_type"], pdf["value"]):
                    k = (str(etype),)
                    prev = (
                        int(self._counts.getValue(k)[0])
                        if self._counts.containsKey(k)
                        else 0
                    )
                    self._counts.updateValue(k, (prev + 1,))
                    self._recent.appendValue((float(value),))
            self._total.update((n,))
            vals = [float(r[0]) for r in self._recent.get()]
            if len(vals) > PROFILE_RECENT_K:
                vals = vals[-PROFILE_RECENT_K:]
                self._recent.put([(v,) for v in vals])
            counts = {k[0]: int(v[0]) for k, v in self._counts.iterator()}
            best = max(counts.values())
            top = min(t for t, c in counts.items() if c == best)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_types": [len(counts)],
                    "top_type": [top],
                    "recent_sum": [float(sum(vals))],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        EventProfile(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="append",
        timeMode="processingTime",  # required for TTL'd state variables
    )


def first_occurrence_stream(
    records: DataFrame,
    key_col: str = "doc_key",
    ttl_hours: int = 14 * 24,
) -> DataFrame:
    """Streaming EXACT dedup with BOUNDED state: emit only the first
    occurrence of each ``key_col`` (e.g. a content hash), remembering
    seen keys in TTL'd ValueState — the ingest-dedup shape for a
    training-data firehose.

    Why TWS and not ``dropDuplicates`` + watermark: the watermark form
    bounds state by EVENT TIME, so a duplicate arriving after the
    watermark passes is re-emitted; this form bounds state by a
    RETENTION POLICY (``ttl_hours`` since last write of that key's
    state), which is the contract corpus ingestion actually wants
    ("drop re-crawls within N days, re-admit after"). State per key is
    one boolean-sized row in RocksDB, evicted by TTL — a 10^10-key
    month-scale firehose holds only the keys seen inside the retention
    window.

    Emits each surviving row's key plus ``n_dropped`` (duplicates
    suppressed for that key within this batch) — the ingest-rate audit
    column.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n_dropped", T.LongType()),
        ]
    )

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "seen BOOLEAN", ttlDurationMs=ttl_hours * 3600 * 1000
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n = 0
            for pdf in rows:
                n += len(pdf)
            if self._seen.exists():
                return  # wholly duplicate: emit nothing, refresh nothing
            self._seen.update((True,))
            yield pd.DataFrame({"key": [key[0]], "n_dropped": [n - 1]})

        def close(self) -> None:
            pass

    return records.groupBy(key_col).transformWithStateInPandas(
        FirstSeen(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="processingTime",
    )
