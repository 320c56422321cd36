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
