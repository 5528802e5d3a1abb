"""Stateful streaming sessionization — the custom-stateful-operator
half of the Structured Streaming story (`windows.py` covers built-in
windowed aggregation; this covers state Spark has no built-in for).

Gap sessions cannot be expressed as a watermarked window groupBy (the
window end depends on the data), so this uses
``applyInPandasWithState``: per-user state holds the open session
(start, last, count) as epoch-ms ints; each Arrow batch folds its
events in (sorted, so intra-batch disorder is free), closing and
emitting every session whose gap was exceeded IN the batch, and an
event-time timeout (``last + gap``) closes the trailing session when
the watermark passes it — exactly-once emission of each closed
session, bounded state (one open session per active user).

Late rows older than the watermark are dropped by Spark before the
function runs — the same admitted-subset semantics as `windows.py`,
pinned by the parity test against the batch `operators.temporal.
sessionize` over the admitted rows.

Scale notes: state is 3 longs per ACTIVE user (idle users' state is
freed by the timeout); the shuffle key is the user id — high
cardinality, no salt needed. The function is Arrow-batched per group,
never per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IN_SCHEMA = "user_id long, event_id long, ts timestamp"
OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"


def _session_fn(gap_s: int):
    gap_ms = gap_s * 1000

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]

        def emit(rows):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows),
                    "session_start": pd.to_datetime([r[0] for r in rows], unit="ms"),
                    "session_end": pd.to_datetime([r[1] for r in rows], unit="ms"),
                    "n_events": [r[2] for r in rows],
                }
            )

        if state.hasTimedOut:
            # watermark passed last+gap: the open session is closed
            start, last, n = state.get
            state.remove()
            yield emit([(start, last, n)])
            return

        ts_ms = []
        for pdf in pdfs:
            ts_ms.extend(pdf["ts"].astype("int64") // 10**6)
        ts_ms.sort()
        if state.exists:
            start, last, n = state.get
        else:
            if not ts_ms:  # defensive: no admitted rows, no open session
                return
            start = last = None
            n = 0
        closed = []
        for t in ts_ms:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_ms:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        state.update((start, last, n))
        # event-time timeout: fires when the watermark passes the gap
        # after the session's last event (always > current watermark,
        # since admitted rows are never older than the watermark)
        state.setTimeoutTimestamp(last + gap_ms)
        if closed:
            yield emit(closed)

    return fn


def sessionize_stream(events, gap_s: int = 30, watermark_delay: str = "10 seconds"):
    """Streaming gap sessionization: one output row per CLOSED session
    (append semantics). ``events`` is a streaming DataFrame with
    ``IN_SCHEMA`` columns."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_s),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def start_session_stream(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_s: int = 30,
    watermark_delay: str = "10 seconds",
):
    """Drain ``drop_dir`` (JSON event files) into closed-session rows
    under ``out_dir`` (parquet, append). ``availableNow``: processes
    the backlog — including the final no-data batch that applies the
    advanced watermark and fires due timeouts — then stops; restart
    with the same checkpoint to continue."""
    raw = spark.readStream.schema(IN_SCHEMA).json(drop_dir)
    sessions = sessionize_stream(raw, gap_s, watermark_delay)
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


__all__ = [
    "IN_SCHEMA",
    "OUT_SCHEMA",
    "sessionize_stream",
    "start_session_stream",
]
