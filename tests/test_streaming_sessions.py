"""Stateful streaming sessionization (applyInPandasWithState):
in-batch closes, timeout closes on watermark advance, exactly-once
across restarts, and parity with the batch sessionize operator on the
admitted subset.

Timeline (seconds after T0; gap 30 s, watermark delay 10 s):

- run 1: user 1 at t = 0, 5, 8 and t = 100; user 2 at t = 3.
  The in-batch gap 8 -> 100 closes user 1's [0, 8] session (emitted
  from the DATA batch). Watermark advances to 100 - 10 = 90; the
  final no-data batch fires no timeouts (open sessions end at 100
  and 3 ... user 2's timeout 3 + 30 = 33 < 90 -> user 2's [3, 3]
  session closes via TIMEOUT in the same run).
- run 2: flush row (user 99, t = 200) -> watermark 190; user 1's
  [100, 100] and the flush user's own state close when due:
  user 1's timeout 130 < 190 fires -> [100, 100] emits. User 99's
  session (200) stays open (timeout 230 > 190).
- run 3: another flush (user 99, t = 205) extends the open session;
  output unchanged (restart idempotence of closed sessions).
"""

import json
import os
from datetime import datetime, timedelta

from olx_spark.streaming.sessions import start_session_stream

T0 = datetime(2026, 1, 1, 0, 0, 0)


def _row(user: int, sec: float, i: int) -> dict:
    return {
        "user_id": user,
        "event_id": i,
        "ts": (T0 + timedelta(seconds=sec)).strftime("%Y-%m-%d %H:%M:%S"),
    }


def _write_file(drop_dir: str, fname: str, rows: list[dict]) -> None:
    path = os.path.join(drop_dir, fname)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)


def _drain(spark, drop, out, ckpt):
    q = start_session_stream(spark, drop, out, ckpt, gap_s=30, watermark_delay="10 seconds")
    q.awaitTermination()


def _read_out(spark, out):
    try:
        df = spark.read.parquet(out)
    except Exception:
        return []
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in df.collect()
    )


def _sec(s):
    return T0 + timedelta(seconds=s)


def test_stateful_sessions_close_in_batch_and_on_timeout(spark, tmp_path):
    drop, out, ckpt = (str(tmp_path / d) for d in ("drop", "out", "ckpt"))
    os.makedirs(drop)

    run1 = [_row(1, s, i) for i, s in enumerate([0, 5, 8, 100])] + [_row(2, 3, 9)]
    _write_file(drop, "f1.json", run1)
    _drain(spark, drop, out, ckpt)
    got1 = _read_out(spark, out)
    # user 1's [0,8] closed by the in-batch gap; user 2's [3,3] closed
    # by event-time timeout when the no-data batch applied watermark 90
    assert got1 == [
        (1, _sec(0), _sec(8), 3),
        (2, _sec(3), _sec(3), 1),
    ]

    _write_file(drop, "f2.json", [_row(99, 200, 20)])
    _drain(spark, drop, out, ckpt)
    got2 = _read_out(spark, out)
    # watermark 190 fires user 1's timeout (130): [100,100] emits once;
    # user 99's own session (timeout 230) stays open
    assert got2 == sorted(got1 + [(1, _sec(100), _sec(100), 1)])

    _write_file(drop, "f3.json", [_row(99, 205, 21)])
    _drain(spark, drop, out, ckpt)
    assert _read_out(spark, out) == got2  # idempotent: nothing re-emits


def test_stateful_sessions_match_batch_operator_on_admitted(spark, tmp_path):
    from pyspark.sql import functions as F

    from olx_spark.operators.temporal import sessionize

    drop, out, ckpt = (str(tmp_path / d) for d in ("drop", "out", "ckpt"))
    os.makedirs(drop)
    import random

    rng = random.Random(5)
    rows = [
        _row(rng.randint(1, 4), rng.choice([0, 3, 9, 47, 52, 120, 128, 300]), i)
        for i in range(60)
    ]
    flush = [_row(99, 10_000, 999)]  # watermark 9990: closes everything
    _write_file(drop, "f1.json", rows)
    _write_file(drop, "f2.json", flush)
    _drain(spark, drop, out, ckpt)
    got = [r for r in _read_out(spark, out) if r[0] != 99]

    batch = spark.createDataFrame(
        [(r["user_id"], r["event_id"], _sec(0) + (datetime.strptime(r["ts"], "%Y-%m-%d %H:%M:%S") - T0)) for r in rows],
        ["user_id", "event_id", "ts"],
    )
    want = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(batch, "user_id", "ts", gap_s=30, order_tiebreak="event_id")
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    assert got == want
