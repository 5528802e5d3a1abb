"""Watermarked event-time windowed aggregation over the discovery
stream (`olx_spark/streaming/windows.py`): append-mode emission,
late-row dropping, watermark persistence across restarts, and
stream == batch parity on the admitted subset.

Timeline (seconds after T0; window 10 s, watermark 30 s):

- run 1 ingests on-time rows at t in [0, 10) and t in [100, 106).
  The data batch advances the watermark to 105 - 30 = 75 and the
  run's final no-data batch (Spark 4 availableNow behavior) emits
  the closed [0,10) windows before stopping.
- run 2 ingests a LATE row at t=5 (< persisted watermark 75:
  DROPPED — it must not bump the already-emitted [0,10) counts),
  on-time rows in [110, 116), and a flush row at t=200. Watermark
  advances to 170 -> [100,110) and [110,120) close and emit.
- run 3 ingests a flush row at t=210 -> watermark 180: closes
  nothing new; output must be unchanged (restart idempotence).
  [200,210) / [210,220) stay open forever (never emitted).
"""

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from olx_spark.streaming.windows import EVENT_SCHEMA, event_window_metrics, start_event_window_stream

T0 = datetime(2026, 1, 1, 0, 0, 0)


def _row(host: str, sec: float, i: int) -> dict:
    return {
        "name": "job",
        "host": host,
        "url": f"https://{host}/ad/{i}",
        "event_ts": (T0 + timedelta(seconds=sec)).strftime("%Y-%m-%d %H:%M:%S"),
    }


def _write_file(drop_dir: str, fname: str, rows: list[dict]) -> None:
    path = os.path.join(drop_dir, fname)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)


def _drain(spark, drop, out, ckpt):
    q = start_event_window_stream(spark, drop, out, ckpt)
    q.awaitTermination()


def _read_out(spark, out):
    try:
        df = spark.read.parquet(out)
    except Exception:
        return []
    return sorted(
        (r["win_start"], r["win_end"], r["host"], r["n_discovered"], r["n_urls_approx"])
        for r in df.collect()
    )


def test_windowed_stream_emits_on_close_drops_late_and_matches_batch(spark, tmp_path):
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(drop)

    on_time_1 = [_row("a.example", s, i) for i, s in enumerate([0, 2, 4, 8])] + [
        _row("b.example", s, i) for i, s in enumerate([1, 9], start=10)
    ] + [_row("a.example", 100 + s, 20 + s) for s in range(6)]
    _write_file(drop, "f1.json", on_time_1)
    _drain(spark, drop, out, ckpt)
    got_after_1 = _read_out(spark, out)
    # availableNow's final no-data batch applies the advanced
    # watermark (75): exactly the [0,10) windows emit, once
    assert {(r[0], r[1]) for r in got_after_1} == {(T0, T0 + timedelta(seconds=10))}
    assert {r[2]: r[3] for r in got_after_1} == {"a.example": 4, "b.example": 2}

    late = [_row("a.example", 5, 99)]  # < watermark 75: must be dropped
    on_time_2 = [_row("b.example", 110 + s, 30 + s) for s in range(6)]
    flush = [_row("c.example", 200, 40)]
    _write_file(drop, "f2.json", late + on_time_2 + flush)
    _drain(spark, drop, out, ckpt)
    got_after_2 = _read_out(spark, out)
    # the late row neither re-emits nor bumps the closed [0,10) rows;
    # watermark 170 closes [100,110) and [110,120)
    assert {(r[0], r[1]) for r in got_after_2} == {
        (T0, T0 + timedelta(seconds=10)),
        (T0 + timedelta(seconds=100), T0 + timedelta(seconds=110)),
        (T0 + timedelta(seconds=110), T0 + timedelta(seconds=120)),
    }
    assert {r[2]: r[3] for r in got_after_2 if r[0] == T0} == {
        "a.example": 4, "b.example": 2,  # late row NOT counted anywhere
    }

    _write_file(drop, "f3.json", [_row("c.example", 210, 41)])
    _drain(spark, drop, out, ckpt)
    got = _read_out(spark, out)
    assert got == got_after_2  # watermark 180 closes nothing new

    # stream == batch over the admitted rows, restricted to closed
    # windows (win_end <= final watermark 170); the open [200,210) /
    # [210,220) windows and the dropped late row never appear
    admitted = on_time_1 + on_time_2 + flush + [_row("c.example", 210, 41)]
    batch = spark.createDataFrame(
        [(r["name"], r["host"], r["url"], datetime.strptime(r["event_ts"], "%Y-%m-%d %H:%M:%S")) for r in admitted],
        EVENT_SCHEMA,
    )
    expect = sorted(
        (r["win_start"], r["win_end"], r["host"], r["n_discovered"], r["n_urls_approx"])
        for r in event_window_metrics(batch)
        .filter(F.col("win_end") <= T0 + timedelta(seconds=170))
        .collect()
    )
    assert got == expect
    assert {(r[0], r[1]) for r in got} == {
        (T0, T0 + timedelta(seconds=10)),
        (T0 + timedelta(seconds=100), T0 + timedelta(seconds=110)),
        (T0 + timedelta(seconds=110), T0 + timedelta(seconds=120)),
    }
