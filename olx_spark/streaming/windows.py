"""Event-time windowed metrics over the discovery stream — the
watermark/late-data half of the Structured Streaming story (the
frontier ingest in ``stream.py`` is the exactly-once half).

The reference's only metrics surface is a one-shot status report
(``OlxServer.scala:33-49``: counts per job); at 100-TB crawl scale the
equivalent is a continuously-maintained per-host discovery rate. This
module computes it the Spark-native way: ``withWatermark`` +
``groupBy(window(...))`` in APPEND mode, so each (window, host) row is
emitted exactly once — when the watermark passes the window end — and
state for closed windows is dropped instead of growing without bound.

Late-data semantics (the part a batch backfill gets wrong silently):
rows later than the watermark delay are DROPPED from their window; the
stream's output is the batch answer over the on-time subset. The
parity pytest pins exactly that: stream result == batch
``groupBy(window)`` over the rows the watermark admitted.

Scale notes: the shuffle key is (window, host) — naturally high
cardinality, no skew salt needed; state size is bounded by
(hosts x open windows); ``availableNow`` triggers make the same code
a drain-the-backlog batch job, which is how the tests drive it
deterministically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = "name string, host string, url string, event_ts timestamp"


def event_window_metrics(
    df,
    window_dur: str = "10 seconds",
    watermark_delay: str = "30 seconds",
):
    """The shared plan: per-(window, host) discovered-URL counts and
    distinct-URL counts. Works on a streaming OR a batch DataFrame —
    the parity test runs the SAME function both ways.

    ``approx_count_distinct`` (HLL) instead of exact ``countDistinct``:
    exact distinct is unsupported under streaming aggregation (state
    would need every URL); the HLL sketch is the 100-TB answer in
    batch mode too.
    """
    src = df.withWatermark("event_ts", watermark_delay) if df.isStreaming else df
    return src.groupBy(
        F.window("event_ts", window_dur).alias("win"),
        "host",
    ).agg(
        F.count("*").alias("n_discovered"),
        F.approx_count_distinct("url").alias("n_urls_approx"),
    ).select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "host",
        "n_discovered",
        "n_urls_approx",
    )


def start_event_window_stream(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_dur: str = "10 seconds",
    watermark_delay: str = "30 seconds",
):
    """Stream discovery events from ``drop_dir`` (JSON files — the
    stand-in for a Kafka topic) into per-window parquet under
    ``out_dir``. Append output mode: a (window, host) row is written
    exactly once, after the watermark closes the window. Returns the
    StreamingQuery (``availableNow`` — drains the current backlog and
    stops; restart with the same checkpoint to continue, the watermark
    persists across runs)."""
    raw = spark.readStream.schema(EVENT_SCHEMA).json(drop_dir)
    agg = event_window_metrics(raw, window_dur, watermark_delay)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
