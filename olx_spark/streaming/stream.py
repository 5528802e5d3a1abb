"""Structured-Streaming frontier processing (SURVEY.md §2.2 streaming
row: the reference has NO streaming semantics — its fs2 stream is a
bounded pull pipeline — so this is the engine-side optional path,
kept thin by design).

Shape: discovered URLs arrive as files in a drop directory (the
streaming stand-in for a Kafka frontier topic); each micro-batch runs
the SAME batch operators (canonicalize -> fingerprint -> first-seen
dedup vs the seen table) inside ``foreachBatch`` and appends fresh URLs
to the snapshot store. Using foreachBatch (not stateful operators) is
deliberate: the seen-set already lives in snapshot tables shared with
the batch engine, so both modes have one source of truth — and the
batch operators are reused verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olx_spark.functions.urls import canonicalize_modern
from olx_spark.operators.dedup import anti_join_unseen, first_seen_dedup
from olx_spark.plans.snapshot import SnapshotStore

DISCOVERY_SCHEMA = "name string, base_url string, href string, priority int"


def start_frontier_stream(
    spark: SparkSession,
    drop_dir: str,
    store: SnapshotStore,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Stream discovered (base_url, href) rows into the frontier.

    Returns the StreamingQuery; with ``trigger_once`` the stream drains
    the directory and stops (deterministic for tests).
    """
    raw = (
        spark.readStream.schema(DISCOVERY_SCHEMA)
        .json(drop_dir)
    )

    batch_no = {"n": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        canon = (
            batch_df.withColumn(
                "url", canonicalize_modern(F.col("href"), F.col("base_url"))
            )
            .withColumn("url_fp", F.xxhash64("url"))
            .withColumn("host", F.parse_url("url", F.lit("HOST")))
        )
        fresh = first_seen_dedup(canon, ["url_fp"], ["name", "href"])
        seen = store.read_table("seen")
        if seen is not None:
            fresh = anti_join_unseen(fresh, seen)
        rounds = store.committed_rounds()
        nxt = (max(rounds) + 1) if rounds else 0
        out = fresh.select(
            "name", "url", "url_fp", "host",
            F.lit("ad").alias("kind"), F.lit(0).alias("depth"),
            F.coalesce("priority", F.lit(0)).alias("priority"),
            F.lit(nxt).alias("discovery_round"),
            F.lit(0).cast("long").alias("parent_fp"),
            F.monotonically_increasing_id().cast("int").alias("discovery_pos"),
        )
        store.commit_round(
            nxt,
            {"frontier": out, "seen": out.select("url_fp")},
            {"stream_batch": int(batch_id)},
        )
        batch_no["n"] += 1

    writer = (
        raw.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
