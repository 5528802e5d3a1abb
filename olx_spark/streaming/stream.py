"""Structured-Streaming frontier processing (SURVEY.md §2.2 streaming
row: the reference has NO streaming semantics — its fs2 stream is a
bounded pull pipeline — so this is the engine-side optional path,
kept thin by design).

Shape: discovered URLs arrive as files in a drop directory (the
streaming stand-in for a Kafka frontier topic); each micro-batch runs
the SAME batch operators (canonicalize -> fingerprint -> first-seen
dedup) inside ``foreachBatch`` and appends fresh URLs to the snapshot
store. Using foreachBatch (not stateful operators) is deliberate: the
state already lives in snapshot tables shared with the batch engine,
so both modes have one source of truth — and the batch operators are
reused verbatim.

Table semantics (shared store contract):

- ``frontier``  — discovered URLs; the batch engine schedules from it.
- ``enqueued``  — STREAM-level dedup marker: url_fps this stream has
  already pushed into the frontier. Kept separate from ``seen``:
  ``seen`` means *scheduled/fetched* in the batch engine, and writing
  stream discoveries there would make the engine's frontier-MINUS-seen
  anti-join drop every streamed URL before it was ever fetched.
- ``seen``      — read-only here: a URL the batch engine already
  fetched is not re-enqueued.

The manifest ``state`` dict is MERGED (stream keys added), never
replaced — clobbering it destroyed the batch engine's ``seeds`` /
``next_round`` and broke resume. Interleaved writers are additionally
safe at the store level: ``commit_round`` serializes commits under a
lock file and CAS-rejects a round planned from a stale manifest read
(``StaleStateError``), so a stream batch racing an engine round fails
loudly instead of clobbering. A foreachBatch failure terminates the
streaming query; on restart the checkpoint replays the same batch,
which then re-reads the store and commits cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olx_spark.functions.urls import canonicalize_modern
from olx_spark.operators.dedup import anti_join_unseen, first_seen_dedup
from olx_spark.operators.ranking import constant_partitioned_window
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

    def process(batch_df: DataFrame, batch_id: int) -> None:
        canon = (
            batch_df.withColumn(
                "url", canonicalize_modern(F.col("href"), F.col("base_url"))
            )
            .withColumn("url_fp", F.xxhash64("url"))
            .withColumn("host", F.parse_url("url", F.lit("HOST")))
        )
        fresh = first_seen_dedup(canon, ["url_fp"], ["name", "href"])
        # stream-level dedup: never enqueue a url_fp twice...
        enqueued = store.read_table("enqueued")
        if enqueued is not None:
            fresh = anti_join_unseen(fresh, enqueued)
        # ...and never re-enqueue what the batch engine already fetched
        seen = store.read_table("seen")
        if seen is not None:
            fresh = anti_join_unseen(fresh, seen)
        rounds = store.committed_rounds()
        nxt = (max(rounds) + 1) if rounds else 0
        # discovery_pos: a deterministic position in an explicit total
        # order — NOT monotonically_increasing_id, whose per-partition
        # id blocks collide/overflow under an int cast and made the
        # ordering partition-layout-dependent. The micro-batch is
        # small, so one (constant-partitioned) rank task is fine.
        w = constant_partitioned_window(["name", "url_fp"])
        out = fresh.select(
            "name", "url", "url_fp", "host",
            F.lit("ad").alias("kind"), F.lit(0).alias("depth"),
            F.coalesce("priority", F.lit(0)).alias("priority"),
            F.lit(nxt).alias("discovery_round"),
            F.lit(0).cast("long").alias("parent_fp"),
        ).withColumn("discovery_pos", (F.row_number().over(w) - 1).cast("int"))
        # MERGE stream bookkeeping into the manifest state: replacing it
        # clobbered the batch engine's seeds/next_round (resume KeyError).
        # next_round must ADVANCE past this commit — the round numbers
        # are a shared sequence, and a resumed batch engine would
        # otherwise try to re-commit the round this batch just took
        # ("round N already committed").
        state = dict(store.last_state())
        state.setdefault("stream_batches", []).append(int(batch_id))
        state["next_round"] = nxt + 1
        store.commit_round(
            nxt,
            {"frontier": out, "enqueued": out.select("url_fp")},
            state,
        )

    writer = (
        raw.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
