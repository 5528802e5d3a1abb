"""The crawl driver loop — SURVEY.md §3.1's Spark translation.

One crawl *round* is one (small set of) Spark job(s) over DataFrames;
the reference's pull-based ``Stream.unfoldEval`` state
(``DownloadLinks.scala:17-34``) becomes explicit per-seed driver state
checkpointed into the snapshot manifest. Per round:

    seeds -> fetch listing pages (mapInPandas)
          -> posexplode hrefs -> canonicalize (vectorized pandas UDF)
          -> per-page first-occurrence dedup (window rn=1)
          -> ordered limit against each seed's remaining budget
          -> fetch+parse ad pages (mapInPandas, Arrow batches)
          -> commit {results, fetch_log} snapshot atomically

Faithful reference-exact semantics (mode="reference"):
- the SAME listing URL is re-fetched every round (``nextPage`` parsed
  but never followed, ``DownloadLinks.scala:21``);
- ``left = max(0, left - n_distinct)`` count-down termination
  (``DownloadLinks.scala:22``);
- dedup is per page only — duplicates reappear across rounds
  (``DownloadLinks.scala:49``);
- the flattened stream is truncated exactly at ``count`` mid-page
  (``DownloadAds.scala:26-27``); crawl order == (round, pos) == the
  reference's ADS.ID insert order (``H2.scala:34-38``).
- divergence guard: a 0-link round ends the seed (the reference would
  spin forever, SURVEY.md §2.1 implicit-semantics note).

Scale notes: per-seed budgets are O(#seeds) scalars on the driver (the
only driver-side state); everything row-shaped stays distributed. The
per-round budget aggregation is a tiny ``groupBy(name).count`` —
map-side combined, collected as #seeds rows.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olx_spark.functions.urls import canonicalize_modern, canonicalize_reference
from olx_spark.operators.fetch import fetch_listings, fetch_parse_ads, with_lineage
from olx_spark.plans.snapshot import SnapshotStore


@dataclass
class CrawlConfig:
    mode: str = "reference"  # "reference" | "scaled"
    max_rounds: int = 200
    with_payload: bool = True
    checkpoint_dir: str | None = None  # default: fresh temp dir per run
    # scaled-mode knobs (operators/politeness.py, operators/dedup.py)
    follow_next_page: bool = True
    # "global_exact" | "global_bloom" | "global_cuckoo" — cuckoo is the
    # deletion-capable seen-filter (re-crawl/TTL retirement; see
    # operators/cuckoo.py); same shard routing + commit plumbing as bloom
    dedup_scope: str = "global_exact"
    per_host_per_round: int = 100  # politeness budget when no crawl_delay
    round_budget_ms: int = 60_000  # politeness: round wall budget per host
    bloom_shards: int = 32  # shard count for bloom AND cuckoo scopes
    bloom_bits_per_shard: int = 1 << 20
    cuckoo_buckets_per_shard: int = 1 << 15  # x4 slots = 131k fps/shard cap
    host_salt_buckets: int = 8
    # physical layout: frontier/seen deltas land in pmod(url_fp, N)
    # bucket subdirs so the per-round pending probe/anti-join is a
    # co-located zero-shuffle read (snapshot.set_bucket_spec). In
    # global_bloom mode the bucket count is forced to bloom_shards
    # (bucket b holds exactly shard b); this knob sizes exact mode.
    # extra["unbucketed_store"]=True disables the layout (A/B + legacy).
    state_buckets: int = 32
    compact_every: int = 8  # merge frontier/seen deltas every N rounds
    # parquet files per round delta: rounds are small relative to the
    # whole crawl, so don't fan a few-MB delta into 32 task files (at
    # real scale size this to round_rows / ~128MB)
    delta_write_partitions: int = 8
    # False: compute the payload in-worker (decode/phash work happens)
    # but null the bytes before the sink — for throughput runs where a
    # single local disk would otherwise measure I/O, not the engine
    # (in prod the payload sink is object storage with aggregate
    # bandwidth; results/metadata still land in the table)
    store_payload_bytes: bool = True
    extra: dict = field(default_factory=dict)


SEED_SCHEMA = "name string, base_url string, round int"
SCHED_SCHEMA = "name string, round int, pos int, seq long, url string"


class CrawlEngine:
    """Reference-exact crawl over a broadcast page store.

    ``graph`` is an ``olx_spark.fixtures.crawl_graph.CrawlGraph`` (or
    anything exposing ``store.listing`` / ``store.ads`` dicts keyed by
    (host, path), plus ``image_seed`` / ``n_hosts``).
    """

    def __init__(self, spark: SparkSession, graph, config: CrawlConfig | None = None):
        self.spark = spark
        self.graph = graph
        self.config = config or CrawlConfig()
        sc = spark.sparkContext
        self._listing_bc = sc.broadcast(dict(graph.store.listing))
        self._ads_bc = sc.broadcast(dict(graph.store.ads))
        ckpt = self.config.checkpoint_dir or tempfile.mkdtemp(prefix="olx_spark_run_")
        self.store = SnapshotStore(ckpt, spark)

    # ---------------------------------------------------------------- run
    def run(self, seeds: list[dict]) -> DataFrame:
        """Run (or resume) the crawl to completion; returns ``results``
        ordered by (name, seq) — the reference's ADS.ID order."""
        state, start_round = self._init_or_resume(seeds)
        rnd = start_round
        while rnd < self.config.max_rounds:
            active = {
                n: s
                for n, s in state.items()
                if s["scheduled"] < s["count"] and s["left"] > 0 and not s["dead"]
            }
            if not active:
                break
            self._run_round(rnd, active, state)
            rnd += 1
        return self.results()

    def results(self) -> DataFrame | None:
        df = self.store.read_table("parsed")
        if df is None:
            return None
        return df.drop("status", "elapsed_ms", "partition_id").orderBy("name", "seq")

    def fetch_log(self) -> DataFrame | None:
        df = self.store.read_table("parsed")
        if df is None:
            return None
        return df.select(
            "name", "round", "seq", F.col("href").alias("url"),
            "status", "elapsed_ms", "partition_id",
        )

    def seen_urls(self) -> DataFrame | None:
        """Distinct fetched URLs per seed, in first-occurrence order —
        the URL-seen set of the north_rule."""
        df = self.store.read_table("parsed")
        if df is None:
            return None
        w = Window.partitionBy("name", "href").orderBy("seq")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("name", "href", F.col("seq").alias("first_seq"))
        )

    # ---------------------------------------------------------- internals
    def _init_or_resume(self, seeds: list[dict]):
        committed = self.store.committed_rounds()
        if committed:
            saved = self.store.last_state()
            return saved["seeds"], saved["next_round"]
        state = {
            s["name"]: {
                "url": s["url"],
                "count": int(s["count"]),
                "left": int(s["count"]),
                "scheduled": 0,
                "dead": False,
            }
            for s in seeds
        }
        return state, 0

    def _run_round(self, rnd: int, active: dict, state: dict) -> None:
        spark = self.spark
        listing_df = spark.createDataFrame(
            [(n, s["url"], rnd) for n, s in active.items()], SEED_SCHEMA
        )
        fetched = fetch_listings(listing_df, self._listing_bc)
        exploded = fetched.select(
            "name",
            "base_url",
            "round",
            F.posexplode("ads").alias("pos_raw", "href"),
        )
        canon = exploded.withColumn(
            "url", canonicalize_reference(F.col("href"), F.col("base_url"))
        )
        # per-page first-occurrence dedup (DownloadLinks.scala:49); each
        # round fetches one page per seed, so (name) scopes the page here
        w_first = Window.partitionBy("name", "url").orderBy("pos_raw")
        w_rank = Window.partitionBy("name").orderBy("pos_raw")
        distinct = (
            canon.withColumn("dup_rn", F.row_number().over(w_first))
            .filter(F.col("dup_rn") == 1)
            .withColumn("pos", (F.row_number().over(w_rank) - 1).cast("int"))
            .select("name", "round", "pos", "url")
        ).cache()  # listing fetch runs once; budget agg + schedule reuse
        # tiny per-seed budget agg -> driver (the unfold countdown)
        counts = {r["name"]: r["n"] for r in distinct.groupBy("name").agg(
            F.count("*").alias("n")).collect()}

        limits = []
        for n, s in active.items():
            n_distinct = int(counts.get(n, 0))
            take_n = min(s["count"] - s["scheduled"], n_distinct)
            limits.append((n, take_n, s["scheduled"]))
            s["left"] = max(0, s["left"] - n_distinct)
            if n_distinct == 0:
                s["dead"] = True  # divergence guard (0-link page)
            s["scheduled"] += take_n
        limits_df = spark.createDataFrame(
            limits, "name string, take_n int, base_seq long"
        )
        scheduled = (
            distinct.join(F.broadcast(limits_df), "name")
            .filter(F.col("pos") < F.col("take_n"))
            .withColumn("seq", F.col("base_seq") + F.col("pos"))
            .select("name", "round", "pos", "seq", "url")
        )
        # results + fetch_log are projections of ONE written table
        parsed = with_lineage(
            fetch_parse_ads(
                scheduled,
                self._ads_bc,
                image_seed=self.graph.image_seed,
                n_hosts=self.graph.n_hosts,
                with_payload=self.config.with_payload,
            )
        )
        # repartition, NOT coalesce: coalesce is a narrow dependency that
        # would collapse the producing pipeline (fetch UDF, parse) to
        # delta_write_partitions tasks — the exact anti-pattern the
        # scaled engine removed (BENCH.md optimization log; repo rule)
        self.store.commit_round(
            rnd,
            {"parsed": parsed.repartition(self.config.delta_write_partitions)},
            {"seeds": state, "next_round": rnd + 1},
        )
        distinct.unpersist()
