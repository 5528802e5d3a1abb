"""Web-scale crawl mode — the 10^10-frontier design (north_rule).

Differences from the reference-exact loop in ``crawl.py``:

- the frontier is a real BFS: ``next_page`` links ARE followed
  (the reference parses but never follows them,
  ``DownloadLinks.scala:21``), and dedup is GLOBAL — exact left-anti
  join against the seen table, or partitioned Bloom shards
  (``operators/dedup.py``) when materializing the exact set per round
  is too expensive;
- politeness is explicit: robots prefixes broadcast-joined + per-host
  crawl-delay budgets enforced by window ranking
  (``operators/politeness.py``);
- all state tables are APPEND-ONLY deltas (frontier discoveries, seen
  fingerprints, results, fetch_log, seen_shards): a round commits only
  its additions, so commit cost is O(round), not O(frontier). The
  pending set is derived: ``frontier MINUS seen`` — and because the
  store writes both sides pre-partitioned into ``pmod(url_fp, N)``
  bucket subdirs (SURVEY §1.4's layout promise; Iceberg
  ``bucket(N, url_fp)`` analog), the derivation is a ZERO-SHUFFLE
  storage-partitioned read: each task reads bucket b of the frontier
  plus bucket b of the seen state (Bloom shard b or exact fps) and
  probes + dedups in-task (``operators/dedup.colocated_pending``).
  Legacy un-bucketed stores fall back to the cogroup/anti-join
  shuffle shape until a compaction migrates the layout.
- hot-host skew: the *fetch* fan-out is repartitioned by salted host
  (``host#salt``) so one 10x host spreads over many tasks, while
  politeness accounting stays on the unsalted host (SURVEY.md §4.2).

Determinism under parallelism: every cut (politeness budget, per-seed
count budget, seq assignment) is rank-then-filter over an explicit
total order — never partition iteration order — so results are
identical at local[8] and local[32] (asserted by the scaling test).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from olx_spark.functions.urls import canonicalize_modern
from olx_spark.operators.dedup import (
    BloomSeenFilter,
    anti_join_unseen,
    colocated_pending,
    first_seen_dedup,
    merge_shard_deltas,
)
from olx_spark.operators.fetch import fetch_listings, fetch_parse_ads, with_lineage
from olx_spark.operators.politeness import per_host_budget, robots_flag
from olx_spark.plans.crawl import CrawlConfig
from olx_spark.plans.snapshot import SnapshotStore

FRONTIER_SCHEMA = (
    "name string, url string, url_fp long, host string, kind string, depth int, "
    "priority int, discovery_round int, parent_fp long, discovery_pos int"
)


def _observed(
    obs: Observation, fired: bool = True, timeout_s: float = 120.0
) -> dict | None:
    """Observation.get with a hang guard. ``fired=False`` means the
    caller KNOWS the observed plan's action never ran (the sink write
    that would consume it didn't happen — e.g. a future regression
    reorders the commit loop): return None immediately so the caller
    falls back to a count job instead of burning a 120 s timeout
    thread on a hung-looking round (VERDICT r4 #4). With ``fired=True``
    the get returns promptly (the action completed); the timeout
    thread remains as a last-ditch guard, and the empty-metrics corner
    (zero tasks ran the node) is mapped to None."""
    if not fired:
        return None
    out: dict = {}

    def _get() -> None:
        try:
            out["m"] = obs.get
        except Exception:
            pass

    t = threading.Thread(target=_get, daemon=True)
    t.start()
    t.join(timeout_s)
    return out.get("m")


class ScaledCrawlEngine:
    """Frontier-BFS crawl with global dedup + politeness."""

    def __init__(self, spark: SparkSession, graph, config: CrawlConfig | None = None):
        self.spark = spark
        self.graph = graph
        self.config = config or CrawlConfig(mode="scaled")
        sc = spark.sparkContext
        # empty stores -> synthetic-server mode (content from URL)
        self._synth_conf = getattr(graph, "synth_conf", None)
        self._listing_bc = (
            sc.broadcast(dict(graph.store.listing)) if graph.store.listing else None
        )
        self._ads_bc = (
            sc.broadcast(dict(graph.store.ads)) if graph.store.ads else None
        )
        if self.config.checkpoint_dir is None:
            import tempfile

            self.config.checkpoint_dir = tempfile.mkdtemp(prefix="olx_scaled_run_")
        self.store = SnapshotStore(self.config.checkpoint_dir, spark)
        self.hosts_df = spark.createDataFrame(
            [
                (
                    h["host"],
                    h["crawl_delay_ms"],
                    h["robots_disallow"],
                    h.get("robots_allow", []),
                )
                for h in graph.hosts
            ],
            "host string, crawl_delay_ms int, robots_disallow array<string>, "
            "robots_allow array<string>",
        )
        self._has_robots = any(h["robots_disallow"] for h in graph.hosts)
        # the seen-filter: BloomSeenFilter (global_bloom) or the
        # API-compatible CuckooSeenFilter (global_cuckoo) — attribute
        # name kept for history; None under global_exact
        self.bloom: BloomSeenFilter | None = None

    # ---------------------------------------------------------------- run
    def run(self, seeds: list[dict]) -> DataFrame | None:
        state, start_round = self._init_or_resume(seeds)
        rnd = start_round
        while rnd < self.config.max_rounds:
            done = all(s["scheduled"] >= s["count"] for s in state.values())
            if done:
                break
            progressed = self._run_round(rnd, state)
            rnd += 1
            if not progressed:
                break  # frontier drained
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

    def seen_fps(self) -> DataFrame | None:
        return self.store.read_table("seen")

    def retire(self, rows: DataFrame) -> int:
        """Re-crawl / TTL support — the capability the cuckoo scope
        exists for (``dedup_scope="global_cuckoo"`` only; Bloom cannot
        delete). Retires previously-fetched ad URLs so the next
        :meth:`run` fetches them again: ``rows`` needs columns
        ``(name, url)`` — e.g. a filter over :meth:`fetch_log`.

        Commits ONE atomic snapshot round that
        - deletes the fingerprints from the cuckoo ``seen_shards``
          (merge + tag delete, replace semantics),
        - rewrites ``seen`` without them (so compaction's frontier
          anti-join cannot re-exclude the re-admissions),
        - appends re-admit ``frontier`` rows stamped with the next
          round number, and
        - re-opens each seed's scheduled budget by its retired count.

        Returns the number of URLs retired. The re-crawled fetches
        flow through the normal politeness/robots gates and append to
        ``parsed`` (the fetch log then shows the URL twice — that is
        the point of a revisit). The ``seen`` rewrite is a full-table
        job: size retirement batches accordingly (TTL batches are
        large and infrequent by nature).

        Edge: retiring the ENTIRE seen set is not supported — the
        zero-row ``seen`` replacement would be pruned by the commit's
        empty-delta rule, leaving stale rows for compaction's frontier
        anti-join. Start a fresh store for a full re-crawl instead
        (it is also the cheaper plan)."""
        if self.config.dedup_scope != "global_cuckoo":
            raise ValueError(
                "retire() requires dedup_scope='global_cuckoo': a Bloom "
                "seen-filter cannot delete — re-crawl needs the cuckoo "
                "scope from the start"
            )
        committed = self.store.committed_rounds()
        saved = self.store.last_state() if committed else {}
        if not committed or "seeds" not in saved:
            raise ValueError("retire() needs a committed crawl to retire from")
        if saved.get("bloom_shards"):
            raise ValueError(
                "checkpoint was written under dedup_scope=global_bloom; "
                "it cannot be retired from (bloom cannot delete)"
            )
        if self.bloom is None:
            from olx_spark.operators.cuckoo import CuckooSeenFilter

            self.bloom = CuckooSeenFilter(
                self.spark,
                n_shards=int(saved.get("cuckoo_shards") or self.config.bloom_shards),
                n_buckets_per_shard=int(
                    saved.get("cuckoo_buckets")
                    or self.config.cuckoo_buckets_per_shard
                ),
            )
        if not self.bloom.has_state():
            self.bloom.set_state(self.store.read_table("seen_shards"))

        state = {k: dict(v) for k, v in saved["seeds"].items()}
        next_round = int(saved["next_round"])
        ret = (
            rows.select("name", "url")
            .distinct()
            .withColumn("url_fp", F.xxhash64("url"))
            .withColumn("host", F.parse_url("url", F.lit("HOST")))
        )
        per_seed = {
            r["name"]: int(r["n"])
            for r in ret.groupBy("name").agg(F.count("*").alias("n")).collect()
        }
        n_ret = sum(per_seed.values())
        if n_ret == 0:
            return 0
        fps = ret.select("url_fp")
        # cuckoo tag delete (distributed; leaves ONE merged row/shard)
        self.bloom.delete_round(fps)
        seen_now = self.store.read_table("seen")
        seen_filtered = (
            seen_now.join(fps, "url_fp", "left_anti")
            if seen_now is not None
            else None
        )
        prio = F.broadcast(
            self.spark.createDataFrame(
                [(n, int(s.get("priority", 0))) for n, s in state.items()],
                "name string, priority int",
            )
        )
        w = Window.partitionBy("name").orderBy("url")
        readmit = (
            ret.join(prio, "name", "left")
            .withColumn("priority", F.coalesce("priority", F.lit(0)))
            .withColumn("kind", F.lit("ad"))
            .withColumn("depth", F.lit(0))
            .withColumn("discovery_round", F.lit(next_round))
            .withColumn("parent_fp", F.lit(0).cast("long"))
            .withColumn("discovery_pos", F.row_number().over(w) - F.lit(1))
            .select(*_frontier_cols())
        )
        for n, k in per_seed.items():
            if n in state:
                state[n]["scheduled"] = max(0, state[n]["scheduled"] - k)
        self.store.commit_round(
            next_round,
            {
                "frontier": readmit,
                "seen": seen_filtered,
                "seen_shards": self.bloom.to_df(),
            },
            {
                **saved,
                "seeds": state,
                "next_round": next_round + 1,
                **self._bloom_state(),
            },
            replace={"seen", "seen_shards"},
        )
        # point the in-memory filter at the committed rows
        self.bloom.set_state(self.store.read_table("seen_shards"))
        return n_ret

    # ---------------------------------------------------------- internals
    def _init_or_resume(self, seeds: list[dict]):
        committed = self.store.committed_rounds()
        saved = self.store.last_state() if committed else {}
        # a resume must never reinterpret committed seen_shards rows
        # under the OTHER filter kind: bloom bit-arrays and cuckoo slot
        # tables are both opaque bytes of plausible lengths, so a scope
        # flip would silently misread them (false negatives).
        if self.config.dedup_scope == "global_cuckoo" and saved.get("bloom_shards"):
            raise ValueError(
                "checkpoint was written under dedup_scope=global_bloom; "
                "resuming it as global_cuckoo would reinterpret bloom "
                "shard rows as cuckoo tables — resume with the original "
                "scope"
            )
        if self.config.dedup_scope == "global_bloom" and saved.get("cuckoo_shards"):
            raise ValueError(
                "checkpoint was written under dedup_scope=global_cuckoo; "
                "resuming it as global_bloom would reinterpret cuckoo "
                "shard rows as bloom bit-arrays — resume with the "
                "original scope"
            )
        if self.config.dedup_scope == "global_cuckoo":
            from olx_spark.operators.cuckoo import CuckooSeenFilter

            # geometry from the COMMITTED state when present (same
            # contract as bloom: config never reinterprets shard rows)
            self.bloom = CuckooSeenFilter(
                self.spark,
                n_shards=int(saved.get("cuckoo_shards") or self.config.bloom_shards),
                n_buckets_per_shard=int(
                    saved.get("cuckoo_buckets")
                    or self.config.cuckoo_buckets_per_shard
                ),
            )
            shards = self.store.read_table("seen_shards") if committed else None
            if shards is not None:
                self.bloom.set_state(shards)
        if self.config.dedup_scope == "global_bloom":
            # construct the filter UNCONDITIONALLY: a run killed before
            # the first seen_shards delta was committed (or a store a
            # stream initialized) must not silently downgrade the whole
            # resumed crawl to the exact anti-join path.
            # Geometry (n_shards, m_bits) comes from the COMMITTED state
            # when present, never from config: a resumed run with a
            # changed bloom config would otherwise silently reinterpret
            # shard rows under the new geometry (fps hash to different
            # shards/bit positions), breaking the no-false-negative
            # invariant with no error.
            self.bloom = BloomSeenFilter(
                self.spark,
                n_shards=int(saved.get("bloom_shards") or self.config.bloom_shards),
                m_bits_per_shard=int(
                    saved.get("bloom_bits") or self.config.bloom_bits_per_shard
                ),
                k_hashes=saved.get("bloom_k"),
            )
            shards = self.store.read_table("seen_shards") if committed else None
            if shards is not None:
                if "bloom_shards" not in saved:
                    # legacy checkpoint (geometry not yet persisted): a
                    # probe under a changed n_shards keys the frontier
                    # by a different pmod and silently yields false
                    # negatives — the m_bits row check cannot catch it,
                    # and the committed rows cannot prove what n_shards
                    # produced them (sparse crawls leave shards empty).
                    # TWO-SIDED guard (ADVICE r3 — the old one-sided
                    # max(shard_id) bound let an INCREASED bloom_shards
                    # resume silently re-key the pmod): the provable
                    # direction still fails hard, and the resume is
                    # accepted only when every configured shard is
                    # present in the committed rows (full population ==
                    # the committed count is exactly n_shards) OR the
                    # operator explicitly asserts the config matches the
                    # original run. The next commit persists the
                    # confirmed geometry, healing the store. Both
                    # aggregates prune the bits column.
                    sid = shards.agg(
                        F.max("shard_id").alias("mx"),
                        F.countDistinct("shard_id").alias("k"),
                    ).first()
                    if sid["mx"] is not None and sid["mx"] >= self.bloom.n_shards:
                        raise ValueError(
                            f"bloom geometry mismatch on resume: committed "
                            f"seen_shards has shard_id {sid['mx']} but config "
                            f"bloom_shards={self.bloom.n_shards}; this "
                            "checkpoint predates geometry persistence — set "
                            "bloom_shards to the value the crawl was started "
                            "with"
                        )
                    if sid["k"] != self.bloom.n_shards and not self.config.extra.get(
                        "legacy_bloom_geometry_ok"
                    ):
                        raise ValueError(
                            "resuming a checkpoint that predates bloom "
                            f"geometry persistence: {sid['k']} distinct "
                            f"shard(s) committed but bloom_shards="
                            f"{self.bloom.n_shards} configured — the store "
                            "cannot verify the config matches the original "
                            "run, and a mismatch silently re-keys the shard "
                            "pmod (false negatives -> duplicate fetches). "
                            "Set extra['legacy_bloom_geometry_ok']=True "
                            "only if this is the exact config the crawl "
                            "was started with"
                        )
                self.bloom.set_state(shards)
        # register the bucketed physical layout BEFORE any write (seed
        # commit included): a committed spec wins over config, exactly
        # like bloom geometry, so resume never mixes bucket counts
        if not self.config.extra.get("unbucketed_store"):
            n_b = (
                self.bloom.n_shards
                if self.bloom is not None
                else int(self.config.state_buckets)
            )
            self.store.set_bucket_spec("frontier", "url_fp", n_b)
            self.store.set_bucket_spec("seen", "url_fp", n_b)
            if self.bloom is not None:
                self.store.set_bucket_spec(
                    "seen_shards", "shard_id", self.bloom.n_shards
                )
        if committed and "seeds" in saved:
            return saved["seeds"], saved["next_round"]

        # fresh start — possibly over a store a frontier STREAM already
        # initialized (committed rounds, no engine state): keep its
        # rounds and continue the shared round numbering
        seed_round = int(saved.get("next_round", (max(committed) + 1) if committed else 0))
        state = {
            s["name"]: {"count": int(s["count"]), "scheduled": 0, "priority": int(s.get("priority", 0))}
            for s in seeds
        }
        # seed commit: the seed frontier (so resume replays exactly)
        seed_frontier = self.spark.createDataFrame(
            [
                (
                    s["name"],
                    s["url"],
                    None,
                    None,
                    "listing",
                    0,
                    int(s.get("priority", 0)),
                    seed_round,
                    0,
                    i,
                )
                for i, s in enumerate(seeds)
            ],
            FRONTIER_SCHEMA,
        )
        seed_frontier = seed_frontier.withColumn(
            "url_fp", F.xxhash64("url")
        ).withColumn("host", F.parse_url("url", F.lit("HOST")))
        self.store.commit_round(
            seed_round,
            {"frontier": seed_frontier.select(*_frontier_cols())},
            {
                **saved,
                "seeds": state,
                "next_round": seed_round + 1,
                **self._bloom_state(),
            },
        )
        return state, seed_round + 1

    def _bloom_state(self) -> dict:
        """Seen-filter identity persisted with every commit (k and the
        shard geometry for bloom; bucket geometry for cuckoo) so a
        resume can never reinterpret committed shard rows under a
        different geometry — or the other filter KIND (each kind's keys
        are None under the other, which is what the scope-flip guard in
        ``_init_or_resume`` checks)."""
        none = {
            "bloom_k": None,
            "bloom_shards": None,
            "bloom_bits": None,
            "cuckoo_shards": None,
            "cuckoo_buckets": None,
        }
        if self.bloom is None:
            return none
        if self.config.dedup_scope == "global_cuckoo":
            return {
                **none,
                "cuckoo_shards": self.bloom.n_shards,
                "cuckoo_buckets": self.bloom.n_buckets,
            }
        return {
            **none,
            "bloom_k": self.bloom.k,
            "bloom_shards": self.bloom.n_shards,
            "bloom_bits": self.bloom.m_bits,
        }

    _PENDING_ORDER = ["discovery_round", "parent_fp", "discovery_pos"]

    def _pending(self) -> DataFrame | None:
        colocated = self._pending_colocated()
        if colocated is not None:
            return colocated
        # fallback (legacy un-bucketed store, or layout/geometry that
        # cannot co-locate): the shuffle shape — probe/anti-join
        # exchanges the accumulated frontier on url_fp every round
        frontier = self.store.read_table("frontier")
        if frontier is None:
            return None
        # drop already-seen urls FIRST (bloom probe / anti-join), THEN
        # dedup duplicate discoveries: late in a crawl most of the
        # frontier is seen, so the dedup window runs over the small
        # pending remainder, not the whole table
        pending = frontier
        seen = self.store.read_table("seen")
        if (
            self.config.dedup_scope in ("global_bloom", "global_cuckoo")
            and self.bloom
            and self.bloom.has_state()
        ):
            pending = self.bloom.probe(pending).filter(~F.col("maybe_seen")).drop(
                "maybe_seen"
            )
        elif seen is not None:
            pending = anti_join_unseen(pending, seen)
        return first_seen_dedup(pending, ["url_fp"], self._PENDING_ORDER)

    def _pending_colocated(self) -> DataFrame | None:
        """The zero-shuffle pending derivation over the bucketed store
        layout (Range -> MapInPandas; see ``colocated_pending``). None
        when the layout cannot co-locate — caller falls back to the
        shuffle path."""
        fb = self.store.bucket_files("frontier")
        if fb is None:
            return None
        n_b, f_files = fb
        kwargs: dict = {}
        if self.config.dedup_scope == "global_bloom":
            if self.bloom is not None and self.bloom.has_state():
                sb = self.store.bucket_files("seen_shards")
                if sb is None or sb[0] != n_b or n_b != self.bloom.n_shards:
                    return None  # bucket b must hold exactly shard b
                kwargs = {
                    "shard_files": sb[1],
                    "m_bits": self.bloom.m_bits,
                    "k": self.bloom.k,
                }
        elif self.config.dedup_scope == "global_cuckoo":
            if self.bloom is not None and self.bloom.has_state():
                sb = self.store.bucket_files("seen_shards")
                if sb is None or sb[0] != n_b or n_b != self.bloom.n_shards:
                    return None  # bucket b must hold exactly shard b
                kwargs = {
                    "cuckoo_files": sb[1],
                    "cuckoo_n_buckets": self.bloom.n_buckets,
                }
        else:
            if self.store.read_manifest()["tables"].get("seen"):
                sb = self.store.bucket_files("seen")
                if sb is None or sb[0] != n_b:
                    return None
                kwargs = {"seen_files": sb[1]}
        from pyspark.sql.types import StructType

        return colocated_pending(
            self.spark,
            StructType.fromDDL(FRONTIER_SCHEMA),
            n_b,
            f_files,
            self._PENDING_ORDER,
            **kwargs,
        )

    def _run_round(self, rnd: int, state: dict) -> bool:
        cfg = self.config
        import time as _time

        _prof = bool(cfg.extra.get("profile"))
        _t = {"last": _time.perf_counter()}

        def mark(label: str) -> None:
            if _prof:
                now = _time.perf_counter()
                print(f"    [r{rnd}] {label}: {now - _t['last']:.2f}s", flush=True)
                _t["last"] = now

        pending = self._pending()
        if pending is None:
            return False

        pending = pending.cache()  # read once; reused by gate + exclusion

        # politeness: robots + per-host crawl-delay budget; robots-hit
        # rows go straight to seen (state EXCLUDED) so they never
        # linger. The disallow test is a broadcast-joined flag column,
        # so allowed/excluded are two filters over ONE cached scan —
        # no exceptAll (which shuffled both sides every round).
        if self._has_robots:
            flagged = robots_flag(pending, self.hosts_df)
            polite = flagged.filter(~F.col("disallowed")).drop("disallowed")
            excluded = flagged.filter(F.col("disallowed")).select("url_fp")
        else:
            polite = pending.join(F.broadcast(self.hosts_df), on="host", how="left")
            excluded = None
        # cache the round's working set: every downstream consumer
        # (budget agg, seen delta, fetch input, commit) would otherwise
        # re-run the whole pending scan + windows — measured 5-7x
        # recompute before caching (bench: 7 -> 40+ urls/s after)
        gated = per_host_budget(
            polite,
            round_budget_ms=cfg.round_budget_ms,
            default_per_round=cfg.per_host_per_round,
            salt_buckets=cfg.host_salt_buckets,
        ).cache()

        # per-seed remaining ad budget (listing fetches are not counted —
        # the reference counts only ad downloads)
        limits = [
            (n, s["count"] - s["scheduled"], s["scheduled"])
            for n, s in state.items()
        ]
        ads_base = gated.filter(F.col("kind") == "ad")
        if len(limits) <= 64:
            # literal-map lookup instead of createDataFrame + broadcast
            # join: the join cost a parallelize job + BroadcastExchange
            # EVERY round (stage-profile class eff 0.43 at 2v8 — pure
            # per-round fixed cost). The maps are plan literals: no job,
            # no exchange, same semantics (a name missing from state
            # yields null remaining -> row filtered, like the inner join).
            # CAP AT 64: GetMapValue on a literal map is a LINEAR key
            # scan per row (no hash), so two lookups x K seeds x M ad
            # rows is O(2KM) string compares — at 512 seeds that beats
            # the join's per-round fixed cost only for toy row counts;
            # the broadcast hash join stays O(1)/row for wide seed lists
            rem_m = F.create_map(
                *[F.lit(v) for n, r, _b in limits for v in (n, r)]
            )
            seq_m = F.create_map(
                *[F.lit(v) for n, _r, b in limits for v in (n, b)]
            )
            ads_base = ads_base.withColumn(
                "remaining", rem_m[F.col("name")].cast("long")
            ).withColumn("base_seq", seq_m[F.col("name")].cast("long"))
        else:  # a seed list this wide belongs in a distributed join
            limits_df = self.spark.createDataFrame(
                limits, "name string, remaining long, base_seq long"
            )
            ads_base = ads_base.join(F.broadcast(limits_df), "name")
        # url_fp final tie-break: (priority, round, parent, pos) is not
        # total when one host's pages collide — see per_host_budget
        w_seed = Window.partitionBy("name").orderBy(
            F.col("priority").desc(), "discovery_round", "parent_fp",
            "discovery_pos", "url_fp",
        )
        ads_sched = (
            ads_base
            .withColumn("seed_rank", F.row_number().over(w_seed) - 1)
            .filter(F.col("seed_rank") < F.col("remaining"))
            .withColumn("seq", F.col("base_seq") + F.col("seed_rank"))
        ).cache()
        listings_sched = gated.filter(F.col("kind") == "listing")

        # ---- fetch listing pages; discover ad links + next_page links
        listing_in = listings_sched.select(
            "name", F.col("url").alias("base_url"), F.lit(rnd).alias("round"),
            "url_fp", "depth", "priority",
        )
        # spread the fetch fan-out by the FULL url hash — per-URL
        # granularity both balances partitions (hashing a quantized
        # salt, pmod(h, 64), into 24 partitions is balls-into-bins
        # over 64 values: max bin ~2x mean — event-log profile showed
        # a 72.5s max task vs 32.5s mean on the ad-fetch stage) and
        # spreads hot hosts perfectly (every URL is independent in the
        # fetch UDF; nothing caches per-host state).
        # NB: EXPLICIT partition count — without it AQE coalesces the
        # pre-UDF shuffle by byte size (~100MB of URLs -> 2-4 tasks) and
        # the expensive fetch UDF runs nearly serial (measured 40% CPU
        # at 32 cores); AQE can't see Python CPU cost behind a shuffle.
        # 3x slots: CPU-heavy UDF stages want small tasks so stragglers
        # don't cap the stage at the slowest of exactly-#cores tasks
        n_fetch = 3 * int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        listing_in = listing_in.repartition(n_fetch, F.xxhash64("base_url"))
        fetched = fetch_listings(
            listing_in.select("name", "base_url", "round"),
            self._listing_bc,
            synth_conf=self._synth_conf,
        ).join(
            listing_in.select(
                F.col("base_url"), "url_fp", "depth", "priority"
            ),
            "base_url",
        )
        ad_disc = (
            fetched.select(
                "name", "base_url", "depth", "priority",
                F.col("url_fp").alias("parent_fp"),
                F.posexplode("ads").alias("discovery_pos", "href"),
            )
            .withColumn("url", canonicalize_modern(F.col("href"), F.col("base_url")))
            .withColumn("kind", F.lit("ad"))
        )
        next_disc = (
            fetched.filter(F.col("next_page").isNotNull())
            .select(
                "name", "base_url", "depth", "priority",
                F.col("url_fp").alias("parent_fp"),
                F.col("next_page").alias("href"),
            )
            .withColumn("discovery_pos", F.lit(-1))  # pagination first
            .withColumn("url", canonicalize_modern(F.col("href"), F.col("base_url")))
            .withColumn("kind", F.lit("listing"))
        )
        discovered = (
            ad_disc.unionByName(next_disc)
            .withColumn("url_fp", F.xxhash64("url"))
            .withColumn("host", F.parse_url("url", F.lit("HOST")))
            .withColumn("depth", F.col("depth") + 1)
            .withColumn("discovery_round", F.lit(rnd))
            .select(*_frontier_cols())
        )
        discovered = first_seen_dedup(
            discovered, ["url_fp"], ["parent_fp", "discovery_pos"]
        ).cache()  # one listing-fetch execution feeds frontier + count

        # ---- fetch + parse scheduled ad pages
        ad_in = ads_sched.select(
            "name", F.lit(rnd).alias("round"),
            F.col("seed_rank").cast("int").alias("pos"), "seq", "url",
        ).repartition(  # explicit count + full-hash spread: see n_fetch comment
            n_fetch, F.xxhash64("url")
        )
        # results + fetch_log live in ONE written table ("parsed"):
        # one write job per round instead of two; readers project out
        # their columns (column pruning makes the log view cheap)
        # store_payload_bytes=False: pixels + phash still computed in
        # the workers (the fetch/decode/hash work), but bytes are never
        # encoded nor shipped through Arrow — metadata-only sink
        parsed = with_lineage(
            fetch_parse_ads(
                ad_in,
                self._ads_bc,  # None -> synthetic-server mode
                image_seed=self.graph.image_seed,
                n_hosts=self.graph.n_hosts,
                with_payload=cfg.with_payload,
                payload_bytes=cfg.store_payload_bytes,
            )
        )

        # ---- seen delta = everything scheduled this round + robots-
        # excluded rows (they must not stay pending forever).
        # NO distinct(): the three parts are disjoint projections of
        # `pending`, which is already unique per url_fp (first_seen_
        # dedup) — listings/ads split on kind, excluded split on the
        # robots flag; and a fp enters seen at most once across rounds
        # (seen rows never return to pending). A distinct here was one
        # full shuffle of the round's frontier for nothing.
        #
        # Driver-side budget/progress accounting rides an OBSERVE node
        # on this union instead of a separate collect job (the r3
        # per-round stats job was 1-2 jobs of the ~10s/round fixed cost
        # holding 2->8 scaling at 0.79). Placement is deliberate: the
        # node sits directly under the `seen` parquet WRITE — a sink
        # consumes every input row, so the metrics are complete; an
        # observe under a JOIN is unreliable (SMJ early-exit /
        # AQE-empty-propagation skip rows — measured in round 4,
        # operators/similarity.py docstring).
        names = list(state.keys())
        obs = Observation()
        sched_tagged = listings_sched.select(
            "url_fp", "name", F.lit("listing").alias("__k")
        ).unionByName(ads_sched.select("url_fp", "name", F.lit("ad").alias("__k")))
        is_ad = F.col("__k") == "ad"
        sched_tagged = sched_tagged.observe(
            obs,
            F.sum((~is_ad).cast("long")).alias("n_listings"),
            *[
                F.sum((is_ad & (F.col("name") == n)).cast("long")).alias(f"s{i}")
                for i, n in enumerate(names)
            ],
        )
        seen_delta = sched_tagged.select("url_fp")
        if excluded is not None:
            seen_delta = seen_delta.unionByName(excluded)

        # NO coalesce on any delta here: coalesce is a narrow dependency
        # that collapses the producing pipeline itself (fetch UDF,
        # canonicalize+dedup window) to that many tasks — measured 21s
        # frontier writes at 32 cores. Compaction merges small files.
        use_bloom = (
            cfg.dedup_scope in ("global_bloom", "global_cuckoo")
            and self.bloom is not None
        )

        # counts resolved from the observation once the seen write has
        # run; memoized; fallback to one count job in the zero-task
        # corner (an observation over a plan no task executed). The
        # seen-write-completed event gates the observation get: if the
        # write never ran, the fallback is immediate, not a 120 s wait.
        counts: dict = {}
        seen_written = threading.Event()

        def _counts() -> dict:
            if not counts:
                m = _observed(obs, fired=seen_written.is_set())
                if m is not None and "n_listings" in m:
                    counts["ads"] = {
                        n: int(m.get(f"s{i}") or 0) for i, n in enumerate(names)
                    }
                    counts["listings"] = int(m.get("n_listings") or 0)
                else:  # fallback: pay one count job
                    rows = (
                        ads_sched.groupBy("name")
                        .agg(F.count("*").alias("n"))
                        .collect()
                    )
                    counts["ads"] = {r["name"]: int(r["n"]) for r in rows}
                    counts["listings"] = listings_sched.count()
            return counts

        def _shards_tbl():
            # Bloom shard state is committed MERGED (one row per shard)
            # every round: the round's delta rows (built per shard in
            # executors, never on the driver) are OR-folded with the
            # previous committed state inside the same distributed
            # write job. Probe tasks then read exactly one row per
            # shard instead of O(rounds) delta rows.
            c = _counts()
            round_progressed = any(c["ads"].values()) or c["listings"] > 0
            if not use_bloom or not round_progressed:
                return None
            delta = self.bloom.build_deltas(seen_delta)
            prev = self.bloom.to_df()
            if prev is None:
                return delta
            stacked = prev.unionByName(delta)
            if cfg.dedup_scope == "global_cuckoo":
                from olx_spark.operators.cuckoo import merge_cuckoo_deltas

                return merge_cuckoo_deltas(stacked, self.bloom.n_buckets)
            return merge_shard_deltas(stacked)

        # `seen` goes FIRST: its write both materializes the shared
        # cached prefix (pending -> gated -> scheduled) and fires the
        # observation, so the LAZY later entries skip their whole plans
        # — empty UDF pipelines included — on rounds the observed
        # counts prove empty (an empty 96-partition mapInPandas write
        # still costs seconds of task scheduling; a drained final round
        # must cost ~nothing)
        tables = {
            "seen": seen_delta,
            "parsed": lambda: parsed if any(_counts()["ads"].values()) else None,
            "frontier": lambda: discovered if _counts()["listings"] else None,
            "seen_shards": _shards_tbl,
        }

        def _finalize() -> dict:
            c = _counts()
            for n, s in state.items():
                s["scheduled"] += c["ads"].get(n, 0)
            return {
                "seeds": state,
                "next_round": rnd + 1,
                **self._bloom_state(),
            }

        self.store.commit_round(
            rnd,
            tables,
            {},
            replace={"seen_shards"},
            finalize_state=_finalize,
            on_written=lambda name: seen_written.set() if name == "seen" else None,
            # parsed/frontier/seen_shards are mutually independent
            # (disjoint inputs off the shared cached prefix): their
            # write jobs run overlapped — the per-round serial tail
            # the short high-core scaling legs were paying (ad-fetch,
            # listing-fetch and shard-merge jobs previously queued
            # one after another even when slots were free)
            parallel_after="seen",
        )
        progressed = sum(_counts()["ads"].values()) > 0 or _counts()["listings"] > 0
        if use_bloom and progressed:
            # next round's probe cogroups against the COMMITTED rows
            # (parquet-backed; delta rows per shard OR-merged in-task)
            self.bloom.set_state(self.store.read_table("seen_shards"))
        mark("commit (seen+parsed+frontier writes + observed stats)")
        for df in (pending, gated, ads_sched, discovered):
            df.unpersist()
        # bound per-round read fan-in: merge accumulated deltas so a
        # long crawl's pending-scan opens O(1) dirs, not O(rounds)
        if cfg.compact_every and rnd % cfg.compact_every == 0 and rnd > 0:
            self.compact_now()
        return progressed

    def compact_now(self) -> None:
        """Merge accumulated state deltas. The frontier is compacted
        down to the PENDING set: subtract the exact seen table
        (committed in both dedup modes) while dedup-merging deltas.
        Without the subtraction the per-round pending scan re-probes
        every URL ever discovered, every round — O(total frontier)
        instead of O(pending). Exact anti-join is safe under
        global_bloom too: any row it removes would probe maybe_seen
        anyway (the filter has no false negatives)."""
        seen_now = self.store.read_table("seen")
        self.store.compact_table(
            "frontier",
            lambda df: first_seen_dedup(
                anti_join_unseen(df, seen_now) if seen_now is not None else df,
                ["url_fp"],
                ["discovery_round", "parent_fp", "discovery_pos"],
            ),
        )
        self.store.compact_table("seen", lambda df: df.distinct())
        # seen_shards needs no compaction (every round commits the
        # OR-merged one-row-per-shard state, replace semantics) — but
        # its superseded full copies must be RECLAIMED, or disk grows
        # O(rounds x shard-state size) (12 GB/round at 10^10). Safe
        # point: every per-round plan was consumed at its commit, and
        # all live tables are re-read from the fresh manifest.
        self.store.vacuum()


def _frontier_cols():
    return [
        "name", "url", "url_fp", "host", "kind", "depth",
        "priority", "discovery_round", "parent_fp", "discovery_pos",
    ]
