"""Scaled-mode engine invariants: global dedup (exact + Bloom), robots,
politeness budgets, per-seed count budgets, BFS discovery."""

import pytest
from pyspark.sql import functions as F

from olx_spark.fixtures import make_crawl_graph
from olx_spark.plans.crawl import CrawlConfig
from olx_spark.plans.scaled import ScaledCrawlEngine


@pytest.fixture(scope="module")
def graph():
    # hot_host_factor=3 keeps the BFS ~9 rounds (test wall-time budget)
    return make_crawl_graph(n_hosts=4, pages_per_host=3, hot_host_factor=3)


def _run(spark, graph, tmp_path_factory, scope, tag, **kw):
    cfg = CrawlConfig(
        mode="scaled",
        dedup_scope=scope,
        checkpoint_dir=str(tmp_path_factory.mktemp(f"scaled_{tag}")),
        max_rounds=30,
        bloom_shards=8,
        bloom_bits_per_shard=1 << 17,
        with_payload=False,
        **kw,
    )
    eng = ScaledCrawlEngine(spark, graph, cfg)
    seeds = [dict(s, count=60) for s in graph.seeds]
    eng.run(seeds)
    return eng


@pytest.fixture(scope="module")
def exact_run(spark, graph, tmp_path_factory):
    return _run(spark, graph, tmp_path_factory, "global_exact", "exact")


@pytest.fixture(scope="module")
def bloom_run(spark, graph, tmp_path_factory):
    return _run(spark, graph, tmp_path_factory, "global_bloom", "bloom")


def test_no_url_fetched_twice(exact_run):
    log = exact_run.fetch_log().collect()
    urls = [r["url"] for r in log]
    assert len(urls) == len(set(urls)), "global dedup violated"


def test_robots_respected(exact_run, graph):
    from urllib.parse import urlsplit

    disallow = {h["host"]: h["robots_disallow"] for h in graph.hosts}
    for r in exact_run.fetch_log().collect():
        u = urlsplit(r["url"])
        for pref in disallow.get(u.netloc, []):
            assert not u.path.startswith(pref), f"robots violation: {r['url']}"


def test_seed_count_budget(exact_run, graph):
    counts = (
        exact_run.results()
        .groupBy("name")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    for r in counts:
        assert r["n"] <= 60


def test_bfs_follows_pagination(exact_run, graph):
    """Unlike the reference (never follows next_page), scaled mode must
    reach ads on page>=1 of some host."""
    from urllib.parse import urlsplit

    by_path = {(urlsplit(a["url"]).netloc, a["path"]): a for a in graph.ad_pages}
    page0_paths = set()
    for lp in graph.listing_pages:
        if lp["page_idx"] == 0:
            for h in lp["ad_hrefs"]:
                page0_paths.add((lp["host"], h))
    fetched = {
        (urlsplit(r["url"]).netloc, urlsplit(r["url"]).path)
        for r in exact_run.fetch_log().collect()
    }
    deep = [k for k in fetched if k in by_path and k not in page0_paths]
    assert deep, "no ads beyond page 0 were crawled"


def test_results_parse_matches_store(exact_run, graph):
    rows = exact_run.results().limit(50).collect()
    assert rows
    for r in rows:
        ad = graph.store.get_ad(r["href"])
        assert ad is not None
        assert r["title"] == ad["title"]
        assert r["description"] == ad["title"]
        assert r["price"] == ad["price"]


def test_bloom_matches_exact_seen_set(exact_run, bloom_run):
    """With generously-sized shards the bloom run fetches the same URL
    set as the exact run (no false negatives; fp rate ~0)."""
    exact = {r["url"] for r in exact_run.fetch_log().collect()}
    bloom = {r["url"] for r in bloom_run.fetch_log().collect()}
    assert bloom == exact


def test_bloom_no_refetch(bloom_run):
    urls = [r["url"] for r in bloom_run.fetch_log().collect()]
    assert len(urls) == len(set(urls))


def test_compaction_preserves_crawl(spark, graph, tmp_path_factory, exact_run):
    """Aggressive delta compaction (every 2 rounds) + vacuum must not
    change the fetched set."""
    eng = _run(
        spark, graph, tmp_path_factory, "global_exact", "compact",
        compact_every=2,
    )
    eng.store.vacuum()
    a = {r["url"] for r in eng.fetch_log().collect()}
    b = {r["url"] for r in exact_run.fetch_log().collect()}
    assert a == b
    # resumability intact after compaction+vacuum: seen table readable
    assert eng.seen_fps().count() > 0


def test_compaction_makes_frontier_the_pending_set(spark, graph, tmp_path_factory, exact_run):
    """Compaction subtracts ``seen`` from the frontier, so after it the
    stored frontier table IS the pending set — the per-round pending
    scan is O(pending), not O(all-ever-discovered)."""
    eng = _run(spark, graph, tmp_path_factory, "global_exact", "compact_pending")
    before = eng.store.read_table("frontier").count()
    eng.compact_now()
    pending = eng._pending()
    n_pending = pending.count() if pending is not None else 0
    after = eng.store.read_table("frontier").count()
    assert after == n_pending
    # a finished crawl's frontier is almost entirely seen: the compacted
    # table must actually have shrunk, not just been rewritten
    assert after < before
    # and compaction must not have changed what is pending
    a = {r["url"] for r in eng.fetch_log().collect()}
    b = {r["url"] for r in exact_run.fetch_log().collect()}
    assert a == b


def test_vacuum_reclaims_superseded_shard_state(spark, graph, tmp_path_factory, exact_run):
    """seen_shards commits a full merged copy every round (replace
    semantics): periodic compaction+vacuum must reclaim the superseded
    copies at table-subdir granularity — whole-round-dir vacuum cannot,
    because the round dirs' parsed/frontier tables stay live — or disk
    grows O(rounds x shard-state size) (12 GB/round at 10^10)."""
    import glob
    import os

    eng = _run(
        spark, graph, tmp_path_factory, "global_bloom", "vacuum",
        compact_every=2,
    )
    d = eng.config.checkpoint_dir
    n_rounds = len(eng.store.committed_rounds())
    shard_dirs = glob.glob(os.path.join(d, "*", "seen_shards"))
    # copies written since the last vacuum remain; everything older is gone
    assert len(shard_dirs) < n_rounds - 2
    # the one referenced copy is intact and the crawl result unchanged
    assert eng.store.read_table("seen_shards").count() > 0
    a = {r["url"] for r in eng.fetch_log().collect()}
    b = {r["url"] for r in exact_run.fetch_log().collect()}
    assert a == b


def test_partial_failure_keeps_round_and_rows(spark, tmp_path_factory):
    """Reference error semantics (OlxServer.scala:56-59): one failed ad
    fetch kills the whole job fiber, keeping only already-inserted rows.
    The engine is strictly more robust by design: failed fetches land in
    fetch_log with per-row status=NOT_FOUND, the round still commits,
    and every OTHER ad of the same round is parsed normally."""
    g = make_crawl_graph(n_hosts=2, pages_per_host=2, hot_host_factor=1)
    # 404 every 5th ad page: drop it from the "server" after the links
    # to it were already published on listing pages
    killed = sorted(g.store.ads)[::5]
    for k in killed:
        del g.store.ads[k]
    assert killed
    cfg = CrawlConfig(
        mode="scaled",
        dedup_scope="global_exact",
        checkpoint_dir=str(tmp_path_factory.mktemp("scaled_404")),
        max_rounds=30,
        with_payload=False,
    )
    eng = ScaledCrawlEngine(spark, g, cfg)
    eng.run([dict(s, count=60) for s in g.seeds])
    log = eng.fetch_log().collect()
    by_status: dict[str, set] = {}
    for r in log:
        by_status.setdefault(r["status"], set()).add(r["url"])
    from urllib.parse import urlsplit

    not_found = by_status.get("NOT_FOUND", set())
    assert not_found, "no NOT_FOUND rows recorded"
    assert all((urlsplit(u).netloc, urlsplit(u).path) in set(killed) for u in not_found)
    # rounds committed: OK rows of the same run are parsed and persisted
    ok_rows = eng.results().filter(F.col("title").isNotNull()).count()
    assert ok_rows == len(by_status.get("OK", set()))
    assert ok_rows > 0
    # every NOT_FOUND row carries lineage like any other row
    assert all(
        r["partition_id"] is not None and r["elapsed_ms"] >= 0 for r in log
    )


def test_politeness_budget_respected(spark, graph, tmp_path_factory):
    eng = _run(
        spark, graph, tmp_path_factory, "global_exact", "polite",
        round_budget_ms=1000, per_host_per_round=5,
    )
    from urllib.parse import urlsplit

    delay = {h["host"]: h["crawl_delay_ms"] for h in graph.hosts}
    per = {}
    for r in eng.fetch_log().collect():
        host = urlsplit(r["url"]).netloc
        per.setdefault((r["round"], host), 0)
        per[(r["round"], host)] += 1
    for (rnd, host), n in per.items():
        d = delay.get(host, 0)
        budget = max(1, 1000 // d) if d else 5
        # listing fetches share the host budget; fetch_log records ads only
        assert n <= budget, f"round {rnd} host {host}: {n} > {budget}"


def test_observed_fallback_is_instant_when_action_never_ran(spark):
    """VERDICT r4 #4: an observation whose plan no action ever executed
    must fall back immediately (fired=False short-circuit), not burn a
    120 s timeout thread making the round look hung."""
    import time

    from pyspark.sql import Observation

    from olx_spark.plans.scaled import _observed

    obs = Observation()
    spark.range(5).observe(obs, F.count("*").alias("n"))  # never acted on
    t0 = time.perf_counter()
    assert _observed(obs, fired=False) is None
    assert time.perf_counter() - t0 < 1.0


# ----------------------------------------------------- bucketed layout
def _crawl_rows(eng):
    return sorted(
        (r["name"], r["seq"], r["href"]) for r in eng.results().collect()
    )


def test_bucketed_layout_colocated_pending_no_exchange(
    spark, graph, tmp_path_factory
):
    """VERDICT r4 #1 done-criteria: frontier/seen deltas land in
    pmod(url_fp, N) bucket subdirs, and the per-round pending
    derivation (bloom probe + first-seen dedup) compiles to
    Range -> MapInPandas with NO Exchange anywhere — the
    storage-partitioned-join shape, vs the old full frontier shuffle."""
    import os

    eng = _run(spark, graph, tmp_path_factory, "global_bloom", "buck_plan")
    d = eng.config.checkpoint_dir
    rdirs = sorted(e for e in os.listdir(d) if e.startswith("r"))
    frontier_dirs = [
        os.path.join(d, r, "frontier")
        for r in rdirs
        if os.path.isdir(os.path.join(d, r, "frontier"))
    ]
    assert frontier_dirs
    for fd in frontier_dirs:
        subs = [e for e in os.listdir(fd) if e.startswith("__b=")]
        assert subs, f"unbucketed frontier delta: {fd}"
    shard_dirs = [
        os.path.join(d, r, "seen_shards")
        for r in rdirs
        if os.path.isdir(os.path.join(d, r, "seen_shards"))
    ]
    assert any(
        [e for e in os.listdir(sd) if e.startswith("__b=")] for sd in shard_dirs
    )
    pending = eng._pending()
    plan = pending._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan
    assert eng._pending_colocated() is not None


@pytest.mark.parametrize("scope", ["global_bloom", "global_exact"])
def test_bucketed_results_equal_unbucketed(spark, graph, tmp_path_factory, scope):
    """The layout is physical only: crawl order, seen set, and results
    must be IDENTICAL with and without the bucketed store."""
    eng_b = _run(spark, graph, tmp_path_factory, scope, f"buck_{scope}")
    eng_u = _run(
        spark,
        graph,
        tmp_path_factory,
        scope,
        f"unbuck_{scope}",
        extra={"unbucketed_store": True},
    )
    assert eng_u._pending_colocated() is None  # layout really off
    assert _crawl_rows(eng_b) == _crawl_rows(eng_u)
    seen_b = sorted(r["url_fp"] for r in eng_b.seen_fps().distinct().collect())
    seen_u = sorted(r["url_fp"] for r in eng_u.seen_fps().distinct().collect())
    assert seen_b == seen_u


def test_legacy_unbucketed_store_heals_via_compaction(
    spark, graph, tmp_path_factory, exact_run
):
    """A legacy (pre-bucketing) checkpoint must resume on the fallback
    shuffle path with IDENTICAL results, and a compaction must MIGRATE
    the tables onto the registered bucket layout (bucket subdirs on
    disk); a drained frontier prunes instead of publishing an empty,
    schema-less bucketed dir."""
    import os

    from olx_spark.plans.crawl import CrawlConfig
    from olx_spark.plans.scaled import ScaledCrawlEngine

    d = str(tmp_path_factory.mktemp("legacy_heal"))
    base = dict(
        mode="scaled",
        dedup_scope="global_exact",
        checkpoint_dir=d,
        with_payload=False,
        state_buckets=8,
        compact_every=0,
    )
    seeds = [dict(s, count=60) for s in graph.seeds]
    # legacy partial crawl: 3 rounds, no bucketing
    legacy = ScaledCrawlEngine(
        spark,
        graph,
        CrawlConfig(**base, max_rounds=3, extra={"unbucketed_store": True}),
    )
    legacy.run(seeds)
    # resume with bucketing enabled: mixed layout -> fallback path,
    # crawl completes with results identical to the reference run
    eng = ScaledCrawlEngine(spark, graph, CrawlConfig(**base, max_rounds=30))
    eng.run(seeds)
    assert eng.store.bucket_spec("frontier") is not None
    assert eng._pending_colocated() is None  # mixed/legacy -> fallback
    assert _crawl_rows(eng) == _crawl_rows(exact_run)
    eng.compact_now()
    n, files = eng.store.bucket_files("seen")
    assert n == 8 and files, "compaction did not migrate seen onto buckets"
    assert _crawl_rows(eng) == _crawl_rows(exact_run)
    seen_b = sorted(r["url_fp"] for r in eng.seen_fps().distinct().collect())
    seen_r = sorted(
        r["url_fp"] for r in exact_run.seen_fps().distinct().collect()
    )
    assert seen_b == seen_r


def test_bucket_spec_committed_wins_over_config(spark, tmp_path_factory):
    """Like bloom geometry: a resumed run with a changed bucket count
    must adopt the COMMITTED spec, never mix layouts in one table."""
    from olx_spark.plans.snapshot import SnapshotStore

    d = str(tmp_path_factory.mktemp("buckspec"))
    st = SnapshotStore(d, spark)
    assert st.set_bucket_spec("t", "k", 8) == {"col": "k", "n": 8}
    st.commit_round(
        0, {"t": spark.range(100).select(F.col("id").alias("k"))}, {"next_round": 1}
    )
    st2 = SnapshotStore(d, spark)
    assert st2.set_bucket_spec("t", "k", 32) == {"col": "k", "n": 8}
    st2.commit_round(
        1, {"t": spark.range(100).select(F.col("id").alias("k"))}, {"next_round": 2}
    )
    n, files = st2.bucket_files("t")
    assert n == 8 and set(files) <= set(range(8))
    assert st2.read_table("t").count() == 200


# --------------------------------------------------------- cuckoo scope
@pytest.fixture(scope="module")
def cuckoo_run(spark, graph, tmp_path_factory):
    return _run(spark, graph, tmp_path_factory, "global_cuckoo", "cuckoo")


def test_cuckoo_matches_exact(exact_run, cuckoo_run):
    """global_cuckoo is semantics-neutral: same crawl rows + URL set
    as the exact run (no false negatives; fp rate ~1.2e-4)."""
    assert _crawl_rows(cuckoo_run) == _crawl_rows(exact_run)
    a = {r["url"] for r in cuckoo_run.fetch_log().collect()}
    b = {r["url"] for r in exact_run.fetch_log().collect()}
    assert a == b


def test_cuckoo_no_refetch(cuckoo_run):
    urls = [r["url"] for r in cuckoo_run.fetch_log().collect()]
    assert urls and len(urls) == len(set(urls))


def test_cuckoo_colocated_pending_no_exchange(cuckoo_run):
    """The cuckoo scope rides the same bucketed layout: pending is the
    zero-shuffle Range -> MapInPandas shape, no Exchange."""
    assert cuckoo_run._pending_colocated() is not None
    pending = cuckoo_run._pending()
    plan = pending._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan


def test_cuckoo_geometry_persisted_over_changed_config(
    spark, graph, tmp_path_factory, cuckoo_run
):
    """Cuckoo geometry (n_shards, n_buckets) is committed state: resume
    with a changed config keeps the committed geometry (same contract
    as bloom), and the bloom keys are None so a scope flip is
    detectable."""
    saved = cuckoo_run.store.last_state()
    assert saved["cuckoo_shards"] == 8
    assert saved["cuckoo_buckets"] == cuckoo_run.config.cuckoo_buckets_per_shard
    assert saved["bloom_shards"] is None
    cfg = CrawlConfig(
        mode="scaled", dedup_scope="global_cuckoo",
        checkpoint_dir=cuckoo_run.config.checkpoint_dir,
        bloom_shards=16, cuckoo_buckets_per_shard=1 << 12,
        with_payload=False,
    )
    resumed = ScaledCrawlEngine(spark, graph, cfg)
    seeds = [dict(s, count=60) for s in graph.seeds]
    resumed.run(seeds)
    assert resumed.bloom.n_shards == 8
    assert resumed.bloom.n_buckets == cuckoo_run.config.cuckoo_buckets_per_shard
    urls = [r["url"] for r in resumed.fetch_log().collect()]
    assert urls and len(urls) == len(set(urls))


def test_seen_filter_scope_flip_rejected(spark, graph, tmp_path_factory, cuckoo_run, bloom_run):
    """Resuming a cuckoo checkpoint as bloom (or vice versa) must fail
    loudly: both state kinds are opaque bytes of plausible lengths, so
    a flip would silently misread them as the other structure."""
    seeds = [dict(s, count=60) for s in graph.seeds]
    flip_to_bloom = CrawlConfig(
        mode="scaled", dedup_scope="global_bloom",
        checkpoint_dir=cuckoo_run.config.checkpoint_dir,
        bloom_shards=8, bloom_bits_per_shard=1 << 17, with_payload=False,
    )
    with pytest.raises(ValueError, match="global_cuckoo"):
        ScaledCrawlEngine(spark, graph, flip_to_bloom).run(seeds)
    flip_to_cuckoo = CrawlConfig(
        mode="scaled", dedup_scope="global_cuckoo",
        checkpoint_dir=bloom_run.config.checkpoint_dir,
        bloom_shards=8, with_payload=False,
    )
    with pytest.raises(ValueError, match="global_bloom"):
        ScaledCrawlEngine(spark, graph, flip_to_cuckoo).run(seeds)


def test_cuckoo_retire_recrawls_exactly_the_retired_urls(
    spark, graph, tmp_path_factory
):
    """The deletion story end-to-end: retire a batch of fetched ad URLs
    from a finished global_cuckoo crawl, resume with the same seeds,
    and the engine re-fetches EXACTLY the retired URLs (twice in the
    log) while every other URL stays fetched-once."""
    import collections

    eng = _run(spark, graph, tmp_path_factory, "global_cuckoo", "retire")
    log1 = eng.fetch_log().collect()
    keys1 = [(r["name"], r["url"]) for r in log1]
    assert len(keys1) == len(set(keys1))
    retired = sorted(set(keys1))[:8]
    ret_df = spark.createDataFrame(retired, "name string, url string")
    assert eng.retire(ret_df) == len(retired)

    cfg = CrawlConfig(
        mode="scaled", dedup_scope="global_cuckoo",
        checkpoint_dir=eng.config.checkpoint_dir,
        max_rounds=30, bloom_shards=8, with_payload=False,
    )
    eng2 = ScaledCrawlEngine(spark, graph, cfg)
    eng2.run([dict(s, count=60) for s in graph.seeds])
    cnt = collections.Counter((r["name"], r["url"]) for r in eng2.fetch_log().collect())
    rset = set(retired)
    for k, c in cnt.items():
        assert c == (2 if k in rset else 1), (k, c)
    assert all(cnt[k] == 2 for k in rset)


def test_retire_rejected_under_bloom(spark, graph, tmp_path_factory, bloom_run):
    """Bloom cannot delete: retire() must refuse rather than silently
    leave the filter claiming the URL is still seen."""
    ret_df = spark.createDataFrame([("s", "http://x/1")], "name string, url string")
    with pytest.raises(ValueError, match="cannot delete"):
        bloom_run.retire(ret_df)


class TestRevalidation:
    def test_modes_statuses_and_ledger(self, spark):
        from pyspark.sql import functions as F

        from olx_spark.operators.fetch import (
            revalidation_outcomes,
            revalidation_plan,
        )

        due = spark.createDataFrame([(i,) for i in range(1, 7)], "url_fp long")
        cache = spark.createDataFrame(
            [(1, "e1", 101, 500), (2, "e2", 102, 600), (3, "e3", 103, 700)],
            "url_fp long, etag string, payload_fp long, body_bytes long",
        )
        server = spark.createDataFrame(
            [
                (1, "e1", 101, 510),    # unchanged -> 304
                (2, "e9", 202, 620),    # changed -> 200
                # 3 gone -> 404
                (4, "e4", 404_0, 400),  # uncached -> full 200
                (5, "e5", 405_0, 410),
            ],
            "url_fp long, etag string, payload_fp long, body_bytes long",
        )
        got = {
            r["url_fp"]: r.asDict()
            for r in revalidation_outcomes(
                revalidation_plan(due, cache), server
            ).collect()
        }
        assert got[1]["mode"] == "conditional" and got[1]["status"] == 304
        assert got[1]["payload_fp"] == 101 and got[1]["bytes_saved"] == 500
        assert got[1]["bytes_fetched"] == 0
        assert got[2]["status"] == 200 and got[2]["payload_fp"] == 202
        assert got[2]["bytes_saved"] == 0 and got[2]["bytes_fetched"] == 620
        assert got[3]["status"] == 404 and got[3]["payload_fp"] is None
        assert got[4]["mode"] == "full" and got[4]["status"] == 200
        assert got[6]["mode"] == "full" and got[6]["status"] == 404
        # the ledger aggregates trivially
        out = revalidation_outcomes(revalidation_plan(due, cache), server)
        saved = out.agg(F.sum("bytes_saved")).first()[0]
        assert saved == 500
