"""Sources (images table, testdata views) + streaming frontier ingest."""

import json
import os

import pytest
from pyspark.sql import functions as F

from olx_spark.fixtures.images import make_image_corpus
from olx_spark.sources.images_table import (
    images_df_from_rows,
    lookup_image,
    read_images,
    write_images,
)
from olx_spark.sources.testdata import register_views
from conftest import SF_DIR


def test_register_views_and_sql(spark):
    register_views(spark, SF_DIR)
    n = spark.sql("select count(*) as n from lineitem").first()["n"]
    assert n > 1000


def test_images_table_roundtrip(spark, tmp_path):
    rows = make_image_corpus(50, seed=11)
    df = images_df_from_rows(spark, rows)
    path = str(tmp_path / "images")
    write_images(df, path, n_buckets=8)
    back = read_images(spark, path)
    assert back.count() == 50
    got = {r["image_id"]: r for r in back.collect()}
    for r in rows:
        assert bytes(got[r["image_id"]]["bytes"]) == r["bytes"]
        assert got[r["image_id"]]["phash"] == r["phash"]


def test_images_point_lookup_prunes(spark, tmp_path):
    rows = make_image_corpus(50, seed=12)
    path = str(tmp_path / "images")
    write_images(images_df_from_rows(spark, rows), path, n_buckets=8)
    target = rows[17]["image_id"]
    hit = lookup_image(spark, path, target, n_buckets=8)
    got = hit.collect()
    assert len(got) == 1 and got[0]["image_id"] == target
    # partition pruning visible in the plan: bucket filter present
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_streaming_frontier_ingest(spark, tmp_path):
    from olx_spark.plans.snapshot import SnapshotStore
    from olx_spark.streaming.stream import start_frontier_stream

    drop = tmp_path / "drop"
    drop.mkdir()
    recs = [
        {"name": "s", "base_url": "https://h.example/list/?x=1", "href": f"/d/ad/a-{i}/", "priority": 1}
        for i in range(10)
    ] + [  # duplicate hrefs -> must be deduped
        {"name": "s", "base_url": "https://h.example/list/?x=1", "href": "/d/ad/a-0/", "priority": 1}
    ]
    with open(drop / "batch0.json", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    store = SnapshotStore(str(tmp_path / "snap"), spark)
    q = start_frontier_stream(
        spark, str(drop), store, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    frontier = store.read_table("frontier")
    rows = frontier.collect()
    assert len(rows) == 10  # dup removed
    urls = {r["url"] for r in rows}
    assert "https://h.example/d/ad/a-0/" in urls  # urljoin of absolute path
    # second drop with overlapping hrefs -> only new ones appended
    with open(drop / "batch1.json", "w") as f:
        for i in range(5, 15):
            f.write(json.dumps({"name": "s", "base_url": "https://h.example/list/?x=1", "href": f"/d/ad/a-{i}/", "priority": 1}) + "\n")
    q2 = start_frontier_stream(
        spark, str(drop), store, str(tmp_path / "ckpt"), trigger_once=True
    )
    q2.awaitTermination(120)
    assert store.read_table("frontier").count() == 15
    # dedup marker is the stream-level 'enqueued' table, NOT 'seen':
    # writing 'seen' would make the batch engine's frontier-minus-seen
    # anti-join drop every streamed URL before it was fetched
    assert store.read_table("enqueued").count() == 15
    assert store.read_table("seen") is None


def test_streaming_positions_stable_across_partitionings(spark, tmp_path):
    """discovery_pos must be the rank in the explicit (name, url_fp)
    order — identical whatever the file/partition layout of the batch
    (the old int-cast monotonically_increasing_id collided across
    partitions)."""
    from olx_spark.plans.snapshot import SnapshotStore
    from olx_spark.streaming.stream import start_frontier_stream

    recs = [
        {"name": f"s{i % 3}", "base_url": "https://h.example/list/?x=1",
         "href": f"/d/ad/b-{i}/", "priority": 1}
        for i in range(24)
    ]
    runs = []
    for layout, n_files in (("one", 1), ("many", 8)):
        drop = tmp_path / f"drop_{layout}"
        drop.mkdir()
        for fi in range(n_files):
            with open(drop / f"f{fi}.json", "w") as f:
                for r in recs[fi::n_files]:
                    f.write(json.dumps(r) + "\n")
        store = SnapshotStore(str(tmp_path / f"snap_{layout}"), spark)
        q = start_frontier_stream(
            spark, str(drop), store, str(tmp_path / f"ckpt_{layout}"),
            trigger_once=True,
        )
        q.awaitTermination(120)
        rows = store.read_table("frontier").collect()
        runs.append(sorted((r["name"], r["url"], r["discovery_pos"]) for r in rows))
        pos = sorted(r["discovery_pos"] for r in rows)
        assert pos == list(range(len(recs)))  # dense, unique, 0-based
    assert runs[0] == runs[1]


def test_streaming_merges_manifest_state(spark, tmp_path):
    """Streaming into a store shared with the batch engine must MERGE
    its bookkeeping into the manifest state — replacing it destroyed
    seeds/next_round and broke engine resume."""
    from olx_spark.plans.snapshot import SnapshotStore
    from olx_spark.streaming.stream import start_frontier_stream

    store = SnapshotStore(str(tmp_path / "snap"), spark)
    seed_df = spark.createDataFrame([(1,)], "url_fp long")
    engine_state = {"seeds": {"job-a": {"count": 5, "scheduled": 0}}, "next_round": 1}
    store.commit_round(0, {"seen": seed_df}, engine_state)

    drop = tmp_path / "drop"
    drop.mkdir()
    with open(drop / "b.json", "w") as f:
        f.write(json.dumps({"name": "s", "base_url": "https://h.example/l/",
                            "href": "/d/ad/z-1/", "priority": 0}) + "\n")
    q = start_frontier_stream(spark, str(drop), store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    state = store.last_state()
    assert state["seeds"] == engine_state["seeds"]  # preserved
    # the stream took round 1 of the shared sequence, so next_round
    # must ADVANCE past it — a resumed batch engine would otherwise
    # re-commit round 1 and die with "round already committed"
    assert state["next_round"] == 2
    assert store.committed_rounds() == [0, 1]
    assert state["stream_batches"] == [0]


def test_batch_engine_runs_on_stream_initialized_store(spark, tmp_path):
    """Stream-first store (committed rounds, no engine state): the
    batch engine must start fresh over it, CONTINUING the shared round
    numbering instead of KeyError-ing on missing seeds — and the
    streamed URLs must actually get fetched (they sit in frontier, not
    in seen)."""
    import json as _json

    from olx_spark.fixtures import make_crawl_graph
    from olx_spark.plans.crawl import CrawlConfig
    from olx_spark.plans.scaled import ScaledCrawlEngine
    from olx_spark.plans.snapshot import SnapshotStore
    from olx_spark.streaming.stream import start_frontier_stream

    g = make_crawl_graph(n_hosts=2, pages_per_host=2, hot_host_factor=1)
    store_dir = str(tmp_path / "snap")
    store = SnapshotStore(store_dir, spark)
    # stream two ad URLs that exist in the fixture graph, addressed to
    # a real crawl job (budgets join on name — a name no job owns has
    # no download budget, matching the reference's Search-scoped model)
    ads = [a for a in g.ad_pages][:2]
    job = g.seeds[0]["name"]
    drop = tmp_path / "drop"
    drop.mkdir()
    with open(drop / "b.json", "w") as f:
        for a in ads:
            f.write(_json.dumps({
                "name": job, "base_url": f"https://{a['host']}/l/",
                "href": a["path"], "priority": 9,
            }) + "\n")
    q = start_frontier_stream(spark, str(drop), store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert store.committed_rounds() == [0]

    cfg = CrawlConfig(
        mode="scaled", dedup_scope="global_exact",
        checkpoint_dir=store_dir, max_rounds=40, with_payload=False,
    )
    eng = ScaledCrawlEngine(spark, g, cfg)
    eng.run([dict(s, count=10) for s in g.seeds])
    fetched = {r["url"] for r in eng.fetch_log().collect()}
    for a in ads:
        assert a["url"] in fetched, f"streamed URL never fetched: {a['url']}"


def test_concurrent_stream_and_engine_commits_race_safely(spark, tmp_path):
    """VERDICT r3 #7: the flock+CAS commit design was only tested
    sequentially. Here a REAL frontier-stream batch races an
    engine-style commit_round on one shared store, two ways:

    1. deterministic loser: an engine writer plans its round, a stream
       batch steals that round number, the engine's commit must fail
       with StaleStateError and succeed after re-reading;
    2. a 20-round two-thread hammer (stream batches vs a tight engine
       commit loop with re-read-and-retry recovery) after which the
       manifest must be uncorrupted: strictly sequential unique rounds,
       every writer's commits landed, both writers' state keys alive.
    """
    import json as _json
    import threading

    from pyspark.errors import StreamingQueryException

    from olx_spark.plans.snapshot import SnapshotStore, StaleStateError
    from olx_spark.streaming.stream import start_frontier_stream

    store_dir = str(tmp_path / "snap")
    store = SnapshotStore(store_dir, spark)
    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def drop_file(i: int) -> None:
        with open(drop / f"b{i:03d}.json", "w") as f:
            f.write(_json.dumps({
                "name": "s", "base_url": "https://h.example/l/",
                "href": f"/d/ad/race-{i}/", "priority": 1,
            }) + "\n")

    def run_stream_batch() -> None:
        """One availableNow stream run; on a lost race the query dies
        with StaleStateError inside foreachBatch — restart replays the
        batch from the checkpoint until it lands (documented recovery)."""
        for _ in range(30):
            q = start_frontier_stream(spark, str(drop), store, ckpt)
            try:
                q.awaitTermination(120)
                return
            except StreamingQueryException as ex:
                # both lost-race shapes: planned round taken (ValueError
                # "already committed") or next_round advanced past the
                # planned one (StaleStateError)
                assert (
                    "StaleStateError" in str(ex)
                    or "stale" in str(ex)
                    or "already committed" in str(ex)
                ), ex
        raise AssertionError("stream batch never landed after 30 restarts")

    # ---- 1. deterministic loser recovery
    engine = SnapshotStore(store_dir, spark)
    planned = engine.last_state().get("next_round", 0)  # engine plans...
    drop_file(0)
    run_stream_batch()  # ...the stream takes that very round
    with pytest.raises((StaleStateError, ValueError)):
        engine.commit_round(
            planned, {"seen": spark.range(1).selectExpr("id as url_fp")},
            {"next_round": planned + 1},
        )
    fresh = engine.last_state()["next_round"]  # loser re-reads and recovers
    engine.commit_round(
        fresh, {"seen": spark.range(1).selectExpr("id as url_fp")},
        {"next_round": fresh + 1, "engine_beat": 0},
    )

    # ---- 2. twenty genuine two-thread races
    n_engine, n_stream = 20, 20
    errs: list = []

    def engine_loop() -> None:
        try:
            for i in range(1, n_engine + 1):
                while True:
                    nxt = int(engine.last_state()["next_round"])
                    try:
                        engine.commit_round(
                            nxt,
                            {"seen": spark.range(1).selectExpr(
                                f"id + {1000 + i} as url_fp"
                            )},
                            {"next_round": nxt + 1, "engine_beat": i},
                        )
                        break
                    except (StaleStateError, ValueError):
                        continue  # lost the race: re-read and retry
        except Exception as ex:  # pragma: no cover - surfaced below
            errs.append(ex)

    t = threading.Thread(target=engine_loop)
    t.start()
    for i in range(1, n_stream + 1):
        drop_file(i)
        run_stream_batch()
    t.join(600)
    assert not t.is_alive() and not errs, errs

    # ---- manifest integrity
    rounds = store.committed_rounds()
    assert rounds == sorted(set(rounds))
    assert rounds == list(range(rounds[-1] + 1))  # dense, no holes
    st = store.last_state()
    assert st["engine_beat"] == n_engine            # every engine commit landed
    assert len(st["stream_batches"]) == n_stream + 1  # every stream batch landed
    assert st["next_round"] == rounds[-1] + 1
    # every streamed URL arrived exactly once
    frontier = store.read_table("frontier")
    urls = [r["url"] for r in frontier.collect()]
    assert len(urls) == len(set(urls)) == n_stream + 1


def test_batch_resume_after_stream_batch(spark, tmp_path):
    """Engine rounds -> stream batch -> engine RESUME must continue
    cleanly past the stream's round (shared numbering, merged state)."""
    import json as _json

    from olx_spark.fixtures import make_crawl_graph
    from olx_spark.plans.crawl import CrawlConfig
    from olx_spark.plans.scaled import ScaledCrawlEngine
    from olx_spark.plans.snapshot import SnapshotStore
    from olx_spark.streaming.stream import start_frontier_stream

    g = make_crawl_graph(n_hosts=2, pages_per_host=2, hot_host_factor=1)
    store_dir = str(tmp_path / "snap")
    cfg = dict(
        mode="scaled", dedup_scope="global_exact",
        checkpoint_dir=store_dir, with_payload=False,
    )
    # phase 1: two engine rounds, then stop
    eng1 = ScaledCrawlEngine(spark, g, CrawlConfig(max_rounds=2, **cfg))
    eng1.run([dict(s, count=20) for s in g.seeds])
    done_rounds = eng1.store.committed_rounds()
    # phase 2: a stream batch drops a fresh URL into the shared store
    store = SnapshotStore(store_dir, spark)
    a = g.ad_pages[-1]
    job = g.seeds[0]["name"]
    drop = tmp_path / "drop"
    drop.mkdir()
    with open(drop / "b.json", "w") as f:
        f.write(_json.dumps({
            "name": job, "base_url": f"https://{a['host']}/l/",
            "href": a["path"], "priority": 9,
        }) + "\n")
    q = start_frontier_stream(spark, str(drop), store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert len(store.committed_rounds()) == len(done_rounds) + 1
    # phase 3: resume the engine — must not collide with the stream round
    eng2 = ScaledCrawlEngine(spark, g, CrawlConfig(max_rounds=40, **cfg))
    eng2.run([dict(s, count=20) for s in g.seeds])
    urls = [r["url"] for r in eng2.fetch_log().collect()]
    assert len(urls) == len(set(urls))  # still globally deduped
    assert a["url"] in set(urls)  # the streamed URL was crawled
