"""Checkpoint/resume exactness (north_rule: a killed run resumes from
the last committed snapshot and completes EXACTLY as an uninterrupted
run — the reference loses all progress on cancel,
``OlxServer.scala:92-100``, SURVEY.md §2.1 row 16)."""

import pytest

from olx_spark.fixtures import make_crawl_graph
from olx_spark.plans.crawl import CrawlConfig, CrawlEngine
from olx_spark.plans.scaled import ScaledCrawlEngine


@pytest.fixture(scope="module")
def graph():
    # small hot factor: resume tests run 4 full crawls (test wall-time)
    return make_crawl_graph(hot_host_factor=2)


def _collect_sorted(df, cols):
    return [tuple(r[c] for c in cols) for r in df.orderBy("name", "seq").collect()]


CMP_COLS = ["name", "seq", "round", "href", "title", "price", "brief_flat"]


def test_reference_mode_resume_exact(spark, graph, tmp_path_factory):
    seeds = [dict(s, count=40) for s in graph.seeds]

    full_dir = str(tmp_path_factory.mktemp("ref_full"))
    full = CrawlEngine(
        spark, graph, CrawlConfig(checkpoint_dir=full_dir, with_payload=False)
    )
    want = _collect_sorted(full.run(seeds), CMP_COLS)

    part_dir = str(tmp_path_factory.mktemp("ref_part"))
    part = CrawlEngine(
        spark,
        graph,
        CrawlConfig(checkpoint_dir=part_dir, max_rounds=2, with_payload=False),
    )
    part.run(seeds)  # "killed" after 2 committed rounds
    assert part.store.committed_rounds() == [0, 1]

    resumed = CrawlEngine(
        spark, graph, CrawlConfig(checkpoint_dir=part_dir, with_payload=False)
    )
    got = _collect_sorted(resumed.run(seeds), CMP_COLS)
    assert got == want


def test_scaled_mode_resume_exact(spark, graph, tmp_path_factory):
    seeds = [dict(s, count=50) for s in graph.seeds]

    def cfg(d, **kw):
        return CrawlConfig(
            mode="scaled", dedup_scope="global_bloom", checkpoint_dir=d,
            bloom_shards=8, bloom_bits_per_shard=1 << 17,
            with_payload=False, **kw,
        )

    full_dir = str(tmp_path_factory.mktemp("sc_full"))
    want = _collect_sorted(
        ScaledCrawlEngine(spark, graph, cfg(full_dir)).run(seeds), CMP_COLS
    )

    part_dir = str(tmp_path_factory.mktemp("sc_part"))
    ScaledCrawlEngine(spark, graph, cfg(part_dir, max_rounds=3)).run(seeds)

    resumed = ScaledCrawlEngine(spark, graph, cfg(part_dir))
    got = _collect_sorted(resumed.run(seeds), CMP_COLS)
    assert got == want


def test_commit_is_atomic_against_partial_round(spark, graph, tmp_path_factory):
    """A crashed round (delta dir written, manifest not swapped) is
    invisible on resume and gets cleanly overwritten."""
    import os

    d = str(tmp_path_factory.mktemp("atomic"))
    seeds = [dict(graph.seeds[1], count=30)]
    eng = CrawlEngine(
        spark, graph, CrawlConfig(checkpoint_dir=d, max_rounds=1, with_payload=False)
    )
    eng.run(seeds)
    # simulate a crash mid-round-1: orphan delta dir, no manifest entry
    orphan = os.path.join(d, "r00001", "results")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    resumed = CrawlEngine(spark, graph, CrawlConfig(checkpoint_dir=d))
    out = resumed.run(seeds)
    assert out.count() == 30
    # the orphan was replaced by a real commit
    assert 1 in resumed.store.committed_rounds()


def test_bloom_survives_resume_before_first_shard_commit(
    spark, graph, tmp_path_factory
):
    """A global_bloom run killed after the seed commit but BEFORE any
    seen_shards delta landed must resume with the Bloom path ACTIVE —
    the old resume only built the filter when the shards table already
    existed, silently downgrading the whole resumed crawl to the exact
    anti-join."""
    from olx_spark.plans.crawl import CrawlConfig
    from olx_spark.plans.scaled import ScaledCrawlEngine

    d = str(tmp_path_factory.mktemp("bloom_early_kill"))
    seeds = [dict(s, count=20) for s in graph.seeds]
    cfg = lambda: CrawlConfig(
        mode="scaled", dedup_scope="global_bloom", checkpoint_dir=d,
        bloom_shards=8, bloom_bits_per_shard=1 << 17,
        max_rounds=30, with_payload=False,
    )
    eng = ScaledCrawlEngine(spark, graph, cfg())
    eng._init_or_resume(seeds)  # commits ONLY the seed round, then "dies"
    assert eng.store.read_table("seen_shards") is None

    resumed = ScaledCrawlEngine(spark, graph, cfg())
    resumed.run(seeds)
    assert resumed.bloom is not None, "bloom silently disabled on resume"
    assert resumed.bloom.has_state()
    assert resumed.store.read_table("seen_shards") is not None
    urls = [r["url"] for r in resumed.fetch_log().collect()]
    assert urls and len(urls) == len(set(urls))


def test_bloom_geometry_persisted_over_changed_config(spark, graph, tmp_path_factory):
    """Shard geometry (n_shards, m_bits) is part of the committed state:
    a resume with a CHANGED bloom config must keep the committed
    geometry — reinterpreting shard rows under a new geometry silently
    breaks the no-false-negative invariant (ADVICE r2, medium)."""
    d = str(tmp_path_factory.mktemp("bloom_geom"))
    seeds = [dict(s, count=30) for s in graph.seeds]

    def cfg(shards, bits, **kw):
        return CrawlConfig(
            mode="scaled", dedup_scope="global_bloom", checkpoint_dir=d,
            bloom_shards=shards, bloom_bits_per_shard=bits,
            with_payload=False, **kw,
        )

    ScaledCrawlEngine(spark, graph, cfg(8, 1 << 17, max_rounds=3)).run(seeds)
    # resume with a DIFFERENT configured geometry: committed state wins
    resumed = ScaledCrawlEngine(spark, graph, cfg(4, 1 << 15))
    resumed.run(seeds)
    assert resumed.bloom.n_shards == 8
    assert resumed.bloom.m_bits == 1 << 17
    urls = [r["url"] for r in resumed.fetch_log().collect()]
    assert urls and len(urls) == len(set(urls))


def test_legacy_checkpoint_bloom_guard_two_sided(spark, graph, tmp_path_factory):
    """A checkpoint predating geometry persistence (no bloom_* keys in
    the committed state) must not resume under a DIFFERENT bloom
    geometry in EITHER direction (ADVICE r3: the old max(shard_id)
    bound only caught a decrease; an increase silently re-keyed the
    shard pmod). Exact-match configs resume; the explicit override
    resumes; and the first resumed commit heals the store by persisting
    the geometry."""
    import json
    import os

    d = str(tmp_path_factory.mktemp("legacy_bloom"))
    seeds = [dict(s, count=20) for s in graph.seeds]

    def cfg(shards, **kw):
        return CrawlConfig(
            mode="scaled", dedup_scope="global_bloom", checkpoint_dir=d,
            bloom_shards=shards, bloom_bits_per_shard=1 << 17,
            with_payload=False, **kw,
        )

    ScaledCrawlEngine(spark, graph, cfg(8, max_rounds=3)).run(seeds)
    # simulate the legacy store: strip the persisted geometry keys
    mpath = os.path.join(d, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    for k in ("bloom_shards", "bloom_bits", "bloom_k"):
        m["state"].pop(k, None)
    with open(mpath, "w") as f:
        json.dump(m, f)

    # INCREASED shards: must now fail loudly (passes the old one-sided
    # max(shard_id) check — 7 < 32 — but re-keys the pmod)
    with pytest.raises(ValueError, match="legacy_bloom_geometry_ok"):
        ScaledCrawlEngine(spark, graph, cfg(32)).run(seeds)
    # DECREASED shards: hard failure from the committed shard ids
    with pytest.raises(ValueError, match="geometry mismatch"):
        ScaledCrawlEngine(spark, graph, cfg(4)).run(seeds)
    # even the true geometry needs the explicit assertion when the
    # committed rows cannot prove it (this store populated 7/8 shards
    # — sparse population is indistinguishable from a larger original
    # n_shards); with the override it resumes and HEALS the store by
    # persisting the confirmed geometry
    with pytest.raises(ValueError, match="legacy_bloom_geometry_ok"):
        ScaledCrawlEngine(spark, graph, cfg(8)).run(seeds)
    ok = cfg(8)
    ok.extra["legacy_bloom_geometry_ok"] = True
    resumed = ScaledCrawlEngine(spark, graph, ok)
    resumed.run(seeds)
    assert resumed.bloom.n_shards == 8
    assert resumed.store.last_state()["bloom_shards"] == 8
    urls = [r["url"] for r in resumed.fetch_log().collect()]
    assert urls and len(urls) == len(set(urls))


def test_commit_round_rejects_stale_writer_and_merges_state(spark, tmp_path_factory):
    """Two writers sharing one store (frontier stream + batch engine):
    a commit planned from a stale manifest read is REJECTED (CAS on
    next_round / round-taken), and committed state is merged so keys a
    writer does not own survive interleaved commits (ADVICE r2)."""
    from olx_spark.plans.snapshot import SnapshotStore, StaleStateError

    d = str(tmp_path_factory.mktemp("cas"))
    a = SnapshotStore(d, spark)
    b = SnapshotStore(d, spark)
    df = spark.range(3)
    a.commit_round(0, {"t": df}, {"next_round": 1})
    # writer A wins round 1 while B planned the same round from an
    # earlier read: B's attempt must fail loudly, not clobber
    a.commit_round(1, {"t": df}, {"next_round": 2, "seeds": {"x": 1}})
    with pytest.raises(ValueError):
        b.commit_round(1, {"t": df}, {"next_round": 2})
    # a round number planned past the committed next_round is stale too
    with pytest.raises(StaleStateError):
        b.commit_round(3, {"t": df}, {"next_round": 4})
    # a correctly re-planned commit merges: A's 'seeds' key survives
    b.commit_round(2, {"t": df}, {"next_round": 3, "stream_batches": [7]})
    st = a.last_state()
    assert st["seeds"] == {"x": 1}
    assert st["stream_batches"] == [7]
    assert st["next_round"] == 3


def test_vacuum_two_phase_grace(spark, tmp_path_factory):
    """vacuum() must grant superseded dirs one full generation of
    grace (a concurrent reader's lazy plan may still reference them):
    the first call records, the second call reclaims."""
    import os

    from olx_spark.plans.snapshot import SnapshotStore

    d = str(tmp_path_factory.mktemp("vac2"))
    st = SnapshotStore(d, spark)
    df = spark.range(5)
    st.commit_round(0, {"t": df}, {"next_round": 1})
    st.commit_round(1, {"t": df}, {"next_round": 2}, replace={"t"})
    superseded = os.path.join(d, "r00000", "t")
    assert os.path.isdir(superseded)
    st.vacuum()  # phase 1: records as unreferenced, grants grace
    assert os.path.isdir(superseded)
    st.vacuum()  # phase 2: reclaims
    assert not os.path.exists(superseded)
    assert st.read_table("t").count() == 5


def test_vacuum_reclaims_superseded_compact_dirs(spark, tmp_path_factory):
    """ADVICE r3 (medium): a superseded compact-* generation's children
    are parquet part FILES, not table subdirs — the old subdir-only
    vacuum neither recorded nor deleted them, so disk grew
    O(compactions x table size). The whole dir is now the reclaim unit
    (same two-phase grace)."""
    import os

    from olx_spark.plans.snapshot import SnapshotStore

    d = str(tmp_path_factory.mktemp("vac3"))
    st = SnapshotStore(d, spark)
    df = spark.range(5)
    st.commit_round(0, {"t": df}, {"next_round": 1})
    st.commit_round(1, {"t": df}, {"next_round": 2})
    st.compact_table("t")
    gen1 = [e for e in os.listdir(d) if e.startswith("compact-t-")]
    assert len(gen1) == 1
    st.commit_round(2, {"t": df}, {"next_round": 3})
    st.compact_table("t")  # supersedes gen1
    assert os.path.isdir(os.path.join(d, gen1[0]))
    st.vacuum()  # phase 1: grace
    assert os.path.isdir(os.path.join(d, gen1[0]))
    st.vacuum()  # phase 2: reclaim the whole superseded generation
    assert not os.path.exists(os.path.join(d, gen1[0]))
    live = [e for e in os.listdir(d) if e.startswith("compact-t-")]
    assert len(live) == 1
    assert st.read_table("t").count() == 15


def test_vacuum_reclaims_orphaned_stage_dirs(spark, tmp_path_factory):
    """A hard-killed writer leaves its .stage-* dir behind (commits now
    stage data OUTSIDE the lock); vacuum reclaims it after the grace
    age, never a fresh one (a live writer may still be mid-write)."""
    import os

    from olx_spark.plans.snapshot import SnapshotStore

    d = str(tmp_path_factory.mktemp("vacstage"))
    st = SnapshotStore(d, spark)
    st.commit_round(0, {"t": spark.range(3)}, {"next_round": 1})
    orphan = os.path.join(d, ".stage-00009-deadbeef")
    os.makedirs(orphan)
    # fresh stage: never reclaimed regardless of vacuum calls
    st.vacuum(stage_grace_s=3600)
    st.vacuum(stage_grace_s=3600)
    assert os.path.isdir(orphan)
    # aged out: two-phase reclaim
    st.vacuum(stage_grace_s=0.0)
    assert os.path.isdir(orphan)
    st.vacuum(stage_grace_s=0.0)
    assert not os.path.exists(orphan)


def test_vacuum_survives_vanishing_stage_entry(spark, tmp_path_factory, monkeypatch):
    """vacuum's .stage-* mtime scan races a concurrent commit's
    out-of-lock rmtree of a staged subdir: a vanished entry must be
    treated as recently-touched (skip), never abort the vacuum — and
    with it the engine round that invoked it (ADVICE r4)."""
    import os

    from olx_spark.plans.snapshot import SnapshotStore

    d = str(tmp_path_factory.mktemp("vacrace"))
    st = SnapshotStore(d, spark)
    st.commit_round(0, {"t": spark.range(3)}, {"next_round": 1})
    racing = os.path.join(d, ".stage-00007-cafebabe")
    os.makedirs(os.path.join(racing, "t"))
    real = os.path.getmtime

    def flaky(p):
        if str(p).startswith(racing):
            raise FileNotFoundError(p)  # the concurrent rmtree won
        return real(p)

    monkeypatch.setattr("os.path.getmtime", flaky)
    st.vacuum(stage_grace_s=0.0)  # must not raise; dir treated as live
    monkeypatch.undo()
    assert os.path.isdir(racing)
    st.vacuum(stage_grace_s=0.0)
    st.vacuum(stage_grace_s=0.0)
    assert not os.path.exists(racing)


def test_compact_inflight_output_survives_concurrent_vacuums(spark, tmp_path_factory):
    """ADVICE r4: compact_table's merged output is staged under a
    .stage-* name (mtime-grace protected) and renamed to compact-*
    only under the commit lock — two full vacuum passes spanning the
    in-flight write must not two-phase-delete it out from under the
    repoint (table data loss with a concurrent-writer deployment)."""
    import contextlib
    import os
    import types

    from olx_spark.plans.snapshot import SnapshotStore

    d = str(tmp_path_factory.mktemp("vaccompact"))
    st = SnapshotStore(d, spark)
    st.commit_round(0, {"t": spark.range(5)}, {"next_round": 1})
    st.commit_round(1, {"t": spark.range(5)}, {"next_round": 2})
    vac = SnapshotStore(d, spark)
    orig = SnapshotStore._commit_lock
    fired = []

    @contextlib.contextmanager
    def lock_after_vacuums(self, timeout_s=600.0):
        # the window between compact's data write and its repoint:
        # a concurrent process runs two whole vacuum generations
        if not fired:
            fired.append(1)
            vac.vacuum()
            vac.vacuum()
        with orig(self, timeout_s=timeout_s):
            yield

    st._commit_lock = types.MethodType(lock_after_vacuums, st)
    st.compact_table("t")
    assert st.read_table("t").count() == 10
    assert len([e for e in os.listdir(d) if e.startswith("compact-t-")]) == 1
    assert not [e for e in os.listdir(d) if e.startswith(".stage-compact-")]


def test_commit_round_skips_empty_deltas(spark, tmp_path_factory):
    """A zero-row table delta writes no parquet part files (no schema
    on disk), so commit_round must not register it — callers can pass
    every table unconditionally and empty rounds self-prune, and
    read_table never opens a parts-less dir."""
    from olx_spark.plans.snapshot import SnapshotStore

    d = str(tmp_path_factory.mktemp("emptydelta"))
    st = SnapshotStore(d, spark)
    st.commit_round(0, {"t": spark.range(4), "u": spark.range(0)}, {"next_round": 1})
    m = st.read_manifest()
    assert "u" not in m["tables"]
    assert st.read_table("u") is None
    st.commit_round(1, {"t": spark.range(0)}, {"next_round": 2})
    assert [r for r in st.read_manifest()["tables"]["t"]] == ["r00000/t"]
    assert st.read_table("t").count() == 4


def test_compact_table_skips_when_table_changed_under_it(spark, tmp_path_factory):
    """compact_table writes its merged output outside the commit lock;
    if a concurrent commit appended a delta in the meantime the
    compaction is stale and must SKIP (dropping its output), never
    repoint the manifest past the new delta."""
    import os

    from olx_spark.plans.snapshot import SnapshotStore, SnapshotStore as SS

    d = str(tmp_path_factory.mktemp("compactrace"))
    a = SnapshotStore(d, spark)
    a.commit_round(0, {"t": spark.range(3)}, {"next_round": 1})
    a.commit_round(1, {"t": spark.range(3)}, {"next_round": 2})

    # interleave: capture the manifest read, then commit from B before
    # A's repoint by monkeypatching the lock entry
    b = SS(d, spark)
    orig_lock = a._commit_lock
    raced = {"done": False}

    def racing_lock(*args, **kwargs):
        if not raced["done"]:
            raced["done"] = True
            b.commit_round(2, {"t": spark.range(3)}, {"next_round": 3})
        return orig_lock(*args, **kwargs)

    a._commit_lock = racing_lock
    a.compact_table("t")
    a._commit_lock = orig_lock
    m = a.read_manifest()
    # the stale compaction must not have repointed: all three deltas live
    assert m["tables"]["t"] == ["r00000/t", "r00001/t", "r00002/t"]
    assert a.read_table("t").count() == 9
    assert not [e for e in os.listdir(d) if e.startswith("compact-t-")]


def test_bloom_probe_rejects_mismatched_geometry(spark):
    """Probing committed shard rows under a different m_bits must fail
    LOUDLY, never silently return false negatives."""
    from olx_spark.operators.dedup import BloomSeenFilter

    df = spark.range(100).selectExpr("xxhash64(cast(id as string)) as url_fp")
    f = BloomSeenFilter(spark, n_shards=4, m_bits_per_shard=1 << 12)
    f.add_round(df)
    wrong = BloomSeenFilter(spark, n_shards=4, m_bits_per_shard=1 << 13)
    wrong.set_state(f.to_df())
    with pytest.raises(Exception, match="geometry mismatch"):
        wrong.probe(df).collect()


def test_commit_round_parallel_after_semantics(spark, tmp_path_factory):
    """parallel_after: the sequential prefix writes first (a later
    callable must see its effects), the remaining callables resolve in
    dict order BEFORE any overlapped write result is consumed, the
    overlapped writes commit a manifest identical to the sequential
    path (dict-ordered registration, zero-row pruning intact), and a
    failing overlapped write aborts the whole commit."""
    from olx_spark.plans.snapshot import SnapshotStore

    d = str(tmp_path_factory.mktemp("parallel"))
    st = SnapshotStore(d, spark)
    events = []

    def lazy(name, df):
        def f():
            events.append(name)
            return df
        return f

    st.commit_round(
        0,
        {
            "first": spark.range(3),
            "a": lazy("a", spark.range(5)),
            "b": lazy("b", spark.range(7)),
            "empty": lazy("empty", spark.range(0)),
        },
        {"next_round": 1},
        parallel_after="first",
    )
    assert events == ["a", "b", "empty"]  # dict-order resolution kept
    m = st.read_manifest()
    assert list(m["tables"]) == ["first", "a", "b"]  # registration order
    assert "empty" not in m["tables"]  # zero-row prune still applies
    assert st.read_table("a").count() == 5
    assert st.read_table("b").count() == 7

    # a failing overlapped WRITE (job error inside the thread pool)
    # must fail the commit and leave no trace (stage dir removed,
    # manifest unchanged)
    from pyspark.sql import functions as _F

    bad = spark.range(1).withColumn("x", _F.raise_error(_F.lit("write failed")))

    import pytest as _pt

    with _pt.raises(Exception, match="write failed"):
        st.commit_round(
            1,
            {"first": spark.range(1), "a": spark.range(1), "bad": bad},
            {"next_round": 2},
            parallel_after="first",
        )
    assert st.committed_rounds() == [0]
    import os as _os

    assert not [e for e in _os.listdir(d) if e.startswith(".stage-")]
