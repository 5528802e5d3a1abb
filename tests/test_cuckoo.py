"""Cuckoo seen-filter tests — the deletion-capable Bloom alternative
(olx_spark/operators/cuckoo.py). Mirrors the BloomSeenFilter suite in
test_dedup.py, plus the cuckoo-only contracts: delete/re-admit,
merge-by-reinsertion equivalence, deterministic kick chains, and the
load-factor wall failing loudly."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from olx_spark.operators.cuckoo import (
    SLOTS,
    CuckooSeenFilter,
    _contains,
    _insert_all,
    _tags_and_buckets,
    merge_cuckoo_deltas,
)


@pytest.fixture(scope="module")
def cuckoo_data(spark):
    n = 4000
    seen_df = spark.range(n).select(F.xxhash64("id").alias("url_fp"))
    fresh_df = spark.range(n, 2 * n).select(F.xxhash64("id").alias("url_fp"))
    return seen_df, fresh_df, n


def test_no_false_negatives(spark, cuckoo_data):
    seen_df, _, _ = cuckoo_data
    f = CuckooSeenFilter(spark, n_shards=8, n_buckets_per_shard=1 << 9)
    f.add_round(seen_df)
    probed = f.probe(seen_df)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_fp_rate_bounded(spark, cuckoo_data):
    seen_df, fresh_df, n = cuckoo_data
    f = CuckooSeenFilter(spark, n_shards=8, n_buckets_per_shard=1 << 9)
    f.add_round(seen_df)
    fp = f.probe(fresh_df).filter(F.col("maybe_seen")).count()
    # theory ~ 2*SLOTS/2^16 ~= 1.2e-4 -> expect ~0.5 of 4000; allow 10
    assert fp <= 10


def test_incremental_merge_matches_single_build(spark, cuckoo_data):
    seen_df, fresh_df, n = cuckoo_data
    half1 = seen_df.limit(n // 2)
    half2 = seen_df.subtract(half1)
    inc = CuckooSeenFilter(spark, n_shards=4, n_buckets_per_shard=1 << 10)
    inc.add_round(half1)
    inc.add_round(half2)
    one = CuckooSeenFilter(spark, n_shards=4, n_buckets_per_shard=1 << 10)
    one.add_round(seen_df)
    # same membership for present items, near-same for absent probes
    assert inc.probe(seen_df).filter(~F.col("maybe_seen")).count() == 0
    inc_fp = inc.probe(fresh_df).filter(F.col("maybe_seen")).count()
    assert inc_fp <= 10


def test_delete_readmits_and_preserves_others(spark, cuckoo_data):
    seen_df, _, n = cuckoo_data
    f = CuckooSeenFilter(spark, n_shards=4, n_buckets_per_shard=1 << 10)
    f.add_round(seen_df)
    retire = seen_df.limit(n // 4)
    keep = seen_df.subtract(retire)
    f.delete_round(retire)
    # kept items never read unseen (no false negatives survive delete)
    assert f.probe(keep).filter(~F.col("maybe_seen")).count() == 0
    # retired items re-admit (modulo the fp rate: allow a handful)
    still = f.probe(retire).filter(F.col("maybe_seen")).count()
    assert still <= 10
    # and a re-add after retirement flips them back to seen
    f.add_round(retire)
    assert f.probe(retire).filter(~F.col("maybe_seen")).count() == 0


def test_merge_deltas_one_row_and_equivalent(spark, cuckoo_data):
    seen_df, _, n = cuckoo_data
    f = CuckooSeenFilter(spark, n_shards=4, n_buckets_per_shard=1 << 10)
    d1 = f.build_deltas(seen_df.limit(n // 2))
    d2 = f.build_deltas(seen_df.subtract(seen_df.limit(n // 2)))
    stacked = d1.unionByName(d2)
    merged = merge_cuckoo_deltas(stacked, f.n_buckets)
    counts = merged.groupBy("shard_id").count().collect()
    assert all(r["count"] == 1 for r in counts)
    # probing the merged single rows == probing the stacked deltas
    f.set_state(merged)
    assert f.probe(seen_df).filter(~F.col("maybe_seen")).count() == 0


def test_snapshot_roundtrip(spark, cuckoo_data, tmp_path):
    seen_df, _, _ = cuckoo_data
    f = CuckooSeenFilter(spark, n_shards=4, n_buckets_per_shard=1 << 10)
    f.add_round(seen_df)
    f.to_df().write.parquet(str(tmp_path / "shards"))
    back = spark.read.parquet(str(tmp_path / "shards"))
    g = CuckooSeenFilter.from_df(
        spark, back, n_buckets_per_shard=1 << 10, n_shards=4
    )
    assert g.probe(seen_df).filter(~F.col("maybe_seen")).count() == 0


def test_geometry_mismatch_fails_loudly(spark, cuckoo_data):
    seen_df, _, _ = cuckoo_data
    f = CuckooSeenFilter(spark, n_shards=4, n_buckets_per_shard=1 << 10)
    f.add_round(seen_df)
    g = CuckooSeenFilter.from_df(
        spark, f.to_df(), n_buckets_per_shard=1 << 9, n_shards=4
    )
    with pytest.raises(Exception, match="geometry mismatch"):
        g.probe(seen_df).collect()


def test_load_factor_wall_raises(spark):
    # 64 buckets x 4 slots = 256 capacity; 300 items must fail loudly
    over = spark.range(300).select(F.xxhash64("id").alias("url_fp"))
    f = CuckooSeenFilter(spark, n_shards=1, n_buckets_per_shard=64)
    with pytest.raises(Exception, match="cuckoo shard full"):
        f.add_round(over)


def test_expected_per_shard_provisions_geometry(spark):
    f = CuckooSeenFilter(
        spark, n_shards=4, n_buckets_per_shard=1 << 4, expected_per_shard=100_000
    )
    assert f.n_buckets * SLOTS * 0.84 >= 100_000
    assert (f.n_buckets & (f.n_buckets - 1)) == 0


def test_insert_deterministic_bytes():
    """Same insertion order -> identical table bytes (kick chains are
    tag-seeded, no RNG): resume/replay produces byte-identical state."""
    rng = np.random.default_rng(7)
    fps = rng.integers(-(2**62), 2**62, size=3000, dtype=np.int64)
    tables = []
    for _ in range(2):
        t = np.zeros((1 << 10, SLOTS), dtype=np.uint16)
        tags, i1s = _tags_and_buckets(fps, 1 << 10)
        _insert_all(t, tags, i1s)
        tables.append(t)
    assert np.array_equal(tables[0], tables[1])
    assert _contains(tables[0], fps).all()


def test_kick_chain_path_exercised():
    """Load a single tiny table to ~0.9: placements must relocate via
    kicks and membership still holds for every inserted item."""
    rng = np.random.default_rng(3)
    n_buckets = 1 << 6
    cap = n_buckets * SLOTS
    fps = rng.integers(-(2**62), 2**62, size=int(cap * 0.9), dtype=np.int64)
    t = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
    tags, i1s = _tags_and_buckets(fps, n_buckets)
    _insert_all(t, tags, i1s)
    assert _contains(t, fps).all()
    assert float((t != 0).mean()) >= 0.85
