"""Unit tests for dedup operators: window first-seen, anti-join, Bloom."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from olx_spark.operators.dedup import (
    BloomSeenFilter,
    _bloom_positions,
    anti_join_unseen,
    first_seen_dedup,
)


def test_first_seen_dedup(spark):
    df = spark.createDataFrame(
        [("a", 2), ("a", 1), ("b", 5), ("a", 3)], "k string, o int"
    )
    got = {(r["k"], r["o"]) for r in first_seen_dedup(df, ["k"], ["o"]).collect()}
    assert got == {("a", 1), ("b", 5)}


def test_anti_join_unseen(spark):
    frontier = spark.createDataFrame([(1,), (2,), (3,)], "url_fp long")
    seen = spark.createDataFrame([(2,), (9,)], "url_fp long")
    got = {r["url_fp"] for r in anti_join_unseen(frontier, seen).collect()}
    assert got == {1, 3}


def test_bloom_positions_deterministic():
    fps = np.array([1, -5, 2**62, -(2**62)], dtype=np.int64)
    p1 = _bloom_positions(fps, 7, 1 << 20)
    p2 = _bloom_positions(fps.copy(), 7, 1 << 20)
    assert np.array_equal(p1, p2)
    assert p1.shape == (4, 7)
    assert (p1 >= 0).all() and (p1 < (1 << 20)).all()


@pytest.fixture(scope="module")
def bloom_data(spark):
    n = 5000
    seen_df = spark.range(n).select(F.xxhash64("id").alias("url_fp"))
    fresh_df = spark.range(n, 2 * n).select(F.xxhash64("id").alias("url_fp"))
    return seen_df, fresh_df


def test_bloom_no_false_negatives(spark, bloom_data):
    seen_df, _ = bloom_data
    f = BloomSeenFilter(spark, n_shards=8, m_bits_per_shard=1 << 17)
    f.add_round(seen_df)
    probed = f.probe(seen_df).collect()
    assert all(r["maybe_seen"] for r in probed), "Bloom false negative!"


def test_bloom_fp_rate_bounded(spark, bloom_data):
    seen_df, fresh_df = bloom_data
    f = BloomSeenFilter(spark, n_shards=8, m_bits_per_shard=1 << 17)
    f.add_round(seen_df)
    probed = f.probe(fresh_df).collect()
    fp = sum(1 for r in probed if r["maybe_seen"]) / len(probed)
    # 5000 items over 8 shards * 131072 bits -> n/shard=625, m/n≈210,
    # k=7 => theoretical fp ~ 1e-11; allow huge slack
    assert fp < 0.01, f"observed fp rate {fp}"
    for sid in f.shards:
        assert f.fp_rate(sid) < 0.01


def test_bloom_incremental_merge_matches_single_build(spark, bloom_data):
    seen_df, _ = bloom_data
    a = seen_df.filter(F.col("url_fp") % 2 == 0)
    b = seen_df.filter(F.col("url_fp") % 2 != 0)
    inc = BloomSeenFilter(spark, n_shards=4, m_bits_per_shard=1 << 16)
    inc.add_round(a)
    inc.add_round(b)
    one = BloomSeenFilter(spark, n_shards=4, m_bits_per_shard=1 << 16)
    one.add_round(seen_df)
    for sid in one.shards:
        assert np.array_equal(inc.shards[sid], one.shards[sid])
    assert sum(inc.n_items.values()) == sum(one.n_items.values())


def test_bloom_snapshot_roundtrip(spark, bloom_data):
    seen_df, _ = bloom_data
    f = BloomSeenFilter(spark, n_shards=4, m_bits_per_shard=1 << 16)
    f.add_round(seen_df)
    df = f.to_df()
    g = BloomSeenFilter.from_df(spark, df, m_bits_per_shard=1 << 16, n_shards=4, k=f.k)
    for sid in f.shards:
        assert np.array_equal(f.shards[sid], g.shards[sid])
    probed = g.probe(seen_df).collect()
    assert all(r["maybe_seen"] for r in probed)
