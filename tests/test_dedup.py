"""Unit tests for dedup operators: window first-seen, anti-join, Bloom.

The Bloom filter is fully distributed (VERDICT round-1 item 1): shard
state is a DataFrame, builds emit delta rows, probes cogroup frontier
slices with single shards. ``shard_arrays()`` (an explicit TEST-ONLY
collect) is the only place bits ever reach the driver.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from olx_spark.operators.dedup import (
    BloomSeenFilter,
    _bloom_positions,
    anti_join_unseen,
    first_seen_dedup,
    merge_shard_deltas,
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
    assert len(probed) == 5000
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
    for sid, rate in f.fp_rates().items():
        assert rate < 0.01, sid


def test_bloom_incremental_merge_matches_single_build(spark, bloom_data):
    seen_df, _ = bloom_data
    a = seen_df.filter(F.col("url_fp") % 2 == 0)
    b = seen_df.filter(F.col("url_fp") % 2 != 0)
    inc = BloomSeenFilter(spark, n_shards=4, m_bits_per_shard=1 << 16)
    inc.add_round(a)
    inc.add_round(b)
    one = BloomSeenFilter(spark, n_shards=4, m_bits_per_shard=1 << 16)
    one.add_round(seen_df)
    one_arrays, inc_arrays = one.shard_arrays(), inc.shard_arrays()
    assert set(one_arrays) == set(inc_arrays)
    for sid in one_arrays:
        assert np.array_equal(inc_arrays[sid], one_arrays[sid])
    assert sum(inc.n_items_by_shard().values()) == sum(
        one.n_items_by_shard().values()
    )


def test_bloom_snapshot_roundtrip(spark, bloom_data, tmp_path):
    """Shard DELTA rows written as parquet (the seen_shards table shape)
    rebuild an equivalent filter — including un-merged multi-delta rows
    per shard, which probe must OR in-task."""
    seen_df, _ = bloom_data
    f = BloomSeenFilter(spark, n_shards=4, m_bits_per_shard=1 << 16)
    # two un-merged deltas per shard, like two committed rounds
    d1 = f.build_deltas(seen_df.filter(F.col("url_fp") % 2 == 0))
    d2 = f.build_deltas(seen_df.filter(F.col("url_fp") % 2 != 0))
    d1.unionByName(d2).write.mode("overwrite").parquet(str(tmp_path / "shards"))
    back = spark.read.parquet(str(tmp_path / "shards"))
    g = BloomSeenFilter.from_df(spark, back, m_bits_per_shard=1 << 16, n_shards=4, k=f.k)
    probed = g.probe(seen_df).collect()
    assert len(probed) == 5000
    assert all(r["maybe_seen"] for r in probed)


def test_bloom_probe_is_distributed_no_driver_bits(spark, bloom_data):
    """VERDICT item 1 'done' gate: the probe path is a co-grouped
    per-shard plan (FlatMapCoGroupsInPandas) with no broadcast of the
    filter, and the filter object holds no shard bytes on the driver."""
    seen_df, fresh_df = bloom_data
    f = BloomSeenFilter(spark, n_shards=8, m_bits_per_shard=1 << 17)
    f.add_round(seen_df)
    out = f.probe(fresh_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "Broadcast" not in plan  # neither exchange nor hashed relation
    # no driver-resident bit arrays anywhere on the object
    for v in vars(f).values():
        assert not isinstance(v, (bytes, bytearray, np.ndarray, dict))
    # and the distributed state is shard rows, not a local structure
    assert f.shards_df is not None and "bits" in f.shards_df.columns


def test_merge_shard_deltas_one_row_per_shard(spark, bloom_data):
    seen_df, _ = bloom_data
    f = BloomSeenFilter(spark, n_shards=4, m_bits_per_shard=1 << 16)
    d1 = f.build_deltas(seen_df.filter(F.col("url_fp") % 2 == 0))
    d2 = f.build_deltas(seen_df.filter(F.col("url_fp") % 2 != 0))
    merged = merge_shard_deltas(d1.unionByName(d2))
    rows = merged.collect()
    assert len(rows) == len({r["shard_id"] for r in rows})
    assert sum(r["n_items"] for r in rows) == 5000


def test_chunk_dedup_stats_planted_boilerplate(spark):
    """Chunk-level exact dedup: a boilerplate chunk shared by three
    docs survives only in the (doc_id, idx)-first document; blank and
    NULL docs report 0/0/0.0; a doc repeating its own chunk dedups
    against itself."""
    from olx_spark.operators.dedup import chunk_dedup_stats

    boiler = " ".join(f"w{i}" for i in range(20))  # exactly one chunk
    uniq = " ".join(f"a{i}" for i in range(25))  # chunks of 20 + 5
    rows = [
        (1, f"{boiler} {uniq}"),  # first: keeps boiler + 2 unique chunks
        (2, f"{boiler} b0 b1 b2"),  # boiler dropped, partial chunk kept
        (3, boiler),  # only the dup chunk -> fully duplicate
        (4, f"{boiler} {boiler}"),  # self-repeat: second copy dropped
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["dup_chunk_frac"])
        for r in chunk_dedup_stats(df, "doc_id", "text", 20).collect()
    }
    assert got[1] == (3, 3, 0.0)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (1, 0, 1.0)
    assert got[4] == (2, 0, 1.0)  # both copies lose to doc 1's chunk 0
    assert got[5] == (0, 0, 0.0)
    assert got[6] == (0, 0, 0.0)


def test_chunk_dedup_first_occurrence_is_min_struct_not_window(spark):
    """Scale-shape gate: the first-occurrence selection must be a
    partial-aggregatable groupBy (HashAggregate / ObjectHashAggregate
    on the fingerprint), NOT a row_number window — a hot boilerplate
    chunk repeated across millions of docs would funnel every copy
    through one window task, while partial aggregation combines
    map-side."""
    from olx_spark.operators.dedup import chunk_dedup_stats

    df = spark.createDataFrame(
        [(i, "x y z") for i in range(10)], "doc_id long, text string"
    )
    plan = (
        chunk_dedup_stats(df, "doc_id", "text", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


# ------------------------------------------------ duplicate spans (ExactSubstr)
class TestDuplicateSpans:
    def _corpus(self, spark):
        boiler = "the quick brown fox jumps over the lazy dog tonight"
        rows = [
            (0, f"alpha beta {boiler} gamma delta"),
            (1, f"{boiler} zeta eta theta iota kappa"),
            # two disjoint duplicated regions in one doc
            (2, f"one two three {boiler} x y z {boiler}"),
            (3, "completely unique words nobody else repeats anywhere here"),
            (4, ""),
            (5, "short doc"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    @staticmethod
    def _replay(rows, n, min_count):
        import hashlib
        from collections import Counter

        def md5_60(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        grams = {}
        for i, txt in rows:
            ws = txt.strip().split()
            grams[i] = [
                md5_60(" ".join(ws[p : p + n])) for p in range(len(ws) - n + 1)
            ] if txt.strip() and len(ws) >= n else []
        cnt = Counter(g for gs in grams.values() for g in gs)
        out = set()
        for i, gs in grams.items():
            dup_pos = [p for p, g in enumerate(gs) if cnt[g] >= min_count]
            run = []
            for p in dup_pos + [None]:
                if run and (p is None or p != run[-1] + 1):
                    out.add((i, run[0], run[-1] + n - 1, len(run)))
                    run = []
                if p is not None:
                    run.append(p)
        return out

    def test_matches_python_replay(self, spark):
        from olx_spark.operators.dedup import duplicate_spans

        df = self._corpus(spark)
        rows = [(r["doc_id"], r["text"]) for r in df.collect()]
        for n in (3, 5):
            got = {
                (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
                for r in duplicate_spans(df, "doc_id", "text", n=n).collect()
            }
            assert got == self._replay(rows, n, 2)

    def test_spans_are_maximal_and_disjoint(self, spark):
        from olx_spark.operators.dedup import duplicate_spans

        out = duplicate_spans(self._corpus(spark), "doc_id", "text", n=4).collect()
        per_doc = {}
        for r in out:
            assert r["span_end"] - r["span_start"] + 1 >= 4
            assert r["n_dup_grams"] == r["span_end"] - r["span_start"] - 4 + 2
            per_doc.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"])
            )
        for spans in per_doc.values():
            spans.sort()
            for (s1, e1), (s2, _) in zip(spans, spans[1:]):
                # maximal: merging any two adjacent spans would need a
                # gap — stride-1 runs were already collapsed
                assert s2 > e1 - 4 + 2  # next run starts past a mergeable pos

    def test_doc2_has_two_disjoint_spans(self, spark):
        from olx_spark.operators.dedup import duplicate_spans

        out = duplicate_spans(self._corpus(spark), "doc_id", "text", n=8)
        spans2 = sorted(
            (r["span_start"], r["span_end"])
            for r in out.filter(F.col("doc_id") == 2).collect()
        )
        assert len(spans2) == 2  # boiler appears twice, split by x y z

    def test_short_blank_and_unique_docs_emit_nothing(self, spark):
        from olx_spark.operators.dedup import duplicate_spans

        out = duplicate_spans(self._corpus(spark), "doc_id", "text", n=8).collect()
        assert all(r["doc_id"] not in (3, 4, 5) for r in out)

    def test_plan_no_gram_window_no_python(self, spark):
        # corpus gram counting must be the groupBy+join shape (AQE skew-
        # splittable), never a count-window partitioned by the hot gram;
        # the whole pipeline stays JVM-side
        from olx_spark.operators.dedup import duplicate_spans

        plan = (
            duplicate_spans(self._corpus(spark), "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        for ln in plan.splitlines():
            if "windowspecdefinition" in ln.lower():
                assert "gram" not in ln

    def test_validation(self, spark):
        from olx_spark.operators.dedup import duplicate_spans

        df = self._corpus(spark)
        with pytest.raises(ValueError):
            duplicate_spans(df, "doc_id", "text", n=0)
        with pytest.raises(ValueError):
            duplicate_spans(df, "doc_id", "text", min_count=1)


# ------------------------------------------------------ keep_canonical ----

def test_keep_canonical_argmax_and_ties(spark):
    from olx_spark.operators.dedup import keep_canonical

    comps = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 40), (5, 50)],
        "doc_id long, component long",
    )
    scores = spark.createDataFrame(
        # comp 10: doc 2 wins on score; comp 40 singleton; comp 50 solo
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.0)],
        "doc_id long, score double",
    )
    out = {r.doc_id: r for r in keep_canonical(comps, scores).collect()}
    assert len(out) == 5  # every doc gets a decision
    assert out[2].action == "keep" and out[2].kept_id == 2  # 0.9 tie -> min id
    assert out[3].action == "drop" and out[3].kept_id == 2
    assert out[1].action == "drop"
    assert out[4].action == "keep" and out[5].action == "keep"  # singletons keep
    # exactly one keep per component
    keeps = {}
    for r in out.values():
        keeps.setdefault(r.component, []).append(r.action)
    for comp, actions in keeps.items():
        assert actions.count("keep") == 1


def test_keep_canonical_no_window_exchange_shape(spark):
    from olx_spark.operators.dedup import keep_canonical

    comps = spark.createDataFrame([(i, i % 3) for i in range(30)],
                                  "doc_id long, component long")
    scores = spark.createDataFrame([(i, float(i % 7)) for i in range(30)],
                                   "doc_id long, score double")
    plan = keep_canonical(comps, scores)._jdf.queryExecution().executedPlan().toString()
    # argmax is an aggregate, not a sorted window
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
