"""Determinism under parallelism: the crawl result must be IDENTICAL
at different partition counts (the property that makes the N vs 4N
scaling runs comparable, and crawl order reproducible on any cluster).
"""

import pytest
from pyspark.sql import functions as F

from olx_spark.fixtures.crawl_graph import make_scaling_graph
from olx_spark.plans.crawl import CrawlConfig
from olx_spark.plans.scaled import ScaledCrawlEngine


def _run(spark, tmp, shuffle_parts):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    try:
        graph = make_scaling_graph(n_hosts=8, pages_per_host=2, ads_per_page=50)
        cfg = CrawlConfig(
            mode="scaled",
            dedup_scope="global_bloom",
            checkpoint_dir=str(tmp / f"det_{shuffle_parts}"),
            max_rounds=10,
            with_payload=True,
            store_payload_bytes=False,
            bloom_shards=8,
            bloom_bits_per_shard=1 << 18,
            per_host_per_round=1_000_000,
            round_budget_ms=10_000_000,
        )
        eng = ScaledCrawlEngine(spark, graph, cfg)
        eng.run(graph.seeds)
        rows = (
            eng.results()
            .select("name", "seq", "round", "href", "title", "phash")
            .collect()
        )
        return sorted(tuple(r) for r in rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_results_identical_across_partition_counts(spark, tmp_path):
    a = _run(spark, tmp_path, 4)
    b = _run(spark, tmp_path, 16)
    assert len(a) == len(b) > 0
    assert a == b, "crawl results depend on partitioning!"
