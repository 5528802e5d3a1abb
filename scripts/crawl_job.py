"""Standalone crawl job for scaling-efficiency runs (spark-submit).

Runs the scaled-mode crawl over the deterministic bench graph and
prints one JSON line with throughput. Used by scripts/scaling_run.py
at two parallelism levels (local[8] vs local[32] standing in for N and
4N executor clusters — sandbox substitution documented in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olx_spark.fixtures import make_crawl_graph
from olx_spark.plans.crawl import CrawlConfig
from olx_spark.plans.scaled import ScaledCrawlEngine
from olx_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--hosts", type=int, default=32)
    ap.add_argument("--pages", type=int, default=4)
    ap.add_argument("--seed-count", type=int, default=10_000)
    args = ap.parse_args()

    spark = get_spark(
        f"olx_crawl_scaling_{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    graph = make_crawl_graph(
        n_hosts=args.hosts, pages_per_host=args.pages,
        ads_per_page=(30, 60), hot_host_factor=2,
    )
    cfg = CrawlConfig(
        mode="scaled",
        dedup_scope="global_bloom",
        checkpoint_dir=tempfile.mkdtemp(prefix=f"olx_scaling_{args.cores}_"),
        max_rounds=40,
        with_payload=True,
        bloom_shards=16,
        bloom_bits_per_shard=1 << 18,
        per_host_per_round=10_000,
        round_budget_ms=10_000_000,
    )
    eng = ScaledCrawlEngine(spark, graph, cfg)
    seeds = [dict(s, count=args.seed_count) for s in graph.seeds]
    t0 = time.perf_counter()
    eng.run(seeds)
    elapsed = time.perf_counter() - t0
    n_ads = eng.fetch_log().count()
    urls = n_ads + len(graph.listing_pages)
    fps = [r["url_fp"] for r in eng.seen_fps().collect()]
    print(
        json.dumps(
            {
                "cores": args.cores,
                "urls": urls,
                "sec": round(elapsed, 3),
                "urls_per_sec": round(urls / elapsed, 2),
                "rounds": len(eng.store.committed_rounds()),
                "seen_count": len(set(fps)),
            }
        )
    )


if __name__ == "__main__":
    main()
