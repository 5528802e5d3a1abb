"""Standalone crawl job for scaling-efficiency runs (spark-submit).

Runs the scaled-mode crawl over the deterministic wide scaling graph
(ad content synthesized in-worker from the URL — no broadcast store,
fetch work dominates fixed round cost) and prints one JSON line with
throughput. Used by scripts/scaling_run.py at two parallelism levels
(local[8] vs local[32] standing in for N and 4N executor clusters —
sandbox substitution documented in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olx_spark.fixtures.crawl_graph import make_scaling_graph
from olx_spark.plans.crawl import CrawlConfig
from olx_spark.plans.scaled import ScaledCrawlEngine
from olx_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--hosts", type=int, default=512)
    ap.add_argument("--pages", type=int, default=1)
    ap.add_argument("--ads-per-page", type=int, default=2000)
    args = ap.parse_args()

    spark = get_spark(
        f"olx_crawl_scaling_{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
        # crawl rows are CPU-heavy per byte: size scan splits and AQE
        # targets by row-work, not the 64/128MB analytics defaults,
        # else 1M-row stages collapse to 2-4 tasks
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 * 1024 * 1024),
        },
    )
    graph = make_scaling_graph(
        n_hosts=args.hosts, pages_per_host=args.pages, ads_per_page=args.ads_per_page
    )
    cfg = CrawlConfig(
        mode="scaled",
        dedup_scope="global_bloom",
        checkpoint_dir=tempfile.mkdtemp(prefix=f"olx_scaling_{args.cores}_"),
        max_rounds=10,
        with_payload=True,
        bloom_shards=64,
        bloom_bits_per_shard=1 << 20,
        per_host_per_round=1_000_000,
        round_budget_ms=10_000_000,
        host_salt_buckets=max(8, args.cores),
        store_payload_bytes=False,  # compute payload, sink metadata only
    )
    eng = ScaledCrawlEngine(spark, graph, cfg)
    # exact per-seed budgets: the run loop's done-check then terminates
    # right after the last productive round (no trailing empty round)
    seeds = [
        dict(s, count=args.pages * args.ads_per_page) for s in graph.seeds
    ]
    t0 = time.perf_counter()
    eng.run(seeds)
    elapsed = time.perf_counter() - t0
    n_ads = eng.fetch_log().count()
    urls = n_ads + args.hosts * args.pages  # ad fetches + listing fetches
    seen_count = eng.seen_fps().distinct().count()
    print(
        json.dumps(
            {
                "cores": args.cores,
                "urls": urls,
                "sec": round(elapsed, 3),
                "urls_per_sec": round(urls / elapsed, 2),
                "rounds": len(eng.store.committed_rounds()),
                "seen_count": seen_count,
            }
        )
    )


if __name__ == "__main__":
    main()
