"""Isolated-stage microbench for the per-round pending derivation
(BENCH.md round-5): the exact stage class the bucketed layout changed.

Phase "build" materializes the SAME synthetic state twice — one
bucketed store (colocated path) and one plain store (fallback shuffle
path): a frontier of ``--rows`` discovered URLs across ``--hosts``
hosts plus Bloom ``seen_shards`` covering half the fingerprints.
Phase "time" runs the pending derivation (probe + first-seen dedup)
to a count at the session's parallelism and prints one JSON line per
mode. Run via spark-submit at local[2] and local[8] to read the
stage's own scaling efficiency with and without the shuffle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from olx_spark.operators.dedup import BloomSeenFilter, colocated_pending, first_seen_dedup
from olx_spark.plans.snapshot import SnapshotStore
from olx_spark.session import get_spark

SCHEMA_DDL = (
    "url string, url_fp long, host string, discovery_round int, "
    "parent_fp long, discovery_pos int"
)  # url included: the shuffle's real cost is moving the wide rows
N_SHARDS = 64
M_BITS = 1 << 20
ORDER = ["discovery_round", "parent_fp", "discovery_pos"]


def synth(spark, rows: int, hosts: int, dup_frac: float = 0.1):
    base = spark.range(rows)
    url = F.concat(
        F.lit("https://h"),
        (F.col("id") % hosts).cast("string"),
        F.lit(".example/obyavlenie/listing-page-item-"),
        (F.col("id") % int(rows * (1 - dup_frac))).cast("string"),
        F.lit("-ID8abc42.html"),
    )
    return base.select(
        url.alias("url"),
        F.xxhash64((F.col("id") % int(rows * (1 - dup_frac))).cast("string")).alias(
            "url_fp"
        ),
        F.concat(F.lit("h"), (F.col("id") % hosts).cast("string")).alias("host"),
        (F.col("id") % 5).cast("int").alias("discovery_round"),
        (F.col("id") % 1000).alias("parent_fp"),
        (F.col("id") % 100000).cast("int").alias("discovery_pos"),
    )


def build(spark, root: str, rows: int, hosts: int) -> None:
    frontier = synth(spark, rows, hosts)
    seen = frontier.select("url_fp").distinct().sample(0.5, seed=7)
    bloom = BloomSeenFilter(spark, n_shards=N_SHARDS, m_bits_per_shard=M_BITS)
    shards = bloom.build_deltas(seen)
    for tag, bucketed in (("bucketed", True), ("plain", False)):
        store = SnapshotStore(os.path.join(root, tag), spark)
        if bucketed:
            store.set_bucket_spec("frontier", "url_fp", N_SHARDS)
            store.set_bucket_spec("seen_shards", "shard_id", N_SHARDS)
        store.commit_round(
            0, {"frontier": frontier, "seen_shards": shards}, {"next_round": 1}
        )


def pending_df(spark, root: str, mode: str):
    store = SnapshotStore(os.path.join(root, mode), spark)
    if mode == "bucketed":
        n_b, f_files = store.bucket_files("frontier")
        _, s_files = store.bucket_files("seen_shards")
        from pyspark.sql.types import StructType

        return colocated_pending(
            spark,
            StructType.fromDDL(SCHEMA_DDL),
            n_b,
            f_files,
            ORDER,
            shard_files=s_files,
            m_bits=M_BITS,
            k=7,
        )
    bloom = BloomSeenFilter(spark, n_shards=N_SHARDS, m_bits_per_shard=M_BITS)
    bloom.set_state(store.read_table("seen_shards"))
    probed = bloom.probe(store.read_table("frontier"))
    return first_seen_dedup(
        probed.filter(~F.col("maybe_seen")).drop("maybe_seen"), ["url_fp"], ORDER
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["build", "time"], required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--hosts", type=int, default=512)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark(
        f"pending_stage_{args.phase}_{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    if args.phase == "build":
        build(spark, args.root, args.rows, args.hosts)
        print(json.dumps({"built": args.root, "rows": args.rows}))
        return
    for mode in ("bucketed", "plain"):
        df = pending_df(spark, args.root, mode)
        n = df.count()  # warm-up (page cache + codegen)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df.count()
            times.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "mode": mode,
                    "cores": args.cores,
                    "pending_rows": n,
                    "times": times,
                    "median_sec": sorted(times)[len(times) // 2],
                }
            )
        )


if __name__ == "__main__":
    main()
