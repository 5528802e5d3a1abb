"""Per-stage scaling profile of the crawl leg (event-log analysis).

Runs the exact scaling-run crawl (scripts/crawl_job.py semantics) at
one parallelism level with ``spark.eventLog`` enabled, then parses the
event log into a per-stage-class table: wall time, summed task time,
shuffle read/write bytes. Running it at local[2] and local[8] and
diffing the two JSON outputs shows WHICH stage classes hold 2v8
efficiency below target — fixed-cost stages show equal wall at both
levels, exchange-bound stages show the documented ~0.7 ceiling, CPU
UDF stages scale ~1.0.

Stage classes are keyed by the first line of the stage name (the
callsite), which Spark keeps stable across rounds of the same plan.

Usage:
  python scripts/stage_profile.py --cores 8 --ads-per-page 4000 \
      --out /tmp/prof8.json
  python scripts/stage_profile.py --compare /tmp/prof2.json /tmp/prof8.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(cores: int, hosts: int, ads_per_page: int, out: str) -> None:
    from olx_spark.fixtures.crawl_graph import make_scaling_graph
    from olx_spark.plans.crawl import CrawlConfig
    from olx_spark.plans.scaled import ScaledCrawlEngine
    from olx_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix=f"olx_evlog_{cores}_")
    spark = get_spark(
        f"olx_stage_profile_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 * 1024 * 1024),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    graph = make_scaling_graph(
        n_hosts=hosts, pages_per_host=1, ads_per_page=ads_per_page
    )
    cfg = CrawlConfig(
        mode="scaled",
        dedup_scope="global_bloom",
        checkpoint_dir=tempfile.mkdtemp(prefix=f"olx_prof_{cores}_"),
        max_rounds=10,
        with_payload=True,
        bloom_shards=64,
        bloom_bits_per_shard=1 << 20,
        per_host_per_round=1_000_000,
        round_budget_ms=10_000_000,
        host_salt_buckets=max(8, cores),
        store_payload_bytes=False,
    )
    eng = ScaledCrawlEngine(spark, graph, cfg)
    seeds = [dict(s, count=1 * ads_per_page) for s in graph.seeds]
    t0 = time.perf_counter()
    eng.run(seeds)
    elapsed = time.perf_counter() - t0
    n_ads = eng.fetch_log().count()
    urls = n_ads + hosts
    spark.stop()  # flushes the event log
    stages = parse_event_dir(evdir)
    payload = {
        "cores": cores,
        "urls": urls,
        "sec": round(elapsed, 3),
        "urls_per_sec": round(urls / elapsed, 2),
        "stages": stages,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: payload[k] for k in ("cores", "urls", "sec", "urls_per_sec")}))


def parse_event_dir(evdir: str) -> dict:
    """Aggregate the (single) event log in ``evdir`` by stage class."""
    # Spark 4 rolling format: evdir/eventlog_v2_<app>/events_* files
    logs = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            p = os.path.join(root, f)
            if not f.startswith(".") and "appstatus" not in f and os.path.isfile(p):
                logs.append(p)
    agg: dict[str, dict] = {}
    # task metrics keyed by (stageId, attempt) then folded into the class
    task_time: dict[tuple, float] = {}
    task_max: dict[tuple, float] = {}
    task_n: dict[tuple, int] = {}
    sh_read: dict[tuple, float] = {}
    sh_write: dict[tuple, float] = {}
    stage_class: dict[tuple, str] = {}
    stage_wall: dict[tuple, float] = {}
    def _open(path):
        if path.endswith(".zstd"):
            # pyspark vendors zstandard? no — but pandas/pyarrow do.
            import io

            import pyarrow as pa

            return io.TextIOWrapper(
                pa.CompressedInputStream(pa.OSFile(path, "rb"), "zstd")
            )
        return open(path)

    for lg in logs:
        with _open(lg) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    key = (si["Stage ID"], si["Stage Attempt ID"])
                    # classify by the stage's operator-scope signature —
                    # the literal stage name is just the AQE thread-pool
                    # callsite, identical for every stage
                    scopes = set()
                    for r in si.get("RDD Info", []):
                        sc = r.get("Scope")
                        if sc:
                            nm = json.loads(sc).get("name", "")
                            scopes.add(nm.split(" (")[0])
                    scopes -= {"mapPartitionsInternal", "mapPartitions",
                               "map", "AdaptiveSparkPlan"}
                    name = "+".join(sorted(scopes)) or "?"
                    stage_class[key] = name
                    sub, comp = si.get("Submission Time"), si.get("Completion Time")
                    if sub and comp:
                        stage_wall[key] = (comp - sub) / 1000.0
                elif et == "SparkListenerTaskEnd":
                    key = (ev["Stage ID"], ev["Stage Attempt ID"])
                    tm = ev.get("Task Metrics") or {}
                    t_run = tm.get("Executor Run Time", 0) / 1000.0
                    task_time[key] = task_time.get(key, 0.0) + t_run
                    task_max[key] = max(task_max.get(key, 0.0), t_run)
                    task_n[key] = task_n.get(key, 0) + 1
                    srm = tm.get("Shuffle Read Metrics") or {}
                    sh_read[key] = (
                        sh_read.get(key, 0.0)
                        + srm.get("Remote Bytes Read", 0)
                        + srm.get("Local Bytes Read", 0)
                    )
                    swm = tm.get("Shuffle Write Metrics") or {}
                    sh_write[key] = sh_write.get(key, 0.0) + swm.get(
                        "Shuffle Bytes Written", 0
                    )
    for key, name in stage_class.items():
        a = agg.setdefault(
            name,
            {"n": 0, "wall_s": 0.0, "task_s": 0.0, "task_max_s": 0.0,
             "tasks": 0, "shuf_read_mb": 0.0, "shuf_write_mb": 0.0},
        )
        a["n"] += 1
        a["wall_s"] += stage_wall.get(key, 0.0)
        a["task_s"] += task_time.get(key, 0.0)
        a["task_max_s"] = max(a["task_max_s"], task_max.get(key, 0.0))
        a["tasks"] += task_n.get(key, 0)
        a["shuf_read_mb"] += sh_read.get(key, 0.0) / 1e6
        a["shuf_write_mb"] += sh_write.get(key, 0.0) / 1e6
    for a in agg.values():
        for k in ("wall_s", "task_s", "task_max_s", "shuf_read_mb", "shuf_write_mb"):
            a[k] = round(a[k], 3)
    return agg


def compare(path_lo: str, path_hi: str) -> None:
    lo, hi = (json.load(open(p)) for p in (path_lo, path_hi))
    c_lo, c_hi = lo["cores"], hi["cores"]
    ratio = c_hi / c_lo
    if lo.get("sec") and hi.get("sec"):  # None when re-parsed offline
        print(
            f"overall: {c_lo}c {lo['sec']}s vs {c_hi}c {hi['sec']}s -> "
            f"eff {(lo['sec'] / hi['sec']) / ratio:.3f}"
        )
    rows = []
    for name, a in lo["stages"].items():
        b = hi["stages"].get(name)
        if b is None:
            rows.append((a["wall_s"], name, a, None))
            continue
        rows.append((a["wall_s"], name, a, b))
    rows.sort(reverse=True)
    hdr = (
        f"{'stage class':58s} {'n':>3s} {'lo wall':>8s} {'hi wall':>8s} "
        f"{'eff':>6s} {'lo task':>8s} {'hi task':>8s} {'shW MB':>8s}"
    )
    print(hdr)
    for wall, name, a, b in rows[:30]:
        if b is None:
            print(f"{name[:58]:58s} {a['n']:3d} {a['wall_s']:8.1f} {'--':>8s}")
            continue
        eff = (a["wall_s"] / b["wall_s"]) / ratio if b["wall_s"] else float("nan")
        print(
            f"{name[:58]:58s} {a['n']:3d} {a['wall_s']:8.1f} {b['wall_s']:8.1f} "
            f"{eff:6.2f} {a['task_s']:8.1f} {b['task_s']:8.1f} "
            f"{a['shuf_write_mb']:8.1f}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--hosts", type=int, default=512)
    ap.add_argument("--ads-per-page", type=int, default=4000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--compare", nargs=2, default=None)
    args = ap.parse_args()
    if args.compare:
        compare(*args.compare)
        return
    out = args.out or f"/tmp/stage_prof_{args.cores}.json"
    run_leg(args.cores, args.hosts, args.ads_per_page, out)


if __name__ == "__main__":
    main()
