"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink, reports per-rep seconds plus the Spark
job/stage counts for one execution, and can dump
``.explain("formatted")`` to a file. ``bench.py`` stays frozen; this
is the measurement harness for OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py q_hits q_pagerank            # time keys
  python bench_extra.py --explain plans/r06 q_hits   # also dump plans
  python bench_extra.py --reps 3 --all               # whole suite
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from olx_spark.session import get_spark  # noqa: E402


def _sink(df) -> None:
    df.write.mode("overwrite").format("noop").save()


class JobCounter:
    """Counts Spark jobs/stages/tasks via the Java status tracker
    delta (no listener plumbing needed from Python)."""

    def __init__(self, spark):
        self.sc = spark.sparkContext
        self.t = self.sc._jsc.sc().statusTracker()

    def snapshot(self):
        jobs = self.t.getJobIdsForGroup(None)
        return max(list(jobs) or [-1])

    def jobs_since(self, mark):
        jobs = [j for j in self.t.getJobIdsForGroup(None) if j > mark]
        return len(jobs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default="", help="dir to write <key>.txt plans")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("olx_spark_bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    queries = entry_mod.queries()
    keys = list(queries) if args.all else args.keys
    jc = JobCounter(spark)

    out = {}
    for key in keys:
        fn = queries[key]
        spark.sparkContext.setJobDescription(f"{key}: warmup")
        df = fn(spark, sf_dir)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            with open(os.path.join(args.explain, f"{key}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        _sink(df)
        times = []
        mark = jc.snapshot()
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{key}: rep {i}")
            t0 = time.perf_counter()
            _sink(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
        n_jobs = jc.jobs_since(mark)
        out[key] = {
            "median": round(statistics.median(times), 3),
            "reps": times,
            "jobs_per_rep": round(n_jobs / args.reps, 1),
        }
        print(f"{key}: median={out[key]['median']}s reps={times} "
              f"jobs/rep={out[key]['jobs_per_rep']}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
