"""Raw no-Spark host-health probe (BENCH.md hardware-table protocol).

Measures make_image_row throughput single-process and at 2/4/8
worker processes via multiprocessing — no JVM, no Spark — so the
number is a pure box-weather reading. Scaling runs are only
comparable to targets when this reads in the healthy-box class
(~3,000 imgs/s single-proc; throttled days read 450-670).

Usage: python scripts/host_probe.py [--n 4000]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olx_spark.fixtures.images import make_image_row  # noqa: E402


def _work(args: tuple[int, int]) -> int:
    start, n = args
    for i in range(start, start + n):
        make_image_row(i)
    return n


def run(procs: int, n: int) -> float:
    chunks = [(k * n // procs, n // procs) for k in range(procs)]
    t0 = time.time()
    if procs == 1:
        _work(chunks[0])
    else:
        with mp.Pool(procs) as pool:
            pool.map(_work, chunks)
    dt = time.time() - t0
    return (n // procs) * procs / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4000)
    args = ap.parse_args()
    run(1, min(500, args.n))  # warm-up (imports, numpy JIT-ish paths)
    out = {}
    base = None
    for p in (1, 2, 4, 8):
        thr = run(p, args.n * p)
        out[f"imgs_per_sec_{p}p"] = round(thr, 1)
        if p == 1:
            base = thr
        else:
            prev = out[f"imgs_per_sec_{p // 2}p"]
            out[f"step_eff_{p // 2}to{p}"] = round(thr / prev / 2, 3)
    out["class"] = "healthy" if base and base > 1500 else "throttled"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
