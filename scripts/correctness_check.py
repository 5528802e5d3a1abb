"""Local approximation of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, compare row count,
sorted-by-name schema, and a normalized value hash (columns sorted
by name, rows sorted, floats rounded to 9 significant-ish digits so
double formatting differences don't false-alarm).

Usage: python scripts/correctness_check.py [--sf /root/testdata/sf0.01] [--keys k1,k2]
Prints one line per key and a final JSON summary; exit 1 on any miss.
"""

from __future__ import annotations

import argparse
import hashlib
import importlib.util
import json
import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = ["\x1f".join(_norm_cell(v) for v in rec) for rec in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--keys", default="")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location("entry", os.path.join(REPO, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs, osql = m.queries(), m.oracle_sql()
    keys = [k for k in qs if not args.keys or k in args.keys.split(",")]

    from olx_spark.session import get_spark

    spark = get_spark("correctness_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    results, bad = {}, []
    for k in keys:
        t0 = time.time()
        try:
            sdf = qs[k](spark, args.sf)
            sp = sdf.toPandas()
            op = con.execute(osql[k]).fetchdf() if k in osql else None
            r = {
                "rows_match": op is not None and len(sp) == len(op),
                "schema_match": op is not None and sorted(sp.columns) == sorted(op.columns),
                "hash_match": False,
                "spark_rows": len(sp),
                "oracle_rows": None if op is None else len(op),
                "err": None,
            }
            if r["rows_match"] and r["schema_match"]:
                r["hash_match"] = frame_hash(sp) == frame_hash(op)
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            r = {"rows_match": False, "schema_match": False, "hash_match": False,
                 "spark_rows": None, "oracle_rows": None, "err": f"{type(e).__name__}: {e}"[:300]}
        ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
        if not ok:
            bad.append(k)
        results[k] = r
        print(f"{'PASS' if ok else 'FAIL'} {k} ({time.time()-t0:.1f}s) rows={r['spark_rows']}/{r['oracle_rows']}"
              + (f" err={r['err']}" if r["err"] else ""), flush=True)

    print(json.dumps({"pass": len(keys) - len(bad), "total": len(keys), "failed": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
