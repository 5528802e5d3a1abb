"""HyperLogLog sketch tests: accuracy, merge losslessness, the
linear-counting branch, portability vs an independent DuckDB replay,
and the scale shape (register row bound)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from olx_spark.operators.sketches import (
    _alpha,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _ids(spark, n, prefix="k"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("k")
    )


def test_accuracy_raw_branch(spark):
    # 50k distinct at p=12 (sigma = 1.04/64 ~ 1.6%): the raw-estimator
    # branch; assert within 5 sigma
    n = 50_000
    est = hll_distinct(_ids(spark, n), "k", p=12).first()["n_distinct_est"]
    assert abs(est - n) / n < 0.08, est


def test_linear_counting_small_range(spark):
    # 300 distinct at p=12: raw <= 2.5m, so linear counting applies and
    # is near-exact at this load factor
    n = 300
    est = hll_distinct(_ids(spark, n), "k", p=12).first()["n_distinct_est"]
    assert abs(est - n) / n < 0.02, est


def test_duplicates_do_not_inflate(spark):
    # every key 40x: estimate unchanged (function of the distinct set)
    n = 2_000
    once = _ids(spark, n)
    many = once.crossJoin(spark.range(40)).select("k")
    e1 = hll_distinct(once, "k", p=10).first()["n_distinct_est"]
    e2 = hll_distinct(many, "k", p=10).first()["n_distinct_est"]
    assert e1 == e2


def test_merge_is_lossless(spark):
    # sketch(A) merge sketch(B) == sketch(A union B), register-exact
    a, b = _ids(spark, 3_000, "a"), _ids(spark, 3_000, "b")
    merged = hll_merge(
        hll_registers(a, "k", p=9).unionByName(hll_registers(b, "k", p=9))
    )
    whole = hll_registers(a.unionByName(b), "k", p=9)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_grouped_and_register_bound(spark):
    p = 7
    df = spark.range(20_000).select(
        (F.col("id") % 4).alias("g"), F.col("id").cast("string").alias("k")
    )
    regs = hll_registers(df, "k", ["g"], p=p)
    per_group = regs.groupBy("g").count().collect()
    assert len(per_group) == 4
    assert all(r["count"] <= (1 << p) for r in per_group)
    est = hll_estimate(regs, p, ["g"]).collect()
    for r in est:  # 5k distinct per group, sigma ~9.2% at p=7
        assert abs(r["n_distinct_est"] - 5_000) / 5_000 < 0.4


def test_portable_vs_duckdb_replay(spark):
    # the portability CLAIM: an independent engine computing the same
    # spec gets bit-identical registers and (to double rounding) the
    # same estimate. DuckDB replay of hash/index/rho/harmonic-sum.
    p, m, w, k1 = 8, 256, 52, 53
    keys = [f"u{i}" for i in range(1_500)]
    sdf = spark.createDataFrame([(k,) for k in keys], "k string")
    s_est = hll_distinct(sdf, "k", p=p).first()["n_distinct_est"]
    num = _alpha(m) * m * m * float(1 << k1)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys}))
    d_est = con.execute(f"""
        with h as (select (('0x' || substr(md5(k), 1, 15))::bigint) as hh from t),
        b as (select (hh >> {w})::int as idx,
                     case when (hh & ((1::bigint << {w}) - 1)) = 0 then {k1}
                          else strpos(lpad(bin(hh & ((1::bigint << {w}) - 1)), {w}, '0'), '1')
                     end as rho from h),
        r as (select idx, max(rho) as rho from b group by 1),
        s as (select count(*) as nz,
                     sum((1::bigint << ({k1} - rho))::bigint)::bigint as sc from r)
        select case when ({num!r}::double / (sc + ({m} - nz) * (1::bigint << {k1})))
                         <= {2.5 * m!r}::double and ({m} - nz) > 0
                    then {float(m)!r}::double * ln({float(m)!r}::double / ({m} - nz))
                    else {num!r}::double / (sc + ({m} - nz) * (1::bigint << {k1}))
               end from s
    """).fetchone()[0]
    assert s_est == pytest.approx(d_est, rel=1e-12, abs=0.0)


def test_p_validation():
    with pytest.raises(ValueError):
        hll_registers(None, "k", p=3)
    with pytest.raises(ValueError):
        hll_registers(None, "k", p=19)
