"""AIMD crawl-delay controller tests: hand-unrolled recurrence,
clamp bounds, per-host independence, determinism, plan tier."""

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.aimd import adaptive_crawl_delay


def _replay(outcomes, d0=1000, lo=250, hi=64000, dec=100, mult=2):
    d, rows = d0, []
    for oc in outcomes:
        before = d
        d = min(hi, d * mult) if oc == "throttle" else max(lo, d - dec)
        rows.append((before, d))
    return rows


def test_hand_unrolled_trajectory(spark):
    outcomes = ["ok", "ok", "throttle", "ok", "throttle", "throttle", "ok"]
    df = spark.createDataFrame(
        [("h", i + 1, oc) for i, oc in enumerate(outcomes)],
        "host string, seq long, outcome string",
    )
    got = sorted(
        (r["seq"], r["delay_before"], r["delay_after"])
        for r in adaptive_crawl_delay(df).collect()
    )
    want = [(i + 1, b, a) for i, (b, a) in enumerate(_replay(outcomes))]
    assert got == want
    # spot-check the arithmetic really is AIMD
    assert got[0][1:] == (1000, 900)       # ok: -100
    assert got[2][1:] == (800, 1600)       # throttle: *2
    assert got[5][1:] == (3000, 6000)      # stacked backoff


def test_clamps_hit_both_bounds(spark):
    df = spark.createDataFrame(
        [("up", i + 1, "throttle") for i in range(12)]
        + [("down", i + 1, "ok") for i in range(12)],
        "host string, seq long, outcome string",
    )
    out = adaptive_crawl_delay(df).collect()
    up = max(r["delay_after"] for r in out if r["host"] == "up")
    down = min(r["delay_after"] for r in out if r["host"] == "down")
    assert up == 64000 and down == 250


def test_hosts_are_independent_and_gaps_ok(spark):
    df = spark.createDataFrame(
        [("a", 10, "throttle"), ("a", 30, "ok"), ("b", 5, "ok")],
        "host string, seq long, outcome string",
    )
    got = {(r["host"], r["seq"]): r for r in adaptive_crawl_delay(df).collect()}
    assert got[("a", 10)]["delay_before"] == 1000
    assert got[("a", 30)]["delay_before"] == 2000  # state carried, gap ignored
    assert got[("b", 5)]["delay_before"] == 1000   # fresh state per host


def test_deterministic_and_plan_tier(spark):
    df = spark.createDataFrame(
        [(f"h{i % 7}", i, ("throttle", "ok")[i % 3 != 0]) for i in range(200)],
        "host string, seq long, outcome string",
    )
    a = sorted(map(tuple, adaptive_crawl_delay(df).collect()))
    b = sorted(map(tuple, adaptive_crawl_delay(df).collect()))
    assert a == b
    plan = adaptive_crawl_delay(df)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan


def test_bad_params_rejected(spark):
    df = spark.createDataFrame(
        [("h", 1, "ok")], "host string, seq long, outcome string"
    )
    with pytest.raises(ValueError):
        adaptive_crawl_delay(df, d0=10, lo=250)
    with pytest.raises(ValueError):
        adaptive_crawl_delay(df, mult=0)
