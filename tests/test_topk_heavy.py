"""Certified exact top-k heavy hitters (Misra-Gries candidate
pruning + exact recount): equals the brute-force top-k with the
certificate set on skewed data, reports uncertified on near-uniform
data with a tiny capacity, deterministic ties."""

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.cms import exact_topk_heavy


def _zipfish(spark, n=20000):
    # key j appears ~ n/(j+1) times -> heavy head, long tail
    return spark.range(n).select(
        F.concat(
            F.lit("k"),
            F.floor(
                F.pow(F.lit(2.0), F.floor(F.log2(F.col("id") + 1)))
            ).cast("long").cast("string"),
        ).alias("key")
    )


def test_equals_bruteforce_and_certified(spark):
    df = _zipfish(spark)
    got = exact_topk_heavy(df, "key", k=5).collect()
    want = (
        df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(5).collect()
    )
    assert [(r["key"], r["cnt"]) for r in got] == [
        (r["key"], r["cnt"]) for r in want
    ]
    assert all(r["certified"] for r in got)


def test_planted_heavy_key_survives_tiny_capacity(spark):
    df = spark.range(10000).select(
        F.when(F.col("id") % 3 == 0, "HEAVY")
        .otherwise(F.concat(F.lit("t"), F.col("id").cast("string")))
        .alias("key")
    )
    got = exact_topk_heavy(df, "key", k=1, capacity=8).collect()
    assert got[0]["key"] == "HEAVY"
    assert got[0]["cnt"] == len([i for i in range(10000) if i % 3 == 0])
    assert got[0]["certified"]  # 3334 * 8 > 10000


def test_uniform_data_reports_uncertified(spark):
    df = spark.range(5000).select(
        F.concat(F.lit("u"), (F.col("id") % 1000).cast("string")).alias("key")
    )
    got = exact_topk_heavy(df, "key", k=3, capacity=10).collect()
    # 1000 near-equal keys through 10 counters: exact counts of the
    # candidates, but no top-k guarantee -> flagged, not raised
    assert len(got) == 3
    assert not got[0]["certified"]


def test_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], "key string"
    )
    got = exact_topk_heavy(df, "key", k=2).collect()
    assert [(r["key"], r["cnt"]) for r in got] == [("a", 2), ("b", 2)]


def test_bad_k(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError):
        exact_topk_heavy(df, "key", k=0)


def test_null_keys_excluded_from_total_across_partitions(spark):
    # r6 internals: the certificate's N is now the sum of per-partition
    # sentinel rows from the Misra-Gries pass — pin that nulls stay out
    # of N and per-partition totals add up over a many-partition frame.
    df = spark.range(9000).select(
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("string"))
        .when(F.col("id") % 3 == 1, F.lit("hot"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 50).cast("string")))
        .alias("key")
    ).repartition(7)
    got = exact_topk_heavy(df, "key", k=1, capacity=8).collect()
    assert got[0]["key"] == "hot" and got[0]["cnt"] == 3000
    # N excludes the 3000 nulls: 3000 * 8 > 6000 -> certified; if nulls
    # leaked into N the margin would still hold, so also pin the exact
    # uncertified complement: with capacity=2, kth*cap = 6000 == N must
    # NOT certify (strict inequality over the null-free total)
    got2 = exact_topk_heavy(df, "key", k=1, capacity=2).collect()
    assert got2[0]["cnt"] == 3000 and not got2[0]["certified"]
