"""Bloom-filter semi-join reduction (operators/joins.py)."""

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.joins import (
    bloom_filtered_join,
    bloom_geometry,
    bloom_prefilter,
)


@pytest.fixture(scope="module")
def sides(spark):
    # big: 2000 distinct keys x 10 rows; small: 30 hot keys (plus 5
    # keys that match nothing in big — bloom build tolerates them)
    big = spark.range(20_000).select(
        (F.col("id") % 2000).alias("k"), F.col("id").alias("payload")
    )
    small = spark.range(35).select(
        (F.col("id") * 63).alias("k"),  # 0,63,...,2142: 32 in-range
        (F.col("id") * 100).alias("w"),
    )
    return big.cache(), small.cache()


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_geometry_standard_optima():
    m, k = bloom_geometry(1000, 0.01)
    assert 9585 <= m <= 9600 and m % 8 == 0
    assert k == 7
    assert bloom_geometry(0, 0.01) == (8, 1)
    with pytest.raises(ValueError):
        bloom_geometry(10, 1.5)


def test_join_equals_plain_join(sides):
    big, small = sides
    got = bloom_filtered_join(big, small, "k")
    want = big.join(small, "k")
    assert _sorted(got) == _sorted(want)


def test_prefilter_no_false_negatives_and_selective(sides):
    big, small = sides
    pruned = bloom_prefilter(big, small, "k", fpp=0.01)
    hot = {r["k"] for r in small.collect()}
    surviving = pruned.collect()
    # every genuinely-matching row survived
    assert sum(1 for r in surviving if r["k"] in hot) == 32 * 10
    # and the prune actually pruned: 320 matches + ~1% fp of 19680
    assert len(surviving) < 1200


def test_multi_column_key(spark):
    big = spark.range(5000).select(
        (F.col("id") % 50).alias("a"),
        (F.col("id") % 7).alias("b"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(1, 1, "x"), (2, 3, "y"), (49, 6, "z")], "a long, b long, t string"
    )
    got = bloom_filtered_join(big, small, ["a", "b"])
    want = big.join(small, ["a", "b"])
    assert _sorted(got) == _sorted(want)
    assert got.count() > 0


def test_null_keys_match_plain_join(spark):
    big = spark.createDataFrame(
        [(1, "m"), (None, "n1"), (2, "o"), (None, "n2")], "k long, s string"
    )
    small = spark.createDataFrame([(1, 10), (None, 99)], "k long, w long")
    got = bloom_filtered_join(big, small, "k")
    want = big.join(small, "k")
    assert _sorted(got) == _sorted(want)  # nulls never join, both sides


def test_empty_build_side_yields_empty_join(spark, sides):
    big, small = sides
    none = small.filter(F.col("k") < 0)
    assert bloom_filtered_join(big, none, "k", expected=0).count() == 0


def test_outer_join_refused(sides):
    big, small = sides
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_filtered_join(big, small, "k", how="left")


def test_oversized_filter_refused(sides):
    big, small = sides
    with pytest.raises(ValueError, match="max_m_bits"):
        bloom_prefilter(big, small, "k", expected=10**9, max_m_bits=1 << 20)


def test_probe_runs_before_join_exchange(sides):
    # the Arrow-batched membership probe must sit on the big side's
    # scan stage, upstream of the join — i.e. the pruned frame's own
    # plan already contains it, so whatever Exchange the join adds
    # happens AFTER the prune.
    big, small = sides
    pruned = bloom_prefilter(big, small, "k")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan  # the prune itself shuffles nothing
