"""Z-order layout (operators/layout.py).

Bit semantics pinned against a Python replay; the LOCALITY property is
asserted directly (per-bucket bounding boxes on a uniform grid are
quadrant-tight on BOTH dimensions — the multi-column pruning claim,
vs a single-column sort where the second dimension never prunes); the
written layout is verified by reading the files back and checking
footer-style min/max disjointness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.layout import (
    write_zordered,
    zorder_bucket_profile,
    zorder_buckets,
    zorder_key,
)


def _py_z(vals, bits, n):
    z = 0
    for j, x in enumerate(vals):
        for b in range(bits):
            z += ((x >> b) & 1) << (b * n + j)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    # exact 16x16 grid: normalization is identity at bits=4
    rows = [(x, y) for x in range(16) for y in range(16)]
    return spark.createDataFrame(rows, "a long, b long")


def test_key_matches_python_replay(spark, grid):
    got = {(r["a"], r["b"]): r["zval"] for r in zorder_key(grid, ["a", "b"], bits=4).collect()}
    for (a, b), z in got.items():
        assert z == _py_z([a, b], 4, 2), (a, b)


def test_buckets_are_quadrants_on_both_dims(spark, grid):
    # 4 buckets over a 16x16 grid -> each bucket must span at most
    # half the domain in EACH dimension (the pruning property a
    # single-column sort cannot give)
    prof = zorder_bucket_profile(grid, ["a", "b"], bits=4, n_buckets=4).collect()
    assert len(prof) == 4
    for r in prof:
        assert r["n_rows"] == 64
        assert r["max_a"] - r["min_a"] <= 7
        assert r["max_b"] - r["min_b"] <= 7


def test_more_buckets_tighter_cells(spark, grid):
    prof = zorder_bucket_profile(grid, ["a", "b"], bits=4, n_buckets=16).collect()
    assert len(prof) == 16
    for r in prof:
        assert r["n_rows"] == 16
        assert r["max_a"] - r["min_a"] <= 3
        assert r["max_b"] - r["min_b"] <= 3


def test_constant_column_degrades_gracefully(spark):
    rows = [(x, 5) for x in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = zorder_buckets(df, ["a", "b"], bits=4, n_buckets=4).collect()
    # constant column contributes zero bits; z reduces to a's lane
    assert len({r["file_bucket"] for r in out}) > 1


def test_validation(spark, grid):
    with pytest.raises(ValueError, match="power of two"):
        zorder_buckets(grid, ["a", "b"], bits=4, n_buckets=3)
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key(grid, ["a"], bits=4)
    with pytest.raises(ValueError, match="bits"):
        zorder_key(grid, ["a", "b"], bits=0)
    with pytest.raises(ValueError, match="exceeds key space"):
        zorder_buckets(grid, ["a", "b"], bits=1, n_buckets=16)


def test_written_files_prune_on_both_columns(spark, grid, tmp_path):
    out = str(tmp_path / "zordered")
    write_zordered(grid, out, ["a", "b"], bits=4, n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 256
    assert set(back.columns) == {"a", "b", "file_bucket"}
    # per-FILE min/max (what footer pruning reads): each file must be
    # range-restricted on both dims
    stats = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("a"), F.max("a"), F.min("b"), F.max("b"))
        .collect()
    )
    assert len(stats) == 4
    for r in stats:
        assert r["max(a)"] - r["min(a)"] <= 7
        assert r["max(b)"] - r["min(b)"] <= 7


def test_explicit_stats_skip_the_scan(spark, grid):
    # passing catalog stats must produce the identical key with no agg
    with_scan = {(r["a"], r["b"]): r["zval"] for r in zorder_key(grid, ["a", "b"], bits=4).collect()}
    given = {(r["a"], r["b"]): r["zval"] for r in zorder_key(
        grid, ["a", "b"], bits=4, stats={"a": (0, 15), "b": (0, 15)}
    ).collect()}
    assert with_scan == given


class TestSizeBalancedAssignment:
    def _assign(self, spark, sizes, target):
        from olx_spark.operators.layout import size_balanced_assignment

        df = spark.createDataFrame(
            [(i, int(s)) for i, s in enumerate(sizes)], "id long, nbytes long"
        )
        out = size_balanced_assignment(df, "nbytes", ["id"], target)
        return [r["file_id"] for r in out.orderBy("id").collect()]

    def test_boundaries_at_cumulative_target(self, spark):
        got = self._assign(spark, [400, 400, 400, 400, 400], 1000)
        # before-bytes: 0,400,800,1200,1600 -> files 0,0,0,1,1
        assert got == [0, 0, 0, 1, 1]

    def test_oversized_row_gets_own_file(self, spark):
        got = self._assign(spark, [100, 5000, 100, 100], 1000)
        # before: 0,100,5100,5200 -> 0,0,5,5: the giant row opens its
        # file and pushes the cursor past four empty slots (no split)
        assert got == [0, 0, 5, 5]

    def test_files_near_target_under_skew(self, spark):
        import random

        rng = random.Random(7)
        sizes = [rng.choice([50, 80, 120, 4000]) for _ in range(400)]
        got = self._assign(spark, sizes, 10_000)
        by_file = {}
        for s, f in zip(sizes, got):
            by_file[f] = by_file.get(f, 0) + s
        # every file except possibly the last crosses the target once
        # it closes, and none exceeds target + max row size
        fids = sorted(by_file)
        for f in fids[:-1]:
            assert by_file[f] <= 10_000 + 4000
        # clustered: file ids are nondecreasing in sort order
        assert got == sorted(got)

    def test_bad_target_refused(self, spark):
        import pytest as _pytest

        from olx_spark.operators.layout import size_balanced_assignment

        df = spark.createDataFrame([(1, 10)], "id long, nbytes long")
        with _pytest.raises(ValueError):
            size_balanced_assignment(df, "nbytes", ["id"], 0)
