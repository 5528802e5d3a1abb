"""Image tile statistics (operators/multimodal.image_tile_stats).

Ground truth pinned on hand-built pixel arrays (quadrant-constant
image -> known sums), the floor-boundary geometry on non-divisible
dims, the grid clamp on degenerate thumbnails, reconstruction (tiles
partition the image exactly), and corrupt-payload behavior.
"""

from __future__ import annotations

import numpy as np
import pytest

from olx_spark.fixtures.images import encode_image
from olx_spark.operators.multimodal import image_tile_stats

SCHEMA = "image_id string, bytes binary, fmt string"


def _quadrant_image():
    # 4x6, each 2x3 quadrant a constant channel value
    arr = np.zeros((4, 6, 3), dtype=np.uint8)
    arr[:2, :3] = (10, 20, 30)
    arr[:2, 3:] = (40, 50, 60)
    arr[2:, :3] = (70, 80, 90)
    arr[2:, 3:] = (100, 110, 120)
    return arr


def test_quadrant_sums(spark):
    df = spark.createDataFrame(
        [("q", encode_image(_quadrant_image(), "raw"), "raw")], SCHEMA
    )
    got = {
        (r["tile_r"], r["tile_c"]): r
        for r in image_tile_stats(df, grid=2).collect()
    }
    assert set(got) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    for (tr, tc), base in {
        (0, 0): 10, (0, 1): 40, (1, 0): 70, (1, 1): 100
    }.items():
        r = got[(tr, tc)]
        assert r["n_px"] == 6
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (
            6 * base, 6 * (base + 10), 6 * (base + 20)
        )


def test_floor_boundaries_non_divisible(spark):
    # 5x7 at grid=2: rows split 2/3, cols split 3/4
    arr = np.ones((5, 7, 3), dtype=np.uint8)
    df = spark.createDataFrame([("n", encode_image(arr, "raw"), "raw")], SCHEMA)
    got = {
        (r["tile_r"], r["tile_c"]): r["n_px"]
        for r in image_tile_stats(df, grid=2).collect()
    }
    assert got == {(0, 0): 6, (0, 1): 8, (1, 0): 9, (1, 1): 12}


def test_grid_clamps_to_thumbnail(spark):
    arr = np.full((2, 2, 3), 5, dtype=np.uint8)
    df = spark.createDataFrame([("t", encode_image(arr, "raw"), "raw")], SCHEMA)
    rows = image_tile_stats(df, grid=4).collect()
    assert len(rows) == 4  # clamped to 2x2, boundaries stay strict
    assert all(r["n_px"] == 1 and r["sum_r"] == 5 for r in rows)


def test_tiles_partition_exactly(spark):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    df = spark.createDataFrame([("p", encode_image(arr, "raw"), "raw")], SCHEMA)
    rows = image_tile_stats(df, grid=4).collect()
    assert sum(r["n_px"] for r in rows) == 13 * 17
    assert sum(r["sum_g"] for r in rows) == int(arr[..., 1].sum())


def test_corrupt_and_validation(spark):
    ok = np.full((4, 4, 3), 9, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            ("good", encode_image(ok, "raw"), "raw"),
            ("bad", b"\x00\x01not an image", "png"),
        ],
        SCHEMA,
    )
    rows = image_tile_stats(df, grid=2).collect()
    assert {r["image_id"] for r in rows} == {"good"}  # corrupt: no tiles
    with pytest.raises(ValueError, match="grid"):
        image_tile_stats(df, grid=0)
    weird = spark.createDataFrame([("w", b"\x00", "tiff")], SCHEMA)
    with pytest.raises(Exception, match="unknown fmt"):
        image_tile_stats(weird, grid=2).collect()
