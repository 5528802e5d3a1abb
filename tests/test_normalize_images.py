"""Contrast-stretch normalization (operators/multimodal.normalize_images).

The exact-integer mapping pinned by hand, idempotence on already-
full-range images, constant-image behavior, lossless-only output
enforcement, and corrupt-payload drops.
"""

from __future__ import annotations

import numpy as np
import pytest

from olx_spark.fixtures.images import decode_image, encode_image
from olx_spark.operators.multimodal import normalize_images

SCHEMA = "image_id string, bytes binary, fmt string"


def _out_pixels(rows):
    return {
        r["image_id"]: decode_image(bytes(r["bytes"]), r["fmt"]) for r in rows
    }


def test_stretch_values_pinned(spark):
    # pixels {50, 100, 150}: span 100 -> out = round((px-50)*255/100)
    arr = np.zeros((1, 3, 3), dtype=np.uint8)
    arr[0, 0] = 50
    arr[0, 1] = 100
    arr[0, 2] = 150
    df = spark.createDataFrame([("s", encode_image(arr, "raw"), "raw")], SCHEMA)
    out = _out_pixels(normalize_images(df).collect())["s"]
    assert out[0, 0, 0] == 0
    assert out[0, 1, 0] == 128  # (50*510+100)//200 = 127.75 -> half-up 128
    assert out[0, 2, 0] == 255


def test_full_range_identity_and_half_up(spark):
    # an image already spanning [0,255] maps to itself exactly
    arr = np.arange(256, dtype=np.uint8).reshape(16, 16)
    arr = np.stack([arr] * 3, axis=-1)
    df = spark.createDataFrame([("i", encode_image(arr, "raw"), "raw")], SCHEMA)
    out = _out_pixels(normalize_images(df).collect())["i"]
    assert np.array_equal(out, arr)


def test_constant_image_maps_to_zero(spark):
    arr = np.full((3, 3, 3), 77, dtype=np.uint8)
    df = spark.createDataFrame([("c", encode_image(arr, "raw"), "raw")], SCHEMA)
    out = _out_pixels(normalize_images(df).collect())["c"]
    assert out.max() == 0


def test_matches_numpy_replay_on_random(spark):
    rng = np.random.default_rng(11)
    arr = rng.integers(30, 200, (9, 7, 3), dtype=np.uint8)
    df = spark.createDataFrame([("r", encode_image(arr, "png"), "png")], SCHEMA)
    out = _out_pixels(normalize_images(df).collect())["r"]
    a = arr.astype(np.int64)
    mn, mx = int(a.min()), int(a.max())
    span = mx - mn
    want = (((a - mn) * 510 + span) // (2 * span)).astype(np.uint8)
    assert np.array_equal(out, want)


def test_lossless_only_and_corrupt_drop(spark):
    arr = np.full((2, 2, 3), 1, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            ("g", encode_image(arr, "raw"), "raw"),
            ("bad", b"garbage", "png"),
        ],
        SCHEMA,
    )
    with pytest.raises(ValueError, match="lossless"):
        normalize_images(df, out_fmt="dctq")
    rows = normalize_images(df).collect()
    assert [r["image_id"] for r in rows] == ["g"]
    assert rows[0]["fmt"] == "png"
