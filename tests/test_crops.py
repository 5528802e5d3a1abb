"""Tile-phash crop-duplicate detection tests: planted grid-aligned
crops are found with the exact expected vote count, distractors stay
silent, degenerate flat corpora hit the mega-bucket guard instead of
a quadratic join, corrupt rows flag."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from olx_spark.fixtures.images import encode_image, make_crop_corpus
from olx_spark.operators.crops import crop_candidates, tile_phashes


def _df(spark, rows):
    return spark.createDataFrame(
        [(r["image_id"], bytearray(r["bytes"]), r["fmt"]) for r in rows],
        "image_id string, bytes binary, fmt string",
    )


def test_planted_crops_found_with_exact_votes(spark):
    rows = make_crop_corpus(6)
    tiles = tile_phashes(_df(spark, rows))
    pairs = {
        (r["id_a"], r["id_b"]): r["votes"]
        for r in crop_candidates(tiles, min_votes=4).collect()
    }
    for g in range(6):
        assert pairs.get((f"crop-{g:03d}-base", f"crop-{g:03d}-crop")) == 9, g
    # nothing else — no distractor or cross-group pair
    assert len(pairs) == 6


def test_tile_counts_and_ragged_edges(spark):
    # 40x40 image with 16-px tiles -> 2x2 full tiles, ragged 8-px rim dropped
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (40, 40, 3)).astype("uint8")
    df = spark.createDataFrame(
        [("x", bytearray(encode_image(arr, "png")), "png")],
        "image_id string, bytes binary, fmt string",
    )
    got = tile_phashes(df).collect()
    assert len(got) == 4
    assert {(r["ty"], r["tx"]) for r in got} == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_degenerate_flat_corpus_hits_guard_not_quadratic(spark, caplog):
    # 40 identical flat images: every tile hash is identical; the guard
    # must drop it and emit ZERO pairs instead of 40*39/2
    flat = np.full((32, 32, 3), 128, dtype=np.uint8)
    rows = [
        {"image_id": f"flat-{i:03d}", "bytes": encode_image(flat, "png"),
         "fmt": "png"}
        for i in range(40)
    ]
    tiles = tile_phashes(_df(spark, rows))
    import logging

    with caplog.at_level(logging.WARNING, logger="olx_spark.operators.crops"):
        out = crop_candidates(tiles, min_votes=1, max_hash_freq=32).collect()
    assert out == []
    assert any("degenerate tile hashes" in r.message for r in caplog.records)


def test_corrupt_row_flags_not_crashes(spark):
    rows = make_crop_corpus(1)
    rows.append({"image_id": "bad", "bytes": b"\x00garbage", "fmt": "png"})
    tiles = tile_phashes(_df(spark, rows))
    bad = tiles.where(F.col("image_id") == "bad").collect()
    assert len(bad) == 1 and bad[0]["decode_ok"] == 0
    # the good group still matches
    pairs = crop_candidates(tiles, min_votes=4).collect()
    assert len(pairs) == 1


def test_plan_arrow_batched_and_single_join_shuffle(spark):
    rows = make_crop_corpus(2)
    tiles = tile_phashes(_df(spark, rows))
    plan = tiles._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
    cplan = crop_candidates(tiles)._jdf.queryExecution().executedPlan().toString()
    # the dropped-hash anti-join must be broadcast, not shuffled
    assert "BroadcastHashJoin" in cplan


def test_shifted_grid_catches_half_tile_crop(spark):
    # crop at (8, 8) — half-tile alignment: invisible to the single
    # aligned grid, caught by adding the (8, 8)-shifted lattice
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (64, 64, 3)).astype("uint8")
    crop = np.ascontiguousarray(base[8:56, 8:56])
    rows = [
        {"image_id": "base", "bytes": encode_image(base, "png"), "fmt": "png"},
        {"image_id": "crop", "bytes": encode_image(crop, "png"), "fmt": "png"},
    ]
    aligned = crop_candidates(tile_phashes(_df(spark, rows)), min_votes=4)
    assert aligned.collect() == []
    shifted = crop_candidates(
        tile_phashes(_df(spark, rows), grid_offsets=((0, 0), (8, 8))),
        min_votes=4,
    ).collect()
    assert len(shifted) == 1
    assert shifted[0]["id_a"] == "base" and shifted[0]["votes"] >= 9
