"""EXIF APP1 writer/parser tests — the encoder (fixtures/exif.py) and
the bounds-checked TIFF-IFD parser (operators/exif.py) are written
independently and must agree; damaged blobs flag, never crash."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from olx_spark.fixtures.exif import (
    build_exif_app1,
    exif_truth,
    make_exif_corpus,
    splice_app1,
)
from olx_spark.operators.exif import exif_features, parse_exif

FIELDS = ("orientation", "make", "model", "datetime", "pixel_x", "pixel_y")


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("orientation", [1, 3, 6, 8])
def test_roundtrip_both_endians(big_endian, orientation):
    app1 = build_exif_app1(
        orientation, "MakerX", "Cam-Y", "2026:08:20 09:15:00", 640, 480,
        big_endian=big_endian,
    )
    blob = b"\xff\xd8" + app1 + b"\xff\xd9"
    p = parse_exif(blob)
    assert p["exif_ok"] == 1
    assert p["orientation"] == orientation
    assert p["make"] == "MakerX" and p["model"] == "Cam-Y"
    assert p["datetime"] == "2026:08:20 09:15:00"
    assert (p["pixel_x"], p["pixel_y"]) == (640, 480)


def test_app1_after_other_segments_still_found():
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    app1 = build_exif_app1(5, "M", "C", "2026:01:01 00:00:00", 8, 8)
    blob = b"\xff\xd8" + app0 + app1 + b"\xff\xd9"
    assert parse_exif(blob)["orientation"] == 5


def test_jpeg_still_decodes_with_app1_spliced():
    from olx_spark.fixtures.images import decode_image, encode_image

    rng = np.random.default_rng(3)
    arr = (rng.integers(0, 256, (16, 16, 3))).astype(np.uint8)
    jpeg = encode_image(arr, "jpeg")
    tagged = splice_app1(
        jpeg, build_exif_app1(6, "M", "C", "2026:01:01 00:00:00", 16, 16)
    )
    np.testing.assert_array_equal(decode_image(jpeg, "jpeg"),
                                  decode_image(tagged, "jpeg"))


def test_damaged_blobs_flag_not_crash():
    for r in make_exif_corpus(4, n_bad=8)[4:]:
        p = parse_exif(r["bytes"])
        assert p["exif_ok"] == 0
        assert all(p[k] is None for k in FIELDS)


def test_orientation_out_of_range_rejected():
    app1 = bytearray(build_exif_app1(1, "M", "C", "2026:01:01 00:00:00", 8, 8))
    # orientation SHORT value sits in IFD0 entry 3's value field; patch
    # it to 9 by searching for the tag bytes (LE tag 0x0112)
    i = bytes(app1).find(b"\x12\x01\x03\x00")
    assert i > 0
    app1[i + 8] = 9
    assert parse_exif(b"\xff\xd8" + bytes(app1) + b"\xff\xd9")["exif_ok"] == 0


def test_spark_corpus_matches_truth(spark):
    rows = make_exif_corpus(32, n_bad=8)
    df = spark.createDataFrame(
        [(r["image_id"], bytearray(r["bytes"])) for r in rows],
        "image_id string, bytes binary",
    )
    got = {r["image_id"]: r.asDict() for r in exif_features(df).collect()}
    assert len(got) == 40
    for r in rows:
        g = got[r["image_id"]]
        assert g["exif_ok"] == r["exif_ok"], r["image_id"]
        for k in FIELDS:
            assert g[k] == r[k], (r["image_id"], k)


def test_plan_is_arrow_batched(spark):
    rows = make_exif_corpus(4, n_bad=0)
    df = spark.createDataFrame(
        [(r["image_id"], bytearray(r["bytes"])) for r in rows],
        "image_id string, bytes binary",
    )
    plan = exif_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


class TestOrientedPhash:
    def test_oriented_agree_raw_disagree(self, spark):
        from olx_spark.fixtures.exif import make_oriented_corpus
        from olx_spark.operators.exif import oriented_phash

        rows = make_oriented_corpus(4)
        df = spark.createDataFrame(
            [(r["image_id"], r["group_id"], bytearray(r["bytes"])) for r in rows],
            "image_id string, group_id int, bytes binary",
        )
        got = oriented_phash(df).collect()
        assert all(r["decode_ok"] == 1 for r in got)

        def ham(a, b):
            return bin((a ^ b) & (2**64 - 1)).count("1")

        by_group = {}
        for r in got:
            by_group.setdefault(r["group_id"], []).append(r)
        for grp in by_group.values():
            base = next(r for r in grp if r["orientation"] == 1)
            for r in grp:
                assert ham(r["phash_oriented"], base["phash_oriented"]) <= 4
                if r["orientation"] != 1:
                    # the un-oriented hash misses the duplicate entirely
                    assert ham(r["phash_raw"], base["phash_raw"]) >= 16

    def test_undecodable_flags(self, spark):
        from olx_spark.operators.exif import oriented_phash

        df = spark.createDataFrame(
            [("x", bytearray(b"\xff\xd8garbage"))], "image_id string, bytes binary"
        )
        r = oriented_phash(df).collect()[0]
        assert r["decode_ok"] == 0 and r["phash_raw"] is None

    def test_apply_orientation_inverts_all_eight(self):
        import numpy as np

        from olx_spark.operators.exif import apply_orientation

        rng = np.random.default_rng(0)
        u = rng.integers(0, 256, (6, 4, 3)).astype("uint8")
        inv = {
            1: lambda a: a,
            2: lambda a: a[:, ::-1],
            3: lambda a: a[::-1, ::-1],
            4: lambda a: a[::-1, :],
            5: lambda a: np.transpose(a, (1, 0, 2)),
            6: lambda a: np.rot90(a, 1),
            7: lambda a: np.transpose(a[::-1, ::-1], (1, 0, 2)),
            8: lambda a: np.rot90(a, -1),
        }
        for o, f in inv.items():
            np.testing.assert_array_equal(apply_orientation(f(u), o), u)
