"""Multimodal (binary image column) operators: features, resize, stubs."""

import numpy as np
import pytest

from olx_spark.fixtures.images import decode_image, make_image_corpus, phash64
from olx_spark.operators.multimodal import (
    audio_sample_frames,
    image_features,
    resize_images,
    video_sample_frames,
)


@pytest.fixture(scope="module")
def images_df(spark):
    rows = make_image_corpus(30, seed=21)
    df = spark.createDataFrame(
        [(r["image_id"], r["bytes"], r["fmt"]) for r in rows],
        "image_id string, bytes binary, fmt string",
    )
    return rows, df


def test_image_features_match_ground_truth(spark, images_df):
    rows, df = images_df
    got = {r["image_id"]: r for r in image_features(df).collect()}
    assert len(got) == 30
    for r in rows:
        g = got[r["image_id"]]
        arr = decode_image(r["bytes"], r["fmt"])
        assert g["decode_ok"] == 1
        assert g["w"] == arr.shape[1] and g["h"] == arr.shape[0]
        assert abs(g["mean_r"] - arr[..., 0].mean()) < 1e-6
        assert g["phash"] == phash64(arr)


def test_jpeg_decodes_and_corrupt_bytes_degrade_gracefully(spark):
    """Real baseline JPEG decodes in the distributed scanner with
    ground-truth features; corrupt bytes (a certainty in a 100-TB
    crawl corpus) flag decode_ok=0 instead of failing the job."""
    from olx_spark.fixtures.jpeg import jpeg_decode, jpeg_encode

    arr = np.random.default_rng(9).integers(0, 256, (32, 48, 3)).astype(np.uint8)
    good = jpeg_encode(arr)
    df = spark.createDataFrame(
        [("good", good, "jpeg"), ("bad", b"\xff\xd8\xff\xe0fakejpeg", "jpeg")],
        "image_id string, bytes binary, fmt string",
    )
    got = {r["image_id"]: r for r in image_features(df).collect()}
    dec = jpeg_decode(good)
    assert got["good"]["decode_ok"] == 1
    assert got["good"]["w"] == 48 and got["good"]["h"] == 32
    assert abs(got["good"]["mean_r"] - dec[..., 0].mean()) < 1e-9
    assert got["good"]["phash"] == phash64(dec)
    assert got["bad"]["decode_ok"] == 0
    assert got["bad"]["phash"] is None


def test_unknown_fmt_value_fails_loudly_not_flagged(spark):
    """An unknown fmt VALUE is a schema/config error: it must raise,
    never be silently absorbed as decode_ok=0 (ADVICE r4 — the wide
    except was masking systematic decoder/config bugs)."""
    import pytest

    df = spark.createDataFrame(
        [("x", b"\x00\x01", "bmp")], "image_id string, bytes binary, fmt string"
    )
    with pytest.raises(Exception, match="unknown fmt"):
        image_features(df).collect()


def test_resize_images(spark, images_df):
    rows, df = images_df
    out = {r["image_id"]: r for r in resize_images(df, 16, 16, "raw").collect()}
    for r in rows[:5]:
        g = out[r["image_id"]]
        arr = decode_image(bytes(g["bytes"]), "raw")
        assert arr.shape == (16, 16, 3)
        # nearest-neighbor of the original at sampled coords
        src = decode_image(r["bytes"], r["fmt"])
        ys = (np.arange(16) * src.shape[0] // 16).clip(0, src.shape[0] - 1)
        xs = (np.arange(16) * src.shape[1] // 16).clip(0, src.shape[1] - 1)
        assert np.array_equal(arr, src[np.ix_(ys, xs)])


def test_phash_near_dups_finds_planted_pairs_and_equals_brute_force(spark):
    """Image dedup: the banded phash pairing must equal the numpy
    brute-force pair set (complete recall at the advertised radius)
    and recover a healthy share of the PLANTED near-dup pairs (odd
    index = perturbed copy of its predecessor)."""
    from olx_spark.fixtures.images import (
        decode_image,
        encode_image,
        make_near_dup_image_corpus,
        near_dup_pixels,
        phash64,
    )
    from olx_spark.operators.multimodal import phash_near_dups

    n, seed, max_dist = 64, 11, 6
    rows = make_near_dup_image_corpus(n, seed=seed)
    df = spark.createDataFrame(
        [(r["image_id"], r["bytes"], r["fmt"]) for r in rows],
        "image_id string, bytes binary, fmt string",
    )
    got = {(r["id_a"], r["id_b"], r["dist"]) for r in phash_near_dups(df, max_dist).collect()}

    # independent numpy brute force over decoded pixels
    ph = {}
    for i in range(n):
        fmt, arr = near_dup_pixels(i, seed)
        ph[f"nd-{i:05d}"] = phash64(decode_image(encode_image(arr, fmt), fmt))
    ids = sorted(ph)
    want = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = bin((ph[ids[x]] ^ ph[ids[y]]) & ((1 << 64) - 1)).count("1")
            if d <= max_dist:
                want.add((ids[x], ids[y], d))
    assert got == want
    planted = {(f"nd-{i - 1:05d}", f"nd-{i:05d}") for i in range(1, n, 2)}
    found_planted = {(a, b) for a, b, _ in got} & planted
    assert len(found_planted) >= len(planted) * 0.5, (
        f"only {len(found_planted)}/{len(planted)} planted pairs found"
    )


def test_phash_mega_bucket_guard_on_degenerate_image_corpus(spark, caplog):
    """Hundreds of IDENTICAL (near-constant) images collapse into one
    phash band bucket per band — the 100-TB failure shape for image
    dedup. The guard must drop those buckets (bounded pair-join input:
    no flat-x-flat pair ever materializes), log the drop count, and
    still pair the planted distinct near-dup that lives in small
    buckets."""
    import logging

    from olx_spark.fixtures.images import encode_image, phash64
    from olx_spark.operators.multimodal import phash_near_dups

    base = np.full((32, 32, 3), 128, dtype=np.uint8)
    rows = [(f"flat-{i:04d}", encode_image(base, "raw"), "raw") for i in range(300)]
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    b = a.copy()
    b[:2, :2] ^= 3  # tiny perturbation -> small phash distance
    rows += [("pair-a", encode_image(a, "raw"), "raw"),
             ("pair-b", encode_image(b, "raw"), "raw")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    d_ab = bin((phash64(a) ^ phash64(b)) & ((1 << 64) - 1)).count("1")
    assert d_ab <= 6, "fixture drifted: planted pair no longer near"
    with caplog.at_level(logging.WARNING, logger="olx_spark.operators.similarity"):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in phash_near_dups(df, max_dist=6, max_bucket=50).collect()
        }
    assert any("hamming_near_dup_pairs: dropped" in r.message for r in caplog.records)
    assert not any(x.startswith("flat") or y.startswith("flat") for x, y, _ in got)
    assert got == {("pair-a", "pair-b", d_ab)}


def test_audio_video_stubs_raise():
    with pytest.raises(NotImplementedError):
        audio_sample_frames(None)
    with pytest.raises(NotImplementedError):
        video_sample_frames(None)
