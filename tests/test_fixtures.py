"""Pure-python fixture tests: codecs, determinism, simulator invariants."""

import numpy as np
import pytest

from olx_spark.fixtures.images import (
    decode_image,
    encode_image,
    image_index_from_id,
    make_image_array,
    make_image_corpus,
    make_image_row,
    phash64,
    png_decode,
    png_encode,
    psnr,
)
from oracle_sim import parse_brief, flatten_brief, graft_url, simulate_seed


def test_png_roundtrip():
    rng = np.random.default_rng(7)
    for w, h in [(32, 32), (96, 64), (1, 1)]:
        arr = make_image_array(rng, w, h)
        assert np.array_equal(png_decode(png_encode(arr)), arr)


def test_raw_roundtrip():
    rng = np.random.default_rng(8)
    arr = make_image_array(rng, 64, 96)
    assert np.array_equal(decode_image(encode_image(arr, "raw"), "raw"), arr)


def test_psnr_identical_is_inf():
    rng = np.random.default_rng(9)
    arr = make_image_array(rng, 32, 32)
    assert psnr(arr, arr) == float("inf")
    noisy = np.clip(arr.astype(int) + rng.integers(-2, 3, arr.shape), 0, 255).astype(
        np.uint8
    )
    assert psnr(arr, noisy) >= 40.0


def test_image_row_per_image_determinism():
    corpus = make_image_corpus(20, seed=43)
    lone = make_image_row(13, seed=43)
    assert corpus[13]["bytes"] == lone["bytes"]
    assert corpus[13]["phash"] == lone["phash"]
    assert image_index_from_id(lone["image_id"]) == 13


def test_phash_stable_under_small_noise():
    rng = np.random.default_rng(10)
    arr = make_image_array(rng, 64, 64)
    noisy = np.clip(arr.astype(int) + rng.integers(-3, 4, arr.shape), 0, 255).astype(
        np.uint8
    )
    h1, h2 = phash64(arr), phash64(noisy)
    dist = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
    assert dist <= 10


def test_graft_keeps_query():
    u = graft_url("https://h.example/list/x/?page=0&currency=UAH", "/d/ad/a-1/")
    assert u == "https://h.example/d/ad/a-1/?page=0&currency=UAH"


@pytest.mark.parametrize(
    "items,expected",
    [
        (["Condition: new"], [("Condition", " new")]),
        (["Negotiable"], [("Negotiable", "true")]),
        (["Time: 10:30"], [("Time", " 10")]),
        (["K: a", "K: b"], [("K", " b")]),  # last wins, first position
        ([": novalue"], []),  # empty key filtered
        (["Key:"], [("Key", "true")]),  # scala split drops trailing empty
        ([""], []),
    ],
)
def test_brief_parse(items, expected):
    assert parse_brief(items) == expected


def test_brief_flatten_reference_format():
    assert flatten_brief([("K", " v"), ("B", "true")]) == "K ->  v; B -> true"


def test_simulator_truncation_and_duplicates(crawl_graph):
    seed = dict(crawl_graph.seeds[1])
    seed["count"] = 20
    r = simulate_seed(crawl_graph.store, seed)
    assert len(r.crawl_order) == 20
    assert len(r.seen_urls) < 20  # duplicates across rounds
    assert [row["seq"] for row in r.crawl_order] == list(range(20))
    assert all(row["description"] == row["title"] for row in r.results)


def test_dctq_roundtrip_lossy_within_psnr():
    """dctq (quantized-DCT) codec: shape-exact, >= 40 dB (input_hint's
    lossy floor), genuinely lossy, and smaller than raw for every
    fixture-shaped image incl. non-multiple-of-8 dims."""
    import numpy as np

    from olx_spark.fixtures.images import (
        dctq_decode,
        dctq_encode,
        make_image_array,
        psnr,
    )

    rng = np.random.default_rng(3)
    for h, w in ((32, 32), (96, 64), (33, 47)):  # incl. non-8-aligned
        arr = make_image_array(rng, w, h)
        data = dctq_encode(arr)
        back = dctq_decode(data)
        assert back.shape == arr.shape and back.dtype == np.uint8
        p = psnr(arr, back)
        assert 40.0 <= p < float("inf"), (h, w, p)
        assert not np.array_equal(arr, back)
        assert len(data) < arr.nbytes
