"""Pure-numpy baseline JPEG codec (fixtures/jpeg.py): round-trip PSNR
floor, every decoder path (4:4:4, 4:2:0, grayscale, restart markers),
marker-level structure, and graceful garbage rejection. No Spark —
the distributed integration is covered by test_multimodal.py and the
q_jpeg_features oracle."""

import numpy as np
import pytest

from olx_spark.fixtures.images import make_image_array, psnr
from olx_spark.fixtures.jpeg import jpeg_decode, jpeg_encode


def _img(w, h, seed=7):
    return make_image_array(np.random.default_rng(seed), w, h)


@pytest.mark.parametrize("w,h", [(32, 32), (64, 48), (96, 96), (17, 23), (8, 8), (1, 1), (5, 100)])
def test_roundtrip_psnr_floor(w, h):
    """Default (capped quant steps) encode must round-trip >= 40 dB on
    ANY input — the input_hint's lossy payload invariant, guaranteed by
    the step cap, not by favorable content."""
    arr = _img(w, h)
    back = jpeg_decode(jpeg_encode(arr))
    assert back.shape == arr.shape
    assert psnr(arr, back) >= 40.0


def test_psnr_floor_on_pure_noise():
    """Worst-case content: uniform noise has maximal high-frequency
    energy; the analytic floor must still hold."""
    noise = np.random.default_rng(3).integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
    assert psnr(noise, jpeg_decode(jpeg_encode(noise))) >= 40.0


def test_restart_markers_do_not_change_pixels():
    """DRI/RSTn segmentation is a bitstream-layout concern only: the
    decoded pixels must be IDENTICAL to the unsegmented encoding."""
    arr = _img(70, 52)
    base = jpeg_decode(jpeg_encode(arr))
    for ri in (1, 3, 7):
        data = jpeg_encode(arr, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI marker present
        assert np.array_equal(jpeg_decode(data), base)


def test_chroma_subsampled_roundtrip():
    """4:2:0 (the common real-world layout): decodes at full frame
    size, luma survives nearly intact (chroma detail is genuinely
    lost, so no global PSNR floor)."""
    arr = _img(70, 52)
    back = jpeg_decode(jpeg_encode(arr, subsample=True))
    assert back.shape == arr.shape
    luma = lambda a: a.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    mse = np.mean((luma(arr) - luma(back)) ** 2)
    assert 10 * np.log10(255.0**2 / mse) >= 38.0
    # odd dimensions exercise the chroma padding path
    odd = _img(17, 23)
    assert jpeg_decode(jpeg_encode(odd, subsample=True)).shape == odd.shape
    # restart markers compose with subsampling
    a = jpeg_decode(jpeg_encode(arr, subsample=True))
    b = jpeg_decode(jpeg_encode(arr, subsample=True, restart_interval=2))
    assert np.array_equal(a, b)


def test_grayscale_single_component():
    g = np.repeat(
        np.random.default_rng(5).integers(0, 256, (33, 41, 1)), 3, axis=2
    ).astype(np.uint8)
    back = jpeg_decode(jpeg_encode(g, grayscale=True))
    assert back.shape == g.shape
    assert psnr(g, back) >= 40.0
    assert np.array_equal(back[..., 0], back[..., 1])  # replicated channels


def test_uncapped_quality_compresses():
    """Real-world settings (no step cap) must actually compress —
    the capped default trades ratio for the PSNR floor."""
    arr = _img(64, 64)
    small = jpeg_encode(arr, quality=75, step_cap=None)
    assert len(small) < arr.nbytes * 0.25
    assert jpeg_decode(small).shape == arr.shape


def test_marker_structure_is_standard_baseline():
    data = jpeg_encode(_img(32, 32))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"  # SOI/EOI
    assert b"JFIF\x00" in data
    assert b"\xff\xc0" in data  # SOF0 baseline
    assert b"\xff\xc4" in data and b"\xff\xdb" in data and b"\xff\xda" in data


def test_garbage_and_unsupported_rejected():
    for bad in (b"", b"nope", b"\xff\xd8\xff\xe0fakejpeg"):
        with pytest.raises(Exception):
            jpeg_decode(bad)
    # progressive (SOF2) must be rejected loudly, not mis-decoded
    data = bytearray(jpeg_encode(_img(16, 16)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(data))


def test_decoder_skips_ff_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; a padded real-world file must decode identically instead
    of degrading to decode_ok=0 on a bogus length parse (ADVICE r4)."""
    data = jpeg_encode(_img(24, 24))
    base = jpeg_decode(data)
    # pad before an interior marker (SOF0) and before EOI
    i = data.find(b"\xff\xc0")
    padded = data[:i] + b"\xff" * 3 + data[i:-2] + b"\xff" * 2 + data[-2:]
    assert np.array_equal(jpeg_decode(padded), base)
    # a header truncated at a lone 0xFF still rejects loudly
    with pytest.raises(ValueError, match="truncated"):
        jpeg_decode(b"\xff\xd8\xff\xff")


def test_decoder_tolerates_extra_app_segments():
    """Real files carry APPn/COM segments the decoder must skip."""
    data = jpeg_encode(_img(24, 24))
    exif = b"\xff\xe1" + (12).to_bytes(2, "big") + b"Exif\x00\x00padd"
    com = b"\xff\xfe" + (9).to_bytes(2, "big") + b"comment"
    patched = data[:2] + exif + com + data[2:]
    assert np.array_equal(jpeg_decode(patched), jpeg_decode(data))
