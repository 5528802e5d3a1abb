"""Deterministic image corpus + pure-numpy codecs (FIXTURES.md §1).

The sandbox ships no Pillow, so the lossless path is a minimal PNG
codec written against the public PNG spec (signature + IHDR + IDAT
(zlib, filter 0) + IEND) plus a ``raw`` passthrough format. A JPEG
path is import-guarded for environments that have a codec; its rows
carry the PSNR>=40dB tolerance from BASELINE.json's input_hint.

Corresponds to the reference payload column ``ADS.HTML``
(``/root/reference/src/main/scala/org/olx/parser/DownloadAds.scala:55``,
``db/H2.scala:61``) generalized to an image+caption pair per
BASELINE.json input_hint: (image_id, bytes, w, h, fmt, caption, phash).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

ADJECTIVES = [
    "red", "blue", "vintage", "new", "large", "small", "classic",
    "modern", "rare", "cheap", "premium", "compact",
]
NOUNS = [
    "bicycle", "sofa", "laptop", "guitar", "jacket", "camera", "table",
    "phone", "lamp", "bookshelf", "stroller", "monitor",
]
CITIES = [
    "Kyiv", "Lviv", "Odesa", "Kharkiv", "Dnipro", "Vinnytsia",
    "Poltava", "Uzhhorod",
]


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB8 PNG (filter 0)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`png_encode` (RGB8, filter 0 only)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only RGB8 supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    if raw[:, 0].any():
        raise NotImplementedError("only filter 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


_DCT8 = None


def _dct_matrix8() -> np.ndarray:
    global _DCT8
    if _DCT8 is None:
        n = 8
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
        m[0, :] = np.sqrt(1.0 / n)
        _DCT8 = m
    return _DCT8


# uniform quantization steps (DC finer than AC). AC step 6 bounds the
# per-coefficient error by U(-3,3): MSE <= 36/12 = 3 under the
# orthonormal DCT => PSNR >= 10*log10(255^2/3) ~ 43.4 dB — comfortably
# above the input_hint's 40 dB lossy floor, while zeroing enough
# high-frequency content to compress
_DCTQ_DC_STEP = 4
_DCTQ_AC_STEP = 6


def _dctq_steps() -> np.ndarray:
    q = np.full((8, 8), float(_DCTQ_AC_STEP))
    q[0, 0] = float(_DCTQ_DC_STEP)
    return q


def dctq_encode(arr: np.ndarray) -> bytes:
    """LOSSY pure-numpy codec: per-channel 8x8 block DCT-II, uniform
    quantization, zlib entropy stage. Exists so the PSNR>=40dB branch
    of the payload invariant is executable in a sandbox with no JPEG
    codec (BASELINE.json input_hint)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="edge").astype(np.float64)
    padded -= 128.0
    hh, ww = padded.shape[:2]
    d = _dct_matrix8()
    steps = _dctq_steps()
    # (nby, nbx, 8, 8, 3) block view -> DCT along both block axes
    blocks = padded.reshape(hh // 8, 8, ww // 8, 8, 3).transpose(0, 2, 1, 3, 4)
    coef = np.einsum("ij,abjkc,lk->abilc", d, blocks, d, optimize=True)
    q = np.round(coef / steps[None, None, :, :, None]).astype(np.int16)
    return (
        struct.pack(">HHBB", h, w, _DCTQ_DC_STEP, _DCTQ_AC_STEP)
        + zlib.compress(q.tobytes(), 6)
    )


def dctq_decode(data: bytes) -> np.ndarray:
    h, w, dc_step, ac_step = struct.unpack(">HHBB", data[:6])
    hh, ww = h + ((-h) % 8), w + ((-w) % 8)
    q = np.frombuffer(zlib.decompress(data[6:]), dtype=np.int16).reshape(
        hh // 8, ww // 8, 8, 8, 3
    )
    steps = np.full((8, 8), float(ac_step))
    steps[0, 0] = float(dc_step)
    coef = q.astype(np.float64) * steps[None, None, :, :, None]
    d = _dct_matrix8()
    blocks = np.einsum("ji,abjkc,kl->abilc", d, coef, d, optimize=True)
    px = blocks.transpose(0, 2, 1, 3, 4).reshape(hh, ww, 3) + 128.0
    return np.clip(np.round(px), 0, 255).astype(np.uint8)[:h, :w]


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(arr)
    if fmt == "raw":
        h, w, _ = arr.shape
        return struct.pack(">HH", h, w) + arr.tobytes()
    if fmt == "dctq":
        return dctq_encode(arr)
    if fmt == "jpeg":
        # pure-numpy baseline JPEG (fixtures/jpeg.py); defaults cap the
        # quant steps so the >=40dB lossy payload invariant holds
        from olx_spark.fixtures.jpeg import jpeg_encode

        return jpeg_encode(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "raw":
        h, w = struct.unpack(">HH", data[:4])
        return np.frombuffer(data[4:], dtype=np.uint8).reshape(h, w, 3).copy()
    if fmt == "dctq":
        return dctq_decode(data)
    if fmt == "jpeg":
        from olx_spark.fixtures.jpeg import jpeg_decode

        return jpeg_decode(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
        m[0, :] = np.sqrt(1.0 / n)
        _DCT32 = m
    return _DCT32


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash (signed int64, as stored in the table).

    Grayscale -> bilinear-ish resize to 32x32 -> 2D DCT-II -> top-left
    8x8 coefficients (minus DC) compared against their median -> 64 bits.
    """
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    small = gray[np.ix_(ys, xs)]
    m = _dct_matrix(32)
    dct = m @ small @ m.T
    block = dct[:8, :8].flatten()
    block[0] = 0.0  # drop DC so flat images don't bias the median
    med = np.median(block)
    bits = (block > med).astype(np.uint64)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # wrap to signed int64 for LongType storage
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def make_image_array(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic per-image pixels: gradient + PRNG noise."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int32)
    noise = rng.integers(-24, 25, size=(h, w, 3), dtype=np.int32)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def image_caption(i: int) -> str:
    return (
        f"{ADJECTIVES[i % len(ADJECTIVES)]} "
        f"{NOUNS[(i // len(ADJECTIVES)) % len(NOUNS)]} "
        f"in {CITIES[i % len(CITIES)]} #{i}"
    )


def make_image_row(
    i: int, seed: int = 42, n_hosts: int = 4, with_bytes: bool = True
) -> dict:
    """One row of the ``images`` payload table, derived from (seed, i)
    ALONE — per-image determinism, so the fetch UDF can regenerate any
    image's bytes from its id without broadcasting the corpus (at
    bench/web scale the payload bytes never leave the executors).

    ``with_bytes=False`` still generates pixels and the phash (the
    fetch/decode/hash work) but skips encoding and returns bytes=None —
    for throughput runs whose sink keeps metadata only."""
    w, h, fmt, arr = original_pixels(i, seed)
    host_idx = i % n_hosts
    return {
        "image_id": f"img-{host_idx:03d}-{i:05d}",
        "bytes": encode_image(arr, fmt) if with_bytes else None,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": image_caption(i),
        "phash": phash64(arr),
    }


def original_pixels(
    i: int, seed: int = 42, fmts: tuple[str, ...] = ("raw", "png", "dctq")
) -> tuple[int, int, str, np.ndarray]:
    """(w, h, fmt, pixels) for image ``i`` BEFORE encoding — the ground
    truth the lossy-payload invariant compares against (input_hint:
    decoded pixels within PSNR>=40dB of the true image for lossy fmt,
    exact for lossless). The default rotation covers lossless raw/png
    and the lossy dctq codec; the real-world ``jpeg`` codec
    (fixtures/jpeg.py) is exercised by its own corpus/oracle
    (q_jpeg_features) rather than the crawl hot path — its per-block
    Python Huffman coding is orders slower than the vectorized codecs
    and would turn the crawl bench into a jpeg microbenchmark."""
    rng = np.random.default_rng(np.random.PCG64(np.random.SeedSequence([seed, i])))
    sizes = [32, 64, 96]
    w = int(rng.choice(sizes))
    h = int(rng.choice(sizes))
    fmt = fmts[int(rng.integers(0, len(fmts)))]
    arr = make_image_array(rng, w, h)
    return w, h, fmt, arr


def image_index_from_id(image_id: str) -> int:
    """Inverse of the ``image_id`` format: ``img-{host:03d}-{i:05d}``."""
    return int(image_id.rsplit("-", 1)[1])


def make_image_corpus(n: int = 100, seed: int = 42, n_hosts: int = 4) -> list[dict]:
    """Rows for the ``images`` payload table (FIXTURES.md §1), schema
    (image_id, bytes, w, h, fmt, caption, phash) per input_hint."""
    return [make_image_row(i, seed=seed, n_hosts=n_hosts) for i in range(n)]


def near_dup_pixels(i: int, seed: int = 11) -> tuple[str, np.ndarray]:
    """(fmt, pixels) for the near-duplicate image corpus: even indices
    are fresh images; each ODD index is its predecessor's pixels with
    sparse small perturbations (~1% of pixels nudged ±<=4) — a visual
    near-duplicate whose phash lands within a few bits, planting known
    positive pairs for image-dedup operators. Derived from (seed, i)
    alone, like :func:`original_pixels`."""
    base_idx = i - 1 if i % 2 else i
    rng = np.random.default_rng(
        np.random.PCG64(np.random.SeedSequence([seed, base_idx]))
    )
    sizes = [32, 64, 96]
    fmts = ["raw", "png", "dctq"]
    w = int(rng.choice(sizes))
    h = int(rng.choice(sizes))
    fmt = fmts[int(rng.integers(0, len(fmts)))]
    arr = make_image_array(rng, w, h)
    if i % 2:
        prng = np.random.default_rng(np.random.PCG64(np.random.SeedSequence([seed, i, 1])))
        mask = prng.random((h, w, 3)) < 0.01
        delta = prng.integers(-4, 5, size=(h, w, 3), dtype=np.int32)
        arr = np.clip(arr.astype(np.int32) + mask * delta, 0, 255).astype(np.uint8)
    return fmt, arr


def make_near_dup_image_corpus(n: int = 96, seed: int = 11) -> list[dict]:
    """Binary-image corpus with PLANTED near-duplicate pairs (each odd
    index perturbs its predecessor): rows (image_id, bytes, fmt) for
    phash-based image dedup tests and oracles."""
    rows = []
    for i in range(n):
        fmt, arr = near_dup_pixels(i, seed)
        rows.append(
            {"image_id": f"nd-{i:05d}", "bytes": encode_image(arr, fmt), "fmt": fmt}
        )
    return rows


def letterbox_pixels(
    i: int, seed: int = 9
) -> tuple[int, int, str, np.ndarray]:
    """(w, h, fmt, pixels) for the border-detection corpus: the base
    image from :func:`original_pixels` with deterministic planted
    bars, LOSSLESS fmt only (exact uint8 bar equality is the operator
    contract — a lossy codec's ringing breaks exact bars). Rotation by
    ``i % 4``: letterbox (black top/bottom, h//6 each), pillarbox
    (white left/right, w//5 each), fully-uniform frame, untouched."""
    w, h, _, arr = original_pixels(i, seed=seed)
    fmt = ("raw", "png")[i % 2]
    arr = arr.copy()
    kind = i % 4
    if kind == 0:
        b = h // 6
        arr[:b] = 0
        arr[h - b:] = 0
    elif kind == 1:
        b = w // 5
        arr[:, :b] = 255
        arr[:, w - b:] = 255
    elif kind == 2:
        arr[:] = np.array([10, 20, 30], dtype=np.uint8)
    return w, h, fmt, arr


def make_crop_corpus(n_groups: int = 10, seed: int = 17) -> list[dict]:
    """Planted CROP duplicates for tile-phash voting tests/oracles:
    each group is a 64x64 base image (png — lossless, so retained
    tiles match bit-exactly), a grid-aligned 48x48 crop of it
    (offset one 16-px tile down: shares 9 of the base's 16 tiles),
    and one unrelated distractor. Expected candidate pairs at
    min_votes=4: exactly (base, crop) per group with 9 votes."""
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_groups):
        base = make_image_array(rng, 64, 64)
        crop = np.ascontiguousarray(base[16:64, 0:48])
        distractor = make_image_array(rng, 64, 64)
        for suffix, arr in (("base", base), ("crop", crop),
                            ("other", distractor)):
            rows.append(
                {
                    "image_id": f"crop-{g:03d}-{suffix}",
                    "bytes": encode_image(arr, "png"),
                    "fmt": "png",
                }
            )
    return rows
