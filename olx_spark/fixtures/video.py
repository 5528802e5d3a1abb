"""Minimal AVI (RIFF) container codec — pure Python + numpy, written
against the public Microsoft AVI/RIFF spec (the ``avih``/``strh``/
``strf`` layout documented in the Win32 `AVIMAINHEADER` /
`AVISTREAMHEADER` / `BITMAPINFOHEADER` references and the OpenDML AVI
file-format spec). No ffmpeg in this sandbox; this gives the video
operators a REAL container bitstream to parse, the same playbook as
``fixtures/jpeg.py`` for still images and ``fixtures/audio.py`` for
WAV: the Spark-side plumbing decodes genuine bytes, and a cluster
with ffmpeg swaps the decoder, not the operator.

Two video stream codecs:

- ``MJPG`` — every frame is a baseline JFIF JPEG, encoded/decoded by
  the in-repo T.81 codec (``fixtures/jpeg.py``). The dominant "video
  without a video codec" layout in the wild (webcams, DV-era files).
- ``DIB `` (``biCompression=0``) — uncompressed 24-bit BGR, bottom-up
  rows padded to 4-byte boundaries, exactly as Windows device-
  independent bitmaps store them. Lossless round-trip.

The reference crawler stores media URLs only (``Model.scala:24``
``photos: List[String]``); video decode is engine-added capability for
the training-data pipeline brief (frame-sample multimodal columns).
"""

from __future__ import annotations

import struct

import numpy as np

from olx_spark.fixtures.jpeg import jpeg_decode, jpeg_encode

_AVIF_HASINDEX = 0x00000010


def _fourcc(tag: bytes) -> bytes:
    assert len(tag) == 4
    return tag


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _dib_encode(frame: np.ndarray) -> bytes:
    """24-bit bottom-up BGR rows, stride padded to 4 bytes (the DIB
    layout ``biCompression=0`` mandates)."""
    h, w, _ = frame.shape
    bgr = frame[::-1, :, ::-1]  # bottom-up, RGB->BGR
    stride = (w * 3 + 3) & ~3
    row_pad = stride - w * 3
    if row_pad == 0:
        return bgr.tobytes()
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = bgr.reshape(h, w * 3)
    return padded.tobytes()


def _dib_decode(data: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    if len(data) < stride * h:
        raise ValueError(f"DIB frame truncated: {len(data)} < {stride * h}")
    rows = np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()  # top-down, BGR->RGB


def avi_encode(frames: list[np.ndarray], fps: int = 10, codec: str = "mjpg") -> bytes:
    """RIFF/AVI bytes for a list of (h, w, 3) uint8 RGB frames.

    ``codec``: ``"mjpg"`` (per-frame baseline JPEG, lossy within the
    T.81 codec's >=40 dB floor) or ``"dib"`` (uncompressed, lossless).
    """
    if not frames:
        raise ValueError("avi_encode: need at least one frame")
    if codec not in ("mjpg", "dib"):
        raise ValueError(f"unknown codec {codec!r}")
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must share one (h, w, 3) uint8 shape")

    if codec == "mjpg":
        payloads = [jpeg_encode(f) for f in frames]
        handler, compression = _fourcc(b"MJPG"), struct.unpack("<I", b"MJPG")[0]
    else:
        payloads = [_dib_encode(f) for f in frames]
        handler, compression = _fourcc(b"DIB "), 0
    max_len = max(len(p) for p in payloads)

    # AVIMAINHEADER (56 bytes after the chunk header)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_len * fps,  # dwMaxBytesPerSec (advisory)
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_len,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    # AVISTREAMHEADER for the single 'vids' stream
    strh = struct.pack(
        "<4s4sI2H8I4h",
        b"vids",
        handler,
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate -> fps = dwRate / dwScale
        0,  # dwStart
        len(frames),  # dwLength (frames)
        max_len,  # dwSuggestedBufferSize
        0xFFFFFFFF & -1,  # dwQuality (default)
        0,  # dwSampleSize (0: varying-size samples)
        0, 0, w, h,  # rcFrame
    )
    # BITMAPINFOHEADER
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        compression,  # biCompression
        max_len,  # biSizeImage (advisory for compressed)
        0, 0, 0, 0,  # biXPelsPerMeter..biClrImportant
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"movi"
    offsets = []  # offsets of each chunk within 'movi' (idx1 convention)
    for p in payloads:
        offsets.append(len(movi_payload))
        movi_payload += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_payload)

    idx_entries = b"".join(
        b"00dc" + struct.pack("<3I", 0x10, off, len(p))  # AVIIF_KEYFRAME
        for off, p in zip(offsets, payloads)
    )
    idx1 = _chunk(b"idx1", idx_entries)

    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _iter_chunks(data: bytes, pos: int, end: int):
    """Yield (tag, payload_start, payload_len) walking sibling chunks."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        start = pos + 8
        if start + size > end:
            raise ValueError(f"chunk {tag!r} overruns container ({size} bytes at {pos})")
        yield tag, start, size
        pos = start + size + (size % 2)


def avi_decode(data: bytes) -> tuple[list[np.ndarray], int]:
    """Parse RIFF/AVI bytes -> (frames as (h, w, 3) uint8 RGB, fps).

    Strict on structure (bad magic / truncated chunks / unsupported
    codecs raise ``ValueError``) so callers can flag ``decode_ok=0``;
    a 100-TB crawl corpus WILL contain garbage labeled ``.avi``.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    w = h = None
    fps = None
    compression = None
    frame_chunks: list[bytes] = []

    for tag, start, size in _iter_chunks(data, 12, end):
        if tag != b"LIST":
            continue
        list_type = data[start : start + 4]
        if list_type == b"hdrl":
            for t2, s2, z2 in _iter_chunks(data, start + 4, start + size):
                if t2 == b"avih":
                    if z2 < 56:
                        raise ValueError("avih header truncated")
                    fields = struct.unpack_from("<14I", data, s2)
                    w, h = fields[8], fields[9]
                elif t2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    for t3, s3, z3 in _iter_chunks(data, s2 + 4, s2 + z2):
                        if t3 == b"strh":
                            if z3 < 48:
                                raise ValueError("strh header truncated")
                            fcc_type = data[s3 : s3 + 4]
                            if fcc_type != b"vids":
                                continue  # non-video stream: skip
                            scale, rate = struct.unpack_from("<2I", data, s3 + 20)
                            if scale == 0 or rate == 0:
                                raise ValueError("strh: zero dwScale/dwRate")
                            fps = max(1, round(rate / scale))
                        elif t3 == b"strf" and compression is None:
                            if z3 < 40:
                                raise ValueError("strf BITMAPINFOHEADER truncated")
                            (compression,) = struct.unpack_from("<I", data, s3 + 16)
        elif list_type == b"movi":
            for t2, s2, z2 in _iter_chunks(data, start + 4, start + size):
                # 00dc = compressed video, 00db = uncompressed DIB
                if t2 in (b"00dc", b"00db"):
                    frame_chunks.append(data[s2 : s2 + z2])

    if w is None or fps is None or compression is None:
        raise ValueError("missing avih/strh/strf headers")
    if not frame_chunks:
        raise ValueError("no video frames in movi list")

    mjpg = struct.unpack("<I", b"MJPG")[0]
    frames: list[np.ndarray] = []
    if compression == mjpg:
        for p in frame_chunks:
            frames.append(jpeg_decode(p))
    elif compression == 0:
        for p in frame_chunks:
            frames.append(_dib_decode(p, w, h))
    else:
        fcc = struct.pack("<I", compression)
        raise ValueError(f"unsupported video codec {fcc!r}")
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError(f"frame shape {f.shape} != header ({h}, {w}, 3)")
    return frames, fps


def make_video_pixels(i: int, seed: int = 17) -> tuple[str, int, list[np.ndarray]]:
    """Deterministic clip #i: (codec, fps, frames). A moving diagonal
    gradient + per-frame noise over a small canvas; codec alternates
    mjpg/dib, fps cycles {5, 10, 12, 25}."""
    rng = np.random.default_rng(seed * 100_003 + i)
    w = 16 + 8 * int(rng.integers(0, 2))  # 16 or 24
    h = 16
    n_frames = 4 + int(rng.integers(0, 5))  # 4-8
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n_frames):
        wave = ((xx + yy + 7 * t) % 32) * 8
        frame = (base.astype(np.int32) // 2 + wave[..., None] // 2).clip(0, 255)
        frames.append(frame.astype(np.uint8))
    codec = "mjpg" if i % 2 == 0 else "dib"
    fps = (5, 10, 12, 25)[i % 4]
    return codec, fps, frames


def make_video_corpus(n: int, seed: int = 17) -> list[dict]:
    """n deterministic AVI clips: dicts of (video_id, bytes, fmt)."""
    out = []
    for i in range(n):
        codec, fps, frames = make_video_pixels(i, seed)
        out.append(
            {
                "video_id": f"vid-{seed}-{i:04d}",
                "bytes": avi_encode(frames, fps=fps, codec=codec),
                "fmt": "avi",
            }
        )
    return out
