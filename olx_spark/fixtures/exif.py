"""Exif APP1 writer — real TIFF-IFD metadata for the jpeg fixture.

Builds a spec-correct Exif APP1 segment (JEITA CP-3451 / TIFF 6.0):
``Exif\\x00\\x00`` + TIFF header (II or MM byte order, magic 42,
IFD0 offset), IFD0 with ascending-tag entries — Make (0x010F,
ASCII), Model (0x0110, ASCII), Orientation (0x0112, SHORT),
DateTime (0x0132, ASCII 20 bytes), Exif-IFD pointer (0x8769, LONG)
— and an Exif sub-IFD carrying PixelXDimension / PixelYDimension
(0xA002/0xA003, LONG). Values wider than 4 bytes live in the data
area behind the IFDs with correct offsets, exactly as a camera
writes them; both byte orders are exercised.

The segment splices into the fixture codec's output right after SOI
(`fixtures/jpeg.py` skips APPn, so the image still decodes
bit-identically with the metadata present — pinned in tests). The
corpus generator returns the GENERATED field values alongside the
bytes, so the oracle for the parsing query inlines ground truth the
parser never saw: encoder (here) and decoder
(`operators/exif.py`) are written independently and checked against
each other.
"""

from __future__ import annotations

import struct

import numpy as np

ASCII, SHORT, LONG = 2, 3, 4


def build_exif_app1(
    orientation: int,
    make: str,
    model: str,
    datetime_s: str,
    pixel_x: int,
    pixel_y: int,
    big_endian: bool = False,
) -> bytes:
    """One Exif APP1 segment (marker + length included)."""
    e = ">" if big_endian else "<"

    # --- lay out: IFD0 (5 entries) | exif IFD (2 entries) | data area
    make_b = make.encode("ascii") + b"\x00"
    model_b = model.encode("ascii") + b"\x00"
    dt_b = datetime_s.encode("ascii") + b"\x00"  # spec: 20 bytes incl. NUL
    assert len(dt_b) == 20, "Exif DateTime must be 'YYYY:MM:DD HH:MM:SS'"

    ifd0_off = 8
    ifd0_size = 2 + 5 * 12 + 4
    exif_ifd_off = ifd0_off + ifd0_size
    exif_ifd_size = 2 + 2 * 12 + 4
    data_off = exif_ifd_off + exif_ifd_size

    data = b""

    def place(value_bytes: bytes) -> int:
        nonlocal data
        off = data_off + len(data)
        data += value_bytes
        if len(data) % 2:  # TIFF word alignment
            data += b"\x00"
        return off

    def ifd_entry(tag: int, typ: int, count: int, value_bytes: bytes) -> bytes:
        head = struct.pack(e + "HHI", tag, typ, count)
        if len(value_bytes) <= 4:
            return head + value_bytes.ljust(4, b"\x00")
        return head + struct.pack(e + "I", place(value_bytes))

    entries0 = [
        ifd_entry(0x010F, ASCII, len(make_b), make_b),
        ifd_entry(0x0110, ASCII, len(model_b), model_b),
        ifd_entry(0x0112, SHORT, 1, struct.pack(e + "H", orientation)),
        ifd_entry(0x0132, ASCII, len(dt_b), dt_b),
        ifd_entry(0x8769, LONG, 1, struct.pack(e + "I", exif_ifd_off)),
    ]
    ifd0 = struct.pack(e + "H", 5) + b"".join(entries0) + struct.pack(e + "I", 0)

    entries_exif = [
        ifd_entry(0xA002, LONG, 1, struct.pack(e + "I", pixel_x)),
        ifd_entry(0xA003, LONG, 1, struct.pack(e + "I", pixel_y)),
    ]
    exif_ifd = (
        struct.pack(e + "H", 2) + b"".join(entries_exif) + struct.pack(e + "I", 0)
    )

    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", ifd0_off)
        + ifd0
        + exif_ifd
        + data
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def splice_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def exif_truth(i: int) -> dict:
    """The deterministic metadata row ``make_exif_corpus`` writes for
    index ``i`` — shared by the generator and the oracle."""
    return {
        "orientation": (i % 8) + 1,
        "make": f"Maker{i % 5}",
        "model": f"Cam-{i % 11}",
        "datetime": f"2026:08:{(i % 28) + 1:02d} 12:{i % 60:02d}:00",
        "pixel_x": 16 + (i % 4) * 8,
        "pixel_y": 16 + ((i // 4) % 4) * 8,
        "big_endian": i % 2 == 1,
    }


ORIENT_VARIANTS = (1, 3, 6, 8)


def make_oriented_corpus(n_groups: int = 12, seed: int = 5) -> list[dict]:
    """Rotated re-posts of one image: each group is a single upright
    32x16 picture stored under EXIF orientations 1/3/6/8, with the
    STORED pixels pre-transformed so ``apply_orientation(stored, o)``
    reproduces the upright image exactly (then jpeg-coded, so decode
    adds bounded lossy noise). The raw phashes of the variants
    disagree wildly; the oriented phashes agree — the corpus that
    proves why a dedup pipeline must orient before hashing."""
    from olx_spark.fixtures.images import encode_image, make_image_array

    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_groups):
        upright = make_image_array(rng, 32, 16)
        for o in ORIENT_VARIANTS:
            if o == 1:
                stored = upright
            elif o == 3:
                stored = upright[::-1, ::-1]
            elif o == 6:
                stored = np.rot90(upright, 1)
            else:  # 8
                stored = np.rot90(upright, -1)
            t = exif_truth(g)
            app1 = build_exif_app1(
                o, t["make"], t["model"], t["datetime"],
                stored.shape[1], stored.shape[0],
                big_endian=(g % 2 == 1),
            )
            jpeg = encode_image(np.ascontiguousarray(stored), "jpeg")
            rows.append(
                {
                    "image_id": f"orient-{g:03d}-o{o}",
                    "group_id": g,
                    "orientation": o,
                    "bytes": splice_app1(jpeg, app1),
                }
            )
    return rows


def make_exif_corpus(n: int = 64, seed: int = 7, n_bad: int = 8) -> list[dict]:
    """``n`` valid EXIF-tagged jpegs + ``n_bad`` damaged rows.

    Valid rows carry the :func:`exif_truth` fields and
    ``exif_ok=1``; damaged rows cycle through no-APP1, truncated
    APP1, bad Exif magic, and a corrupt TIFF IFD offset — all must
    parse as ``exif_ok=0`` with NULL fields, never crash.
    """
    from olx_spark.fixtures.images import encode_image, make_image_array

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        t = exif_truth(i)
        arr = make_image_array(rng, t["pixel_x"], t["pixel_y"])
        jpeg = encode_image(arr, "jpeg")
        app1 = build_exif_app1(
            t["orientation"], t["make"], t["model"], t["datetime"],
            t["pixel_x"], t["pixel_y"], big_endian=t["big_endian"],
        )
        rows.append(
            {"image_id": f"exif-{i:04d}", "bytes": splice_app1(jpeg, app1),
             "exif_ok": 1, **{k: t[k] for k in
                              ("orientation", "make", "model", "datetime",
                               "pixel_x", "pixel_y")}}
        )
    for j in range(n_bad):
        t = exif_truth(j)
        arr = make_image_array(rng, 16, 16)
        jpeg = encode_image(arr, "jpeg")
        app1 = build_exif_app1(
            t["orientation"], t["make"], t["model"], t["datetime"], 16, 16
        )
        kind = j % 4
        if kind == 0:
            blob = jpeg  # no APP1 at all
        elif kind == 1:
            blob = splice_app1(jpeg, app1[: len(app1) // 2])  # truncated
        elif kind == 2:
            bad = app1.replace(b"Exif\x00\x00", b"Brif\x00\x00", 1)
            blob = splice_app1(jpeg, bad)
        else:
            # IFD0 offset pointing far outside the segment
            bad = bytearray(app1)
            bad[14:18] = b"\xff\xff\xff\x0f"
            blob = splice_app1(jpeg, bytes(bad))
        rows.append(
            {"image_id": f"exif-bad-{j:04d}", "bytes": blob, "exif_ok": 0,
             "orientation": None, "make": None, "model": None,
             "datetime": None, "pixel_x": None, "pixel_y": None}
        )
    return rows
