"""EXIF metadata extraction from JPEG binary columns.

Camera metadata drives real curation decisions in an image-caption
pipeline: Orientation (tag 0x0112) says the stored pixels must be
rotated/flipped before any pixel-space dedup (a phash of an
unrotated portrait never matches its rotated twin), and
Make/Model/DateTime feed provenance and burst-dedup grouping. The
reference pipeline stores images as opaque blobs
(`/root/reference/src/main/scala/olx/DownloadAds.scala:60` writes
bytes, no metadata pass); this operator is part of the
training-data-pipeline surface.

The parser is a bounds-checked TIFF 6.0 / Exif (JEITA CP-3451) IFD
walk written INDEPENDENTLY of the fixture writer
(`fixtures/exif.py`) — the oracle query inlines the writer's
generated truth, so encoder and decoder check each other. It reads:
the JPEG marker stream up to SOS, the first APP1 whose payload
starts ``Exif\\x00\\x00``, both byte orders, IFD0 tags Make / Model
/ Orientation / DateTime, and the Exif sub-IFD (pointer tag 0x8769)
tags PixelXDimension / PixelYDimension. Any structural violation —
missing/truncated APP1, wrong magic, entry or value offset outside
the segment, orientation outside 1..8 — yields ``exif_ok=0`` with
NULL fields, never an exception: corrupt bytes are data, not bugs
(same doctrine as ``multimodal.image_features``).

Scale shape: Arrow-batched ``mapInPandas`` — one Python invocation
per batch, a few hundred bytes inspected per row (the marker walk
stops at SOS, so megapixel payloads cost header-scan time only); no
shuffle is introduced, partitioning is inherited.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_ASCII, _SHORT, _LONG = 2, 3, 4
_EMPTY = {
    "orientation": None, "make": None, "model": None,
    "datetime": None, "pixel_x": None, "pixel_y": None, "exif_ok": 0,
}


def _find_exif_tiff(data: bytes) -> bytes | None:
    """Walk JPEG markers from SOI; return the TIFF blob of the first
    Exif APP1, or None."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        # optional fill bytes before a marker (T.81 allows them)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # SOS / EOI: no APP1 past here
            return None
        if pos + 4 > len(data):
            return None
        seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if seg_len < 2 or pos + 2 + seg_len > len(data):
            return None
        if marker == 0xE1:
            payload = data[pos + 4:pos + 2 + seg_len]
            if payload[:6] == b"Exif\x00\x00":
                return payload[6:]
        pos += 2 + seg_len
    return None


def _read_ifd(tiff: bytes, e: str, off: int) -> dict[int, tuple[int, int, bytes]]:
    """One IFD -> {tag: (type, count, raw 4-byte value field)}.
    Raises ValueError on any out-of-bounds structure."""
    if off + 2 > len(tiff):
        raise ValueError("IFD offset out of bounds")
    (n,) = struct.unpack_from(e + "H", tiff, off)
    end = off + 2 + n * 12 + 4
    if end > len(tiff):
        raise ValueError("IFD entries out of bounds")
    out = {}
    for k in range(n):
        base = off + 2 + k * 12
        tag, typ, count = struct.unpack_from(e + "HHI", tiff, base)
        out[tag] = (typ, count, tiff[base + 8:base + 12])
    return out


_TYPE_SIZE = {1: 1, _ASCII: 1, _SHORT: 2, _LONG: 4}


def _value(tiff: bytes, e: str, typ: int, count: int, raw: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise ValueError(f"unsupported TIFF type {typ}")
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(e + "I", raw)
        if off + total > len(tiff):
            raise ValueError("value offset out of bounds")
        buf = tiff[off:off + total]
    if typ == _ASCII:
        return buf.split(b"\x00")[0].decode("ascii", "replace")
    if typ == _SHORT:
        return struct.unpack(e + "H", buf[:2])[0]
    if typ == _LONG:
        return struct.unpack(e + "I", buf[:4])[0]
    return int(buf[0])


def parse_exif(data) -> dict:
    """Parse one blob; always returns the full field dict."""
    try:
        tiff = _find_exif_tiff(bytes(data))
        if tiff is None or len(tiff) < 8:
            return dict(_EMPTY)
        order = tiff[:2]
        if order == b"II":
            e = "<"
        elif order == b"MM":
            e = ">"
        else:
            return dict(_EMPTY)
        magic, ifd0_off = struct.unpack_from(e + "HI", tiff, 2)
        if magic != 42:
            return dict(_EMPTY)
        ifd0 = _read_ifd(tiff, e, ifd0_off)

        def get(ifd, tag):
            if tag not in ifd:
                return None
            return _value(tiff, e, *ifd[tag])

        out = {
            "make": get(ifd0, 0x010F),
            "model": get(ifd0, 0x0110),
            "orientation": get(ifd0, 0x0112),
            "datetime": get(ifd0, 0x0132),
            "pixel_x": None,
            "pixel_y": None,
            "exif_ok": 1,
        }
        sub = get(ifd0, 0x8769)
        if sub is not None:
            exif_ifd = _read_ifd(tiff, e, int(sub))
            out["pixel_x"] = get(exif_ifd, 0xA002)
            out["pixel_y"] = get(exif_ifd, 0xA003)
        o = out["orientation"]
        if o is not None and not 1 <= int(o) <= 8:
            raise ValueError(f"orientation {o} outside 1..8")
        return out
    except (ValueError, struct.error, IndexError):
        return dict(_EMPTY)


_EXIF_FIELDS = [
    StructField("orientation", IntegerType()),
    StructField("make", StringType()),
    StructField("model", StringType()),
    StructField("datetime", StringType()),
    StructField("pixel_x", IntegerType()),
    StructField("pixel_y", IntegerType()),
    StructField("exif_ok", IntegerType()),
]


def apply_orientation(arr, orientation: int):
    """Map STORED pixels to upright display per EXIF orientation 1..8
    (TIFF 6.0 / JEITA CP-3451 table). Numpy views — no copy unless
    the caller needs contiguity."""
    import numpy as np

    o = int(orientation) if orientation is not None else 1
    if o == 2:
        return arr[:, ::-1]
    if o == 3:
        return arr[::-1, ::-1]
    if o == 4:
        return arr[::-1, :]
    if o == 5:
        return np.transpose(arr, (1, 0, 2))
    if o == 6:
        return np.rot90(arr, -1)
    if o == 7:
        return np.transpose(arr[::-1, ::-1], (1, 0, 2))
    if o == 8:
        return np.rot90(arr, 1)
    return arr


def oriented_phash(
    df: DataFrame, data_col: str = "bytes", fmt: str = "jpeg"
) -> DataFrame:
    """Decode + EXIF-orient + 64-bit phash, Arrow-batched.

    THE reason a curation pipeline parses Orientation at all: a phash
    of stored portrait pixels never matches its upright twin, so
    rotated re-posts of one image survive near-dup removal unless
    every hash is computed on ORIENTED pixels. Appends
    ``orientation`` (parsed, default 1), ``phash_raw`` (stored
    pixels), ``phash_oriented`` (after :func:`apply_orientation`) and
    ``decode_ok``; undecodable rows flag 0 with NULL hashes. Same
    mapInPandas shape and corrupt-bytes doctrine as
    ``multimodal.image_features``.
    """
    import numpy as np

    from olx_spark.fixtures.images import decode_image, phash64

    schema = StructType(
        [f for f in df.schema.fields if f.name != data_col]
        + [
            StructField("orientation", IntegerType()),
            StructField("phash_raw", LongType()),
            StructField("phash_oriented", LongType()),
            StructField("decode_ok", IntegerType()),
        ]
    )
    passthrough = [f.name for f in df.schema.fields if f.name != data_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[data_col]:
                meta = parse_exif(blob)
                o = meta["orientation"] if meta["exif_ok"] else None
                try:
                    arr = decode_image(bytes(blob), fmt)
                    rows.append(
                        (
                            o,
                            phash64(arr),
                            phash64(np.ascontiguousarray(
                                apply_orientation(arr, o or 1))),
                            1,
                        )
                    )
                except Exception:
                    rows.append((o, None, None, 0))
            feats = pd.DataFrame(
                rows,
                columns=["orientation", "phash_raw", "phash_oriented",
                         "decode_ok"],
            )
            out = pd.concat(
                [pdf[passthrough].reset_index(drop=True), feats], axis=1
            )
            out["orientation"] = out["orientation"].astype("Int32")
            out["decode_ok"] = out["decode_ok"].astype("Int32")
            for col in ("phash_raw", "phash_oriented"):
                out[col] = out[col].astype("Int64")
            yield out

    return df.mapInPandas(run, schema=schema)


def exif_features(df: DataFrame, data_col: str = "bytes") -> DataFrame:
    """Append the EXIF field columns to ``df`` (Arrow-batched
    ``mapInPandas``; see module docstring for semantics)."""
    schema = StructType(
        [f for f in df.schema.fields if f.name != data_col] + _EXIF_FIELDS
    )
    passthrough = [f.name for f in df.schema.fields if f.name != data_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pd.DataFrame(
                [parse_exif(b) for b in pdf[data_col]],
                columns=[f.name for f in _EXIF_FIELDS],
            )
            out = pd.concat(
                [pdf[passthrough].reset_index(drop=True), feats], axis=1
            )
            for col in ("orientation", "pixel_x", "pixel_y", "exif_ok"):
                out[col] = out[col].astype("Int32")
            yield out

    return df.mapInPandas(run, schema=schema)
