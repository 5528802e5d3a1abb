"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns plus typed metadata — the
input_hint's (image_id, bytes, w, h, fmt, caption, phash) schema. All
Spark-side plumbing here is real and tested: Arrow-batched
``mapInPandas`` iterators, explicit output schemas, partition-sized
batches. The pixel codecs cover lossless ``raw`` + ``png``, the LOSSY
``dctq`` quantized-DCT codec, and BASELINE SEQUENTIAL ``jpeg``
(``fixtures/jpeg.py`` — a real T.81 bitstream codec written against
the public spec, since the sandbox ships no Pillow/libjpeg); only
audio/video sampling remain STUBBED behind ``NotImplementedError``
(no ffmpeg) — their plumbing pattern is defined by the image
operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from olx_spark.fixtures.images import decode_image, encode_image, phash64

FEATURE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("std_gray", DoubleType()),
        StructField("phash", LongType()),
        StructField("decode_ok", IntegerType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


KNOWN_FMTS = ("raw", "png", "dctq", "jpeg")


def _decode(data: bytes, fmt: str) -> np.ndarray | None:
    if fmt in KNOWN_FMTS:
        # jpeg: pure-numpy baseline decoder (fixtures/jpeg.py) — real
        # bitstream parsing, not a stub; swap in libjpeg/Pillow on a
        # cluster that has it for speed
        return decode_image(bytes(data), fmt)
    raise ValueError(f"unknown fmt {fmt!r}")


def image_features(df: DataFrame) -> DataFrame:
    """Decode + per-image features (channel means, gray stddev, phash)
    over Arrow batches. Input: (image_id, bytes, fmt, ...)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                if fmt not in KNOWN_FMTS:
                    # an unknown fmt VALUE is a schema/config error, not
                    # a corrupt payload — fail loudly instead of silently
                    # flagging the whole column decode_ok=0 (ADVICE r4)
                    raise ValueError(
                        f"unknown fmt {fmt!r} for image_id={image_id!r}: "
                        f"expected one of {KNOWN_FMTS}"
                    )
                try:
                    arr = _decode(data, fmt)
                except Exception:
                    # corrupt/truncated/unsupported payload: a 100-TB
                    # crawl corpus WILL contain garbage bytes; the
                    # feature scanner flags (decode_ok=0), never dies
                    rows.append(
                        {
                            "image_id": image_id,
                            "w": None,
                            "h": None,
                            "fmt": fmt,
                            "mean_r": None,
                            "mean_g": None,
                            "mean_b": None,
                            "std_gray": None,
                            "phash": None,
                            "decode_ok": 0,
                        }
                    )
                    continue
                gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                rows.append(
                    {
                        "image_id": image_id,
                        "w": arr.shape[1],
                        "h": arr.shape[0],
                        "fmt": fmt,
                        "mean_r": float(arr[..., 0].mean()),
                        "mean_g": float(arr[..., 1].mean()),
                        "mean_b": float(arr[..., 2].mean()),
                        "std_gray": float(gray.std()),
                        "phash": phash64(arr),
                        "decode_ok": 1,
                    }
                )
            yield pd.DataFrame(rows, columns=FEATURE_SCHEMA.fieldNames())

    return df.mapInPandas(_feat, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, out_w: int = 32, out_h: int = 32, out_fmt: str = "png") -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h), re-encoded. The 100-TB
    consideration: output batches are re-encoded per batch, payload
    never collects to the driver."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                arr = _decode(data, fmt)
                h, w, _ = arr.shape
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                small = arr[np.ix_(ys, xs)]
                rows.append(
                    {
                        "image_id": image_id,
                        "bytes": encode_image(small, out_fmt),
                        "w": out_w,
                        "h": out_h,
                        "fmt": out_fmt,
                    }
                )
            yield pd.DataFrame(rows, columns=RESIZE_SCHEMA.fieldNames())

    return df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def phash_near_dups(
    df: DataFrame, max_dist: int = 6, max_bucket: int = 10_000
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash Hamming distance:
    decode + phash64 via :func:`image_features` (Arrow-batched), then
    banded bit-distance pairing via
    :func:`olx_spark.operators.similarity.hamming_near_dup_pairs`
    (bands derived from max_dist -> complete candidate recall, equal
    to brute force; one shuffle on band hash, never all-pairs — the
    image-dedup scale path for a 100 TB media corpus). Degenerate band
    buckets — a 100-TB corpus's near-constant images collapse into a
    handful of band values — are dropped above ``max_bucket`` with a
    logged count instead of exploding the self-join.

    Input: (image_id, bytes, fmt, ...); rows whose format cannot be
    decoded (jpeg stub) are excluded. Output: (id_a, id_b, dist)."""
    from olx_spark.operators.similarity import hamming_near_dup_pairs

    feats = image_features(df).filter(F.col("decode_ok") == 1)
    pairs = hamming_near_dup_pairs(
        feats, "image_id", "phash", max_dist, nbits=64, max_bucket=max_bucket
    )
    return pairs.select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"), "dist"
    )


def audio_sample_frames(df: DataFrame, *args, **kwargs):
    """STUB: audio frame sampling needs an audio codec (ffmpeg) absent
    from this environment. The image operators above define the
    plumbing pattern (binary column + mapInPandas + typed schema)."""
    raise NotImplementedError("audio decoding requires ffmpeg/soundfile")


def video_sample_frames(df: DataFrame, *args, **kwargs):
    """STUB: see audio_sample_frames."""
    raise NotImplementedError("video decoding requires ffmpeg")
