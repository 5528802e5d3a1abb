"""Cropped-duplicate image detection via tile-phash voting.

Whole-image perceptual hashes (``multimodal.phash``) miss CROPS: cut
a quarter off a scraped picture and its 64-bit phash moves far past
any near-dup threshold, so the re-post survives dedup. Tiles fix
this: split every image into an aligned ``tile x tile`` lattice,
phash each tile, and two images sharing >= ``min_votes`` tile hashes
are crop candidates — the original and its crop agree on every tile
the crop retained. (Grid-ALIGNED crops match exactly; production
systems add shifted/overlapping grids for arbitrary offsets — same
plan shape, ``grid_offsets`` more rows. The reference stores images
without any pixel-level dedup: `/root/reference/src/main/scala/olx/
DownloadAds.scala:60`.)

Scale shape (10^9 images): ``tile_phashes`` is one Arrow-batched
``mapInPandas`` pass (decode + vectorized per-tile hash; zero
shuffle, partitioning inherited). Matching is the banded-join
doctrine of `operators/similarity.py`: hashes appearing in more than
``max_hash_freq`` tiles corpus-wide (flat borders, letterbox bars)
are counted FIRST and dropped with a logged count — the mega-bucket
guard — so the self-join's per-key fan-out is bounded; then one
equi-join on the 64-bit hash + a map-side-combinable pair count.
Votes, not single collisions, gate the output, so one coincidental
tile never yields a pair.
"""

from __future__ import annotations

import logging
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

logger = logging.getLogger(__name__)


def tile_phashes(
    df: DataFrame,
    data_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "image_id",
    tile: int = 16,
    grid_offsets: tuple = ((0, 0),),
) -> DataFrame:
    """Explode each image into its tile lattice(s):
    ``(id_col, oy, ox, ty, tx, tile_phash, decode_ok)`` — one row per
    full ``tile x tile`` tile of each grid offset (ragged edges are
    dropped: a partial tile's hash can never match its counterpart).
    Undecodable rows yield one ``decode_ok=0`` row with NULL hash,
    never a crash.

    ``grid_offsets``: extra shifted lattices. The default single
    aligned grid only matches crops cut on tile boundaries; adding
    e.g. ``((0, 0), (tile // 2, tile // 2))`` lets a crop at
    half-tile alignment share hashes with the original's shifted
    grid — linear row growth per offset, no change to the matching
    stage (a match in ANY grid is a vote)."""
    import numpy as np

    from olx_spark.fixtures.images import decode_image, phash64

    schema = StructType(
        [
            StructField(id_col, StringType()),
            StructField("oy", IntegerType()),
            StructField("ox", IntegerType()),
            StructField("ty", IntegerType()),
            StructField("tx", IntegerType()),
            StructField("tile_phash", LongType()),
            StructField("decode_ok", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, blob, fmt in zip(
                pdf[id_col], pdf[data_col], pdf[fmt_col]
            ):
                try:
                    arr = decode_image(bytes(blob), fmt)
                    any_tile = False
                    for oy, ox in grid_offsets:
                        h = (arr.shape[0] - oy) // tile
                        w = (arr.shape[1] - ox) // tile
                        for ty in range(h):
                            for tx in range(w):
                                t = arr[
                                    oy + ty * tile:oy + (ty + 1) * tile,
                                    ox + tx * tile:ox + (tx + 1) * tile,
                                ]
                                out.append(
                                    (image_id, oy, ox, ty, tx,
                                     phash64(np.ascontiguousarray(t)), 1)
                                )
                                any_tile = True
                    if not any_tile:
                        raise ValueError("image smaller than one tile")
                except Exception:
                    out.append((image_id, -1, -1, -1, -1, None, 0))
            res = pd.DataFrame(
                out,
                columns=[id_col, "oy", "ox", "ty", "tx", "tile_phash",
                         "decode_ok"],
            )
            res["tile_phash"] = res["tile_phash"].astype("Int64")
            yield res

    return df.mapInPandas(run, schema=schema)


def crop_candidates(
    tiles: DataFrame,
    id_col: str = "image_id",
    min_votes: int = 4,
    max_hash_freq: int = 32,
) -> DataFrame:
    """Candidate crop/original pairs from a :func:`tile_phashes`
    frame: ``(id_a, id_b, votes)`` with ``id_a < id_b`` and
    ``votes`` = number of PRODUCTIVE shared tile hashes >=
    ``min_votes``. A hash occurring in more than ``max_hash_freq``
    tiles corpus-wide is dropped first (logged) — the
    `_productive_buckets` mega-bucket doctrine of
    ``operators/similarity.py:38``: degenerate flat tiles would
    otherwise make the self-join quadratic."""
    from pyspark.sql import Observation

    from olx_spark.session import materialize

    # materialized ONCE (r6): `t` feeds the frequency guard AND both
    # pair-join sides — un-cut, the upstream tile-decode mapInPandas
    # re-executed per consumer (3 full decode passes)
    t = materialize(
        tiles.where(F.col("decode_ok") == 1).select(
            F.col(id_col).alias("id"), "tile_phash"
        )
    )
    freq = t.groupBy("tile_phash").agg(F.count("*").alias("__n"))
    # the degenerate-hash frame is tiny; its count rides the
    # materialize as an observe accumulator (one job, not two)
    d_obs = Observation()
    dropped = materialize(
        freq.where(F.col("__n") > max_hash_freq).observe(
            d_obs, F.count(F.lit(1)).alias("n")
        )
    )
    n_dropped = int(d_obs.get["n"] or 0)
    if n_dropped:
        logger.warning(
            "crop_candidates: dropping %d degenerate tile hashes "
            "(> %d occurrences)", n_dropped, max_hash_freq
        )
    productive = t.join(
        F.broadcast(dropped.select("tile_phash")), "tile_phash", "left_anti"
    )
    a = productive.select(F.col("id").alias("id_a"), "tile_phash")
    b = productive.select(F.col("id").alias("id_b"), "tile_phash")
    return (
        a.join(b, "tile_phash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("votes"))
        .where(F.col("votes") >= min_votes)
    )
