"""URL-seen dedup operators (SURVEY.md §2.1 row 5, §2.3 item 3).

The reference's only dedup is per-page ``List.distinct``
(``DownloadLinks.scala:49``). The engine offers three scopes:

- ``first_seen_dedup``: exact first-occurrence-wins via window
  ``row_number() = 1`` — the correctness oracle, and fine up to ~10^9
  rows (one shuffle on the key).
- ``anti_join_unseen``: frontier MINUS seen via broadcast-free left
  anti join — the exact global seen-set at any scale (shuffles both
  sides on url_fp; with both tables bucketed by url_fp this is a
  zero-shuffle sort-merge join on a real cluster).
- ``BloomSeenFilter``: partitioned Bloom shards for the 10^10-URL
  frontier where materializing the exact seen-set per round is too
  expensive. Shards are numpy bit-arrays built per ``url_fp % n_shards``
  group with ``applyInPandas``, OR-merged each round, probed inside
  ``mapInPandas`` with the shard binaries broadcast. No false
  negatives (a seen URL always probes positive); false positives
  (a fresh URL wrongly skipped) bounded by the standard
  (1 - e^{-kn/m})^k rate, accounted per shard.

Shard math at 10^10 URLs (documented for the scale claim): target fp
rate 1% needs m/n ≈ 9.6 bits -> 9.6e10 bits = 12 GB total, sharded
across e.g. 4096 partitions = 2.9 MB/shard — each shard comfortably
in-memory in its executor, merged as 4096 small rows per round.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant (splitmix64)


def first_seen_dedup(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Exact first-occurrence dedup: keep the first row per key in the
    given total order. The oracle for every other dedup mode."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def anti_join_unseen(frontier: DataFrame, seen: DataFrame, key: str = "url_fp") -> DataFrame:
    """frontier rows whose key is NOT in seen (exact, any scale)."""
    return frontier.join(seen.select(key).distinct(), on=key, how="left_anti")


SHARD_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType()),
        StructField("bits", BinaryType()),
        StructField("n_items", LongType()),
    ]
)


def _bloom_positions(fps: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher): h1 = fp, h2 = splitmix-mixed fp, both mod m."""
    h1 = fps.astype(np.uint64)
    x = h1 * MIX
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    h2 = x | np.uint64(1)  # odd, never zero
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


class BloomSeenFilter:
    """Partitioned Bloom seen-filter over 64-bit URL fingerprints."""

    def __init__(
        self,
        spark: SparkSession,
        n_shards: int = 32,
        m_bits_per_shard: int = 1 << 20,
        k_hashes: int | None = None,
        expected_per_shard: int | None = None,
    ):
        self.spark = spark
        self.n_shards = n_shards
        self.m_bits = m_bits_per_shard
        if k_hashes is None and expected_per_shard:
            k_hashes = max(1, round(math.log(2) * m_bits_per_shard / expected_per_shard))
        self.k = k_hashes or 7
        # shard binaries held driver-side between rounds (n_shards rows,
        # MBs each); persisted to the snapshot store as the seen_shards
        # table for resume
        self.shards: dict[int, np.ndarray] = {}
        self.n_items: dict[int, int] = {}

    # -------------------------------------------------------------- build
    def add_round(self, df: DataFrame, fp_col: str = "url_fp") -> None:
        """OR this round's fingerprints into the shards. One
        applyInPandas pass: group by shard id, build a bit-array per
        group in its executor, collect only the n_shards small rows."""
        n_shards, m_bits, k = self.n_shards, self.m_bits, self.k

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            fps = pdf[fp_col].to_numpy(dtype=np.int64)
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            pos = _bloom_positions(fps, k, m_bits).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
            sid = int(pdf["__shard"].iloc[0])
            return pd.DataFrame(
                {"shard_id": [sid], "bits": [bits.tobytes()], "n_items": [len(fps)]}
            )

        rows = (
            df.select(F.col(fp_col))
            .withColumn("__shard", F.pmod(F.col(fp_col), F.lit(n_shards)).cast("int"))
            .groupBy("__shard")
            .applyInPandas(build, schema=SHARD_SCHEMA)
            .collect()
        )
        for r in rows:
            arr = np.frombuffer(r["bits"], dtype=np.uint8)
            if r["shard_id"] in self.shards:
                self.shards[r["shard_id"]] = self.shards[r["shard_id"]] | arr
            else:
                self.shards[r["shard_id"]] = arr.copy()
            self.n_items[r["shard_id"]] = self.n_items.get(r["shard_id"], 0) + int(
                r["n_items"]
            )

    # -------------------------------------------------------------- probe
    def probe(self, df: DataFrame, fp_col: str = "url_fp") -> DataFrame:
        """Adds boolean ``maybe_seen``: False is definitive (fresh URL),
        True may be a false positive at the configured rate."""
        shards_bc = self.spark.sparkContext.broadcast(
            {sid: arr.tobytes() for sid, arr in self.shards.items()}
        )
        n_shards, m_bits, k = self.n_shards, self.m_bits, self.k
        out_schema = StructType(df.schema.fields + [StructField("maybe_seen", IntegerType())])

        def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            shards = {
                sid: np.frombuffer(b, dtype=np.uint8)
                for sid, b in shards_bc.value.items()
            }
            for pdf in batches:
                fps = pdf[fp_col].to_numpy(dtype=np.int64)
                res = np.zeros(len(fps), dtype=np.int32)
                sid_of = np.mod(fps, n_shards)  # matches Spark pmod
                for sid in np.unique(sid_of):
                    mask = sid_of == sid
                    shard = shards.get(int(sid))
                    if shard is None:
                        continue
                    pos = _bloom_positions(fps[mask], k, m_bits)
                    hit = (
                        (shard[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
                    ).all(axis=1)
                    res[mask] = hit.astype(np.int32)
                out = pdf.copy()
                out["maybe_seen"] = res
                yield out

        return df.mapInPandas(_probe, schema=out_schema).withColumn(
            "maybe_seen", F.col("maybe_seen") == 1
        )

    # ------------------------------------------------------------ fp math
    def fp_rate(self, shard_id: int) -> float:
        n = self.n_items.get(shard_id, 0)
        return (1.0 - math.exp(-self.k * n / self.m_bits)) ** self.k

    # --------------------------------------------------------- snapshots
    def to_rows(self) -> list[tuple]:
        return [
            (sid, self.shards[sid].tobytes(), self.n_items.get(sid, 0))
            for sid in sorted(self.shards)
        ]

    def to_df(self) -> DataFrame:
        return self.spark.createDataFrame(self.to_rows(), SHARD_SCHEMA)

    def to_arrow(self):
        """Driver-side arrow table (for pyarrow snapshot writes — no
        Spark job for 16 rows of driver state)."""
        import pyarrow as pa

        rows = self.to_rows()
        return pa.table(
            {
                "shard_id": pa.array([r[0] for r in rows], pa.int32()),
                "bits": pa.array([r[1] for r in rows], pa.binary()),
                "n_items": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    @classmethod
    def from_df(
        cls, spark: SparkSession, df: DataFrame, m_bits_per_shard: int, n_shards: int, k: int
    ) -> "BloomSeenFilter":
        f = cls(spark, n_shards=n_shards, m_bits_per_shard=m_bits_per_shard, k_hashes=k)
        # union of round deltas: OR duplicate shard rows together
        for r in df.collect():
            arr = np.frombuffer(r["bits"], dtype=np.uint8)
            if r["shard_id"] in f.shards:
                f.shards[r["shard_id"]] = f.shards[r["shard_id"]] | arr
            else:
                f.shards[r["shard_id"]] = arr.copy()
            f.n_items[r["shard_id"]] = f.n_items.get(r["shard_id"], 0) + int(r["n_items"])
        return f
