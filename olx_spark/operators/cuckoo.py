"""Partitioned cuckoo seen-filter — the deletion-capable alternative
to :class:`olx_spark.operators.dedup.BloomSeenFilter` (the north rule
names "bloom/cuckoo URL-seen"; reference parity: the olx crawler's
seen-set is the ``visited`` accumulation in ``Olx.scala:31-44`` —
both filters reproduce its membership semantics at 10^10 scale).

Why a cuckoo variant next to the Bloom: **deletion**. A crawler with a
revisit policy (TTL expiry, re-crawl of stale listings) must RETIRE
fingerprints from the seen-set so the frontier re-admits them; a plain
Bloom cannot delete (a counting Bloom pays 4-8x the memory). Cuckoo
filters (Fan, Andersen, Kaminsky, Mitzenmacher — "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014) support O(1) delete at
comparable space (~12 bits/item at the 4-slot, 16-bit-tag geometry
used here, fp rate ~= 2 * 4 / 2^16 ~= 1.2e-4).

Layout mirrors the Bloom exactly so the engine's plumbing is shared:

- state is a DataFrame of ``(shard_id, bits, n_items)`` rows (the
  ``SHARD_SCHEMA`` of dedup.py; ``bits`` holds the slot table); the
  driver never materializes a table;
- an item routes to shard ``pmod(url_fp, n_shards)`` — the SAME
  routing as the Bloom and the bucketed store layout, so co-location
  properties carry over unchanged;
- probe co-groups frontier slices with their shard's rows; a task
  holds one shard's tables and only its slice of the frontier.

In-shard geometry (per Fan et al.): ``n_buckets`` buckets (power of
two) x 4 slots x uint16 tag, tag 0 = empty. For 64-bit fingerprint
``fp``: ``tag = nonzero 16-bit mix of fp``, ``i1 = mix(fp) mod
n_buckets``, ``i2 = i1 XOR (h(tag) mod n_buckets)`` — the XOR makes
``alt(alt(i)) == i``, so any slot can relocate knowing only its
(bucket, tag), which is also what makes shard rows MERGEABLE by
re-insertion (Bloom merges by OR; cuckoo deltas merge by replaying
non-empty slots — no original keys needed).

Multiset semantics as in the paper: insert does NOT pre-check
membership, so delete(x) is guaranteed-safe iff x was inserted and
not yet deleted (the engine flow inserts only post-probe fresh
fingerprints, so duplicate copies are structurally rare). Kicks are
DETERMINISTIC (slot choice seeded by the evicted tag), so shard bytes
are reproducible for a given insertion order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from olx_spark.operators.dedup import MIX, SHARD_SCHEMA

SLOTS = 4
MAX_KICKS = 500


_U64 = (1 << 64) - 1


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 (vectorized; wraparound is the
    algorithm)."""
    x = np.asarray(x, dtype=np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _mix64_scalar(x: int) -> int:
    """Python-int twin of :func:`_mix64` (bit-identical; used by the
    sequential insert/delete loops to avoid per-item numpy scalars)."""
    x &= _U64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _U64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _U64
    return x ^ (x >> 31)


def _alt_one(i: int, tag: int, n_buckets: int) -> int:
    """Scalar i2 = i XOR (h(tag) mod n_buckets); bit-identical to
    :func:`_alt_bucket`."""
    return i ^ (_mix64_scalar(tag) & (n_buckets - 1))


def _tags_and_buckets(fps: np.ndarray, n_buckets: int):
    """(tag uint16 nonzero, i1 int64) for each 64-bit fingerprint."""
    h = _mix64(fps.astype(np.int64).view(np.uint64) * MIX)
    tag = (h >> np.uint64(48)).astype(np.uint16)
    tag = np.where(tag == 0, np.uint16(1), tag)
    i1 = (h & np.uint64(n_buckets - 1)).astype(np.int64)
    return tag, i1


def _alt_bucket(i: np.ndarray | int, tag: np.ndarray | int, n_buckets: int):
    """i2 = i XOR (h(tag) mod n_buckets); involutive in i."""
    h = _mix64(np.asarray(tag, dtype=np.uint64))
    return (np.asarray(i, dtype=np.uint64) ^ (h & np.uint64(n_buckets - 1))).astype(
        np.int64
    )


def _insert_all(table: np.ndarray, tags: np.ndarray, i1s: np.ndarray) -> None:
    """Insert (tag, i1) pairs into an (n_buckets, SLOTS) uint16 table,
    kicking deterministically; raises on kick-chain exhaustion (the
    load-factor wall ~0.95 — geometry must be provisioned, same
    contract as the Bloom's m_bits)."""
    n_buckets = table.shape[0]
    for t, i1 in zip(tags.tolist(), i1s.tolist()):
        i2 = _alt_one(i1, int(t), n_buckets)
        placed = False
        for i in (i1, i2):
            row = table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = t
                placed = True
                break
        if placed:
            continue
        # deterministic kick chain: start at the bucket picked by the
        # tag's low bit, evict the slot indexed by (kick + tag) & 3
        cur, i = int(t), i2 if (t & 1) else i1
        for kick in range(MAX_KICKS):
            j = (kick + cur) & (SLOTS - 1)
            cur, table[i, j] = int(table[i, j]), cur
            i = _alt_one(i, cur, n_buckets)
            row = table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                placed = True
                break
        if not placed:
            occ = float((table != 0).mean())
            raise ValueError(
                f"cuckoo shard full (load factor {occ:.3f}, "
                f"{n_buckets} buckets x {SLOTS} slots): kick chain of "
                f"{MAX_KICKS} exhausted — provision more buckets per "
                "shard or more shards (resume must reuse committed "
                "geometry either way)"
            )


def _contains(table: np.ndarray, fps: np.ndarray) -> np.ndarray:
    """Vectorized membership: tag present in bucket i1 or i2."""
    if len(fps) == 0:
        return np.zeros(0, dtype=bool)
    n_buckets = table.shape[0]
    tag, i1 = _tags_and_buckets(fps, n_buckets)
    i2 = _alt_bucket(i1, tag, n_buckets)
    t = tag[:, None]
    return (table[i1] == t).any(axis=1) | (table[i2] == t).any(axis=1)


def _delete_all(table: np.ndarray, fps: np.ndarray) -> int:
    """Remove ONE tag copy per fingerprint (bucket i1 preferred).
    Returns the number actually removed. Safe iff each fp was inserted
    and not yet deleted (the Fan et al. contract)."""
    n_buckets = table.shape[0]
    tags, i1s = _tags_and_buckets(fps, n_buckets)
    removed = 0
    for t, i1 in zip(tags.tolist(), i1s.tolist()):
        for i in (i1, _alt_one(i1, int(t), n_buckets)):
            hit = np.flatnonzero(table[i] == t)
            if hit.size:
                table[i, hit[0]] = 0
                removed += 1
                break
    return removed


def _merge_tables(rows: "pd.Series", n_buckets: int) -> np.ndarray:
    """Merge shard delta rows by re-inserting every non-empty slot of
    later rows into the first row's table (slot (bucket, tag) is a
    complete relocation key thanks to the XOR pairing)."""
    out: np.ndarray | None = None
    for b in rows:
        arr = np.frombuffer(b, dtype=np.uint16).reshape(-1, SLOTS)
        if arr.shape[0] != n_buckets:
            raise ValueError(
                f"cuckoo geometry mismatch: shard row has {arr.shape[0]} "
                f"buckets, filter configured n_buckets={n_buckets}; "
                "resume must reuse the committed geometry"
            )
        if out is None:
            out = arr.copy()
            continue
        occ_i, occ_j = np.nonzero(arr)
        _insert_all(out, arr[occ_i, occ_j], occ_i.astype(np.int64))
    return out


def merge_cuckoo_deltas(df: DataFrame, n_buckets: int) -> DataFrame:
    """Collapse accumulated per-round shard delta rows to one row per
    shard (snapshot-compaction analog of ``merge_shard_deltas``; probe
    does NOT need it — it checks each delta row — but delete does)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "bits": [_merge_tables(pdf["bits"], n_buckets).tobytes()],
                "n_items": [int(pdf["n_items"].sum())],
            }
        )

    return df.groupBy("shard_id").applyInPandas(merge, schema=SHARD_SCHEMA)


class CuckooSeenFilter:
    """Partitioned cuckoo seen-filter over 64-bit URL fingerprints.

    API-compatible with :class:`BloomSeenFilter` (same state schema,
    same ``build_deltas``/``probe``/``add_round``/``set_state``
    surface) plus ``delete_round`` — retire fingerprints so the
    frontier re-admits their URLs (re-crawl / TTL expiry).
    """

    def __init__(
        self,
        spark: SparkSession,
        n_shards: int = 32,
        n_buckets_per_shard: int = 1 << 15,
        expected_per_shard: int | None = None,
    ):
        if n_buckets_per_shard & (n_buckets_per_shard - 1):
            raise ValueError("n_buckets_per_shard must be a power of two")
        if expected_per_shard is not None:
            # provision for ~0.84 load (kick failures climb past ~0.95)
            need = int(expected_per_shard / 0.84 / SLOTS)
            while n_buckets_per_shard < need:
                n_buckets_per_shard <<= 1
        self.spark = spark
        self.n_shards = n_shards
        self.n_buckets = n_buckets_per_shard
        self.shards_df: DataFrame | None = None

    # -------------------------------------------------------------- state
    def has_state(self) -> bool:
        return self.shards_df is not None

    def set_state(self, shards_df: DataFrame | None) -> None:
        self.shards_df = shards_df

    # -------------------------------------------------------------- build
    def build_deltas(self, df: DataFrame, fp_col: str = "url_fp") -> DataFrame:
        """This round's fingerprints as per-shard cuckoo DELTA rows
        (each group inserts into a fresh table in its executor);
        append to the state table — probe unions rows, compaction
        merges them by re-insertion."""
        n_shards, n_buckets = self.n_shards, self.n_buckets

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            fps = np.unique(pdf[fp_col].to_numpy(dtype=np.int64))
            table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
            tags, i1s = _tags_and_buckets(fps, n_buckets)
            _insert_all(table, tags, i1s)
            return pd.DataFrame(
                {
                    "shard_id": [int(pdf["__shard"].iloc[0])],
                    "bits": [table.tobytes()],
                    "n_items": [len(fps)],
                }
            )

        return (
            df.select(F.col(fp_col))
            .withColumn("__shard", F.pmod(F.col(fp_col), F.lit(n_shards)).cast("int"))
            .groupBy("__shard")
            .applyInPandas(build, schema=SHARD_SCHEMA)
        )

    def add_round(self, df: DataFrame, fp_col: str = "url_fp") -> None:
        """Standalone state update: merge this round's deltas into the
        distributed state (executor-resident via ``materialize``; the
        engine commits deltas through the snapshot store instead)."""
        from olx_spark.session import materialize

        delta = self.build_deltas(df, fp_col)
        merged = (
            delta
            if self.shards_df is None
            else merge_cuckoo_deltas(
                self.shards_df.unionByName(delta), self.n_buckets
            )
        )
        self.shards_df = materialize(merged)

    # ------------------------------------------------------------- delete
    def delete_round(self, df: DataFrame, fp_col: str = "url_fp") -> None:
        """Retire fingerprints (multiset delete: one copy each). The
        shard's delta rows are first merged by re-insertion so the
        delete lands regardless of which round inserted the item —
        emits ONE replacement row per shard."""
        if not self.has_state():
            return
        from olx_spark.session import materialize

        n_shards, n_buckets = self.n_shards, self.n_buckets
        dels = (
            df.select(F.col(fp_col))
            .withColumn("__shard", F.pmod(F.col(fp_col), F.lit(n_shards)).cast("int"))
        )

        def _del(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(right) == 0:
                return pd.DataFrame(columns=["shard_id", "bits", "n_items"])
            table = _merge_tables(right["bits"], n_buckets)
            n = int(right["n_items"].sum())
            if len(left):
                n -= _delete_all(table, left[fp_col].to_numpy(dtype=np.int64))
            return pd.DataFrame(
                {
                    "shard_id": [int(right["shard_id"].iloc[0])],
                    "bits": [table.tobytes()],
                    "n_items": [max(n, 0)],
                }
            )

        merged = (
            dels.groupby("__shard")
            .cogroup(self.shards_df.groupby("shard_id"))
            .applyInPandas(_del, schema=SHARD_SCHEMA)
        )
        self.shards_df = materialize(merged)

    # -------------------------------------------------------------- probe
    def probe(self, df: DataFrame, fp_col: str = "url_fp") -> DataFrame:
        """Adds boolean ``maybe_seen``: False is definitive (no false
        negatives for inserted-and-not-deleted items), True is a
        possible false positive at ~2*SLOTS/2^16 ~= 1.2e-4. Each task
        holds one shard's rows and its slice of the frontier; delta
        rows are probed individually (membership in the union ==
        any-row hit), so probe never pays the merge."""
        if not self.has_state():
            return df.withColumn("maybe_seen", F.lit(False))
        n_buckets = self.n_buckets
        out_schema = StructType(
            df.schema.fields + [StructField("maybe_seen", BooleanType())]
        )

        def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            out = left.drop(columns=["__shard"])
            if len(left) == 0:
                out["maybe_seen"] = pd.Series([], dtype=bool)
                return out
            fps = out[fp_col].to_numpy(dtype=np.int64)
            hit = np.zeros(len(fps), dtype=bool)
            for b in right["bits"]:
                arr = np.frombuffer(b, dtype=np.uint16).reshape(-1, SLOTS)
                if arr.shape[0] != n_buckets:
                    raise ValueError(
                        f"cuckoo geometry mismatch: shard row has "
                        f"{arr.shape[0]} buckets, filter configured "
                        f"n_buckets={n_buckets}; resume must reuse the "
                        "committed geometry"
                    )
                hit |= _contains(arr, fps)
            out["maybe_seen"] = hit
            return out

        keyed = df.withColumn(
            "__shard", F.pmod(F.col(fp_col), F.lit(self.n_shards)).cast("int")
        )
        shards = self.shards_df.select("shard_id", "bits")
        return (
            keyed.groupby("__shard")
            .cogroup(shards.groupby("shard_id"))
            .applyInPandas(_probe, schema=out_schema)
        )

    # ------------------------------------------------------------ metrics
    def load_factors(self) -> dict[int, float]:
        """Per-shard load factor from item counts (bits pruned; only
        counts reach the driver). Kick failures climb past ~0.95."""
        if not self.has_state():
            return {}
        cap = self.n_buckets * SLOTS
        rows = (
            self.shards_df.groupBy("shard_id")
            .agg(F.sum("n_items").alias("n"))
            .collect()
        )
        return {int(r["shard_id"]): int(r["n"]) / cap for r in rows}

    # --------------------------------------------------------- snapshots
    def to_df(self) -> DataFrame | None:
        return self.shards_df

    @classmethod
    def from_df(
        cls, spark: SparkSession, df: DataFrame, n_buckets_per_shard: int, n_shards: int
    ) -> "CuckooSeenFilter":
        f = cls(spark, n_shards=n_shards, n_buckets_per_shard=n_buckets_per_shard)
        f.set_state(df)
        return f
