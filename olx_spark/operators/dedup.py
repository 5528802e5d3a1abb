"""URL-seen dedup operators (SURVEY.md §2.1 row 5, §2.3 item 3).

The reference's only dedup is per-page ``List.distinct``
(``DownloadLinks.scala:49``). The engine offers three scopes:

- ``first_seen_dedup``: exact first-occurrence-wins via window
  ``row_number() = 1`` — the correctness oracle, and fine up to ~10^9
  rows (one shuffle on the key).
- ``anti_join_unseen``: frontier MINUS seen via left anti join — the
  exact global seen-set at any scale (with both tables bucketed by
  url_fp this is a zero-shuffle sort-merge join on a real cluster).
- ``BloomSeenFilter``: partitioned Bloom shards for the 10^10-URL
  frontier where materializing the exact seen-set per round is too
  expensive.

Bloom layout — fully DISTRIBUTED, nothing resident on the driver:

- shard state is a DataFrame of ``(shard_id, bits, n_items)`` rows
  (the ``seen_shards`` snapshot table in the engine); a round's build
  is one ``applyInPandas`` pass grouped by ``url_fp % n_shards`` that
  emits per-shard DELTA rows — appended to the table, never collected;
- probing CO-GROUPS the frontier (keyed by the same ``pmod``) with the
  shard rows, so each task holds exactly one shard's bit-arrays (OR of
  its deltas) and only that task's slice of the frontier — the filter
  is never broadcast whole and never lives in a driver dict;
- delta rows per shard are OR-merged lazily in the probe task and
  physically by ``merge_shard_deltas`` during snapshot compaction.

Shard math at 10^10 URLs: target fp rate 1% needs m/n ≈ 9.6 bits ->
9.6e10 bits = 12 GB TOTAL — never materialized in one place: across
4096 shards that is 2.9 MB per shard row, and a probe task touches
exactly one of them. No false negatives (a seen URL always probes
positive); false positives bounded by the standard (1 - e^{-kn/m})^k
rate, accounted per shard from the table's n_items (bits column pruned
— only counts ever reach the driver).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olx_spark.functions import text as text_fns
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
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


def chunk_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 20,
) -> DataFrame:
    """Corpus-wide chunk-level exact dedup (the CCNet line-dedup pass,
    adapted to fixed token windows): fingerprint every chunk (md5-60),
    keep only the globally-first occurrence of each fingerprint in
    (doc_id, chunk_idx) order, and report per-document survival stats
    — (id, n_chunks, n_kept, dup_chunk_frac); documents with no
    chunks (blank text) read 0/0/0.0.

    Scale shape: first-occurrence selection is a min-of-struct
    groupBy — partial (map-side) aggregation absorbs hot boilerplate
    chunks (the very rows this pass exists to find), where a
    row_number window over the fingerprint would funnel every copy of
    a hot chunk through one task. The join back on the fingerprint is
    AQE-skew-splittable. Two shuffles total (fp, then id) — the same
    budget as doc-level exact dedup."""
    chunks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(text_fns.token_chunks(F.col(text_col), chunk_tokens)).alias(
            "__idx", "__chunk"
        ),
    ).select("__id", "__idx", text_fns.md5_60(F.col("__chunk")).alias("__fp"))
    firsts = chunks.groupBy("__fp").agg(
        F.min(F.struct("__id", "__idx")).alias("__first")
    )
    marked = chunks.join(firsts, "__fp").withColumn(
        "__kept",
        (
            (F.col("__id") == F.col("__first.__id"))
            & (F.col("__idx") == F.col("__first.__idx"))
        ).cast("int"),
    )
    stats = marked.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_chunks"), F.sum("__kept").alias("n_kept")
    )
    return (
        df.select(F.col(id_col))
        .join(stats, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.round(
                F.when(F.coalesce("n_chunks", F.lit(0)) == 0, F.lit(0.0)).otherwise(
                    1.0 - F.col("n_kept") / F.col("n_chunks").cast("double")
                ),
                6,
            ).alias("dup_chunk_frac"),
        )
    )


def colocated_pending(
    spark: SparkSession,
    schema: StructType,
    n_buckets: int,
    frontier_files: dict[int, list[str]],
    order_cols: list[str],
    fp_col: str = "url_fp",
    seen_files: dict[int, list[str]] | None = None,
    shard_files: dict[int, list[str]] | None = None,
    m_bits: int | None = None,
    k: int | None = None,
    cuckoo_files: dict[int, list[str]] | None = None,
    cuckoo_n_buckets: int | None = None,
) -> DataFrame:
    """The per-round pending derivation (frontier MINUS seen, then
    first-occurrence dedup) as a ZERO-SHUFFLE storage-partitioned job
    over a bucketed snapshot layout (``SnapshotStore.bucket_files``).

    Both ``frontier`` and the seen state (exact fps, or Bloom shard
    rows) are written pre-partitioned by ``pmod(url_fp, n_buckets)``
    subdirs, so bucket b of the frontier can only match bucket b of the
    seen state. The plan is ``Range -> MapInPandas``: ``spark.range(n,
    numPartitions=n)`` pins exactly one bucket per task (contiguous
    range slicing — no hash, no exchange), and each task pyarrow-reads
    its own bucket's frontier delta files plus its own seen/shard
    files, probes, and dedups IN TASK. This is the local-parquet
    stand-in for an Iceberg ``bucket(n, url_fp)`` table pair under a
    storage-partitioned join: the previous shape shuffled the ENTIRE
    accumulated frontier on url_fp (cogroup/anti-join exchange) every
    round — the measured 0.68 shuffle ceiling on 2v8 scaling
    (BENCH.md round 4); this shape shuffles nothing.

    Semantics are identical to ``probe-then-first_seen_dedup``:

    - Bloom mode (``shard_files``): vectorized double-hash probe
      against the OR of the bucket's shard rows (no false negatives;
      same ``_bloom_positions`` math as :class:`BloomSeenFilter`).
      Requires the layout ``n_buckets == n_shards`` so bucket b holds
      exactly shard b.
    - Cuckoo mode (``cuckoo_files``): vectorized tag-membership probe
      against each of the bucket's cuckoo shard rows (union semantics;
      no merge needed to probe). Same ``n_buckets == n_shards`` layout
      requirement as Bloom mode.
    - Exact mode (``seen_files``): ``np.isin`` anti-filter against the
      bucket's seen fingerprints.
    - Dedup: stable-sort on ``order_cols``, keep first per ``fp_col``
      (all rows of one fp are in one bucket by construction).

    At 10^10-frontier scale each task touches one shard row (~3 MB at
    4096 shards) and its own slice of the frontier — the same unit of
    work a real cluster's co-located scan would schedule. File-list
    maps ride the closure (O(buckets x deltas) strings; compaction
    bounds deltas)."""
    if sum(x is not None for x in (shard_files, seen_files, cuckoo_files)) > 1:
        raise ValueError(
            "pass shard_files (bloom), cuckoo_files (cuckoo), or "
            "seen_files (exact) — at most one"
        )
    cols = schema.fieldNames()

    def _run(batches) -> "pd.DataFrame":
        import pyarrow.parquet as pq

        def read_all(files: list[str]) -> pd.DataFrame | None:
            if not files:
                return None
            import pyarrow as pa

            # permissive: deltas from different rounds differ in
            # nullability metadata (seed frontier vs discovered rows)
            return pa.concat_tables(
                [pq.read_table(f) for f in files], promote_options="permissive"
            ).to_pandas()

        for pdf in batches:
            for b in pdf["id"].astype(int):
                rows = read_all(frontier_files.get(b, []))
                if rows is None or len(rows) == 0:
                    continue
                fps = rows[fp_col].to_numpy(dtype=np.int64)
                if shard_files is not None:
                    shards = read_all(shard_files.get(b, []))
                    if shards is not None and len(shards):
                        bits = _or_rows(shards["bits"])
                        if len(bits) * 8 != m_bits:
                            raise ValueError(
                                f"bloom geometry mismatch: shard row has "
                                f"{len(bits) * 8} bits, filter configured "
                                f"m_bits={m_bits}; resume must reuse the "
                                "committed geometry"
                            )
                        pos = _bloom_positions(fps, k, m_bits)
                        hit = (
                            (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
                        ).all(axis=1)
                        rows = rows[~hit]
                elif cuckoo_files is not None:
                    shards = read_all(cuckoo_files.get(b, []))
                    if shards is not None and len(shards):
                        from olx_spark.operators.cuckoo import SLOTS, _contains

                        hit = np.zeros(len(fps), dtype=bool)
                        for tb in shards["bits"]:
                            arr = np.frombuffer(tb, dtype=np.uint16).reshape(
                                -1, SLOTS
                            )
                            if arr.shape[0] != cuckoo_n_buckets:
                                raise ValueError(
                                    f"cuckoo geometry mismatch: shard row "
                                    f"has {arr.shape[0]} buckets, filter "
                                    f"configured n_buckets="
                                    f"{cuckoo_n_buckets}; resume must "
                                    "reuse the committed geometry"
                                )
                            hit |= _contains(arr, fps)
                        rows = rows[~hit]
                elif seen_files is not None:
                    seen = read_all(seen_files.get(b, []))
                    if seen is not None and len(seen):
                        seen_fps = seen[fp_col].to_numpy(dtype=np.int64)
                        rows = rows[~np.isin(fps, seen_fps)]
                if len(rows) == 0:
                    continue
                rows = rows.sort_values(order_cols, kind="mergesort")
                rows = rows.drop_duplicates(subset=[fp_col], keep="first")
                yield rows[cols]

    src = spark.range(0, n_buckets, 1, numPartitions=n_buckets)
    return src.mapInPandas(_run, schema=schema)


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


def _or_rows(bits_col) -> np.ndarray | None:
    out: np.ndarray | None = None
    for b in bits_col:
        arr = np.frombuffer(b, dtype=np.uint8)
        if out is not None and len(arr) != len(out):
            raise ValueError(
                f"bloom shard geometry mismatch: rows of one shard have "
                f"{len(out) * 8} and {len(arr) * 8} bits — the store was "
                "written under a different (n_shards, m_bits) configuration"
            )
        out = arr.copy() if out is None else (out | arr)
    return out


def merge_shard_deltas(df: DataFrame) -> DataFrame:
    """OR-merge accumulated per-round shard delta rows down to one row
    per shard (used by snapshot compaction; probe tasks do the same OR
    lazily, so merging is an optimization, not a correctness need)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "bits": [_or_rows(pdf["bits"]).tobytes()],
                "n_items": [int(pdf["n_items"].sum())],
            }
        )

    return df.groupBy("shard_id").applyInPandas(merge, schema=SHARD_SCHEMA)


class BloomSeenFilter:
    """Partitioned Bloom seen-filter over 64-bit URL fingerprints.

    State is a DataFrame of shard rows (``shards_df``), pointed at the
    committed ``seen_shards`` table by the engine (``set_state``) or
    locally checkpointed between ``add_round`` calls in standalone use.
    The driver never holds shard bits; probe is a per-shard cogroup.
    """

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
        self.shards_df: DataFrame | None = None

    # -------------------------------------------------------------- state
    def has_state(self) -> bool:
        return self.shards_df is not None

    def set_state(self, shards_df: DataFrame | None) -> None:
        """Point the filter at committed shard rows (delta rows allowed:
        probe ORs rows of one shard inside its task)."""
        self.shards_df = shards_df

    # -------------------------------------------------------------- build
    def build_deltas(self, df: DataFrame, fp_col: str = "url_fp") -> DataFrame:
        """This round's fingerprints as per-shard Bloom DELTA rows: one
        applyInPandas pass grouped by shard id; each group builds its
        bit-array in its executor. Returns a DataFrame (n_shards rows
        max) — the caller appends it to the seen_shards table; nothing
        is collected."""
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

        return (
            df.select(F.col(fp_col))
            .withColumn("__shard", F.pmod(F.col(fp_col), F.lit(n_shards)).cast("int"))
            .groupBy("__shard")
            .applyInPandas(build, schema=SHARD_SCHEMA)
        )

    def add_round(self, df: DataFrame, fp_col: str = "url_fp") -> None:
        """Standalone (storeless) state update: OR this round's deltas
        into the distributed state. ``localCheckpoint`` materializes the
        merged rows on the EXECUTORS (truncating lineage so later probes
        don't rebuild every delta) — still no driver copy. Engine runs
        use build_deltas + snapshot commit + set_state instead."""
        from olx_spark.session import materialize

        delta = self.build_deltas(df, fp_col)
        merged = (
            delta
            if self.shards_df is None
            else merge_shard_deltas(self.shards_df.unionByName(delta))
        )
        self.shards_df = materialize(merged)

    # -------------------------------------------------------------- probe
    def probe(self, df: DataFrame, fp_col: str = "url_fp") -> DataFrame:
        """Adds boolean ``maybe_seen``: False is definitive (fresh URL),
        True may be a false positive at the configured rate.

        Frontier rows are co-grouped with shard rows on
        ``url_fp % n_shards``: each task sees one shard's bits and only
        its own slice of the frontier — no driver collect, no whole-
        filter broadcast (the 12 GB @ 10^10 never converges anywhere).
        """
        if not self.has_state():
            return df.withColumn("maybe_seen", F.lit(False))
        m_bits, k = self.m_bits, self.k
        out_schema = StructType(df.schema.fields + [StructField("maybe_seen", BooleanType())])

        def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            out = left.drop(columns=["__shard"])
            if len(left) == 0:
                out["maybe_seen"] = pd.Series([], dtype=bool)
                return out
            if len(right) == 0:
                out["maybe_seen"] = False
                return out
            bits = _or_rows(right["bits"])
            if len(bits) * 8 != m_bits:
                # fail LOUDLY: probing committed shards under a different
                # m_bits silently yields false negatives (duplicate
                # fetches) — the one invariant the filter must never break
                raise ValueError(
                    f"bloom geometry mismatch: shard row has {len(bits) * 8} "
                    f"bits but the filter is configured m_bits={m_bits}; "
                    "resume must reuse the committed geometry"
                )
            fps = out[fp_col].to_numpy(dtype=np.int64)
            pos = _bloom_positions(fps, k, m_bits)
            hit = ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
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

    # ------------------------------------------------------------ fp math
    def fp_rates(self) -> dict[int, float]:
        """Per-shard theoretical fp rate from the table's item counts.
        Only (shard_id, n_items) is aggregated/collected — the bits
        column is pruned and never reaches the driver."""
        if not self.has_state():
            return {}
        rows = (
            self.shards_df.groupBy("shard_id")
            .agg(F.sum("n_items").alias("n"))
            .collect()
        )
        return {
            int(r["shard_id"]): (1.0 - math.exp(-self.k * int(r["n"]) / self.m_bits))
            ** self.k
            for r in rows
        }

    # --------------------------------------------------------- snapshots
    def to_df(self) -> DataFrame | None:
        """The distributed shard rows (delta form) — what the engine
        commits; round-trips through ``from_df``."""
        return self.shards_df

    @classmethod
    def from_df(
        cls, spark: SparkSession, df: DataFrame, m_bits_per_shard: int, n_shards: int, k: int
    ) -> "BloomSeenFilter":
        f = cls(spark, n_shards=n_shards, m_bits_per_shard=m_bits_per_shard, k_hashes=k)
        f.set_state(df)
        return f

    # ------------------------------------------------------ test helpers
    def shard_arrays(self) -> dict[int, np.ndarray]:
        """TEST/DEBUG ONLY: collect the OR-merged shard bit-arrays to
        the driver for assertions. Never on any engine path."""
        if not self.has_state():
            return {}
        rows = merge_shard_deltas(self.shards_df).collect()
        return {
            int(r["shard_id"]): np.frombuffer(r["bits"], dtype=np.uint8) for r in rows
        }

    def n_items_by_shard(self) -> dict[int, int]:
        if not self.has_state():
            return {}
        rows = (
            self.shards_df.groupBy("shard_id").agg(F.sum("n_items").alias("n")).collect()
        )
        return {int(r["shard_id"]): int(r["n"]) for r in rows}


def duplicate_spans(
    df: "DataFrame",
    id_col: str,
    text_col: str,
    n: int = 8,
    min_count: int = 2,
) -> "DataFrame":
    """Exact-substring duplicate-SPAN detection (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    ExactSubstr step, at word granularity): find, per document, the
    maximal word spans whose every length-``n`` word gram occurs at
    least ``min_count`` times in the whole corpus. Downstream either
    cuts the spans out of the text or drops documents dominated by
    them — both need the span table this operator emits.

    Pipeline (pure JVM end to end — no Python, no UDF):

    1. positional n-grams: one ``transform`` over ``sequence(0,
       n_words-n)`` builds the md5-60 gram fingerprint at every
       position (whitespace tokens, the repo's ``token_count``
       convention), then ONE ``posexplode`` — corpus size × ~words/doc
       rows, the same explode class as the MinHash shingle pass;
    2. corpus gram counts: ``groupBy(gram)`` (map-side combined) and a
       shuffle join back on the gram — NOT a count-window, so AQE's
       skew split applies to the hot boilerplate grams that dominate
       web corpora (a window partitioned by gram would pin each hot
       gram to one task); the positional gram table feeds BOTH the
       count aggregate and the join-back, so it is materialized once
       (``session.materialize``, reliable under
       ``spark.olx.checkpoint.reliable``) instead of re-running the
       explode + md5 per branch — same trade as the MinHash signature
       table: one words-per-doc-sized write vs double the gram-hash
       CPU, and the fork is what makes Spark recompute;
    3. span merge: duplicated positions collapse to maximal runs by
       gaps-and-islands (``pos - row_number()`` is constant on a
       stride-1 run) — windows partitioned per DOCUMENT, which is
       bounded by doc length, never by corpus size.

    Output: ``(id, span_start, span_end, n_dup_grams)`` with word
    indices inclusive (``span_end = last_pos + n - 1``); a document
    with no duplicated gram emits no row.
    """
    from olx_spark.functions.text import md5_60

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    t = F.trim(F.col(text_col))
    words = F.split(t, r"\s+")
    grams = F.when(
        (F.length(t) > 0) & (F.size(words) >= n),
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: md5_60(F.concat_ws(" ", F.slice(words, i + 1, n))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    from olx_spark.session import materialize

    pos = materialize(
        df.select(F.col(id_col), F.posexplode(grams).alias("pos", "gram"))
    )
    counts = pos.groupBy("gram").agg(F.count("*").alias("cnt")).filter(
        F.col("cnt") >= min_count
    )
    dup = pos.join(counts, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        dup.withColumn("__grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            F.count("*").alias("n_dup_grams"),
        )
        .drop("__grp")
    )


def keep_canonical(
    comps: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "component",
    score_col: str = "score",
) -> DataFrame:
    """The APPLY step of a dedup pass: given transitive dup groups
    (``comps``: one row per doc with its component id, e.g. from
    ``graph.connected_components``) and a per-doc score, keep the
    best-scoring doc of each group (ties broken by MIN id — a total
    order, so re-runs keep the same representative) and mark the rest
    dropped. Returns ``(id_col, comp_col, kept_id, action)`` with
    ``action`` in {'keep', 'drop'} for EVERY input doc — the decision
    log a pipeline persists for lineage, not just the survivor list.

    Callers should pass a ROUNDED score (e.g. ``round(quality, 6)``)
    when the score comes from float arithmetic: the argmax compares
    raw values, and a rounded score makes the comparison replayable
    across engines (the oracle contract used by q_dedup_decisions).

    Scale shape (100 TB): one groupBy on the component id over a
    1-row-per-doc frame (map-side combinable — the struct max folds
    partials), then one join back on the same key, co-partitioned
    with the groupBy's output. No windows over global orders, no
    collect; component skew (a boilerplate mega-group) costs one
    combiner-reduced max, not a sorted window."""
    j = comps.join(scores.select(id_col, score_col), id_col)
    # max(struct(score, -id)): max score, then (on equal score) the
    # max of -id == the MIN id — argmax without a window sort
    best = j.groupBy(comp_col).agg(
        F.max(
            F.struct(
                F.col(score_col).alias("s"),
                (-F.col(id_col)).alias("nid"),
            )
        ).alias("best")
    )
    winners = best.select(comp_col, (-F.col("best.nid")).alias("kept_id"))
    return (
        comps.join(winners, comp_col)
        .select(
            id_col,
            comp_col,
            "kept_id",
            F.when(F.col(id_col) == F.col("kept_id"), F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("action"),
        )
    )
