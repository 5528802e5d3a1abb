"""Token-budget sequence packing — assign each document to a training
shard so shards hold ~``budget`` tokens each, deterministically.

The LLM-training-data step after dedup/filter/sample: context-window
construction wants the corpus cut into fixed-token-budget groups in a
reproducible random order. The reference engine has no analog (it
stores ads row-at-a-time, `DownloadAds.scala:33`); this backs the
engine's pipeline brief alongside the sampling/split family.

Semantics: documents are laid out on one conceptual token tape in the
salted-hash order ``(bucket, h, id)`` (``h = md5_60(salt:id)``,
``bucket = h % n_buckets`` — a uniform random permutation, version-
pinned by the salt exactly like ``sampling.py``). A document's shard
is ``floor(start_offset / budget)`` — the shard its FIRST token lands
in. Every document belongs to exactly one shard; a shard's token sum
is < ``budget + max_doc_tokens`` (boundary documents are not split).

Scale shape (100 TB): a naive global running sum is a no-partition
window — the single-task scale-killer this repo bans. Instead the
classic TWO-PHASE DISTRIBUTED PREFIX SUM:

1. per-bucket token totals: one map-side-combinable groupBy over
   ``n_buckets`` keys, collected to the driver — ``n_buckets`` rows of
   metadata, NOT data (same budget class as AQE's per-partition
   stats);
2. exclusive prefix sum over the (tiny, sorted) bucket totals gives
   each bucket's global tape offset, broadcast back as a join against
   an ``n_buckets``-row frame;
3. in-bucket exclusive running sum: a window partitioned BY BUCKET
   (parallel across buckets, each sorts only its ~1/n_buckets slice)
   ordered by ``(h, id)``; the document's global start offset is the
   bucket offset plus the in-bucket running sum.

``n_buckets`` is part of the packing's identity (it defines the tape
order) — resumed or re-run jobs must reuse it, like the salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from olx_spark.functions.text import md5_60


def pack_token_shards(
    df: DataFrame,
    id_col: str,
    tokens_col: Column | str,
    budget: int,
    salt: str = "pack-v1",
    n_buckets: int = 32,
) -> DataFrame:
    """Add ``(n_tokens, start_offset, shard_id)`` to ``df``.

    ``tokens_col``: a column name or Column expression giving each
    document's token count (e.g. ``functions.text.token_count(text)``).
    ``budget``: tokens per shard. Zero-token documents still occupy a
    tape position (width 0) and get the shard of their offset.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    toks = (F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col).cast(
        "long"
    )
    h = md5_60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    base = df.withColumn("n_tokens", toks).withColumn("__h", h).withColumn(
        "__b", F.pmod(F.col("__h"), F.lit(n_buckets)).cast("int")
    )

    # phase 1+2: bucket totals -> exclusive prefix offsets (driver-side
    # over n_buckets rows — metadata, not data)
    totals = {
        int(r["__b"]): int(r["t"])
        for r in base.groupBy("__b").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += totals.get(b, 0)
    off_df = df.sparkSession.createDataFrame(offsets, "__b int, __off long")

    # phase 3: in-bucket exclusive running sum, parallel across buckets
    w = (
        Window.partitionBy("__b")
        .orderBy(F.col("__h"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(off_df), "__b")
        .withColumn(
            "start_offset",
            F.col("__off") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .withColumn("shard_id", F.floor(F.col("start_offset") / budget))
        .drop("__h", "__b", "__off")
    )
