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


def ar_bucket_ladder(
    base: int = 64, step: int = 16, min_side: int = 32, max_side: int = 128
) -> list[tuple[int, int]]:
    """SDXL/NovelAI-style aspect-ratio bucket ladder: all ``(w, h)``
    pairs with sides multiples of ``step`` in ``[min_side, max_side]``
    whose area stays within the ``base*base`` pixel budget, closed
    under transposition (every landscape bucket has its portrait
    mirror). Sorted by aspect ratio (then width) so bucket ids are
    stable. Deterministic constants — the batching's SQL oracle embeds
    the same ladder as VALUES."""
    if step < 1 or min_side < 1 or min_side > max_side:
        raise ValueError(
            f"need step >= 1 and 1 <= min_side <= max_side, got "
            f"step={step} min_side={min_side} max_side={max_side}"
        )
    budget = base * base
    pairs: set[tuple[int, int]] = set()
    for w in range(min_side, max_side + 1, step):
        h = min(max_side, (budget // w) // step * step)
        if h >= min_side:
            pairs.add((w, h))
            pairs.add((h, w))
    if not pairs:
        raise ValueError(f"empty ladder for base={base} step={step} "
                         f"min_side={min_side} max_side={max_side}")
    return sorted(pairs, key=lambda p: (p[0] / p[1], p[0]))


def ar_bucket_batches(
    df: DataFrame,
    id_col: str,
    w_col: str,
    h_col: str,
    batch_size: int,
    buckets: list[tuple[int, int]] | None = None,
    salt: str = "arb-v1",
    n_sub: int = 8,
) -> DataFrame:
    """Aspect-ratio bucketed training batches — the image-training
    analog of :func:`pack_token_shards`: diffusion/VLM trainers batch
    same-shape tensors, so each image is snapped to the nearest
    aspect-ratio bucket from a fixed ladder and the bucket's images
    are cut into fixed-size batches in a deterministic salted order
    (the SDXL / NovelAI bucketing scheme). The reference crawler has
    no analog (it stores pages row-at-a-time, `DownloadAds.scala:33`);
    this backs the image axis of the engine's training-data brief.

    Assignment: nearest bucket by aspect-ratio distance, computed as
    the EXACT integer cross-ratio ``greatest(w*bh, h*bw) / least(w*bh,
    h*bw)`` (== exp|ln(w/h) - ln(bw/bh)|, monotone-equivalent) — one
    correctly-rounded IEEE division of exact integer products, so the
    SQL oracle reproduces the argmin bit-for-bit with no libm ``ln``
    drift. Ties break to the smaller bucket id. The argmin itself is a
    single codegen ``array_min`` over ``len(buckets)`` structs — no
    join, no shuffle, scan-adjacent.

    Batching: within a bucket, images are ordered by ``(sub, h, id)``
    where ``h = md5_60(salt:id)`` and ``sub = h % n_sub`` — a uniform
    salted permutation, same convention as ``pack_token_shards``'s
    tape. ``sample_idx`` is the image's 0-based position in that
    order; ``batch_id = sample_idx // batch_size``; the ragged tail
    (``total % batch_size`` images) is dropped so every emitted batch
    is EXACTLY full (``is_full`` semantics are implicit — partial
    batches never appear).

    Scale shape (100 TB): AR buckets are few and HEAVILY skewed (most
    of a web corpus is ~1:1 / 4:3), so a per-bucket window is a
    single-task sort — the banned shape. Instead the same two-phase
    distributed prefix as ``pack_token_shards``: per-``(bucket, sub)``
    counts are collected (``len(buckets) * n_sub`` metadata rows),
    prefix-summed on the driver, broadcast back, and the only window
    runs per ``(bucket, sub)`` — the hot bucket sorts in ``n_sub``
    parallel slices. Rows with non-positive ``w``/``h`` are dropped
    (no shape to bucket).

    Output: input columns plus ``bucket_id, bucket_w, bucket_h,
    sample_idx, batch_id, slot``.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if n_sub < 1:
        raise ValueError(f"n_sub must be >= 1, got {n_sub}")
    ladder = ar_bucket_ladder() if buckets is None else list(buckets)
    if not ladder or any(bw < 1 or bh < 1 for bw, bh in ladder):
        raise ValueError(f"buckets must be non-empty positive pairs, got {ladder}")

    wl = F.col(w_col).cast("long")
    hl = F.col(h_col).cast("long")
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    (
                        F.greatest(wl * F.lit(bh), hl * F.lit(bw)).cast("double")
                        / F.least(wl * F.lit(bh), hl * F.lit(bw))
                    ).alias("d"),
                    F.lit(bid).alias("bid"),
                    F.lit(bw).alias("bw"),
                    F.lit(bh).alias("bh"),
                )
                for bid, (bw, bh) in enumerate(ladder)
            ]
        )
    )
    h = md5_60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    base = (
        df.filter((F.col(w_col) > 0) & (F.col(h_col) > 0))
        .withColumn("__best", best)
        .withColumn("bucket_id", F.col("__best.bid"))
        .withColumn("bucket_w", F.col("__best.bw"))
        .withColumn("bucket_h", F.col("__best.bh"))
        .drop("__best")
        .withColumn("__h", h)
        .withColumn("__sub", F.pmod(F.col("__h"), F.lit(n_sub)).cast("int"))
    )

    # two-phase prefix: (bucket, sub) counts -> driver prefix offsets +
    # per-bucket full-batch cut, broadcast back (metadata, not data)
    counts = {
        (int(r["bucket_id"]), int(r["__sub"])): int(r["c"])
        for r in base.groupBy("bucket_id", "__sub").count().withColumnRenamed("count", "c").collect()
    }
    totals: dict[int, int] = {}
    for (b, _s), c in counts.items():
        totals[b] = totals.get(b, 0) + c
    rows, acc_by_bucket = [], {}
    for b in sorted(totals):
        cut = (totals[b] // batch_size) * batch_size
        acc = 0
        for s in range(n_sub):
            rows.append((b, s, acc, cut))
            acc += counts.get((b, s), 0)
    off_df = df.sparkSession.createDataFrame(
        rows, "bucket_id int, __sub int, __off long, __cut long"
    )

    w = Window.partitionBy("bucket_id", "__sub").orderBy(F.col("__h"), F.col(id_col))
    return (
        base.join(F.broadcast(off_df), ["bucket_id", "__sub"])
        .withColumn("sample_idx", F.col("__off") + F.row_number().over(w) - 1)
        .filter(F.col("sample_idx") < F.col("__cut"))
        .withColumn("batch_id", F.floor(F.col("sample_idx") / batch_size))
        .withColumn("slot", F.pmod(F.col("sample_idx"), F.lit(batch_size)))
        .drop("__h", "__sub", "__off", "__cut")
    )


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
