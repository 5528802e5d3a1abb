"""Vocabulary frequency/coverage profile — tokenizer-training prep.

Before training a BPE/unigram tokenizer over a crawl corpus, the
pipeline needs the term-frequency table with GLOBAL ranks and the
cumulative-coverage curve ("the top 32k terms cover 97.1% of token
occurrences") to size the vocab. (The reference has no text-corpus
surface — ads go straight to H2 — this is training-pipeline scope.)

The naive Spark spelling is ``row_number().over(Window.orderBy(...))``
— a GLOBAL window, which Catalyst executes on a SINGLE partition: the
whole vocab table (10^7-10^8 terms for a web corpus) funnels through
one task. :func:`vocab_coverage` instead computes rank and running
sum with a DISTRIBUTED PREFIX-SUM:

1. the corpus shuffles once into the term-count table (map-side
   combined groupBy — the only corpus-sized exchange),
2. the term table is range-repartitioned on the rank order
   ``(count desc, term asc)`` and sorted within partitions,
3. one tiny aggregate per partition (``spark_partition_id`` groupBy)
   collects P rows to the driver, which prefix-sums them into
   per-partition (row, count) OFFSETS,
4. rank = per-partition ``row_number`` + row offset and
   ``cum_cnt`` = per-partition running sum + count offset — windows
   PARTITIONED by partition id, so no task sees more than its slice.

Partition RANGE BOUNDS come from sampling and may vary run-to-run;
rank/cum values do NOT — they are fully determined by the total order
(ties broken by the term string), so results are value-deterministic
cross-run and cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def vocab_coverage(
    terms: DataFrame,
    *,
    term_col: str = "term",
    top_k: int = 1000,
    n_parts: int | None = None,
) -> DataFrame:
    """Global term ranks + coverage curve over a ``(term)`` stream
    (one row per occurrence). Returns one row per distinct term:
    ``(term, cnt, rank, cum_frac, in_vocab)`` — ``rank`` 1-based by
    (count desc, term asc), ``cum_frac`` = running occurrence share
    at 6 dp, ``in_vocab`` = rank <= top_k."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    sess = terms.sparkSession
    if n_parts is None:
        n_parts = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    from olx_spark.session import materialize

    # materialized ONCE: un-cut, the corpus explode + groupBy would run
    # THREE times — the (former) total aggregate, repartitionByRange's
    # range-bound sampling pass, and the real range shuffle (guide §2.4:
    # a multi-consumer subtree re-executes per consumer; range
    # partitioning's sampler is a hidden second consumer)
    counted = materialize(
        terms.groupBy(F.col(term_col).alias("__vc_t")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    order = [F.col("cnt").desc(), F.col("__vc_t").asc()]
    ranged = (
        counted.repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__vc_pid", F.spark_partition_id())
    )
    # the partition id is a physical artifact: pin it before the two
    # consumers (per-partition totals, final windows) so both see the
    # same assignment
    ranged = materialize(ranged)
    parts = sorted(
        ranged.groupBy("__vc_pid")
        .agg(F.count(F.lit(1)).alias("rows"), F.sum("cnt").alias("csum"))
        .collect(),
        key=lambda r: r["__vc_pid"],
    )
    row_off, cnt_off, offsets = 0, 0, {}
    for p in parts:
        offsets[p["__vc_pid"]] = (row_off, cnt_off)
        row_off += p["rows"]
        cnt_off += p["csum"]
    # the global total falls out of the offsets scan — no separate
    # corpus-pass aggregate job
    total = cnt_off
    if not total:
        return sess.createDataFrame(
            [], f"{term_col} string, cnt long, rank long, "
            "cum_frac double, in_vocab int",
        )
    off_df = F.broadcast(
        sess.createDataFrame(
            [(pid, ro, co) for pid, (ro, co) in offsets.items()],
            "__vc_pid int, __vc_ro long, __vc_co long",
        )
    )
    w = Window.partitionBy("__vc_pid").orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = ranged.join(off_df, "__vc_pid").select(
        F.col("__vc_t").alias(term_col),
        "cnt",
        (F.row_number().over(w) + F.col("__vc_ro")).cast("long").alias("rank"),
        F.round(
            (F.sum("cnt").over(wsum) + F.col("__vc_co"))
            / F.lit(float(total)),
            6,
        ).alias("cum_frac"),
    )
    return out.withColumn(
        "in_vocab", (F.col("rank") <= top_k).cast("int")
    )
