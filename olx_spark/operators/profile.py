"""Table profiler — per-column statistics in ONE scan.

The stats feeder for everything that plans by metadata: the z-order
normalizer (``operators/layout.py`` takes injected min/max), join-side
broadcast decisions, skew detection, null-rate data-quality gates, and
the ``ANALYZE TABLE``-style catalog numbers a 100-TB lakehouse keeps
per snapshot.

Scale design:

- **One pass, no per-column jobs.** All measures ride a single
  ``df.agg(...)``: row count, per-column non-null count, distinct
  count, min and max. With ``exact=True`` Spark plans the multiple
  DISTINCT aggregates via one Expand (one scan, xN intermediate rows,
  map-side partial aggregation); with ``exact=False`` the distinct
  counts become ``approx_count_distinct`` (HyperLogLog++), which
  drops the Expand entirely — one plain partial-aggregate scan, the
  right default at 100 TB where a +-2% NDV is what the optimizer
  wants anyway. The oracle pins the exact mode.
- **One row to the driver.** The aggregate result is a single row;
  the unpivot to (column_name, stats...) rows is a ``stack`` over
  that row — no data-scale shuffle anywhere.
- min/max are cast to string AFTER aggregating (aggregation runs on
  the native type — numeric min, not lexicographic) so heterogeneous
  columns share one output schema.

Reference parity: no analog in stanikol/olx (no stats of any kind);
serves the engine's own catalog/layout story (SURVEY §1.4, §2 ext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Per-column profile in one scan: (column_name, n_rows, n_nulls,
    n_distinct, min_val, max_val). ``exact=False`` swaps distinct
    counts to HyperLogLog++ (``approx_count_distinct``) — no Expand,
    the 100-TB default."""
    cols = cols or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    nd = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{i}"),
            nd(F.col(c)).alias(f"__nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}"
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack}) as "
            "(column_name, __nn, n_distinct, min_val, max_val)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_val",
        "max_val",
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    k: int = 8,
    n_parts: int | None = None,
) -> DataFrame:
    """Exact equi-depth (equi-height) histogram of a numeric column —
    the optimizer statistic behind selectivity estimation (Spark's own
    ANALYZE/CBO histograms are approximate-percentile sketches; this
    is the exact construction, oracle-checkable). Bucket j of k holds
    the rows with global rank in ((j-1)·n/k, j·n/k]; a distinct value
    lands in the bucket of its LAST occurrence, so a heavy hitter
    spilling past a boundary widens its bucket instead of splitting
    (the standard merged-boundary convention; the bucket's row count
    reports the true mass). Returns ``(bucket, lo, hi, n_rows,
    n_distinct)``.

    Scale shape — the ``vocab_coverage`` distributed-prefix-sum
    pattern, not a global window: group-count per distinct value
    (map-side combinable), range-partition by value, per-partition
    running sums plus broadcast partition offsets give every distinct
    value its exact global cumulative count with NO single-task sort
    of the distinct domain."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sess = df.sparkSession
    if n_parts is None:
        n_parts = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    from olx_spark.session import materialize

    # materialized ONCE: un-cut, the corpus groupBy would run three
    # times (total agg + range-bound sampling + the real shuffle);
    # the total now falls out of the per-partition offsets instead
    counted = materialize(
        df.groupBy(F.col(value_col).alias("__v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    ranged = (
        counted.repartitionByRange(n_parts, F.col("__v").asc())
        .sortWithinPartitions(F.col("__v").asc())
        .withColumn("__pid", F.spark_partition_id())
    )
    ranged = materialize(ranged)  # pin the physical partition ids
    parts = sorted(
        ranged.groupBy("__pid").agg(F.sum("cnt").alias("csum")).collect(),
        key=lambda r: r["__pid"],
    )
    cum_off, offsets = 0, {}
    for p in parts:
        offsets[p["__pid"]] = cum_off
        cum_off += p["csum"]
    total = cum_off
    if not total:
        return sess.createDataFrame(
            [], "bucket int, lo double, hi double, n_rows long, n_distinct long"
        )
    off_df = F.broadcast(
        sess.createDataFrame(
            [(pid, co) for pid, co in offsets.items()], "__pid int, __co long"
        )
    )
    w = Window.partitionBy("__pid").orderBy(F.col("__v").asc())
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_end = F.sum("cnt").over(wsum) + F.col("__co")
    # ceil(cum_end * k / total) in exact integer-valued float64
    bucket = F.floor(
        (cum_end * F.lit(k) + F.lit(int(total) - 1)) / F.lit(int(total))
    ).cast("int")
    assigned = ranged.join(off_df, "__pid").select(
        F.col("__v"), "cnt", bucket.alias("bucket")
    )
    return assigned.groupBy("bucket").agg(
        F.min("__v").cast("double").alias("lo"),
        F.max("__v").cast("double").alias("hi"),
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
