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

from pyspark.sql import DataFrame
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
