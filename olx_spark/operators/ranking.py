"""Frontier ranking + deterministic ordered limits (SURVEY.md §2.3
items 4, 6; §4.2 item 1).

A bare ``df.limit(n)`` is partition-order-nondeterministic in Spark, so
every "take the first n" in this engine is rank-then-filter over an
explicit total order — the same trick that makes the crawl order
reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frontier_rank(frontier: DataFrame) -> DataFrame:
    """Per-host priority queue: rank by (priority desc, discovery_round,
    discovery_pos) within host — the window-function heart of the
    scheduler (north_star)."""
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("discovery_round"), F.col("discovery_pos")
    )
    return frontier.withColumn("host_rank", F.row_number().over(w) - 1)


def ordered_limit(df: DataFrame, n: int, order_cols: list, partition_cols: list | None = None) -> DataFrame:
    """Deterministic top-n in a total order; optionally per partition
    group. Adds ``rank_in_limit`` (0-based)."""
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    else:
        w = Window.orderBy(*order_cols)
    return (
        df.withColumn("rank_in_limit", F.row_number().over(w) - 1)
        .filter(F.col("rank_in_limit") < n)
    )
