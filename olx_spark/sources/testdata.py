"""Readers for the driver-generated TPC-H-ish testdata (TESTDATA.md).

Scans stay pushdown-friendly: callers select/filter on the returned
DataFrames and Catalyst pushes predicates + column pruning into the
parquet scan (verify with ``df.explain`` — ``PushedFilters`` /
``ReadSchema`` must reflect the query, see tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
