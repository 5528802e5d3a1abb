"""Parquet footer-statistics audit tests: the written files' footer
min/max must reproduce the data-derived aggregates exactly, across
multiple files per bucket, with zero data-page reads in the plan."""

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.layout import footer_stats_audit


def test_footer_stats_equal_data_stats(spark, tmp_path):
    df = spark.range(2000).select(
        (F.col("id") % 5).alias("b"),
        F.col("id").alias("v"),
        (F.col("id") * 0.25).alias("x"),
    )
    audit = footer_stats_audit(df, "b", ["v", "x"], out_dir=str(tmp_path / "t"))
    truth = df.groupBy("b").agg(
        F.count("*").alias("n_rows"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
    )
    assert sorted(map(tuple, audit.collect())) == sorted(
        map(tuple, truth.collect())
    )


def test_multi_file_buckets_aggregate(spark, tmp_path):
    # many input partitions -> several files per bucket dir; the audit
    # result must be split-invariant
    df = (
        spark.range(400)
        .repartition(8)
        .select((F.col("id") % 2).alias("b"), F.col("id").alias("v"))
    )
    out = str(tmp_path / "m")
    audit = {r["b"]: r for r in
             footer_stats_audit(df, "b", ["v"], out_dir=out).collect()}
    import glob

    assert len(glob.glob(out + "/b=0/*.parquet")) > 1
    assert audit[0]["n_rows"] == 200 and audit[1]["n_rows"] == 200
    assert audit[0]["min_v"] == 0 and audit[1]["max_v"] == 399


def test_audit_reads_footers_not_data(spark, tmp_path):
    df = spark.range(100).select(
        (F.col("id") % 2).alias("b"), F.col("id").alias("v")
    )
    audit = footer_stats_audit(df, "b", ["v"], out_dir=str(tmp_path / "p"))
    plan = audit._jdf.queryExecution().executedPlan().toString()
    # the audit plan scans the tiny PATH LIST, not the written table:
    # no parquet FileScan of the data dir appears
    assert "MapInPandas" in plan
    assert "p/b=" not in plan


def test_empty_write_raises(spark, tmp_path):
    df = spark.range(1).where("id < 0").select(
        (F.col("id") % 2).alias("b"), F.col("id").alias("v")
    )
    with pytest.raises(RuntimeError, match="no parquet files"):
        footer_stats_audit(df, "b", ["v"], out_dir=str(tmp_path / "e"))
