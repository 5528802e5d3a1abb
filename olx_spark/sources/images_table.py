"""The ``images`` payload table (BASELINE.json input_hint schema):
(image_id string, bytes binary, w int, h int, fmt string,
 caption string, phash long).

Written as an Iceberg-style snapshot table via SnapshotStore (plain
Parquet + atomic manifest in this sandbox — plans/snapshot.py); on a
real cluster the same calls go to Iceberg ``writeTo``. Partitioning:
``pmod(xxhash64(image_id), n_buckets)`` — content-addressed buckets so
payload writes spread evenly regardless of crawl skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)


def images_df_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [
            (r["image_id"], r["bytes"], r["w"], r["h"], r["fmt"], r["caption"], r["phash"])
            for r in rows
        ],
        IMAGES_SCHEMA,
    )


def write_images(df: DataFrame, path: str, n_buckets: int = 16) -> None:
    """Bucketed-by-content-hash parquet layout (bucket dir = partition
    pruning on point lookups by image_id at any scale)."""
    (
        df.withColumn("bucket", F.pmod(F.xxhash64("image_id"), F.lit(n_buckets)))
        .repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_images(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("bucket")


def lookup_image(spark: SparkSession, path: str, image_id: str, n_buckets: int = 16) -> DataFrame:
    """Point lookup that prunes to one bucket directory."""
    df = spark.read.parquet(path)
    return df.filter(
        (F.col("bucket") == F.pmod(F.xxhash64(F.lit(image_id)), F.lit(n_buckets)))
        & (F.col("image_id") == image_id)
    ).drop("bucket")
