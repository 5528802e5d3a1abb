"""Sources (images table, testdata views) + streaming frontier ingest."""

import json
import os

from pyspark.sql import functions as F

from olx_spark.fixtures.images import make_image_corpus
from olx_spark.sources.images_table import (
    images_df_from_rows,
    lookup_image,
    read_images,
    write_images,
)
from olx_spark.sources.testdata import register_views
from conftest import SF_DIR


def test_register_views_and_sql(spark):
    register_views(spark, SF_DIR)
    n = spark.sql("select count(*) as n from lineitem").first()["n"]
    assert n > 1000


def test_images_table_roundtrip(spark, tmp_path):
    rows = make_image_corpus(50, seed=11)
    df = images_df_from_rows(spark, rows)
    path = str(tmp_path / "images")
    write_images(df, path, n_buckets=8)
    back = read_images(spark, path)
    assert back.count() == 50
    got = {r["image_id"]: r for r in back.collect()}
    for r in rows:
        assert bytes(got[r["image_id"]]["bytes"]) == r["bytes"]
        assert got[r["image_id"]]["phash"] == r["phash"]


def test_images_point_lookup_prunes(spark, tmp_path):
    rows = make_image_corpus(50, seed=12)
    path = str(tmp_path / "images")
    write_images(images_df_from_rows(spark, rows), path, n_buckets=8)
    target = rows[17]["image_id"]
    hit = lookup_image(spark, path, target, n_buckets=8)
    got = hit.collect()
    assert len(got) == 1 and got[0]["image_id"] == target
    # partition pruning visible in the plan: bucket filter present
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_streaming_frontier_ingest(spark, tmp_path):
    from olx_spark.plans.snapshot import SnapshotStore
    from olx_spark.streaming.stream import start_frontier_stream

    drop = tmp_path / "drop"
    drop.mkdir()
    recs = [
        {"name": "s", "base_url": "https://h.example/list/?x=1", "href": f"/d/ad/a-{i}/", "priority": 1}
        for i in range(10)
    ] + [  # duplicate hrefs -> must be deduped
        {"name": "s", "base_url": "https://h.example/list/?x=1", "href": "/d/ad/a-0/", "priority": 1}
    ]
    with open(drop / "batch0.json", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    store = SnapshotStore(str(tmp_path / "snap"), spark)
    q = start_frontier_stream(
        spark, str(drop), store, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    frontier = store.read_table("frontier")
    rows = frontier.collect()
    assert len(rows) == 10  # dup removed
    urls = {r["url"] for r in rows}
    assert "https://h.example/d/ad/a-0/" in urls  # urljoin of absolute path
    # second drop with overlapping hrefs -> only new ones appended
    with open(drop / "batch1.json", "w") as f:
        for i in range(5, 15):
            f.write(json.dumps({"name": "s", "base_url": "https://h.example/list/?x=1", "href": f"/d/ad/a-{i}/", "priority": 1}) + "\n")
    q2 = start_frontier_stream(
        spark, str(drop), store, str(tmp_path / "ckpt"), trigger_once=True
    )
    q2.awaitTermination(120)
    assert store.read_table("frontier").count() == 15
