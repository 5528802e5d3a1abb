"""Batched fetch + parse operators (SURVEY.md §2.1 rows 4, 9, 11).

The reference fetches one page at a time with a fresh HTTP client per
request (``DownloadAds.scala:30-41``, ``DownloadLinks.scala:36-52``).
Here each *partition* of URLs is fetched by one ``mapInPandas`` worker
over Arrow batches — the Spark-native shape for a 1000-executor fetch
fan-out. In this sandbox the "network" is the deterministic fixture
page store (FIXTURES.md §2): listing/ad metadata is a broadcast dict
keyed by (host, path); image payload bytes are REGENERATED inside the
worker from the image id (per-image seeded PRNG), modeling a remote
server without broadcasting the corpus.

Parse micro-semantics are transcribed from the reference
(``DownloadAds.scala:43-58``): ``description`` == ``title`` (faithful
copy-paste quirk), brief items split on ":" with Scala split semantics,
one-segment items valued "true", first-two-segments only, empty k/v
filtered, duplicate keys last-wins, flattened ``"k -> v; ..."`` per
``H2.scala:60``.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from olx_spark.fixtures.crawl_graph import ad_key, listing_key
from olx_spark.fixtures.images import image_index_from_id, make_image_row

LISTING_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("base_url", StringType()),
        StructField("round", IntegerType()),
        StructField("ads", ArrayType(StringType())),
        StructField("next_page", StringType()),
        StructField("listing_status", StringType()),
        StructField("listing_elapsed_ms", DoubleType()),
    ]
)

AD_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("round", IntegerType()),
        StructField("pos", IntegerType()),
        StructField("seq", LongType()),
        StructField("href", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("price", StringType()),
        StructField("brief", MapType(StringType(), StringType())),
        StructField("brief_flat", StringType()),
        StructField("image_id", StringType()),
        StructField("image_bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
        StructField("status", StringType()),
        StructField("elapsed_ms", DoubleType()),
    ]
)


def scala_split_colon(s: str) -> list[str]:
    """Scala ``String.split(":")``: trailing empty segments removed."""
    segs = s.split(":")
    while segs and segs[-1] == "":
        segs.pop()
    return segs


def parse_brief_items(items: list[str]) -> dict[str, str]:
    """Reference brief parse (``DownloadAds.scala:49-54``); python dicts
    give first-occurrence key order with last-wins values, matching the
    reference's small-Map behavior (SURVEY.md §2.1 row 11)."""
    out: dict[str, str] = {}
    for item in items:
        segs = scala_split_colon(item)
        if not segs:
            continue
        k = segs[0]
        v = segs[1] if len(segs) >= 2 else "true"
        if k == "" or v == "":
            continue
        out[k] = v
    return out


def flatten_brief(d: dict[str, str]) -> str:
    """Scala ``Map.mkString("; ")`` with ``k -> v`` rendering
    (``H2.scala:60``)."""
    return "; ".join(f"{k} -> {v}" for k, v in d.items())


def fetch_listings(df: DataFrame, listing_store_bc) -> DataFrame:
    """mapInPandas listing-page fetch: (name, base_url, round) ->
    + (ads array, next_page). The flatten to individual hrefs happens
    Spark-side via posexplode (SURVEY.md §2.1 row 8)."""

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        store = listing_store_bc.value
        for pdf in batches:
            t0 = time.perf_counter()
            ads, nxt, status = [], [], []
            for url in pdf["base_url"]:
                page = store.get(listing_key(url))
                if page is None:
                    ads.append([])
                    nxt.append(None)
                    status.append("NOT_FOUND")
                else:
                    ads.append(list(page["ad_hrefs"]))
                    nxt.append(page["next_page"])
                    status.append("OK")
            ms = (time.perf_counter() - t0) * 1000.0 / max(len(pdf), 1)
            yield pd.DataFrame(
                {
                    "name": pdf["name"],
                    "base_url": pdf["base_url"],
                    "round": pdf["round"],
                    "ads": ads,
                    "next_page": nxt,
                    "listing_status": status,
                    "listing_elapsed_ms": ms,
                }
            )

    return df.mapInPandas(_fetch, schema=LISTING_SCHEMA)


def fetch_parse_ads(
    df: DataFrame,
    ad_store_bc,
    image_seed: int,
    n_hosts: int,
    with_payload: bool = True,
) -> DataFrame:
    """mapInPandas ad-page fetch + parse + payload materialization.

    Input columns: (name, round, pos, seq, url). One Arrow batch of
    URLs per iteration; payload bytes regenerated from image_id.
    """

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        store = ad_store_bc.value
        for pdf in batches:
            rows = []
            for name, rnd, pos, seq, url in zip(
                pdf["name"], pdf["round"], pdf["pos"], pdf["seq"], pdf["url"]
            ):
                t0 = time.perf_counter()
                ad = store.get(ad_key(url))
                if ad is None:
                    rows.append(
                        dict.fromkeys(AD_SCHEMA.fieldNames())
                        | {
                            "name": name,
                            "round": int(rnd),
                            "pos": int(pos),
                            "seq": int(seq),
                            "href": url,
                            "status": "NOT_FOUND",
                            "elapsed_ms": (time.perf_counter() - t0) * 1000.0,
                        }
                    )
                    continue
                brief = parse_brief_items(ad["brief_items"])
                img = None
                if with_payload:
                    img = make_image_row(
                        image_index_from_id(ad["image_id"]),
                        seed=image_seed,
                        n_hosts=n_hosts,
                    )
                rows.append(
                    {
                        "name": name,
                        "round": int(rnd),
                        "pos": int(pos),
                        "seq": int(seq),
                        "href": url,
                        "title": ad["title"],
                        "description": ad["title"],  # faithful quirk
                        "price": ad["price"],
                        "brief": brief,
                        "brief_flat": flatten_brief(brief),
                        "image_id": ad["image_id"],
                        "image_bytes": img["bytes"] if img else None,
                        "w": img["w"] if img else None,
                        "h": img["h"] if img else None,
                        "fmt": img["fmt"] if img else None,
                        "caption": img["caption"] if img else None,
                        "phash": img["phash"] if img else None,
                        "status": "OK",
                        "elapsed_ms": (time.perf_counter() - t0) * 1000.0,
                    }
                )
            yield pd.DataFrame(rows, columns=AD_SCHEMA.fieldNames())

    return df.mapInPandas(_fetch, schema=AD_SCHEMA)


def with_lineage(df: DataFrame) -> DataFrame:
    """Per-partition lineage columns for fetch_log (north_rule)."""
    return df.withColumn("partition_id", F.spark_partition_id())
