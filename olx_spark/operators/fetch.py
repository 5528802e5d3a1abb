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
from olx_spark.fixtures.images import image_caption, image_index_from_id, make_image_row


def synth_listing(url: str, conf: dict) -> dict | None:
    """Deterministic 'server' for listing pages (scale runs): hrefs and
    the next-page link derived from (host index, page) in the URL."""
    from urllib.parse import parse_qs, urlsplit

    u = urlsplit(url)
    try:
        host_idx = int(u.netloc.split(".")[0].removeprefix("host"))
        page = int(parse_qs(u.query).get("page", ["0"])[0])
    except ValueError:
        return None
    npages, app = conf["pages_per_host"], conf["ads_per_page"]
    if host_idx >= conf["n_hosts"] or page >= npages:
        return None
    base = (host_idx * npages + page) * app
    return {
        "ad_hrefs": [f"/d/ad/x-{base + j}/" for j in range(app)],
        "next_page": (
            f"https://{u.netloc}/list/all/?page={page + 1}"
            if page + 1 < npages
            else None
        ),
    }


def synth_ad(url: str, n_hosts: int) -> dict:
    """Deterministic 'server': ad content derived from the URL alone
    (path ends in ``-{i}/``). Used for scale runs where a broadcast ad
    store would be the bottleneck — same trick as per-id image
    regeneration: content addressed by identifier, no data shipping."""
    host, path = ad_key(url)
    i = int(path.rstrip("/").rsplit("-", 1)[1])
    host_idx = i % n_hosts
    return {
        "title": image_caption(i),
        "price": f"{(i * 7919) % 99899 + 100} грн.",
        "brief_items": [
            f"Condition: {'new' if i % 3 == 0 else 'used'}",
            f"Year: {2015 + i % 10}",
        ]
        + (["Negotiable"] if i % 5 == 0 else []),
        "image_id": f"img-{host_idx:03d}-{i:05d}",
    }

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


def fetch_listings(df: DataFrame, listing_store_bc, synth_conf: dict | None = None) -> DataFrame:
    """mapInPandas listing-page fetch: (name, base_url, round) ->
    + (ads array, next_page). The flatten to individual hrefs happens
    Spark-side via posexplode (SURVEY.md §2.1 row 8). With
    ``synth_conf`` set, pages are synthesized in-worker (scale runs)."""

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        store = listing_store_bc.value if listing_store_bc is not None else None
        for pdf in batches:
            t0 = time.perf_counter()
            ads, nxt, status = [], [], []
            for url in pdf["base_url"]:
                page = (
                    store.get(listing_key(url))
                    if store is not None
                    else synth_listing(url, synth_conf)
                )
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
    payload_bytes: bool = True,
) -> DataFrame:
    """mapInPandas ad-page fetch + parse + payload materialization.

    Input columns: (name, round, pos, seq, url). One Arrow batch of
    URLs per iteration; payload bytes regenerated from image_id.
    """

    cols = AD_SCHEMA.fieldNames()

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        store = ad_store_bc.value if ad_store_bc is not None else None
        for pdf in batches:
            # column-wise accumulation: building a 10k-row batch from
            # per-row dicts makes pandas re-infer dtypes row by row
            # (~ms/row); dict-of-lists assembles in one shot
            out: dict[str, list] = {c: [] for c in cols}
            for name, rnd, pos, seq, url in zip(
                pdf["name"], pdf["round"], pdf["pos"], pdf["seq"], pdf["url"]
            ):
                t0 = time.perf_counter()
                ad = (
                    store.get(ad_key(url))
                    if store is not None
                    else synth_ad(url, n_hosts)
                )
                out["name"].append(name)
                out["round"].append(int(rnd))
                out["pos"].append(int(pos))
                out["seq"].append(int(seq))
                out["href"].append(url)
                if ad is None:
                    for c in (
                        "title", "description", "price", "brief", "brief_flat",
                        "image_id", "image_bytes", "w", "h", "fmt", "caption", "phash",
                    ):
                        out[c].append(None)
                    out["status"].append("NOT_FOUND")
                    out["elapsed_ms"].append((time.perf_counter() - t0) * 1000.0)
                    continue
                brief = parse_brief_items(ad["brief_items"])
                img = (
                    make_image_row(
                        image_index_from_id(ad["image_id"]),
                        seed=image_seed,
                        n_hosts=n_hosts,
                        with_bytes=payload_bytes,
                    )
                    if with_payload
                    else None
                )
                out["title"].append(ad["title"])
                out["description"].append(ad["title"])  # faithful quirk
                out["price"].append(ad["price"])
                out["brief"].append(brief)
                out["brief_flat"].append(flatten_brief(brief))
                out["image_id"].append(ad["image_id"])
                out["image_bytes"].append(img["bytes"] if img else None)
                out["w"].append(img["w"] if img else None)
                out["h"].append(img["h"] if img else None)
                out["fmt"].append(img["fmt"] if img else None)
                out["caption"].append(img["caption"] if img else None)
                out["phash"].append(img["phash"] if img else None)
                out["status"].append("OK")
                out["elapsed_ms"].append((time.perf_counter() - t0) * 1000.0)
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(_fetch, schema=AD_SCHEMA)


def with_lineage(df: DataFrame) -> DataFrame:
    """Per-partition lineage columns for fetch_log (north_rule)."""
    return df.withColumn("partition_id", F.spark_partition_id())


def revalidation_plan(
    due: DataFrame,
    cache: DataFrame,
    key: str = "url_fp",
) -> DataFrame:
    """Conditional-request planning (RFC 9110 §13) for the refresh
    crawl: left-join the due set against the validator cache —
    ``(url_fp, etag, payload_fp, body_bytes)`` from prior fetches —
    and emit per-URL ``mode``: ``full`` (no cache row, unconditional
    GET) or ``conditional`` (GET + ``If-None-Match: <etag>``).
    Broadcast-or-shuffle is Catalyst's choice; the cache side carries
    only validators, never bodies, so it stays orders of magnitude
    smaller than the fetch payloads it saves.
    """
    c = cache.select(
        F.col(key),
        F.col("etag").alias("cached_etag"),
        F.col("payload_fp").alias("cached_fp"),
        F.col("body_bytes").alias("cached_bytes"),
    )
    return due.join(c, key, "left").withColumn(
        "mode",
        F.when(F.col("cached_etag").isNotNull(), F.lit("conditional")).otherwise(
            F.lit("full")
        ),
    )


def revalidation_outcomes(
    plan: DataFrame,
    server: DataFrame,
    key: str = "url_fp",
) -> DataFrame:
    """Resolve a :func:`revalidation_plan` against current server
    state ``(url_fp, etag, payload_fp, body_bytes)``: conditional
    requests whose validator still matches come back ``304`` (body
    NOT transferred — ``bytes_saved`` = the cached body size, payload
    reused from cache); everything else is a ``200`` with the fresh
    payload. Gone URLs (no server row) report ``404`` with nulls.
    The per-row outputs make the bandwidth ledger a trivial
    aggregation: ``sum(bytes_saved)`` is the revalidation win the
    crawl operator tracks.
    """
    s = server.select(
        F.col(key),
        F.col("etag").alias("srv_etag"),
        F.col("payload_fp").alias("srv_fp"),
        F.col("body_bytes").alias("srv_bytes"),
    )
    j = plan.join(s, key, "left")
    not_modified = (F.col("mode") == "conditional") & (
        F.col("srv_etag") == F.col("cached_etag")
    )
    status = (
        F.when(F.col("srv_etag").isNull(), F.lit(404))
        .when(not_modified, F.lit(304))
        .otherwise(F.lit(200))
    )
    return j.select(
        key,
        "mode",
        status.alias("status"),
        F.when(status == 304, F.col("cached_fp"))
        .when(status == 200, F.col("srv_fp"))
        .alias("payload_fp"),
        F.when(status == 304, F.col("cached_bytes"))
        .otherwise(F.lit(0).cast("long"))
        .alias("bytes_saved"),
        F.when(status == 200, F.coalesce("srv_bytes", F.lit(0)))
        .otherwise(F.lit(0).cast("long"))
        .alias("bytes_fetched"),
    )
