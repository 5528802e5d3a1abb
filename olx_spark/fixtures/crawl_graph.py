"""Deterministic synthetic crawl graph — the "network" the engine fetches.

Replaces olx.ua (FIXTURES.md §2). A page store keyed by URL; the fetch
UDF looks pages up here instead of doing HTTP. Mirrors the reference's
two-level structure: listing pages carrying ad links + a
pagination-forward link (selectors at
``/root/reference/src/main/scala/org/olx/parser/DownloadLinks.scala:38-39``)
and ad pages carrying title/price/brief/payload (fields parsed at
``DownloadAds.scala:46-55``).

Design constraints honored:
- within-page duplicate hrefs (exercises the per-page ``List.distinct``
  at ``DownloadLinks.scala:49``) and cross-page duplicates (exercises
  per-page vs global dedup);
- listing URLs carry a query string (``?currency=UAH``) to exercise the
  reference's path-graft-keeps-query canonicalization quirk
  (``DownloadLinks.scala:47-48``, http4s ``withPath`` semantics);
- brief items hit the split-on-colon micro-semantics
  (``DownloadAds.scala:49-54``): missing colon -> value "true",
  multi-colon -> first two segments only, duplicate keys -> last wins,
  empty key/value -> filtered. Briefs keep <=4 distinct keys so Scala's
  small-Map insertion ordering is well-defined (SURVEY.md §2.1 row 11).
- one designated hot host gets ~10x the pages (skew tests).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import parse_qs, urlsplit

import numpy as np

from olx_spark.fixtures.images import CITIES, make_image_corpus

TOPICS = ["bikes", "furniture", "electronics", "music", "clothes"]

BRIEF_KEYS = ["Condition", "Brand", "Year", "Delivery"]
BRIEF_VALS = ["new", "used", "Bosch", "Giant", "2019", "2021", "yes", "no"]


def listing_key(url: str) -> tuple[str, str, str]:
    """Listing pages are addressed by (host, path, page-param): olx-style
    pagination uses ``?page=N`` on a shared path, so the page number is
    part of the server-side routing; other params (currency, grafted
    junk) are ignored."""
    u = urlsplit(url)
    page = parse_qs(u.query).get("page", ["0"])[0]
    return (u.netloc, u.path, page)


def ad_key(url: str) -> tuple[str, str]:
    """Ad pages are addressed by (host, path); the query string is
    ignored (a real server ignores unknown params), so the reference's
    grafted-query ad URLs resolve to the same page."""
    u = urlsplit(url)
    return (u.netloc, u.path)


@dataclass
class PageStore:
    """URL -> page content; see :func:`listing_key` / :func:`ad_key`."""

    listing: dict[tuple[str, str, str], dict] = field(default_factory=dict)
    ads: dict[tuple[str, str], dict] = field(default_factory=dict)

    def get_listing(self, url: str) -> dict | None:
        return self.listing.get(listing_key(url))

    def get_ad(self, url: str) -> dict | None:
        return self.ads.get(ad_key(url))


@dataclass
class CrawlGraph:
    hosts: list[dict]
    listing_pages: list[dict]
    ad_pages: list[dict]
    images: list[dict]
    seeds: list[dict]
    store: PageStore
    image_seed: int = 43  # seed used for make_image_row regeneration
    n_hosts: int = 4
    # synthetic-server config: when set, listing/ad content is derived
    # in-worker from the URL alone (scale runs; nothing broadcast)
    synth_conf: dict | None = None

    def images_by_id(self) -> dict[str, dict]:
        return {r["image_id"]: r for r in self.images}


def _make_brief(rng: np.random.Generator, ad_idx: int) -> list[str]:
    """Colon-joined brief strings incl. the reference parse edge cases."""
    items = []
    n = int(rng.integers(2, 5))
    keys = list(rng.permutation(BRIEF_KEYS))[:n]
    for k in keys:
        v = BRIEF_VALS[int(rng.integers(0, len(BRIEF_VALS)))]
        items.append(f"{k}: {v}")
    # deterministic edge cases sprinkled by ad index
    if ad_idx % 5 == 0:
        items.append("Negotiable")  # no colon -> ("Negotiable", "true")
    if ad_idx % 7 == 0:
        items.append("Time: 10:30")  # multi-colon -> ("Time", " 10") seg2 dropped
    if ad_idx % 11 == 0 and keys:
        items.append(f"{keys[0]}: override")  # duplicate key -> last wins
    if ad_idx % 13 == 0:
        items.append(": novalue")  # empty key -> filtered
    return items


def make_crawl_graph(
    n_hosts: int = 4,
    pages_per_host: int = 3,
    ads_per_page: tuple[int, int] = (3, 12),
    seed: int = 42,
    hot_host_factor: int = 10,
    dup_within_page: bool = True,
    dup_across_pages: bool = True,
) -> CrawlGraph:
    """Build the deterministic crawl graph (FIXTURES.md §2)."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    hosts = []
    for i in range(n_hosts):
        hosts.append(
            {
                "host": f"host{i:03d}.example",
                "crawl_delay_ms": int([0, 50, 200][i % 3]),
                "robots_disallow": [],  # filled after ads are laid out
                "hot": i == 0 and n_hosts > 1,
            }
        )

    # total ads first, so image corpus size is known
    plan: list[tuple[int, int, int]] = []  # (host_idx, page_idx, n_ads)
    for hi, hrow in enumerate(hosts):
        npages = pages_per_host * (hot_host_factor if hrow["hot"] else 1)
        for p in range(npages):
            n_ads = int(rng.integers(ads_per_page[0], ads_per_page[1] + 1))
            plan.append((hi, p, n_ads))
    total_ads = sum(n for _, _, n in plan)
    images = make_image_corpus(n=total_ads, seed=seed + 1, n_hosts=n_hosts)

    listing_pages: list[dict] = []
    ad_pages: list[dict] = []
    store = PageStore()
    ad_counter = 0
    per_host_paths: dict[int, list[str]] = {i: [] for i in range(n_hosts)}

    for hi, p, n_ads in plan:
        host = hosts[hi]["host"]
        topic = TOPICS[p % len(TOPICS)]
        url = f"https://{host}/list/{topic}/?page={p}&currency=UAH"
        hrefs: list[str] = []
        for _ in range(n_ads):
            img = images[ad_counter]
            slug = img["caption"].split(" in ")[0].replace(" ", "-").lower()
            path = f"/d/ad/{slug}-{ad_counter}/"
            hrefs.append(path)
            amount = int(rng.integers(100, 99999))
            ad_row = {
                "url": f"https://{host}{path}",
                "path": path,
                "host": host,
                "title": img["caption"],
                "price": f"{amount} грн.",
                "brief_items": _make_brief(rng, ad_counter),
                "image_id": img["image_id"],
            }
            ad_pages.append(ad_row)
            store.ads[(host, path)] = ad_row
            per_host_paths[hi].append(path)
            ad_counter += 1
        if dup_within_page and n_ads >= 3:
            # repeat an earlier href later in the same page
            hrefs.append(hrefs[int(rng.integers(0, 2))])
        if dup_across_pages and p > 0 and per_host_paths[hi]:
            # borrow an ad from an earlier page of the same host
            hrefs.append(per_host_paths[hi][int(rng.integers(0, len(per_host_paths[hi])))])
        npages = pages_per_host * (hot_host_factor if hosts[hi]["hot"] else 1)
        # the forward link must address the REAL next page (its own
        # topic path), like the reference's pagination-forward anchor
        next_topic = TOPICS[(p + 1) % len(TOPICS)]
        next_page = (
            f"https://{host}/list/{next_topic}/?page={p + 1}&currency=UAH"
            if p + 1 < npages
            else None
        )
        lrow = {
            "url": url,
            "host": host,
            "page_idx": p,
            "ad_hrefs": hrefs,
            "next_page": next_page,
        }
        listing_pages.append(lrow)
        store.listing[listing_key(url)] = lrow

    # robots: disallow ~5% of ad paths per host (path prefixes)
    for hi, hrow in enumerate(hosts):
        paths = per_host_paths[hi]
        k = max(1, len(paths) // 20) if paths else 0
        hrow["robots_disallow"] = sorted(
            str(p) for p in rng.choice(paths, size=k, replace=False)
        ) if k else []

    # seeds: counts chosen to hit mid-page truncation and multi-round repeats
    counts = [1, 7, 10, 55, 200]
    seeds_list = []
    first_pages = [lp for lp in listing_pages if lp["page_idx"] == 0]
    for i, lp in enumerate(first_pages):
        seeds_list.append(
            {
                "name": f"job-{CITIES[i % len(CITIES)].lower()}-{i}",
                "url": lp["url"],
                "count": counts[i % len(counts)],
                "priority": int(rng.integers(0, 10)),
            }
        )

    return CrawlGraph(
        hosts=hosts,
        listing_pages=listing_pages,
        ad_pages=ad_pages,
        images=images,
        seeds=seeds_list,
        store=store,
        image_seed=seed + 1,
        n_hosts=n_hosts,
    )


def make_scaling_graph(
    n_hosts: int = 256,
    pages_per_host: int = 2,
    ads_per_page: int = 1000,
    seed: int = 42,
) -> CrawlGraph:
    """Wide synthetic graph for throughput/scaling runs: BOTH listing
    and ad content are SYNTHESIZED inside the fetch workers from the
    URL alone (``operators.fetch.synth_listing`` / ``synth_ad``), so
    nothing is broadcast and per-round fetch work dominates fixed
    round cost — the regime where scaling efficiency is a meaningful
    measurement. Total URLs = n_hosts * pages_per_host * (1 +
    ads_per_page)."""
    hosts = [
        {"host": f"host{i:03d}.example", "crawl_delay_ms": 0,
         "robots_disallow": [], "hot": False}
        for i in range(n_hosts)
    ]
    seeds = [
        {
            "name": f"job-{hi:03d}",
            "url": f"https://host{hi:03d}.example/list/all/?page=0",
            "count": 10**9,
            "priority": 0,
        }
        for hi in range(n_hosts)
    ]
    return CrawlGraph(
        hosts=hosts,
        listing_pages=[],
        ad_pages=[],
        images=[],
        seeds=seeds,
        store=PageStore(),
        image_seed=seed + 1,
        n_hosts=n_hosts,
        synth_conf={
            "n_hosts": n_hosts,
            "pages_per_host": pages_per_host,
            "ads_per_page": ads_per_page,
        },
    )
