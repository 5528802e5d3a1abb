"""Reference oracle: a faithful pure-Python transcription of the
stanikol/olx crawl semantics (SURVEY.md §2.1 rows 3-11).

This is the ground truth the Spark engine's reference-exact mode is
tested against. Transcribed behaviors, each cited to the reference:

- Pagination unfold is count-based only; the SAME listing URL is
  re-fetched every round (``nextPage`` parsed but never followed) and
  both unfold branches continue (``DownloadLinks.scala:17-34``).
- ``left = max(0, left - len(distinct_ads))`` per round
  (``DownloadLinks.scala:22``).
- Per-page first-occurrence dedup only; NO cross-round seen set
  (``DownloadLinks.scala:49``) — duplicates reappear across rounds.
- URL canonicalization grafts each href as a *path* onto the seed
  URL's scheme+authority, RETAINING the seed's query string (http4s
  ``withPath`` semantics, ``DownloadLinks.scala:47-48``).
- Global exact truncation of the flattened stream at ``count``
  (``DownloadAds.scala:26-27``) — mid-page truncation.
- Parse: ``description`` equals ``title`` (copy-paste quirk,
  ``DownloadAds.scala:46-47``); brief items split on ":" with Scala
  split semantics (trailing empty segments dropped), one-segment items
  get value "true", only the first two segments are kept, empty
  key/value entries filtered, duplicate keys last-wins with
  first-occurrence position (``DownloadAds.scala:49-54``); the brief
  map flattens to ``"k -> v; ..."`` (``H2.scala:60``).
- Crawl order == insert order == ADS.ID order (``H2.scala:34-38``).
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlsplit

from olx_spark.fixtures.crawl_graph import PageStore

MAX_ROUNDS_GUARD = 1000  # divergence guard: reference loops forever on 0-ad pages


def graft_url(seed_url: str, href: str) -> str:
    """Reference canonicalization: href treated as a path grafted onto the
    seed's scheme+authority; seed query (and fragment) retained."""
    u = urlsplit(seed_url)
    out = f"{u.scheme}://{u.netloc}{href}"
    if u.query:
        out += f"?{u.query}"
    if u.fragment:
        out += f"#{u.fragment}"
    return out


def scala_split_colon(s: str) -> list[str]:
    """Scala's String.split(":"): trailing empty segments are removed."""
    segs = s.split(":")
    while segs and segs[-1] == "":
        segs.pop()
    return segs


def parse_brief(items: list[str]) -> list[tuple[str, str]]:
    """Brief parse micro-semantics; returns insertion-ordered (k, v) with
    duplicate keys collapsed last-wins at first-occurrence position."""
    out: dict[str, str] = {}
    for item in items:
        segs = scala_split_colon(item)
        if not segs:
            continue
        k = segs[0]
        v = segs[1] if len(segs) >= 2 else "true"
        if k == "" or v == "":
            continue
        out[k] = v  # python dicts: first-occurrence order, last value wins
    return list(out.items())


def flatten_brief(pairs: list[tuple[str, str]]) -> str:
    """Scala ``Map.mkString("; ")`` with elements rendered ``k -> v``."""
    return "; ".join(f"{k} -> {v}" for k, v in pairs)


@dataclass
class SimResult:
    name: str
    crawl_order: list[dict]  # [{seq, round, pos, url}] duplicates included
    seen_urls: list[str]  # first-occurrence order of distinct fetched urls
    results: list[dict]  # parsed rows in crawl (ADS.ID) order


def simulate_seed(store: PageStore, seed: dict, max_rounds: int = MAX_ROUNDS_GUARD) -> SimResult:
    """Simulate one Search job exactly as the reference executes it."""
    count = seed["count"]
    url = seed["url"]
    left = count
    flat: list[dict] = []  # the flattened href stream with (round, pos)
    rnd = 0
    while left > 0 and rnd < max_rounds:
        page = store.get_listing(url)
        if page is None:
            break
        grafted = [graft_url(url, h) for h in page["ad_hrefs"]]
        distinct: list[str] = []
        seen_page: set[str] = set()
        for g in grafted:
            if g not in seen_page:
                seen_page.add(g)
                distinct.append(g)
        for pos, g in enumerate(distinct):
            flat.append({"round": rnd, "pos": pos, "url": g})
        left = max(0, left - len(distinct))
        rnd += 1
        if not distinct:
            break  # engine divergence guard (reference would spin forever)

    crawl_order = flat[:count]
    for seq, row in enumerate(crawl_order):
        row["seq"] = seq

    seen: list[str] = []
    seen_set: set[str] = set()
    results = []
    for row in crawl_order:
        u = row["url"]
        if u not in seen_set:
            seen_set.add(u)
            seen.append(u)
        ad = store.get_ad(u)
        if ad is None:
            # reference: a failed fetch raises and kills the job fiber;
            # fixtures are error-free so this should not happen
            raise KeyError(f"ad page not found: {u}")
        pairs = parse_brief(ad["brief_items"])
        results.append(
            {
                "seq": row["seq"],
                "round": row["round"],
                "pos": row["pos"],
                "href": u,
                "title": ad["title"],
                "description": ad["title"],  # faithful copy-paste quirk
                "price": ad["price"],
                "brief_flat": flatten_brief(pairs),
                "image_id": ad["image_id"],
            }
        )
    return SimResult(
        name=seed["name"], crawl_order=crawl_order, seen_urls=seen, results=results
    )


def simulate_all(store: PageStore, seeds: list[dict]) -> dict[str, SimResult]:
    return {s["name"]: simulate_seed(store, s) for s in seeds}
