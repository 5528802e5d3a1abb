"""Sitemap parsing — URL discovery beyond page links.

A production frontier seeds not only from page links but from
``sitemap.xml`` (and sitemap-index) files advertised in robots.txt
(sitemaps.org protocol). The reference discovers URLs only by parsing
listing pages (``/root/reference/src/main/scala/olx/ParsePage.scala``);
sitemap ingestion is the standing-crawl complement: it carries
``lastmod``/``changefreq``/``priority`` hints that feed the recrawl
scheduler (:mod:`olx_spark.operators.recrawl`) directly.

:func:`parse_sitemaps` takes ``(host, xml)`` documents and emits one
typed row per entry:

``(host, entry_type, loc, lastmod, priority, changefreq)``

- ``entry_type`` — ``'url'`` for ``<urlset>`` entries, ``'sitemap'``
  for ``<sitemapindex>`` children (the caller feeds those back as
  fetches).
- ``lastmod`` — parsed DATE (null when absent), ``priority`` —
  double with the protocol's 0.5 default, ``changefreq`` — verbatim
  token ('' when absent).

Parsing is tag-anchored, not XML-DOM: split on the entry tag,
``regexp_extract`` per field — the standard big-engine choice for
machine-generated XML (sitemaps are produced by generators, not
humans; a DOM parse would be a per-row Python UDF for no added
robustness on this grammar). Everything stays in whole-stage codegen:
split + explode + regexp — ZERO shuffle, rows inherit the input
partitioning, and at 100 TB the xml column is the only wide column
read."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _entries(
    df: DataFrame, host_col: str, xml_col: str, tag: str, etype: str
) -> DataFrame:
    # doc-type guard: without it, a <sitemapindex> doc has no <url>
    # tags, so the url-branch split yields ONE whole-doc fragment that
    # still contains <loc> — a spurious entry carrying the first child
    root = "<urlset" if etype == "url" else "<sitemapindex"
    df = df.filter(F.col(xml_col).contains(root))
    frags = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(xml_col), f"<{tag}>")).alias("__sm_f"),
    ).filter(F.col("__sm_f").contains("<loc>"))
    loc = F.regexp_extract("__sm_f", r"<loc>\s*([^<\s]+)\s*</loc>", 1)
    lastmod = F.regexp_extract("__sm_f", r"<lastmod>([^<]+)</lastmod>", 1)
    prio = F.regexp_extract("__sm_f", r"<priority>([^<]+)</priority>", 1)
    cf = F.regexp_extract("__sm_f", r"<changefreq>([^<]+)</changefreq>", 1)
    return frags.select(
        "host",
        F.lit(etype).alias("entry_type"),
        loc.alias("loc"),
        F.when(lastmod != "", F.to_timestamp(lastmod)).alias("lastmod"),
        F.when(prio != "", prio.cast("double"))
        .otherwise(F.lit(0.5))
        .alias("priority"),
        F.when(cf != "", cf).otherwise(F.lit("")).alias("changefreq"),
    ).filter(F.col("loc") != "")


def parse_sitemaps(
    df: DataFrame, *, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """Typed entries from sitemap / sitemap-index documents (see
    module docstring). A ``<urlset>`` doc contains no ``<sitemap>``
    tags and vice versa, so the union's two branches are disjoint by
    construction; both are shuffle-free scans of the same input."""
    return _entries(df, host_col, xml_col, "url", "url").unionByName(
        _entries(df, host_col, xml_col, "sitemap", "sitemap")
    )
