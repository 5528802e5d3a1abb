"""Anchor-text aggregation — link-context profiles per target URL.

Web-search and crawl pipelines describe a page by what OTHER pages'
links say about it (anchor text beats on-page text for queries, and
incoming-anchor diversity is a spam/navigation-hub signal). The
reference extracts links but discards the anchor context
(``/root/reference/src/main/scala/olx/ParsePage.scala`` keeps only
hrefs); a training/search pipeline over the same crawl needs the
per-target rollup.

:func:`anchor_text_profile` takes an edge table ``(src_fp, dst_fp,
anchor)`` and returns one row per target:

``(dst_fp, n_links, n_unique_srcs, n_unique_anchors, top_anchor,
top_anchor_n)``

where ``top_anchor`` is the modal anchor string with a DETERMINISTIC
tie-break (highest count, then lexicographically smallest anchor) so
the result is value-reproducible cross-engine.

Scale shape (100 TB of edges): the anchor histogram shuffles the edge
table once on ``(dst, anchor)`` with full map-side combining (hot
targets — a homepage with 10^8 in-links — collapse to one row per
distinct anchor per mapper before the exchange); the per-target
argmax folds that already-small histogram with a ``min(struct(-cnt,
anchor))`` single-expression argmax (no window, no second sort); the
distinct-source count shuffles ``(dst, src)`` pairs once with the
same partial-distinct absorption. Both final aggregates are
hash-partitioned on ``dst``, so Catalyst joins them without a third
exchange. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anchor_text_profile(
    links: DataFrame,
    *,
    src_col: str = "src_fp",
    dst_col: str = "dst_fp",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target anchor-text rollup (see module docstring)."""
    base = links.select(
        F.col(src_col).alias("__an_src"),
        F.col(dst_col).alias("__an_dst"),
        F.col(anchor_col).alias("__an_a"),
    )
    hist = base.groupBy("__an_dst", "__an_a").agg(
        F.count(F.lit(1)).alias("__an_cnt")
    )
    # argmax by (cnt desc, anchor asc): min over struct(-cnt, anchor)
    per_dst = hist.groupBy("__an_dst").agg(
        F.sum("__an_cnt").alias("n_links"),
        F.count(F.lit(1)).alias("n_unique_anchors"),
        F.min(
            F.struct(
                (-F.col("__an_cnt")).alias("nc"),
                F.col("__an_a").alias("a"),
            )
        ).alias("__an_top"),
    )
    srcs = base.groupBy("__an_dst").agg(
        F.countDistinct("__an_src").alias("n_unique_srcs")
    )
    return per_dst.join(srcs, "__an_dst").select(
        F.col("__an_dst").alias(dst_col),
        F.col("n_links").cast("long").alias("n_links"),
        F.col("n_unique_srcs").cast("long").alias("n_unique_srcs"),
        F.col("n_unique_anchors").cast("long").alias("n_unique_anchors"),
        F.col("__an_top.a").alias("top_anchor"),
        (-F.col("__an_top.nc")).cast("long").alias("top_anchor_n"),
    )
