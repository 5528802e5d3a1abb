"""HTML main-content extraction by line-wise text density — the
boilerplate-removal pass that runs BEFORE corpus-level text filters
(CCNet line dedup, Gopher rules operate on extracted text; this is
the step that produces it from markup).

The heuristic is the public Arc90-readability / jusText family,
reduced to signals that are pure JVM expressions: per physical line,

- ``text``: the tag-stripped, whitespace-collapsed payload,
- ``n_tags``: markup density (count of ``<``),
- ``link_len``: characters of anchor-enclosed text (``<a ...>x</a>``),

and a line is CONTENT iff its text is long enough
(``min_text_len``), its text-to-tag ratio clears ``min_density``,
and anchor text is a minority (``max_link_frac``) — nav bars,
footers, and ad blocks are short, tag-heavy, and link-dominated,
which is exactly what the three thresholds encode.

Everything is higher-order-function expressions over ONE let_-bound
line-struct array: no explode, no shuffle, no Python — a row-local
filter with the correct 100-TB shape (the scan's columnar batch is
the only data movement). The reference parses pages with jsoup
selectors on known markup (``DownloadAds.scala:43-58``); density
extraction is the engine-added generalization for arbitrary crawled
markup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from olx_spark.functions.text import let_

TAG_RE = "<[^>]*>"
ANCHOR_TEXT_RE = "<a[^>]*>([^<]*)</a>"


def strip_tags(col: Column | str) -> Column:
    """Tag-stripped, whitespace-collapsed, trimmed text of one line
    (tags are replaced by a space so ``a</p><p>b`` keeps a word
    boundary)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(F.regexp_replace(c, TAG_RE, " "), r"\s+", " ")
    )


def _line_stats(line: Column) -> Column:
    text = strip_tags(line)
    n_tags = F.length(line) - F.length(F.replace(line, F.lit("<"), F.lit("")))
    link_len = F.aggregate(
        F.transform(
            F.regexp_extract_all(line, F.lit(ANCHOR_TEXT_RE), 1),
            lambda a: F.length(F.trim(a)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.struct(
        text.alias("text"),
        n_tags.alias("n_tags"),
        link_len.alias("link_len"),
    )


def extract_main_content(
    col: Column | str,
    *,
    min_text_len: int = 20,
    min_density: float = 10.0,
    max_link_frac: float = 0.5,
) -> list[Column]:
    """Named columns ``(n_lines, n_kept, main_text)``: the document's
    content lines (per the module-docstring heuristic) joined with
    single spaces, in order. ``n_lines`` counts non-blank physical
    lines after tag-stripping."""
    c = F.col(col) if isinstance(col, str) else col

    def body(stats: Column) -> Column:
        nonblank = F.filter(stats, lambda s: F.length(s["text"]) > 0)
        kept = F.filter(
            nonblank,
            lambda s: (F.length(s["text"]) >= min_text_len)
            & (
                (s["n_tags"] == 0)
                | (F.length(s["text"]) / s["n_tags"] >= F.lit(min_density))
            )
            & (
                s["link_len"]
                <= F.lit(max_link_frac) * F.length(s["text"])
            ),
        )
        return F.struct(
            F.size(nonblank).alias("n_lines"),
            F.size(kept).alias("n_kept"),
            F.array_join(
                F.transform(kept, lambda s: s["text"]), " "
            ).alias("main_text"),
        )

    out = let_(
        let_(
            F.split(c, "\n"),
            lambda lines: F.transform(lines, _line_stats),
        ),
        body,
    )
    return [
        out.getField("n_lines").alias("n_lines"),
        out.getField("n_kept").alias("n_kept"),
        out.getField("main_text").alias("main_text"),
    ]


# --------------------------------------------------- crawl directives

ANCHOR_TAG_RE = r"<a\s[^>]*>"


def robots_meta(col: Column | str) -> Column:
    """Page-level robots directives from ``<meta name="robots"
    content="...">`` (the REP meta-tag convention that complements
    robots.txt, which ``operators/politeness.py`` enforces): struct
    ``(noindex, nofollow)`` ints. ``none`` means both; a missing tag
    means neither. Case-insensitive; first matching tag wins (the
    Google/Bing documented behavior for duplicate tags)."""
    c = F.col(col) if isinstance(col, str) else col
    content = F.regexp_extract(
        F.lower(c), r'<meta[^>]*name="robots"[^>]*content="([^"]*)"', 1
    )
    none = content.contains("none")
    return F.struct(
        (none | content.contains("noindex")).cast("int").alias("noindex"),
        (none | content.contains("nofollow")).cast("int").alias("nofollow"),
    )


def followable_links(col: Column | str) -> Column:
    """hrefs the frontier may expand: every ``<a>`` whose ``rel``
    does not carry ``nofollow`` (``ugc``/``sponsored`` variants keep
    their other tokens — only the nofollow token blocks discovery,
    matching the published REP link-attribute semantics). Page-level
    ``nofollow`` (:func:`robots_meta`) is the CALLER's gate — it
    suppresses the whole page, not individual anchors. Pure JVM:
    one regexp scan for anchor tags, per-tag href/rel extraction in
    a transform/filter — no explode until the caller wants rows."""
    c = F.col(col) if isinstance(col, str) else col
    tags = F.regexp_extract_all(c, F.lit(ANCHOR_TAG_RE), 0)
    withattrs = F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, r'href="([^"]*)"', 1).alias("href"),
            F.lower(F.regexp_extract(t, r'rel="([^"]*)"', 1)).alias("rel"),
        ),
    )
    return F.transform(
        F.filter(
            withattrs,
            lambda s: (F.length(s["href"]) > 0)
            & ~s["rel"].contains("nofollow"),
        ),
        lambda s: s["href"],
    )


def head_metadata(col: Column | str) -> Column:
    """Head-metadata extraction: struct ``(title, canonical,
    og_title, og_image)`` — the fields a crawl pipeline reads before
    anything else: ``<link rel="canonical">`` feeds canonical-URL
    dedup (the server's own statement that two fetched URLs are one
    document — cheaper and stronger than any content similarity when
    present), og:* carry the curator-facing title/image. Missing
    fields are NULL (regexp_extract misses map '' -> NULL via
    nullif). Attribute order is as emitted by the synthesis/common
    CMSes (rel before href, property before content); a production
    pass adds the swapped-order alternates to the same regexps.
    Pure JVM, zero shuffle."""
    c = F.col(col) if isinstance(col, str) else col

    def ex(pat: str) -> Column:
        return F.nullif(F.regexp_extract(c, pat, 1), F.lit(""))

    return F.struct(
        ex(r"<title>([^<]*)</title>").alias("title"),
        ex(r'<link[^>]*rel="canonical"[^>]*href="([^"]*)"').alias("canonical"),
        ex(r'<meta[^>]*property="og:title"[^>]*content="([^"]*)"').alias("og_title"),
        ex(r'<meta[^>]*property="og:image"[^>]*content="([^"]*)"').alias("og_image"),
    )
