"""Crawler-trap detection via URL-template mining.

The reference crawler walks olx.ua pagination with a fixed
``&page=N`` unfold (``Olx.scala:21-24`` builds the page-N listing
URL) and is therefore immune to traps only because its frontier is a
closed template. A general frontier (this engine's ``plans/crawl``)
meets calendar pages, session-id links, and infinite facet
combinations — the classic crawler traps — and must detect them from
the URL stream itself, before the fetch budget drowns.

Standard recipe (Heritrix path-pattern quotas, IRLbot's spam/trap
budgeting): strip every volatile token from the URL to get its
TEMPLATE, then count how many DISTINCT urls collapse onto each
(host, template). A legit listing template maps a handful of urls; a
trap template keeps minting fresh ones — flag any template whose
distinct-url count exceeds a budget so the scheduler can de-prioritize
or cap it.

Scale shape (100 TB / 10^10-URL frontier):

- Template derivation is a pure JVM ``regexp_replace`` chain — no
  Python, stays inside whole-stage codegen, runs map-side.
- The aggregation is TWO-PHASE: first ``groupBy(host, template,
  url)`` (partial map-side combine; the key includes the url, so the
  very templates that explode in distinct urls are exactly the ones
  whose first-phase key stays high-cardinality and therefore
  UNIFORM — trap templates cannot skew the first shuffle), then
  ``groupBy(host, template)`` over the already-distinct rows. Same
  plan Catalyst generates for ``countDistinct``, written explicitly
  so the second-phase input is provably one row per distinct url.
- Output is O(distinct templates) — tiny; fit for a broadcast join
  back against the frontier to drop trapped urls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# volatile-token normalization, applied in order. Each rule is a
# (pattern, replacement) handled identically by Java regex (Spark)
# and RE2-ish DuckDB regexp_replace with the 'g' flag — the oracle
# replays the same chain, so only dialect-portable constructs are
# allowed here (no lookbehind, no \p classes).
TEMPLATE_RULES: tuple[tuple[str, str], ...] = (
    # long hex runs (session ids, content hashes) before digit runs,
    # else the digits inside them are rewritten first and the hex
    # signature is destroyed
    ("[0-9a-f]{8,}", "{h}"),
    ("[0-9]+", "{d}"),
)


def url_template(url: Column) -> Column:
    """Template of a url: volatile tokens replaced per
    :data:`TEMPLATE_RULES`. Pure JVM expression chain."""
    out = url
    for pat, rep in TEMPLATE_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def mine_url_templates(
    df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    trap_distinct_urls: int = 100,
) -> DataFrame:
    """Per-(host, template) url-population stats with a trap flag.

    Returns one row per (host, template):

    - ``n_urls``   distinct urls minting the template,
    - ``n_hits``   total url occurrences (frontier pressure),
    - ``sample_url`` lexicographic min url (debuggability — which
      concrete page tripped the flag),
    - ``is_trap``  1 when ``n_urls > trap_distinct_urls``.

    Two-phase aggregation as described in the module docstring.
    """
    t = df.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        url_template(F.col(url_col)).alias("template"),
    )
    per_url = t.groupBy("host", "template", "url").agg(
        F.count(F.lit(1)).alias("hits")
    )
    return (
        per_url.groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum("hits").alias("n_hits"),
            F.min("url").alias("sample_url"),
        )
        .withColumn(
            "is_trap",
            (F.col("n_urls") > F.lit(trap_distinct_urls)).cast("int"),
        )
    )


def path_tree_rollup(
    df: DataFrame,
    url_col: str = "url",
    max_depth: int = 4,
) -> DataFrame:
    """Site-tree statistics: page and distinct-host counts for every
    directory prefix of every URL path up to ``max_depth`` — the
    subtree view a crawl operator reads next to
    :func:`mine_url_templates`'s trap report, and the input to
    Heritrix-style per-subtree page QUOTAS (cap fetches under a
    prefix once its page count explodes).

    Returns ``(prefix, depth, n_pages, n_hosts)`` where ``prefix``
    is ``/seg1/...`` (leading slash, no trailing); a URL contributes
    one page-count to each of its ancestor prefixes.

    Scale shape: the prefix fan-out is bounded (``<= max_depth`` rows
    per URL, built with JVM slice/array_join — no per-row Python),
    and the distinct-host count is TWO-PHASE — pre-aggregate on
    ``(prefix, depth, host)`` first, so a hot subtree's millions of
    pages collapse map-side before the exchange and the second agg
    counts rows, never holding a distinct-set. Both shuffles are
    map-side combinable; no windows, no skew funnel."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    u = F.col(url_col)
    host = F.parse_url(u, F.lit("HOST"))
    parts = F.filter(
        F.split(F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("")), "/"),
        lambda s: F.length(s) > 0,
    )
    # guard: Spark's sequence(1, 0) DESCENDS — an empty path must
    # yield an empty prefix list, not [/, garbage]
    prefixes = F.when(F.size(parts) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.least(F.size(parts), F.lit(max_depth))),
            lambda i: F.concat(
                F.lit("/"), F.array_join(F.slice(parts, 1, i), "/")
            ),
        )
    )
    exploded = df.select(
        host.alias("__host"), F.posexplode(prefixes).alias("__d", "prefix")
    ).select("prefix", (F.col("__d") + 1).alias("depth"), "__host")
    per_host = exploded.groupBy("prefix", "depth", "__host").agg(
        F.count("*").alias("n")
    )
    return per_host.groupBy("prefix", "depth").agg(
        F.sum("n").alias("n_pages"), F.count("*").alias("n_hosts")
    )
