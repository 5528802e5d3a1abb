"""Politeness gate: robots rules + per-host crawl-delay budgets
(SURVEY.md §2.1 row 10, §2.3 item 5).

The reference's politeness is implicit: exactly one in-flight request
per job, no robots.txt, no delay (``DownloadAds.scala:28``). The engine
makes the budget explicit and distributed:

- robots rules live in a small ``hosts`` dimension (host,
  crawl_delay_ms, allow/disallow prefixes) that is BROADCAST-joined to
  the frontier — never shuffled;
- rule matching is a JVM-side fold with RFC 9309 §2.2.2 precedence
  (longest matching Allow/Disallow prefix wins, Allow wins ties) — no
  Python in the hot path;
- the per-round per-host budget is ``floor(round_budget_ms /
  crawl_delay_ms)`` requests; enforcement is a TWO-PHASE salted top-k
  (rank within ``(host, salt)`` first, cut to the budget per salt
  partition, then rank the <= budget x salts survivors per host). A
  single ``row_number() over (partition by host ...)`` would sort one
  hot host's entire frontier slice in ONE task — AQE skew-split does
  not apply to window partitions, only joins — so at a 10^10 frontier
  a 10^8-URL host serializes the round. The salted pre-rank spreads
  that sort over ``salt_buckets`` tasks and is exactly equivalent: any
  row in a host's true top-``budget`` is necessarily in the
  top-``budget`` of its own salt bucket (each bucket is a subset of
  the host's rows under the same total order).
- ``per_host_budget`` additionally assigns each kept URL a
  deterministic ``not_before_ms`` offset inside the round (host_rank x
  crawl_delay), which a real fetcher sleeps to; the sandbox fetcher
  records it instead of sleeping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olx_spark.operators.ranking import frontier_order_cols, salted_precut


def robots_rules(col: Column | str) -> Column:
    """Parse a raw robots.txt body into the Allow/Disallow prefix
    arrays that apply to this crawler (``User-agent: *`` groups),
    entirely as a JVM expression (split + aggregate over struct state —
    no Python). Returns ``struct<allow: array<string>, disallow:
    array<string>>``.

    Standard grouping semantics (RFC 9309 §2.1): a record is one or
    more consecutive ``User-agent`` lines followed by rules; a rule
    line closes the user-agent run, so the next UA line starts a NEW
    group. ``Allow:``/``Disallow:`` with an empty value match nothing
    (the line is skipped). Field names are case-insensitive; ``#``
    comments and blank lines are ignored (blank lines do NOT end a
    group — grouping is driven by the UA/rule alternation).

    Scope: prefix matching only — the RFC's optional ``*`` wildcards
    and ``$`` end-anchors are not pattern-matched, but they degrade
    CONSERVATIVELY instead of being read as literal characters (a
    literal read under-blocked: ``Disallow: /*.php`` matched nothing
    and the crawler fetched disallowed URLs — ADVICE r3):

    - a ``Disallow`` pattern is truncated at its first ``*`` (prefix
      ``/*.php`` -> ``/``, ``/a/*/b`` -> ``/a/``) and a trailing ``$``
      anchor is stripped (``/priv$`` -> ``/priv``) — both over-block,
      the safe direction for a politeness layer;
    - an ``Allow`` pattern containing ``*`` is DROPPED, and a trailing
      ``$`` is kept literal (matches nothing) — both under-allow,
      again the safe direction.

    Precedence is applied at match time by :func:`robots_flag`
    (longest-match, Allow wins ties — RFC 9309 §2.2.2).
    """
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\r?\n")
    # strip comments + whitespace once
    cleaned = F.transform(
        lines, lambda ln: F.trim(F.regexp_replace(ln, "#.*$", ""))
    )
    is_ua = lambda ln: F.lower(ln).startswith("user-agent:")
    is_dis = lambda ln: F.lower(ln).startswith("disallow:")
    is_alw = lambda ln: F.lower(ln).startswith("allow:")
    # split on the FIRST colon only (paths may contain colons)
    val = lambda ln: F.trim(F.element_at(F.split(ln, ":", 2), 2))
    ua_val = lambda ln: F.trim(F.element_at(F.split(F.lower(ln), ":", 2), 2))

    def dis_prefix(raw):
        """Conservative prefix form of a Disallow pattern: cut at the
        first '*', strip a trailing '$'; a pattern emptied by the cut
        ('*', '$') blocks the whole host ('/')."""
        t = F.regexp_replace(
            F.element_at(F.split(raw, "\\*", 2), 1), "\\$$", ""
        )
        return F.when(t == "", F.lit("/")).otherwise(t)
    init = F.struct(
        F.lit(False).alias("star"),       # current group applies to us
        F.lit(True).alias("closed"),      # UA run closed by a rule line
        F.array().cast("array<string>").alias("allow"),
        F.array().cast("array<string>").alias("disallow"),
    )

    def step(acc, ln):
        new_group_star = ua_val(ln) == "*"
        star_on_ua = F.when(acc["closed"], new_group_star).otherwise(
            acc["star"] | new_group_star
        )
        prefix = val(ln)
        keep = acc["star"] & (prefix != "")
        keep_alw = keep & ~prefix.contains("*")  # wildcard Allow: drop (safe)

        def rule_state(allow, disallow):
            return F.struct(
                acc["star"].alias("star"),
                F.lit(True).alias("closed"),
                allow.alias("allow"),
                disallow.alias("disallow"),
            )

        return (
            F.when(
                is_ua(ln),
                F.struct(
                    star_on_ua.alias("star"),
                    F.lit(False).alias("closed"),
                    acc["allow"].alias("allow"),
                    acc["disallow"].alias("disallow"),
                ),
            )
            .when(
                is_dis(ln),
                rule_state(
                    acc["allow"],
                    F.when(
                        keep, F.array_append(acc["disallow"], dis_prefix(prefix))
                    ).otherwise(acc["disallow"]),
                ),
            )
            .when(
                is_alw(ln),
                rule_state(
                    F.when(keep_alw, F.array_append(acc["allow"], prefix)).otherwise(
                        acc["allow"]
                    ),
                    acc["disallow"],
                ),
            )
            # any other non-empty rule line (Crawl-delay, Sitemap, …)
            # closes the UA run too; blank lines change nothing
            .when(ln != "", rule_state(acc["allow"], acc["disallow"]))
            .otherwise(acc)
        )

    return F.aggregate(
        cleaned,
        init,
        step,
        lambda acc: F.struct(
            acc["allow"].alias("allow"), acc["disallow"].alias("disallow")
        ),
    )


def robots_disallow_prefixes(col: Column | str) -> Column:
    """Disallow-prefix projection of :func:`robots_rules` (back-compat
    for callers that only gate on Disallow)."""
    return robots_rules(col)["disallow"]


def hosts_from_robots(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Build the engine's hosts dimension from RAW robots.txt bodies:
    rows = [(host, crawl_delay_ms, robots_txt)]. The allow/disallow
    arrays are parsed by :func:`robots_rules` at plan time."""
    df = spark.createDataFrame(
        rows, "host string, crawl_delay_ms int, robots_txt string"
    )
    rules = robots_rules("robots_txt")
    return df.select(
        "host",
        "crawl_delay_ms",
        rules["disallow"].alias("robots_disallow"),
        rules["allow"].alias("robots_allow"),
    )


def _longest_match_len(prefixes: Column, path: Column) -> Column:
    """Length of the longest prefix in ``prefixes`` matching ``path``
    (0 when none match) — pure JVM fold."""
    return F.aggregate(
        F.coalesce(prefixes, F.array().cast("array<string>")),
        F.lit(0),
        lambda acc, p: F.greatest(
            acc, F.when(path.startswith(p), F.length(p)).otherwise(F.lit(0))
        ),
    )


def robots_flag(frontier: DataFrame, hosts: DataFrame) -> DataFrame:
    """Broadcast-join the hosts dimension and add a boolean
    ``disallowed`` column with RFC 9309 §2.2.2 precedence: the most
    specific (longest) matching Allow/Disallow prefix wins, Allow wins
    exact-length ties, no match means allowed. ``hosts``: (host,
    crawl_delay_ms, robots_disallow array[, robots_allow array]) — a
    dimension without Allow rules degrades to pure Disallow-prefix
    gating. All matching is a JVM fold — zero Python.

    Returning a flag instead of filtering lets callers split ONE cached
    scan into allowed/excluded with two cheap filters — the previous
    ``exceptAll(frontier - polite)`` shape shuffled both sides every
    round that had any disallow rule."""
    joined = frontier.join(F.broadcast(hosts), on="host", how="left")
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    dis_len = _longest_match_len(F.col("robots_disallow"), path)
    alw_len = (
        _longest_match_len(F.col("robots_allow"), path)
        if "robots_allow" in hosts.columns
        else F.lit(0)
    )
    return joined.withColumn("disallowed", dis_len > alw_len)


def robots_filter(frontier: DataFrame, hosts: DataFrame) -> DataFrame:
    """Drop frontier URLs whose path matches a disallow prefix of its
    host (filter view of :func:`robots_flag`)."""
    return robots_flag(frontier, hosts).filter(~F.col("disallowed")).drop("disallowed")


def _budget_expr(round_budget_ms: int, default_per_round: int) -> Column:
    return F.when(
        F.coalesce(F.col("crawl_delay_ms"), F.lit(0)) > 0,
        # a host is always allowed >=1 fetch per round, else it starves
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.lit(round_budget_ms) / F.col("crawl_delay_ms")),
        ),
    ).otherwise(F.lit(default_per_round))


def per_host_budget(
    frontier: DataFrame,
    round_budget_ms: int = 60_000,
    default_per_round: int = 100,
    order_cols: list | None = None,
    salt_buckets: int = 8,
    max_precut_budget: int = 1 << 17,
) -> DataFrame:
    """Rank frontier rows per host and keep the round's budget:
    budget = round_budget_ms / crawl_delay_ms (or default when delay=0).
    Adds ``host_rank`` (0-based) and ``not_before_ms``.

    TWO-PHASE top-k (module docstring): phase 1 ranks within
    ``(host, salt)`` — salt derived from the URL fingerprint, so a hot
    host's sort spreads over ``salt_buckets`` tasks — and cuts each
    salt partition to the budget; phase 2 ranks the <= budget x
    salt_buckets survivors per host. The result is row-for-row
    identical to a single per-host window (each salt bucket is a
    subset of the host's rows under the same total order, so the true
    per-host top-``budget`` rows all survive phase 1), but no task
    ever sorts more than one salt slice. ``salt_buckets=1`` falls back
    to the single-phase window (no pre-cut shuffle).

    The pre-cut only pays when the budget actually CUTS: with an
    effectively unbounded budget (politeness disabled — throughput
    benches set per-round budgets in the millions) phase 1 keeps every
    row, a pure extra shuffle that fixes nothing (phase 2 still sorts
    the full slice — two-phase cannot help the unbounded case by
    construction). The budget expression's static ceiling is
    ``max(default_per_round, round_budget_ms)`` (delay >= 1ms implies
    floor(budget_ms/delay) <= budget_ms); above ``max_precut_budget``
    the pre-cut is skipped. Configs that disable politeness lean on the
    fetch-side host salting as the skew defense instead.

    The default order includes the frontier fingerprint tie-breaks
    (parent_fp, url_fp when present): (priority, round, pos) alone is
    not a total order — two listing pages of one host fetched in the
    same round yield identical triples, and the budget cut would then
    depend on partition iteration order."""
    order_cols = order_cols or frontier_order_cols(frontier)
    budget = _budget_expr(round_budget_ms, default_per_round)
    budget_ceiling = max(default_per_round, round_budget_ms)
    pre = frontier
    if salt_buckets > 1 and budget_ceiling <= max_precut_budget:
        pre = salted_precut(frontier, order_cols, budget, salt_buckets)
    w = Window.partitionBy("host").orderBy(*order_cols)
    return (
        pre.withColumn("host_rank", F.row_number().over(w) - 1)
        .filter(F.col("host_rank") < budget)
        .withColumn(
            "not_before_ms",
            F.col("host_rank") * F.coalesce(F.col("crawl_delay_ms"), F.lit(0)),
        )
    )


def rate_limit_audit(
    fetches: DataFrame,
    *,
    host_col: str = "host",
    ts_col: str = "ts_s",
    window_s: int = 30,
    max_in_window: int = 10,
) -> DataFrame:
    """Retrospective politeness compliance audit — did the crawler
    ever exceed ``max_in_window`` requests to one host inside any
    trailing ``window_s``-second window? The forward scheduler
    (:func:`per_host_budget`) ENFORCES the budget per round; this is
    the AUDITOR over the fetch log that proves it (and catches
    multi-round leakage, clock skew between rounds, or a foreign
    writer sharing the frontier). The reference enforces politeness
    implicitly — one in-flight request per job
    (``DownloadAds.scala:28`` sequential evalMap) — and audits
    nothing.

    Per fetch row: ``n_in_window`` = number of requests to the same
    host with timestamp in ``[t - window_s, t]`` (RANGE frame —
    simultaneous fetches count each other symmetrically, the
    conservative reading), ``violation`` = 1 when it exceeds the cap.

    Scale shape: ONE shuffle on the host key; the RANGE-frame count is
    a single forward pass per host partition (no self-join — the naive
    spelling is a t-range self-join that squares hot hosts). Hot-host
    skew is bounded by the fetch log itself being politeness-limited
    per round.
    """
    if window_s < 0:
        raise ValueError(f"window_s must be >= 0, got {window_s}")
    w = (
        Window.partitionBy(host_col)
        .orderBy(F.col(ts_col).asc())
        .rangeBetween(-window_s, 0)
    )
    n = F.count(F.lit(1)).over(w)
    return fetches.withColumn("n_in_window", n.cast("long")).withColumn(
        "violation", (F.col("n_in_window") > max_in_window).cast("int")
    )



def robots_sitemap_urls(col: Column | str) -> Column:
    """``Sitemap:`` URLs declared in a robots.txt body (RFC 9309 §2.3
    other-records convention; the sitemaps.org discovery mechanism):
    the field is case-insensitive and GLOBAL — valid anywhere in the
    file, outside any user-agent group — so extraction is a pure line
    scan: split lines, keep ``sitemap:`` lines, take the text after
    the FIRST colon (the URL itself contains colons), strip a
    trailing ``#`` comment, trim. Returns array<string> in file order
    (a host may declare several; empty when none). Feeds
    :mod:`olx_spark.operators.sitemaps` parsing, which seeds the
    frontier. Zero shuffle."""
    c = F.col(col) if isinstance(col, str) else col

    def value_of(l: Column) -> Column:
        t = F.trim(l)
        after_colon = F.substring(
            t, (F.instr(t, ":") + 1).cast("int"), F.length(t)
        )
        return F.trim(F.regexp_replace(after_colon, "#.*$", ""))

    vals = F.transform(
        F.split(c, "\n"),
        lambda l: F.when(
            F.lower(F.trim(l)).startswith("sitemap:"), value_of(l)
        ),
    )
    return F.filter(vals, lambda v: v.isNotNull() & (F.length(v) > 0))
