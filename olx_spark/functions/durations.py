"""Reference "N units ago" duration parsing (SURVEY.md §2.1 row 18).

The reference parses free-proxy "lastChecked" cells like
``"1 hour 5 mins ago"``: it strips the literal ``"ago"``, finds every
``(\\d+ \\S+)`` component, parses each with ``scala.concurrent.duration
.Duration`` (unit-word -> multiplier), and FOLDS the components with
``plus`` onto the base timestamp
(``/root/reference/src/main/scala/freesslproxies/FreeProxy.scala:59-70``;
note the reference *adds* the duration to ``now`` rather than
subtracting — a faithful quirk callers can replicate by adding
``duration_ago_seconds`` to their base).

Everything here is a JVM-side Column expression (regexp_extract_all +
higher-order aggregate) with an exact DuckDB twin inlined in
``__spark_entry__.oracle_sql()["q_duration_parse"]`` — no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the scala.concurrent.duration.Duration unit words the reference's
# proxy-table strings use (seconds granularity; ms and below appear in
# scala Duration but never in "N units ago" cells)
UNIT_SECONDS: dict[str, int] = {
    "sec": 1, "secs": 1, "second": 1, "seconds": 1,
    "min": 60, "mins": 60, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def duration_ago_seconds(col: Column | str) -> Column:
    """Total seconds encoded by an "N units [M units ...] ago" string:
    strip "ago", extract every ``(\\d+ \\S+)`` component, map the unit
    word through :data:`UNIT_SECONDS`, sum. Unknown units contribute 0
    (the reference would throw; the engine records 0 and keeps the row
    — strictly more robust, same as its per-row fetch status)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.replace(c, F.lit("ago"), F.lit(""))
    matches = F.regexp_extract_all(cleaned, F.lit(r"(\d+ \S+)"), F.lit(1))
    unit_map = F.create_map(
        *[x for k, v in UNIT_SECONDS.items() for x in (F.lit(k), F.lit(v))]
    )
    return F.aggregate(
        matches,
        F.lit(0).cast("bigint"),
        lambda acc, m: acc
        + F.element_at(F.split(m, " "), 1).cast("bigint")
        * F.coalesce(
            unit_map[F.element_at(F.split(m, " "), 2)], F.lit(0)
        ).cast("bigint"),
    )


def cache_control_ttl(col: Column | str) -> Column:
    """HTTP ``Cache-Control`` freshness for a SHARED cache (which a
    crawler is — RFC 9111 §4.2.1 precedence): struct ``(cacheable,
    ttl_s)``. ``no-store``/``no-cache``/``private`` -> not cacheable,
    ttl 0; otherwise ``s-maxage`` wins over ``max-age``; neither
    directive -> cacheable with NULL ttl (heuristic freshness, the
    caller's policy). Token matching is word-anchored on the
    lowercased header so ``no-cache="set-cookie"``-style field
    arguments or lookalike extensions don't false-positive. Pure JVM
    regexp — runs against billions of stored response headers as a
    scan-local projection."""
    c = F.col(col) if isinstance(col, str) else col

    def grab(directive: str) -> Column:
        return F.nullif(
            F.regexp_extract(
                F.lower(c), rf"(?:^|[,\s]){directive}\s*=\s*(\d+)", 1
            ),
            F.lit(""),
        ).cast("bigint")

    low = F.lower(c)
    blocked = (
        low.rlike(r"(?:^|[,\s])no-store(?:$|[,\s])")
        | low.rlike(r"(?:^|[,\s])no-cache(?:$|[,\s=])")
        | low.rlike(r"(?:^|[,\s])private(?:$|[,\s=])")
    )
    ttl = F.coalesce(grab("s-maxage"), grab("max-age"))
    return F.struct(
        (~blocked).cast("int").alias("cacheable"),
        F.when(blocked, F.lit(0).cast("bigint")).otherwise(ttl).alias("ttl_s"),
    )
