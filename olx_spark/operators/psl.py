"""Public-Suffix-List registrable-domain extraction (eTLD+1).

A crawler's politeness, dedup and quality accounting must group by
REGISTRABLE domain, not hostname: ``a.blogspot.com`` and
``b.blogspot.com`` are different sites (blogspot.com is a public
suffix), while ``shop.example.co.uk`` and ``www.example.co.uk`` are
the same site (``example.co.uk``). The reference crawls a single
site so never needs this (`/root/reference/src/main/scala/olx/
Olx.scala:21` hard-codes the olx.ua host); at web scale it is the
key every per-site budget hangs off — the complement of
:func:`olx_spark.functions.urls.surt` (which sorts by reversed host
but does not know where the registrable boundary is).

Semantics are the publicsuffix.org algorithm, in full:

- a NORMAL rule (``co.uk``) matches any host whose label-suffix
  equals the rule; the public suffix is the rule itself;
- a WILDCARD rule (``*.ck``) matches any label-suffix whose tail
  (everything after its first label) equals the rule's tail; the
  public suffix includes the wildcarded label;
- an EXCEPTION rule (``!www.ck``) matches exactly and PREVAILS over
  every other matching rule; the public suffix is the rule minus its
  leftmost label;
- among non-exception matches the rule with the MOST labels
  prevails; with no match at all the implicit default rule ``*``
  applies (public suffix = rightmost label);
- the registrable domain (eTLD+1) is the public suffix plus one more
  host label — NULL when the host IS a public suffix.

Scale shape (10^10 URLs): matching runs over ``distinct`` hosts only
(orders of magnitude fewer than URLs). Each host explodes into its
<= ``max_labels`` label-suffix candidates (pure JVM ``slice`` /
``array_join`` — no Python), which broadcast-hash-join the rule
table (the real PSL is ~10k rows — always broadcastable), and the
prevailing rule is a map-side-combined ``max(struct(is_exc,
ps_labels))`` per host. The resulting (host -> eTLD+1) map is itself
broadcast back onto the URL-scale frame, so the per-URL cost is one
broadcast probe; the only shuffle anywhere carries one row per
distinct host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psl_rules(spark, rules: list[str]) -> DataFrame:
    """Parse raw public-suffix-list rule lines into the rule table
    ``(kind, key, ps_labels)`` that :func:`registrable_domains`
    joins against.

    ``kind``: ``norm`` | ``wild`` | ``exc``. ``key`` is the equi-join
    key — the rule itself for normal/exception rules, the tail after
    ``*.`` for wildcard rules. ``ps_labels`` is the label count of
    the public suffix a match implies. Comment (``//``) and blank
    lines are skipped, case is folded, so the official PSL file can
    be fed verbatim.
    """
    rows = []
    for raw in rules:
        r = raw.strip().lower()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            key = r[1:]
            n = len(key.split("."))
            if n < 2:
                raise ValueError(
                    f"exception rule {raw!r} needs >= 2 labels (its public "
                    "suffix is the rule minus the leftmost label)"
                )
            rows.append(("exc", key, n - 1))
        elif r.startswith("*."):
            key = r[2:]
            rows.append(("wild", key, len(key.split(".")) + 1))
        else:
            rows.append(("norm", r, len(r.split("."))))
    return spark.createDataFrame(rows, "kind string, key string, ps_labels int")


def registrable_domains(
    df: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    out_ps: str = "public_suffix",
    out_rd: str = "registrable_domain",
    max_labels: int = 12,
) -> DataFrame:
    """Append ``out_ps`` (public suffix) and ``out_rd`` (eTLD+1)
    columns derived from ``host_col`` under the PSL ``rules`` table
    (from :func:`psl_rules`).

    Hosts are matched case-insensitively with a trailing dot
    stripped; the appended columns are lowercase. A NULL/empty host
    yields NULLs. ``max_labels`` caps candidate generation (hosts
    deeper than the deepest real PSL rule only ever match on their
    tail; 12 covers the official list with headroom).
    """
    spark = df.sparkSession
    hosts = (
        df.select(F.col(host_col).alias("__h_raw"))
        .where(F.col("__h_raw").isNotNull() & (F.col("__h_raw") != ""))
        .distinct()
    )
    labels = F.split(F.lower(F.regexp_replace(F.col("__h_raw"), r"\.$", "")), r"\.")
    n = F.size("__labels")
    cand = (
        hosts.withColumn("__labels", labels)
        .withColumn("__n", n)
        .select(
            "__h_raw",
            "__labels",
            "__n",
            # i = labels dropped from the left; suffix S_i and its tail
            # T_i. Rules have <= max_labels labels, so only the
            # max_labels SHORTEST suffixes (largest i) can ever match —
            # a 30-label host generates candidates for its rightmost
            # max_labels cut points, not 30.
            F.explode(
                F.sequence(
                    F.greatest(F.col("__n") - max_labels, F.lit(0)),
                    F.col("__n") - 1,
                )
            ).alias("__i"),
        )
        .select(
            "__h_raw",
            "__labels",
            "__n",
            F.array_join(
                F.slice("__labels", F.col("__i") + 1, F.col("__n") - F.col("__i")),
                ".",
            ).alias("__s"),
            F.array_join(
                F.slice("__labels", F.col("__i") + 2, F.col("__n") - F.col("__i") - 1),
                ".",
            ).alias("__t"),
        )
    )
    direct = cand.join(
        F.broadcast(rules.where(F.col("kind") != "wild")),
        F.col("__s") == F.col("key"),
    )
    tail = cand.join(
        F.broadcast(rules.where(F.col("kind") == "wild")),
        F.col("__t") == F.col("key"),
    )
    matches = direct.unionByName(tail).select(
        "__h_raw",
        F.struct(
            (F.col("kind") == "exc").cast("int").alias("is_exc"),
            F.col("ps_labels").alias("m"),
        ).alias("__rule"),
    )
    prevailing = matches.groupBy("__h_raw").agg(F.max("__rule").alias("__best"))
    resolved = (
        hosts.withColumn("__labels", labels)
        .withColumn("__n", F.size("__labels"))
        .join(prevailing, "__h_raw", "left")
        # implicit default rule "*": public suffix = rightmost label
        .withColumn("__m", F.coalesce(F.col("__best.m"), F.lit(1)))
        .select(
            "__h_raw",
            F.array_join(
                F.slice("__labels", F.col("__n") - F.col("__m") + 1, F.col("__m")),
                ".",
            ).alias(out_ps),
            F.when(
                F.col("__n") > F.col("__m"),
                F.array_join(
                    F.slice(
                        "__labels", F.col("__n") - F.col("__m"), F.col("__m") + 1
                    ),
                    ".",
                ),
            ).alias(out_rd),
        )
    )
    return df.join(
        F.broadcast(resolved), df[host_col] == resolved["__h_raw"], "left"
    ).drop("__h_raw")
