"""Frontier ranking + deterministic ordered limits (SURVEY.md §2.3
items 4, 6; §4.2 item 1).

A bare ``df.limit(n)`` is partition-order-nondeterministic in Spark, so
every "take the first n" in this engine is over an explicit TOTAL order.
Two scale-aware shapes:

- per-group top-n: ``row_number() over (partition by g order by ...)``
  -> rank-then-filter. One shuffle on ``g``; each partition sorts only
  its group.
- GLOBAL top-n: ``orderBy(...).limit(n)`` which Catalyst compiles to
  ``TakeOrderedAndProject`` — a distributed partial top-n per partition
  merged on one reducer over only n rows. Deterministic given a total
  order, and it never moves the full dataset to a single partition
  (a global ``Window.orderBy`` with no partitionBy does — the
  "WindowExec: No Partition Defined" scale-killer).

The rank column is derived AFTER the limit, over the tiny (<= n row)
result, partitioned by a constant so no global-window warning fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic tie-breaks appended to every frontier ordering when the
# columns exist: (priority, discovery_round, discovery_pos) alone is NOT
# a total order — two listing pages of the same host fetched in the same
# round emit ads with identical (priority, round, pos), and row_number
# ties would then be broken by partition iteration order.
# discovery_pos stays BEFORE parent_fp: the engine marks pagination
# links with pos=-1 ("pagination first", plans/scaled.py) and that
# convention must hold across parents, not just within one
_FRONTIER_TIEBREAKS = ("discovery_pos", "parent_fp", "url_fp")


def frontier_order_cols(df: DataFrame) -> list:
    """The engine's canonical frontier total order: priority desc, then
    discovery round, then position (pagination sentinel -1 first), then
    the fingerprint tie-breaks present in ``df``."""
    cols = [F.col("priority").desc(), F.col("discovery_round")]
    for c in _FRONTIER_TIEBREAKS:
        if c in df.columns:
            cols.append(F.col(c))
    return cols


def constant_partitioned_window(order_cols: list) -> Window:
    """A window over an explicit total order whose partition key is a
    CONSTANT — for ranking result sets already known to be tiny (post
    sort+limit, a drained micro-batch). A plain ``lit(0)`` partition
    key gets constant-folded out of the window spec, reviving the
    single-partition global window and its "No Partition Defined"
    scale warning; ``monotonically_increasing_id() % 1`` is always 0
    but non-foldable (miid is marked nondeterministic)."""
    const_key = F.pmod(F.monotonically_increasing_id(), F.lit(1))
    return Window.partitionBy(const_key).orderBy(*order_cols)


def salted_precut(
    df: DataFrame,
    order_cols: list,
    cut,
    salt_buckets: int,
    partition_cols: list | tuple = ("host",),
    salt_src=None,
) -> DataFrame:
    """Phase 1 of a two-phase salted per-group top-k: rank within
    ``(*partition_cols, salt)`` and keep rows ranked below ``cut`` (an
    int or a per-row Column, e.g. a crawl-delay-derived budget). Any
    row in a group's true top-``cut`` under ``order_cols`` is
    necessarily in the top-``cut`` of its own salt bucket (each bucket
    is a subset under the same total order), so a final per-group rank
    over the survivors is row-identical to a single-phase window — but
    no task ever sorts more than one salt slice of a hot group. Shared
    by :func:`frontier_rank`, ``politeness.per_host_budget`` and
    :func:`ordered_limit`'s per-group path.

    ``salt_src`` (any deterministic per-row Column) defaults to the URL
    fingerprint when present, else a hash over every input column —
    rows identical in all columns land in one bucket, which is fine:
    they are interchangeable under any total order on those columns."""
    if salt_src is None:
        if "url_fp" in df.columns:
            salt_src = F.col("url_fp")
        elif "url" in df.columns:
            salt_src = F.xxhash64("url")
        else:
            salt_src = F.xxhash64(*[F.col(c) for c in df.columns])
    w = Window.partitionBy(
        *partition_cols, F.pmod(salt_src, F.lit(salt_buckets))
    ).orderBy(*order_cols)
    return (
        df.withColumn("__salt_rank", F.row_number().over(w) - 1)
        .filter(F.col("__salt_rank") < cut)
        .drop("__salt_rank")
    )


def frontier_rank(
    frontier: DataFrame, top_n: int | None = None, salt_buckets: int = 8
) -> DataFrame:
    """Per-host priority queue: rank by (priority desc, discovery_round,
    parent_fp, discovery_pos, url_fp) within host — the window-function
    heart of the scheduler (north_star). The fingerprint tie-breaks make
    the order total, so ranks are identical at any parallelism.

    With ``top_n`` set, only the first ``top_n`` rows per host are
    returned, computed as a TWO-PHASE salted top-k: rank within
    ``(host, salt)`` first (salt from url_fp), cut each salt partition
    to ``top_n``, then rank the <= top_n x salt_buckets survivors per
    host. Identical output to the single window (each salt bucket is a
    subset of its host under the same total order), but a hot host's
    sort spreads over ``salt_buckets`` tasks instead of serializing in
    one — the scale path for skewed frontiers, since AQE skew-split
    does not apply to window partitions. Without ``top_n`` a full
    per-host rank has no cut to exploit, so it stays single-phase —
    callers ranking a skewed full frontier should pass the budget."""
    order_cols = frontier_order_cols(frontier)
    pre = frontier
    if top_n is not None and salt_buckets > 1:
        pre = salted_precut(frontier, order_cols, top_n, salt_buckets)
    w = Window.partitionBy("host").orderBy(*order_cols)
    ranked = pre.withColumn("host_rank", F.row_number().over(w) - 1)
    if top_n is not None:
        ranked = ranked.filter(F.col("host_rank") < top_n)
    return ranked


def ordered_limit(
    df: DataFrame,
    n: int,
    order_cols: list,
    partition_cols: list | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Deterministic top-n in a total order; optionally per partition
    group. Adds ``rank_in_limit`` (0-based).

    Global form compiles to ``TakeOrderedAndProject`` (distributed
    partial top-n) — NOT a no-partition window, which would move the
    entire input through one task at scale.

    The per-group form is the same TWO-PHASE salted top-k as
    ``frontier_rank(top_n)`` / ``per_host_budget``: a salted pre-rank
    cuts each ``(group, salt)`` slice to ``n`` before the final
    per-group window, so one skewed group's sort spreads over
    ``salt_buckets`` tasks instead of serializing (AQE skew-split does
    not apply to window partitions). Output is row-identical to the
    single-phase window when ``order_cols`` is a total order within
    each group. ``salt_buckets=1`` disables the pre-cut."""
    if partition_cols:
        pre = df
        if salt_buckets > 1:
            pre = salted_precut(
                df, order_cols, n, salt_buckets, partition_cols=partition_cols
            )
        w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
        return (
            pre.withColumn("rank_in_limit", F.row_number().over(w) - 1)
            .filter(F.col("rank_in_limit") < n)
        )
    top = df.orderBy(*order_cols).limit(n)
    # rank over the <= n surviving rows only (constant-partitioned, so
    # the plan stays a tiny partitioned window, not a global one)
    w = constant_partitioned_window(order_cols)
    return top.withColumn("rank_in_limit", F.row_number().over(w) - 1)


def allocate_budget(
    hosts: DataFrame,
    total: int,
    *,
    host_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """Proportional-fair fetch-budget allocation — split a global
    per-round request budget across hosts by INTEGER weight (e.g.
    pending-count x quality bucket) using the largest-remainder
    (Hamilton) method, so allocations are integers that sum EXACTLY
    to ``total`` and the rounding error lands on the hosts with the
    largest fractional claims. (The reference has no global budget —
    one job = one host sequence, ``OlxServer.scala:56`` — a shared
    cluster crawling 10^6 hosts needs the split to be explicit.)

    ``weight_col`` MUST be integral: the quota ``total * w / sum(w)``
    is then a ratio of exact int64s and every engine computes the
    same double, making the (frac desc, host asc) remainder order
    value-deterministic cross-engine — the reason this takes integer
    weights instead of floats (a float sum's value depends on
    partition order).

    Returns one row per host with ``weight > 0``: ``(host, weight,
    base, extra, alloc)`` where ``alloc = base + extra`` and
    ``sum(alloc) == min(total, ...)`` exactly (hosts with zero weight
    get nothing and are dropped).

    Scale shape: the host table is orders smaller than the fetch log
    it summarizes. Two tiny scalar aggs (weight sum, base sum) come
    to the driver; the ``k`` remainder winners are picked by
    :func:`ordered_limit` — ``TakeOrderedAndProject``, a distributed
    partial top-k, never a single-partition window — and broadcast
    back. The host table is scanned, not sorted globally.
    """
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    from olx_spark.session import materialize

    h = materialize(
        hosts.select(
            F.col(host_col).alias("__ab_h"),
            F.col(weight_col).cast("long").alias("__ab_w"),
        ).filter(F.col("__ab_w") > 0)
    )
    sumw = h.agg(F.sum("__ab_w").alias("s")).collect()[0]["s"]
    if not sumw or total == 0:
        return h.select(
            F.col("__ab_h").alias(host_col),
            F.col("__ab_w").alias(weight_col),
            F.lit(0).cast("long").alias("base"),
            F.lit(0).cast("int").alias("extra"),
            F.lit(0).cast("long").alias("alloc"),
        )
    quota = F.col("__ab_w").cast("double") * F.lit(float(total)) / F.lit(
        float(sumw)
    )
    staged = materialize(
        h.withColumn("__ab_base", F.floor(quota).cast("long")).withColumn(
            "__ab_frac", quota - F.floor(quota)
        )
    )
    k = total - staged.agg(F.sum("__ab_base").alias("b")).collect()[0]["b"]
    if k > 0:
        extras = ordered_limit(
            staged, int(k), [F.col("__ab_frac").desc(), F.col("__ab_h").asc()]
        ).select("__ab_h", F.lit(1).alias("__ab_x"))
        staged = staged.join(F.broadcast(extras), "__ab_h", "left")
    else:
        staged = staged.withColumn("__ab_x", F.lit(None).cast("int"))
    extra = F.coalesce(F.col("__ab_x"), F.lit(0))
    return staged.select(
        F.col("__ab_h").alias(host_col),
        F.col("__ab_w").alias(weight_col),
        F.col("__ab_base").alias("base"),
        extra.cast("int").alias("extra"),
        (F.col("__ab_base") + extra).cast("long").alias("alloc"),
    )
