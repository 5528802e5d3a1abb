"""Recrawl scheduling — the refresh half of a production frontier.

The reference crawls each listing once per job
(``DownloadAds.scala:25-41`` fetches, inserts, and forgets); a
standing 10^10-URL frontier instead re-visits: every fetched URL
carries a next-due time derived from its last fetch and failure
history, and each scheduling round selects the due set under the same
per-host politeness budget the first-visit path uses. This module is
that selector.

Semantics (all exact-integer, hence fully oracle-able):

- **Exponential backoff**: ``due_s = unix(last_fetch_ts) +
  base_interval_s * 2^min(fail_count, backoff_cap)`` — the power of
  two is a ``shiftleft`` (pure codegen, no float ``pow`` to drift
  cross-engine). Failing URLs cool down geometrically; the cap keeps
  a permanently-broken URL at a finite revisit rate instead of
  overflowing.
- **Due set**: ``due_s <= unix(now_ts)``. ``now`` is an explicit
  argument, never a clock read — scheduling is a pure function of
  (state, now), which is what makes rounds replayable from snapshots.
- **Per-host budget**: the due set is cut to ``per_host_budget`` rows
  per host in (priority desc, due_s asc — most-overdue first, url_fp)
  order via the SAME two-phase salted top-k the first-visit scheduler
  uses (``ranking.ordered_limit``): one hot host spreads over
  ``salt_buckets`` tasks instead of serializing a window sort, since
  AQE skew-split does not apply to window partitions.

Scale: one filter (pushed to the scan — due_s is a projection of scan
columns) + the salted two-phase top-k's shuffles on (host, salt) and
host. The state table is the snapshot store's ``seen`` lineage, which
is already bucketed; nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olx_spark.operators.ranking import ordered_limit


def recrawl_due(
    state: DataFrame,
    now: str,
    base_interval_s: int = 86_400,
    backoff_cap: int = 4,
    per_host_budget: int | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Select the recrawl-due set from ``state`` rows
    ``(url_fp, host, last_fetch_ts, fail_count, priority, ...)`` as of
    ``now`` (a ``'YYYY-MM-DD HH:MM:SS'`` literal — explicit, never a
    clock read). Adds ``due_s`` (epoch seconds, exact) and, with a
    budget, ``rank_in_limit`` within host. See module doc."""
    if base_interval_s < 1:
        raise ValueError(f"base_interval_s must be >= 1, got {base_interval_s}")
    if backoff_cap < 0:
        raise ValueError(f"backoff_cap must be >= 0, got {backoff_cap}")
    for c in ("url_fp", "host", "last_fetch_ts", "fail_count", "priority"):
        if c not in state.columns:
            raise ValueError(f"state is missing column {c!r}")
    # SQL form: the shiftleft builtin takes a column bit count there
    # (the Python wrapper only accepts a literal)
    backoff = F.expr(
        f"shiftleft(cast(1 as bigint), least(fail_count, {int(backoff_cap)}))"
    )
    due_s = (
        F.unix_timestamp("last_fetch_ts")
        + F.lit(base_interval_s).cast("long") * backoff
    )
    now_s = F.unix_timestamp(F.to_timestamp(F.lit(now)))
    due = state.withColumn("due_s", due_s).filter(F.col("due_s") <= now_s)
    if per_host_budget is None:
        return due
    return ordered_limit(
        due,
        per_host_budget,
        order_cols=[F.col("priority").desc(), F.col("due_s").asc(), F.col("url_fp").asc()],
        partition_cols=["host"],
        salt_buckets=salt_buckets,
    )


def estimate_change_rate(
    observations: DataFrame,
    url_col: str = "url_fp",
    changed_col: str = "changed",
    interval_col: str = "interval_s",
    min_obs: int = 2,
) -> DataFrame:
    """Per-URL Poisson change-rate estimation (Cho & Garcia-Molina,
    "Estimating frequency of change", ACM TOIT 2003) — the statistical
    upgrade over :func:`recrawl_due`'s fixed exponential backoff: the
    revisit interval is DERIVED from each URL's observed change
    history instead of guessed from failures.

    Input: one row per revisit observation — ``(url_fp, changed
    {0,1}: content fingerprint differed from the previous fetch,
    interval_s: seconds since that previous fetch)``. Output per URL
    with at least ``min_obs`` observations::

        (url_fp, n_obs, n_changed, avg_interval_s, lambda_per_day,
         next_interval_s)

    ``lambda_per_day`` is the paper's bias-reduced estimator for a
    Poisson change process sampled at (roughly regular) intervals:

        r_hat = -ln((n - X + 0.5) / (n + 0.5))          [changes/visit]
        lambda = r_hat / avg_interval                   [scaled /day]

    (their Eq. for \\bar{X}/n with the +0.5 continuity correction that
    keeps the estimator finite when EVERY visit saw a change, X = n).
    ``next_interval_s`` is the utility-optimal revisit interval
    ~ 1/lambda, clamped to [avg_interval/8, 8*avg_interval] so a
    never-changing URL backs off geometrically, not to infinity.

    Scale shape: ONE map-side-combinable groupBy on the URL key —
    three sums and a count; the math is a handful of JVM scalar
    expressions on the aggregated row. Fully oracle-able (exact
    integer sums + deterministic double math).
    """
    if min_obs < 1:
        raise ValueError(f"min_obs must be >= 1, got {min_obs}")
    agg = (
        observations.groupBy(F.col(url_col))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.col(changed_col).cast("long")).alias("n_changed"),
            F.sum(F.col(interval_col).cast("double")).alias("sum_int"),
        )
        .filter(F.col("n_obs") >= min_obs)
    )
    avg_int = F.col("sum_int") / F.col("n_obs")
    r_hat = -F.log(
        (F.col("n_obs") - F.col("n_changed") + F.lit(0.5))
        / (F.col("n_obs") + F.lit(0.5))
    )
    lam_s = r_hat / avg_int  # changes per second
    # never-changed URLs have r_hat == 0 exactly: clamp to the max
    # backoff explicitly instead of dividing by zero (Spark doubles
    # give Infinity there, DuckDB errors — the guard keeps the math
    # engine-portable)
    next_int = F.when(r_hat <= 0, avg_int * 8).otherwise(
        F.least(F.greatest(F.lit(1.0) / lam_s, avg_int / 8), avg_int * 8)
    )
    return agg.select(
        F.col(url_col),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("n_changed").cast("long").alias("n_changed"),
        avg_int.alias("avg_interval_s"),
        (lam_s * 86_400.0).alias("lambda_per_day"),
        next_int.alias("next_interval_s"),
    )


def freshness_allocation(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "url_fp",
    lam_col: str = "lam",
    budget_per_host: float = 10.0,
) -> DataFrame:
    """Freshness-optimal revisit-frequency allocation (Cho &
    Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
    TODS 2003): given per-page Poisson change rates λ and a per-host
    revisit budget B (visits per unit time), choose frequencies f_i
    maximizing expected freshness Σ f_i/(f_i+λ_i) s.t. Σ f_i = B.
    The Lagrange condition λ/(f+λ)² = μ gives the closed-form
    water-filling: with t = 1/√μ, ``f_i = t·√λ_i − λ_i`` for pages
    with λ_i < t² and 0 for the rest — the famous result that a
    freshness-optimal crawler SKIPS the fastest-changing pages
    entirely rather than chase them.

    Deterministic solver, one pass per host partition: sort pages by
    (λ asc, id), running prefix sums S_k=Σλ and Q_k=Σ√λ give the
    candidate threshold t_k = (B+S_k)/Q_k for every prefix; the
    optimal active set is the LARGEST prefix with t_k·√λ_k > λ_k
    (standard water-filling selection), found with one
    max-of-struct aggregation per host and broadcast back. Every
    arithmetic step is elementwise IEEE (+,·,/,√ are correctly
    rounded) over an order-pinned sequential prefix sum, so the
    result is bit-identical across engines and carries a full value
    oracle.

    Scale shape: ONE shuffle on host (window partitions), one
    map-side-combinable per-host agg, one broadcastable k-row join
    back. Hosts are the parallel unit — the global-window shape this
    deliberately avoids would serialize the planet through one task.

    Returns (host, id, lam, freq, freshness, active).
    """
    w = Window.partitionBy("host").orderBy("lam", "id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("id"),
        F.col(lam_col).alias("lam"),
    ).withColumns(
        {
            "rn": F.row_number().over(w),
            "s_k": F.sum("lam").over(run),
            "q_k": F.sum(F.sqrt("lam")).over(run),
        }
    )
    t_k = (F.lit(float(budget_per_host)) + F.col("s_k")) / F.col("q_k")
    d = d.withColumn("t_k", t_k).withColumn(
        "valid", F.col("t_k") * F.sqrt("lam") > F.col("lam")
    )
    best = (
        d.groupBy("host")
        .agg(
            F.max(
                F.when(
                    F.col("valid"), F.struct(F.col("rn"), F.col("t_k"))
                )
            ).alias("b")
        )
        .select(
            "host",
            F.col("b.rn").alias("k_star"),
            F.col("b.t_k").alias("t_star"),
        )
    )
    out = d.join(F.broadcast(best), "host")
    freq = F.when(
        F.col("rn") <= F.col("k_star"),
        F.col("t_star") * F.sqrt("lam") - F.col("lam"),
    ).otherwise(F.lit(0.0))
    # no rounding: every value is the same correctly-rounded IEEE
    # result on any engine (see docstring), and round-to-6 would sit
    # exactly on decimal half-boundaries where engines disagree
    return out.select(
        "host",
        "id",
        "lam",
        freq.alias("freq"),
        F.when(freq > 0, freq / (freq + F.col("lam")))
        .otherwise(F.lit(0.0))
        .alias("freshness"),
        (F.col("rn") <= F.col("k_star")).cast("int").alias("active"),
    )
