"""Temporal relational operators Spark lacks natively: as-of join,
range (interval) join, and gap sessionization.

These are the classic event-correlation primitives of a training-data
/ analytics pipeline (align each sample with the latest prior state;
attribute events into time windows; group activity into sessions).
The reference engine has no temporal operators (its `created` column
is parsed but only projected, `Model.scala:24`, `insertAds` in
`DB.scala`); these back the engine's pipeline brief the same way the
dedup/ANN family does.

Scale design (100 TB):

- ``asof_join`` is the union + running-``last`` formulation: ONE
  shuffle on the join key, no range condition ever reaches a join
  operator (a naive ``ts_r <= ts_l`` theta-join degenerates to a
  broadcast-nested-loop or a per-key cross product on skewed keys).
  Cost is a window sort per key partition — exactly what a
  1000-executor cluster does well.
- ``range_join`` rewrites ``point BETWEEN lo AND hi`` into a bucketed
  EQUI-join: intervals explode onto the fixed-width buckets they
  cover, points map to exactly one bucket, Spark hash-joins on
  (eq_keys, bucket), and the exact predicate refines. Join input is
  |points| + |intervals| x avg_buckets_per_interval rows instead of
  the |points| x |intervals| cross product per key.
- ``sessionize`` is two stacked windows over one partitioning (lag ->
  running sum), a single shuffle, whole-stage-codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_s: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the LATEST right row
    with ``right.right_ts <= left.left_ts`` and the same ``key``
    (backward as-of; equal timestamps match). Left rows keep all their
    columns; unmatched rows get null payloads (left semantics).

    ``payload_cols`` are the right columns to carry (must not collide
    with left column names — alias on the way in). ``tolerance_s``
    drops matches older than the window (payloads null out, the left
    row stays). ``right_tiebreak`` names a right column that resolves
    ties among right rows sharing the same ``(key, ts)`` — the row
    with the LARGEST tiebreak value wins, deterministically across
    shuffles; without it such ties resolve by physical row order
    (fine when ``(key, right_ts)`` is unique, e.g. event streams with
    sub-second timestamps).

    Implementation: tag both sides, union, and take the running
    ``last(payload, ignoreNulls=True)`` per key ordered by
    ``(ts, side[, tiebreak])`` with right rows ordered BEFORE left
    rows at equal timestamps so ``<=`` semantics hold. One shuffle on
    ``key``.
    """
    lcols = left.columns
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        F.col(right_ts).alias("__rts"),
    )
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if right_tiebreak is not None:
        tb = F.col(f"__p_{right_tiebreak}")
        if right_tiebreak not in payload_cols:
            raise ValueError(
                "right_tiebreak must be one of payload_cols so it rides "
                f"the union: {right_tiebreak!r} not in {payload_cols}"
            )
        # nulls (left rows) first: among same-ts right rows the largest
        # tiebreak sorts last and wins the running last()
        order.append(tb.asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in payload_cols
        ],
        F.last("__rts", ignorenulls=True).over(w).alias("__m_rts"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_s is not None:
        in_tol = (
            F.col("__m_rts").isNotNull()
            & (
                F.unix_timestamp(F.col("__ts")) - F.unix_timestamp(F.col("__m_rts"))
                <= F.lit(int(tolerance_s))
            )
        )
        out = out.select(
            *lcols,
            *[
                F.when(in_tol, F.col(f"__m_{c}")).alias(f"{c}_asof")
                for c in payload_cols
            ],
            F.when(in_tol, F.col("__m_rts")).alias("ts_asof"),
        )
    else:
        out = out.select(
            *lcols,
            *[F.col(f"__m_{c}").alias(f"{c}_asof") for c in payload_cols],
            F.col("__m_rts").alias("ts_asof"),
        )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_ts: str,
    hi_ts: str,
    eq_keys: list[str],
    bucket_s: int = 3600,
    max_buckets_per_interval: int = 1024,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``lo_ts <= point_ts <= hi_ts`` (timestamps compared at full
    precision) and equal ``eq_keys``. Returns points' columns plus the
    intervals' columns (caller aliases collisions away beforehand).

    Scale path: intervals explode onto the epoch-``bucket_s`` buckets
    they cover (inclusive of both floored endpoints — a superset, the
    exact predicate refines), points map to their single bucket, and
    the join is a hash EQUI-join on ``eq_keys + [bucket]``. Pick
    ``bucket_s`` near the typical interval length so each interval
    covers ~1-2 buckets.

    An interval covering more than ``max_buckets_per_interval``
    buckets fails the job LOUDLY (executor-side raise) instead of
    silently exploding a year-long interval into 10^5 rows each — a
    degenerate interval table (bad parse, sentinel end-dates) is a
    data bug the operator must surface, the same policy as the
    mega-bucket guards in the similarity family. Raise ``bucket_s``
    (or fix the data) to proceed.
    """
    p = points.withColumn(
        "__b", F.floor(F.unix_timestamp(F.col(point_ts)) / F.lit(bucket_s))
    )
    lo_b = F.floor(F.unix_timestamp(F.col(lo_ts)) / F.lit(bucket_s))
    hi_b = F.floor(F.unix_timestamp(F.col(hi_ts)) / F.lit(bucket_s))
    n_b = hi_b - lo_b + 1
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.when(
                n_b <= F.lit(int(max_buckets_per_interval)), F.sequence(lo_b, hi_b)
            ).otherwise(
                F.raise_error(
                    F.format_string(
                        "range_join: interval covers %s buckets of "
                        + f"{bucket_s}s (max {max_buckets_per_interval}); "
                        + "degenerate interval or bucket_s too small",
                        n_b,
                    )
                )
            )
        ),
    )
    joined = p.join(iv, on=eq_keys + ["__b"], how="inner").filter(
        (F.col(point_ts) >= F.col(lo_ts)) & (F.col(point_ts) <= F.col(hi_ts))
    )
    return joined.drop("__b")


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    gap_s: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign every row a per-``key`` ``session_seq`` (1-based): a new
    session starts when the gap to the previous event of the same key
    exceeds ``gap_s`` WHOLE seconds (gaps measured on floored epoch
    seconds — deterministic across engines). Adds the column, keeps
    all input columns. One shuffle on ``key``; lag + running sum over
    the same window partitioning, no Python.
    """
    order = [F.col(ts).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    sec = F.unix_timestamp(F.col(ts))
    brk = F.when(
        F.lag(sec).over(w).isNull() | ((sec - F.lag(sec).over(w)) > gap_s), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_seq", F.sum(brk).over(wsum))


def scd2_history(
    obs: DataFrame,
    key: str = "url_fp",
    ts: str = "fetch_ts",
    value: str = "content_hash",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a per-key observation stream into SCD type-2 validity
    intervals — the recrawl ledger: the crawl engine re-fetches a URL
    every refresh cycle (`operators/recrawl`), and downstream
    consumers need "what did this page SAY, and when" as intervals,
    not as 10^2 near-identical observations per URL. (The reference
    stores every parsed ad row append-only — ``db/H2.scala:61`` — so
    its history is the raw stream; this is the warehouse view over
    it.)

    Returns one row per (key, run of consecutive equal ``value``):
    ``(key, version, value, valid_from, valid_to, n_obs,
    is_current)`` — ``version`` 1-based in observation order,
    ``valid_to`` = the next version's ``valid_from`` (NULL while
    current), ``is_current`` flags the open interval.

    Scale shape (10^10-URL corpus x recrawls): ONE shuffle on ``key``
    — the change-point window, the per-version groupBy (key is a
    prefix of the group key, so rows are already clustered), and the
    valid_to/is_current windows all reuse the same hash partitioning;
    Catalyst plans a single Exchange (asserted in tests). Everything
    is JVM window/agg expressions — no Python.
    """
    order = [F.col(ts).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    chg = F.when(
        F.lag(value).over(w).isNull()
        | (F.col(value) != F.lag(value).over(w)),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = obs.withColumn("version", F.sum(chg).over(wsum))
    per = runs.groupBy(key, "version").agg(
        F.min(value).alias(value),  # constant within a run; min = any
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    wv = Window.partitionBy(key).orderBy(F.col("version").asc())
    return per.select(
        key,
        F.col("version").cast("int").alias("version"),
        value,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_obs",
        F.when(F.lead("valid_from").over(wv).isNull(), 1)
        .otherwise(0)
        .alias("is_current"),
    )


def funnel(
    events: DataFrame,
    key: str,
    ts: str,
    type_col: str,
    stages: list[str],
    order_tiebreak: str | None = None,
) -> DataFrame:
    """First-conversion funnel: for each ``key``, the timestamp of the
    first ``stages[0]`` event, the first ``stages[1]`` event STRICTLY
    after it, the first ``stages[2]`` strictly after that, and so on —
    the standard ordered-funnel semantics of event analytics (a click
    before any view does not count as funnel progress). One row per
    key with per-stage first-hit timestamps, per-stage raw event
    counts, the deepest stage reached, and end-to-end conversion time.

    The reference crawler reports only flat run totals
    (`Model.scala:30` `Report`); this is the sequenced view a crawl /
    product pipeline needs (listing seen -> ad opened -> ad stored).

    Scale shape (100 TB of events): ONE shuffle on ``key``. Stage
    gates are running ``min``s over a single window partitioning —
    stage *i* qualifies where the running first-hit of stage *i-1* is
    already set and strictly earlier — and the final per-key rollup
    groups on the same key, so Catalyst plans one Exchange for the
    window stack and reuses the clustering for the agg. All JVM
    window/agg expressions, no Python, no self-joins (the naive
    formulation is one join per stage on a hot key).
    """
    order = [F.col(ts).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = events
    qual_cols: list[str] = []
    prev_run: str | None = None
    for i, st in enumerate(stages):
        qc = f"_funnel_q{i}"
        if i == 0:
            q = F.when(F.col(type_col) == st, F.col(ts))
        else:
            q = F.when(
                (F.col(type_col) == st) & (F.col(ts) > F.col(prev_run)),
                F.col(ts),
            )
        out = out.withColumn(qc, q)
        qual_cols.append(qc)
        if i < len(stages) - 1:
            rc = f"_funnel_r{i}"
            out = out.withColumn(rc, F.min(F.col(qc)).over(w))
            prev_run = rc
    aggs = []
    for i, st in enumerate(stages):
        # parquet timestamps arrive NTZ; the engine pins the session
        # to UTC (session.py), so the cast to instant is offset-free
        aggs.append(
            F.unix_micros(
                F.min(F.col(qual_cols[i])).cast("timestamp")
            ).alias(f"t_{st}_us")
        )
        aggs.append(
            F.sum((F.col(type_col) == st).cast("long")).alias(f"n_{st}")
        )
    per = out.groupBy(key).agg(*aggs)
    # deepest stage reached: first null in the stage chain caps it
    reached = F.lit(len(stages))
    for i in range(len(stages) - 1, -1, -1):
        reached = F.when(
            F.col(f"t_{stages[i]}_us").isNull(), F.lit(i)
        ).otherwise(reached)
    first, last = stages[0], stages[-1]
    return per.withColumn("stage_reached", reached.cast("int")).withColumn(
        "conv_us",
        F.when(
            F.col(f"t_{last}_us").isNotNull(),
            F.col(f"t_{last}_us") - F.col(f"t_{first}_us"),
        ),
    )


def recency_weighted_scores(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    now: str,
    half_life_s: int = 86_400,
    value_scale: int = 100,
    max_halvings: int = 40,
) -> DataFrame:
    """Recency-weighted per-group score: every event contributes its
    value decayed by age — the host-quality / trending-entity signal
    a refresh crawler ranks by. The decay is STEP-HALVING — the
    contribution is ``floor(value*scale) >> min(floor(age/half_life),
    max_halvings)`` — i.e. exactly halved once per elapsed half-life,
    a documented stepwise stand-in for continuous ``exp`` decay
    chosen because it is ALL integer arithmetic: ``exp`` is not
    correctly-rounded across libms, so a float decay cannot carry a
    bit-exact cross-engine oracle, while shift/floor arithmetic can
    (the ``recrawl_due`` backoff precedent). ``now`` is an explicit
    timestamp literal, never a clock read.

    Returns ``(group, n_events, score_scaled, score)`` where
    ``score_scaled`` is the exact integer sum and ``score`` =
    score_scaled / scale. ONE map-side-combinable shuffle."""
    if half_life_s < 1:
        raise ValueError(f"half_life_s must be >= 1, got {half_life_s}")
    now_s = F.unix_timestamp(F.to_timestamp(F.lit(now)))
    age = now_s - F.unix_timestamp(F.col(ts_col))
    halvings = F.least(
        F.floor(age / F.lit(half_life_s)).cast("int"), F.lit(max_halvings)
    )
    v = F.floor(F.col(value_col).cast("double") * value_scale).cast("long")
    # shiftright with a COLUMN bit count needs the SQL builtin (the
    # Python wrapper only takes a literal), and events from the
    # future (clock skew) decay nothing
    contrib = F.when(age < 0, v).otherwise(
        F.call_function("shiftright", v, halvings)
    )
    return (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(contrib).alias("score_scaled"),
        )
        .select(
            "grp",
            "n_events",
            "score_scaled",
            (F.col("score_scaled") / F.lit(float(value_scale))).alias("score"),
        )
    )
