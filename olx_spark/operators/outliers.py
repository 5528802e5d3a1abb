"""Winsorization — per-group percentile clipping of a numeric
column, the standard outlier-robustness pass before any statistic or
model consumes a metric (fetch latencies, image sizes, token counts:
web-scale measurements have heavy tails, and one bad host's 10^9-ms
"latency" should not own the mean). The reference engine has no
numeric post-processing (`Model.scala`), so this backs the pipeline
brief.

Semantics: for each group, compute the exact interpolated
``(p_lo, p_hi)`` percentiles of ``value_col`` (Spark ``percentile``
== DuckDB ``quantile_cont``, equality already pinned by
``q_quantiles``), then clip every row into ``[lo, hi]`` and flag the
rows that moved. NULL values pass through unclipped and unflagged
(they carry no magnitude to clip).

Scale design (100 TB): one map-side-combinable groupBy builds the
per-group bounds table (one row per group — orders of magnitude
below the fact table), which joins back via an explicit broadcast;
the clip itself is codegen ``greatest``/``least`` on the scan, no
second shuffle of the facts. EXACT percentiles hold the group's
distinct values in memory — at 100-TB continuous metrics switch to
``approx_percentile`` (t-digest) and relax the oracle to a tolerance
check (the same trade ``q_quantiles`` documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Clip ``value_col`` to its per-group ``[p_lo, p_hi]`` exact
    percentiles. Adds ``<value_col>_w`` (clipped) and ``clipped``
    (-1 floor-clipped / 0 untouched or NULL / 1 ceiling-clipped)."""
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got ({p_lo}, {p_hi})")
    if not group_cols:
        raise ValueError("group_cols must be non-empty (use a literal "
                         "constant column for a global clip)")
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(value_col, p_lo).alias("__lo"),
        F.percentile(value_col, p_hi).alias("__hi"),
    )
    v = F.col(value_col)
    return (
        df.join(F.broadcast(bounds), group_cols)
        .withColumn(
            f"{value_col}_w",
            F.when(v.isNull(), v)
            .otherwise(F.greatest(F.least(v, F.col("__hi")), F.col("__lo"))),
        )
        .withColumn(
            "clipped",
            F.when(v.isNull(), F.lit(0))
            .when(v < F.col("__lo"), F.lit(-1))
            .when(v > F.col("__hi"), F.lit(1))
            .otherwise(F.lit(0)),
        )
        .drop("__lo", "__hi")
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    k: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier flags via the median absolute
    deviation (the Iglewicz-Hoaglin modified z-score, the standard
    robust alternative to mean/stddev rules — one wild value cannot
    move its own threshold, which is exactly what breaks 3-sigma on
    crawl metrics): ``z = 0.6745 * (x - median) / MAD``, flag
    ``|z| > k`` (3.5 is the published default).

    A zero-MAD group (majority-constant values) degenerates: rows AT
    the median read z = 0, rows off it are flagged with NULL z (the
    modified z-score is undefined there, but the row is certainly
    anomalous — the flag is the answer, the score honestly absent).

    Scale shape: two grouped EXACT percentiles (Spark ``percentile``
    — per-group sort in the aggregation buffer, fine for the bounded
    group cardinalities of monitoring dimensions; a billion-row
    single group wants the approx sketch instead) + two broadcast
    joins back. Returns (id, group, value, robust_z, is_outlier).
    """
    med = (
        df.groupBy(F.col(group_col).alias("__mo_g"))
        .agg(F.percentile(F.col(value_col), F.lit(0.5)).alias("med"))
    )
    with_med = df.join(
        F.broadcast(med), F.col(group_col) == F.col("__mo_g")
    ).drop("__mo_g")
    mad = (
        with_med.groupBy(F.col(group_col).alias("__mo_g"))
        .agg(
            F.percentile(
                F.abs(F.col(value_col) - F.col("med")), F.lit(0.5)
            ).alias("mad")
        )
    )
    j = with_med.join(
        F.broadcast(mad), F.col(group_col) == F.col("__mo_g")
    ).drop("__mo_g")
    dev = F.col(value_col) - F.col("med")
    z = F.lit(0.6745) * dev / F.col("mad")
    robust_z = F.when(
        F.col("mad") == 0, F.when(dev == 0, F.lit(0.0)).otherwise(F.lit(None))
    ).otherwise(F.round(z, 6))
    flag = F.when(
        F.col("mad") == 0, (dev != 0).cast("int")
    ).otherwise((F.abs(z) > k).cast("int"))
    return j.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("value"),
        robust_z.alias("robust_z"),
        flag.alias("is_outlier"),
    )
