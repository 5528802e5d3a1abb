"""Count-min sketch — approximate per-key frequencies in fixed space.

The heavy-hitter / hot-key primitive (Cormode & Muthukrishnan, J.
Algorithms 2005): at 100 TB, "which hosts/users/tokens are hot" via an
exact ``groupBy(key)`` shuffles every distinct key; a CMS reduces the
state to a fixed ``d x w`` counter grid — the shuffle moves at most
``d * w`` counter rows (map-side combined), point lookups are
``min`` over ``d`` counters, sketches MERGE by counter-wise sum, and
the estimate NEVER undercounts (one-sided error: overcount ≤
``2N/w`` with prob ``1 - 2^-d``). This is the same primitive the
crawl engine's skew handling wants for detecting hot hosts without
paying an exact host histogram.

Like ``operators/sketches`` (HLL), the construction is PORTABLE BY
CONSTRUCTION: row ``j`` hashes with the repo's md5-60 convention under
salt ``cms{j}:``, the bucket is ``pmod(h, w)``, counters are exact
bigints — an independent engine replaying the spec produces the
identical grid, so the oracle gate checks equality, not tolerance.

Reference analog: none (the reference keeps exact rows in Postgres);
part of the engine's training-data/corpus-stats surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olx_spark.functions.text import md5_60


def _key(key: Column | str) -> Column:
    return key if isinstance(key, Column) else F.col(key)


def cms_build(
    df: DataFrame,
    key: Column | str,
    d: int = 4,
    w: int = 1 << 12,
    group_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Build the ``d x w`` counter grid for ``key`` (one grid per
    group): rows ``group..., j int, b int, cnt long`` — only non-zero
    counters are materialized (absent == 0). One map-side-combinable
    aggregation; the explode multiplies rows by ``d`` BEFORE the
    combine, so the shuffle still moves at most ``d * w`` rows per
    group per map task."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d}, w={w}")
    k = _key(key).cast("string")
    gcols = list(group_cols)
    rows = df.select(
        *gcols, F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"), k.alias("__k")
    ).select(
        *gcols,
        "j",
        F.pmod(
            md5_60(F.concat(F.lit("cms"), F.col("j").cast("string"), F.lit(":"), F.col("__k"))),
            F.lit(w),
        ).cast("int").alias("b"),
    )
    return rows.groupBy(*gcols, "j", "b").agg(F.count("*").alias("cnt"))


def cms_merge(counters: DataFrame, group_cols: list[str] | tuple[str, ...] = ()) -> DataFrame:
    """Merge grids built with the SAME (d, w) (union the frames
    first): counter-wise sum — merging the sketches of two halves
    equals sketching the union (pytest-pinned)."""
    return counters.groupBy(*list(group_cols), "j", "b").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_lookup(
    counters: DataFrame,
    queries: DataFrame,
    key: Column | str,
    d: int = 4,
    w: int = 1 << 12,
    out_col: str = "n_est",
) -> DataFrame:
    """Point-query estimates for every row of ``queries``:
    ``queries.* , out_col long`` with ``out_col = min_j grid[j][h_j(k)]``
    (>= the true count, always). The query side fans out ``d`` probe
    rows per key and joins the grid on ``(j, b)`` — with a small query
    set Catalyst broadcasts the probes, so the big counter table never
    moves. A probed counter that was never materialized reads 0 —
    which CMS semantics define as "true count is 0"."""
    k = _key(key).cast("string")
    probes = queries.select(
        queries["*"],
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
    ).withColumn(
        "b",
        F.pmod(
            md5_60(F.concat(F.lit("cms"), F.col("j").cast("string"), F.lit(":"), k)),
            F.lit(w),
        ).cast("int"),
    )
    qcols = [c for c in queries.columns]
    joined = probes.join(counters.select("j", "b", "cnt"), ["j", "b"], "left")
    return (
        joined.groupBy(*qcols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )
