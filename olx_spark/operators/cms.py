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


def exact_topk_heavy(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    capacity: int | None = None,
) -> DataFrame:
    """Certified EXACT top-k heavy hitters in two passes with no
    shuffle of the tail — the companion to the CMS (which answers
    point queries approximately; this returns exact counts with a
    proof they are the true top-k).

    Pass 1 runs Misra-Gries (capacity counters) INSIDE each
    partition via ``mapInPandas``: any key whose partition count
    exceeds partition_rows/capacity survives its partition's summary,
    and a globally heavy key must be partition-heavy somewhere (the
    pigeonhole step), so the union of summaries is a candidate
    SUPERSET of every key with global count > N/capacity. Pass 2
    broadcast-semi-joins the candidates back (the tail never
    shuffles) and counts them exactly.

    The certificate: the true k-th count must EXCEED N/capacity, the
    only mass an MG summary can lose. If the exact k-th candidate
    count clears that threshold, the result is provably the exact
    top-k and ``certified`` is true on every row; otherwise the rows
    are still exact counts of the candidate set but the guarantee
    does not hold — the caller retries with a larger ``capacity``
    (default ``64 * k``). We REPORT rather than raise: at crawl
    scale a near-uniform key distribution has no meaningful top-k
    and the flag says exactly that.

    Ties on count break by key ascending (deterministic, oracle-
    replayable). Returns ``(key, cnt, certified)``, largest first,
    at most k rows.
    """
    import pandas as pd

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    if k < 1:
        raise ValueError("k must be >= 1")
    cap = capacity or 64 * k
    src = df.select(F.col(key_col).cast("string").alias("key"))

    summary_schema = StructType(
        [StructField("key", StringType()), StructField("c", LongType())]
    )

    def mg(batches):
        # weighted Misra-Gries: each Arrow batch pre-aggregates with
        # value_counts (vectorized), then the per-UNIQUE-key loop
        # applies weighted updates — same guarantee (every decrement
        # step retires >= cap+1 units of mass, so a key loses at most
        # partition_rows/cap), far off the per-row-Python path.
        # The partition's non-null row total rides out as ONE sentinel
        # row (key=null) so the certificate's N needs no second corpus
        # pass (r6: the former src.count() full scan is gone).
        counters: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            for key, w in pdf["key"].dropna().value_counts().items():
                w = int(w)
                n_rows += w
                while w > 0:
                    if key in counters:
                        counters[key] += w
                        break
                    if len(counters) < cap:
                        counters[key] = w
                        break
                    d = min(min(counters.values()), w)
                    for x in list(counters):
                        counters[x] -= d
                        if counters[x] == 0:
                            del counters[x]
                    w -= d
        yield pd.DataFrame(
            {
                "key": list(counters) + [None],
                "c": list(counters.values()) + [n_rows],
            }
        )

    partials = src.mapInPandas(mg, schema=summary_schema).collect()
    cands = sorted({r["key"] for r in partials if r["key"] is not None})
    total = sum(r["c"] for r in partials if r["key"] is None)
    cand_df = F.broadcast(
        df.sparkSession.createDataFrame([(c,) for c in cands] or [(None,)],
                                        "key string")
    )
    exact = (
        src.join(cand_df, "key")  # broadcast semi: tail rows drop pre-shuffle
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(k)
    )
    rows = exact.collect()
    kth = rows[-1]["cnt"] if len(rows) == k else 0
    certified = len(rows) < k or kth * cap > total
    sess = df.sparkSession
    return sess.createDataFrame(
        [(r["key"], r["cnt"], certified) for r in rows],
        "key string, cnt long, certified boolean",
    )
