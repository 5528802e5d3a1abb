"""Distributed k-means clustering over an embedding column.

The second iterative algorithm in the engine next to PageRank
(``operators/graph.py``), and the missing general-purpose primitive
behind the existing clustering *consumers* (``semantic_dedup`` cells,
``cluster_balanced_sample`` groups, IVF cell training): Lloyd's
algorithm where BOTH relations stay distributed — the corpus is never
collected, only the (k x dim) centroid table moves to the driver
between rounds (the Spark MLlib / Mahout layout).

Scale shape (the part that must survive 100 TB):

- **Assignment is zero-shuffle.** Centroids are a closure constant
  shipped once per executor; a vectorized pandas UDF computes
  ``argmin ||x - c_j||^2`` as one numpy matmul per Arrow batch
  (same playbook as ``similarity._cell_assigner``).
- **The update is ONE map-side-combinable shuffle per round**:
  ``posexplode`` the dims, hash-aggregate ``sum, count`` by
  ``(cell, dim)`` — at most ``k * dim`` combiner cells per map task,
  so the 64x row fan-out collapses before the exchange. Only
  ``k * dim`` result rows reach the driver.
- The quantized corpus frame feeds ``iters + 1`` passes, so it is
  materialized ONCE through the ``session.materialize`` knob
  (fork-recompute doctrine; reliable-checkpoint conf applies).

Exact-integer determinism (why this carries a FULL value oracle while
MLlib's k-means cannot): float summation order differs between
engines, and one flipped ulp near an assignment boundary compounds
across rounds. Every arithmetic step here is therefore kept in the
range where float64 is EXACT:

- inputs quantize to integers: ``floor(x * 1e6 + 0.5)`` — |q| <= ~1e6
  (``floor`` of an identically-computed double is engine-portable,
  unlike ``round``'s half-up/half-even split);
- squared distances are sums of 64 integer products <= ~2^47 — exact
  in float64 REGARDLESS of summation order, so numpy's blocked matmul,
  Spark's fold and DuckDB's ``list_sum`` all produce the identical
  integer;
- centroid updates are ``floor(sum / n)`` where ``sum`` is an exact
  integer: IEEE division of identical exact doubles is identical
  everywhere, so the floor is too. Empty cells keep their previous
  centroid (deterministic; no reseed randomness).

Ties in assignment break to the SMALLEST cell id (numpy ``argmin``
returns the first minimum; the oracle orders ``dist asc, cid asc``).
Initial centroids are the vectors of the ``k`` smallest ids — a
deterministic, oracle-replayable seeding (k-means++ would need a
random stream shared with SQL).

Reference parity note: the reference crawler (stanikol/olx) has no
clustering; this extends the engine's LLM-training-data toolkit
(SemDeDup cluster stage, DataComp cluster-balanced sampling) with the
primitive those pipelines assume as given.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from olx_spark.session import materialize

# quantization scale: 6 decimal places. |x| <= ~0.53 in the fixture;
# anything |x| < 4e3 keeps every downstream product/sum exact in
# float64 (see module docstring).
QUANT_SCALE = 1_000_000


def quantize_vec(vec_col, scale: int = QUANT_SCALE):
    """``floor(x * scale + 0.5)`` per component, as bigints — the
    engine-portable fixed-point quantization (NOT ``round``: Spark
    rounds half-up, DuckDB half-even; ``floor`` of the identically
    computed double agrees everywhere)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    )


def _dist_assigner(cents: np.ndarray):
    """Scalar pandas UDF: nearest-centroid cell per quantized vector.

    ``||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2`` — every term an exact
    integer in float64, so the blocked matmul is exact and the argmin
    is bit-deterministic. Ties -> smallest cell id (argmin = first)."""
    cm = cents.astype(np.float64)
    c_sq = (cm * cm).sum(axis=1)

    @pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=np.int32)
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        # ||x||^2 is constant per row — drop it; argmin unchanged
        d = c_sq[None, :] - 2.0 * (x @ cm.T)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return assign


def kmeans_cluster(
    corpus: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
    reliable: bool | None = None,
) -> tuple[DataFrame, list[list[int]]]:
    """Run ``iters`` Lloyd rounds; return ``(assignment, centroids)``.

    ``assignment`` columns: ``(id_col, cell:int, dist:bigint)`` — the
    FINAL assignment under the post-update centroids (so the frame is a
    pure deterministic function of the input), ``dist`` the exact
    integer squared distance in quantized units. ``centroids`` is the
    final ``k x dim`` integer table (driver-side list-of-lists).

    ``dim`` is REQUIRED plan metadata (embedding width) — never derived
    by a driver job (same contract as ``similarity.lsh_topk``).
    """
    if k < 1 or iters < 0:
        raise ValueError("k >= 1 and iters >= 0 required")
    q = materialize(
        corpus.select(
            F.col(id_col).alias("__id"), quantize_vec(vec_col, scale).alias("__qv")
        ),
        reliable=reliable,
    )
    # deterministic seeding: the k smallest ids' vectors, in id order.
    # TakeOrderedAndProject — k rows to the driver, never a full sort.
    seed_rows = q.orderBy("__id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(seed_rows)}")
    cents = np.array([r["__qv"] for r in seed_rows], dtype=np.int64)
    if cents.shape[1] != dim:
        raise ValueError(f"dim={dim} but vectors are {cents.shape[1]}-wide")

    for _ in range(iters):
        assigned = q.withColumn("cell", _dist_assigner(cents)(F.col("__qv")))
        # ONE map-side-combinable shuffle: <= k*dim combiner cells/task
        sums = (
            assigned.select("cell", F.posexplode("__qv").alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = cents.copy()  # empty cells keep their previous centroid
        for r in sums:
            # floor(exact_int / exact_int) via float64 division:
            # identical in numpy / Spark / DuckDB (module docstring)
            new[r["cell"], r["dim"]] = int(np.floor(float(r["s"]) / float(r["n"])))
        cents = new

    cm = cents.astype(np.float64)
    # exact in int64 (<= 64 * (2^20)^2 ~ 2^46) and in float64 (< 2^53)
    c_sq_i = (cents * cents).sum(axis=1).astype(np.float64)

    @pandas_udf("cell int, dist long")
    def assign_dist(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"cell": pd.Series([], dtype=np.int32),
                                 "dist": pd.Series([], dtype=np.int64)})
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        x_sq = (x * x).sum(axis=1)
        d = x_sq[:, None] - 2.0 * (x @ cm.T) + c_sq_i[None, :]
        cell = d.argmin(axis=1)
        return pd.DataFrame({
            "cell": cell.astype(np.int32),
            "dist": d[np.arange(len(cell)), cell].astype(np.int64),
        })

    out = q.withColumn("__a", assign_dist(F.col("__qv"))).select(
        F.col("__id").alias(id_col),
        F.col("__a.cell").alias("cell"),
        F.col("__a.dist").alias("dist"),
    )
    return out, cents.tolist()


def kmeans_cluster_stats(
    corpus: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
    reliable: bool | None = None,
) -> DataFrame:
    """Assignment joined with per-cell sizes — the query-facing frame:
    ``(id_col, cell, dist, cell_size)``. The size table is k rows, so
    the join broadcasts."""
    assigned, _ = kmeans_cluster(
        corpus, dim, k, iters, id_col=id_col, vec_col=vec_col,
        scale=scale, reliable=reliable,
    )
    assigned = materialize(assigned, reliable=reliable)
    sizes = assigned.groupBy("cell").agg(F.count("*").alias("cell_size"))
    return assigned.join(F.broadcast(sizes), "cell").select(
        id_col, "cell", "dist", "cell_size"
    )
