"""Product quantization (PQ) for embedding compression + ADC search
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) — the third ANN memory regime next to the
sign-LSH and IVF paths in ``operators/similarity.py``: a 64-dim
float32 vector (256 bytes) compresses to ``m`` one-byte codes
(m=4 here → 64x), and query-time asymmetric distance computation
(ADC) needs ONLY the codes plus an m x k lookup table — the layout
that lets a 100-TB embedding corpus be scanned for neighbors from
RAM-resident codes.

Scale shape:

- **Training** follows the ``clustering.kmeans_cluster`` playbook
  with the m sub-quantizers trained JOINTLY in one pass: assignment
  is a zero-shuffle vectorized pandas UDF emitting all m codes per
  row, and each Lloyd round is ONE map-side-combinable
  ``(subspace, cell, dim)`` sum shuffle — at most ``m*k*(dim/m) =
  k*dim`` combiner cells per task, identical budget to plain
  k-means. Only the ``m x k x (dim/m)`` codebook reaches the driver.
- **Encoding** is the same zero-shuffle UDF (codes only).
- **ADC is pure JVM**: the query's distance table is an ``m x k``
  integer literal folded into the plan, and the per-row distance is
  ``m`` nested ``element_at`` lookups + adds inside whole-stage
  codegen — scan-adjacent, no Python, no shuffle, no join.

Exact-integer determinism (same doctrine as ``clustering.py``, which
documents the float64-exactness argument): quantized components
|q| <= ~2^20, per-subspace squared distances <= 16 * 2^42 < 2^47,
ADC sums < 2^49 — every value exact in float64 regardless of
summation order, so Spark, numpy and DuckDB agree bit-for-bit and
the whole pipeline (training included) carries a FULL value oracle.
Ties break to the smallest cell id everywhere. Seeding: sub-vectors
of the k smallest ids (deterministic, oracle-replayable).

The reference crawler has no vector search; PQ extends the engine's
training-data brief (dedup/retrieval over embedding columns at
corpus scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from olx_spark.operators.clustering import QUANT_SCALE, quantize_vec
from olx_spark.session import materialize


def _code_assigner(books: np.ndarray):
    """Scalar pandas UDF: all m sub-quantizer codes per quantized
    vector. ``books``: (m, k, sub) int64. Ties -> smallest code
    (argmin = first minimum)."""
    m, k, sub = books.shape
    mats = books.astype(np.float64)
    sq = (mats * mats).sum(axis=2)  # (m, k)

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            xj = x[:, j * sub : (j + 1) * sub]
            d = sq[j][None, :] - 2.0 * (xj @ mats[j].T)
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return assign


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
    reliable: bool | None = None,
) -> np.ndarray:
    """Train the m sub-codebooks (``iters`` joint Lloyd rounds over
    the quantized corpus); returns int64 ``(m, k, dim/m)``. Empty
    cells keep their previous centroid."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if k < 1 or iters < 0:
        raise ValueError("k >= 1 and iters >= 0 required")
    sub = dim // m
    q = materialize(
        corpus.select(
            F.col(id_col).alias("__id"), quantize_vec(vec_col, scale).alias("__qv")
        ),
        reliable=reliable,
    )
    seed_rows = q.orderBy("__id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(seed_rows)}")
    seeds = np.array([r["__qv"] for r in seed_rows], dtype=np.int64)
    if seeds.shape[1] != dim:
        raise ValueError(f"dim={dim} but vectors are {seeds.shape[1]}-wide")
    books = seeds.reshape(k, m, sub).transpose(1, 0, 2).copy()  # (m, k, sub)

    for _ in range(iters):
        coded = q.withColumn("__codes", _code_assigner(books)(F.col("__qv")))
        j_col = F.floor(F.col("dim") / F.lit(sub)).cast("int")
        sums = (
            coded.select("__codes", F.posexplode("__qv").alias("dim", "v"))
            .select(
                j_col.alias("j"),
                F.element_at("__codes", j_col + 1).alias("cell"),
                (F.col("dim") % sub).alias("within"),
                "v",
            )
            .groupBy("j", "cell", "within")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = books.copy()
        for r in sums:
            new[r["j"], r["cell"], r["within"]] = int(
                np.floor(float(r["s"]) / float(r["n"]))
            )
        books = new
    return books


def pq_encode(
    corpus: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """(id, codes array<int> of length m): each vector's nearest
    sub-centroid per subspace. Zero shuffle."""
    return corpus.select(
        F.col(id_col),
        _code_assigner(books)(quantize_vec(vec_col, scale)).alias("codes"),
    )


def adc_table(books: np.ndarray, query: list[float], scale: int = QUANT_SCALE) -> np.ndarray:
    """The query's m x k integer distance table: exact squared
    distance from each quantized query sub-vector to each
    sub-centroid."""
    m, k, sub = books.shape
    qv = np.floor(np.asarray(query, dtype=np.float64) * scale + 0.5).astype(np.int64)
    if qv.shape[0] != m * sub:
        raise ValueError(f"query dim {qv.shape[0]} != codebook dim {m * sub}")
    qs = qv.reshape(m, sub)
    diff = qs[:, None, :] - books  # (m, k, sub)
    return (diff * diff).sum(axis=2)  # int64, exact


def pq_adc(
    encoded: DataFrame,
    books: np.ndarray,
    query: list[float],
    codes_col: str = "codes",
    scale: int = QUANT_SCALE,
) -> Column:
    """ADC distance column for ``encoded`` rows: m literal-table
    lookups + adds, whole-stage codegen (no Python, no join)."""
    dt = adc_table(books, query, scale)
    m = dt.shape[0]
    lit = F.array(
        *[F.array(*[F.lit(int(v)) for v in row]) for row in dt.tolist()]
    )
    terms = [
        F.element_at(
            F.element_at(lit, j + 1), F.element_at(codes_col, j + 1) + 1
        )
        for j in range(m)
    ]
    adc = terms[0]
    for t in terms[1:]:
        adc = adc + t
    return adc.cast("long")


def pq_adc_topk(
    corpus: DataFrame,
    books: np.ndarray,
    query: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """(rk, id, adc_dist): the ``topk`` nearest codes by ADC,
    total-ordered by (adc, id). TakeOrderedAndProject — no global
    sort."""
    from olx_spark.operators.ranking import ordered_limit

    enc = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col, scale=scale)
    scored = enc.select(
        id_col, pq_adc(enc, books, query, scale=scale).alias("adc_dist")
    )
    top = ordered_limit(scored, topk, ["adc_dist", id_col])
    return top.select(
        (F.col("rank_in_limit") + 1).alias("rk"), id_col, "adc_dist"
    )
