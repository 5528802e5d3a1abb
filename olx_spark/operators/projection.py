"""Random sign projection — embedding compression for the ANN family.

Johnson–Lindenstrauss with a {-1, +1} (Achlioptas-style) projection
matrix: ``y = Q R^T`` where ``Q`` is the exact-integer quantized
embedding and ``R``'s signs derive from the SAME portable 60-bit md5
hash the rest of the engine uses — so the matrix is a pure function of
``(tag, i, j)``, identical in driver Python, Spark, and the DuckDB
oracle, with no stored state to ship. Compressed vectors feed the
LSH/IVF ANN stages at a fraction of the shuffle width (dim 768 -> 64
cuts candidate-join bytes ~12x), preserving cosine geometry to within
the JL bound.

Exactness (what makes the FULL value oracle possible): components
quantize to integers (``round(x * scale)``), signs are exact +-1, so
every output component is a sum of <= in_dim integer terms — bounded
by ``in_dim * scale * max|x|``, far inside int64 — and bit-identical
everywhere.

Scale design: ONE Arrow-batched pandas UDF doing an int64 numpy matmul
per batch (the sign matrix rides the closure — out_dim x in_dim int8,
kilobytes); zero shuffle, output inherits input partitioning. The
explode to (vec_id, dim_j, component) rows is for the oracle
comparator; production callers keep the array form
(``project_embeddings``). No driver collect anywhere.

Reference parity: no analog in stanikol/olx (no vector ops at all);
backs the engine's ANN/similarity brief (SURVEY §2 ext).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def _md5_60(s: str) -> int:
    """Driver-Python twin of functions.text.md5_60 (first 15 hex chars
    of the md5 -> int). Pinned by tests against the Spark expression."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def sign_matrix(in_dim: int, out_dim: int, tag: str = "rp-v1") -> np.ndarray:
    """Deterministic (out_dim x in_dim) +-1 matrix:
    ``1 - 2 * (md5_60(f"{tag}:{i}:{j}") % 2)`` — replayable verbatim in
    Spark SQL and DuckDB."""
    m = np.empty((out_dim, in_dim), dtype=np.int8)
    for j in range(out_dim):
        for i in range(in_dim):
            m[j, i] = 1 - 2 * (_md5_60(f"{tag}:{i}:{j}") % 2)
    return m


def project_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = 16,
    scale: int = 1_000_000,
    tag: str = "rp-v1",
) -> DataFrame:
    """Append ``projected`` (array<long>, length ``out_dim``): the
    exact-integer sign projection of the quantized embedding. Wrong-
    length vectors raise (a schema error, not data noise)."""
    if not 1 <= out_dim:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    if in_dim < out_dim:
        raise ValueError(f"in_dim {in_dim} < out_dim {out_dim}: not a compression")
    mat = sign_matrix(in_dim, out_dim, tag).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def _proj(vecs: pd.Series) -> pd.Series:
        arrs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in vecs]
        )  # batch x in_dim
        if arrs.shape[1] != in_dim:
            raise ValueError(
                f"embedding length {arrs.shape[1]} != in_dim {in_dim}"
            )
        # floor(x*scale + 0.5): round-half-up, identical IEEE ops in
        # numpy / Spark / DuckDB (np.rint would be half-to-EVEN, which
        # SQL round() is not — the one drift trap in this chain)
        q = np.floor(arrs * scale + 0.5).astype(np.int64)
        y = q @ mat.T  # int64 exact
        return pd.Series(list(y))

    return df.withColumn("projected", _proj(F.col(vec_col)))


def projected_components(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = 16,
    scale: int = 1_000_000,
    tag: str = "rp-v1",
) -> DataFrame:
    """Oracle-comparable exploded form: one row per output component
    (id, dim_j, component)."""
    p = project_embeddings(df, id_col, vec_col, in_dim, out_dim, scale, tag)
    return p.select(
        F.col(id_col),
        F.posexplode("projected").alias("dim_j", "component"),
    )
