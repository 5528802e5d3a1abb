"""Random sign projection (operators/projection.py).

The driver-Python md5 twin is pinned against the Spark expression, the
projection against a plain numpy replay, geometry preservation against
the JL expectation, and the zero-shuffle claim against the plan.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from olx_spark.functions.text import md5_60
from olx_spark.operators.projection import (
    _md5_60,
    project_embeddings,
    projected_components,
    sign_matrix,
)


def test_python_md5_twin_matches_spark(spark):
    samples = ["rp-v1:0:0", "rp-v1:63:15", "x", ""]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", md5_60(F.col("s")).alias("h")).collect()}
    for s in samples:
        assert got[s] == _md5_60(s), s


def test_sign_matrix_shape_and_determinism():
    m = sign_matrix(64, 16)
    assert m.shape == (16, 64)
    assert set(np.unique(m)) == {-1, 1}
    assert np.array_equal(m, sign_matrix(64, 16))
    assert not np.array_equal(m, sign_matrix(64, 16, tag="rp-v2"))
    # md5 parity is unbiased: the matrix is roughly balanced
    assert 0.35 < (m == 1).mean() < 0.65


def test_projection_matches_numpy_replay(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["vec_id"], r["dim_j"]): r["component"]
        for r in projected_components(df, in_dim=8, out_dim=4).collect()
    }
    m = sign_matrix(8, 4).astype(np.int64)
    q = np.floor(vecs.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    want = q @ m.T
    assert len(got) == 80
    for i in range(20):
        for j in range(4):
            assert got[(i, j)] == want[i, j]


def test_geometry_roughly_preserved(spark):
    # JL sanity: dot-product sign agreement between 64d originals and
    # their 16d projections on clearly-correlated pairs
    rng = np.random.default_rng(9)
    base = rng.normal(size=64)
    near = base + 0.1 * rng.normal(size=64)
    far = -base + 0.1 * rng.normal(size=64)
    df = spark.createDataFrame(
        [(0, [float(x) for x in base]), (1, [float(x) for x in near]),
         (2, [float(x) for x in far])],
        "vec_id long, embedding array<float>",
    )
    rows = project_embeddings(df, in_dim=64, out_dim=16).collect()
    p = {r["vec_id"]: np.array(r["projected"], dtype=np.float64) for r in rows}
    cos = lambda a, b: a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos(p[0], p[1]) > 0.5
    assert cos(p[0], p[2]) < -0.5


def test_validation_and_wrong_length(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="not a compression"):
        project_embeddings(df, in_dim=2, out_dim=4)
    bad = project_embeddings(df, in_dim=8, out_dim=2)
    with pytest.raises(Exception, match="embedding length"):
        bad.collect()


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * 8)], "vec_id long, embedding array<float>"
    )
    plan = (
        project_embeddings(df, in_dim=8, out_dim=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
