"""Distributed k-means (operators/clustering.py).

Correctness is pinned against an independent pure-numpy Lloyd replay
(same quantize / floor-div / first-min-tie semantics); determinism is
pinned across partitionings (the exact-integer design's whole point);
degenerate shapes (k > n, empty cells via duplicated points, iters=0)
are exercised explicitly. The full SQL oracle lives in
__spark_entry__._sql_kmeans and is exercised by the driver gate +
test_oracle_parity.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from olx_spark.operators.clustering import (
    QUANT_SCALE,
    kmeans_cluster,
    kmeans_cluster_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def _numpy_kmeans(ids, vecs, k, iters, scale=QUANT_SCALE):
    """Independent replay: quantize, seed with the k smallest ids,
    Lloyd with floor-div updates, empty cells carry over."""
    order = np.argsort(ids)
    x = np.floor(np.asarray(vecs, dtype=np.float64) * scale + 0.5).astype(np.int64)
    cents = x[order[:k]].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]).astype(np.float64) ** 2).sum(-1)
        a = d.argmin(1)
        new = cents.copy()
        for j in range(k):
            m = x[a == j]
            if len(m):
                new[j] = np.floor(
                    m.sum(0).astype(np.float64) / float(len(m))
                ).astype(np.int64)
        cents = new
    d = ((x[:, None, :] - cents[None, :, :]).astype(np.float64) ** 2).sum(-1)
    a = d.argmin(1)
    dist = d[np.arange(len(a)), a].astype(np.int64)
    return a, dist, cents


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _replay_frame(emb):
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    vecs = np.stack(pdf["embedding"].to_numpy())
    return ids, vecs


def test_matches_numpy_replay(spark, emb):
    out, cents = kmeans_cluster(emb, dim=64, k=8, iters=3)
    got = {r["vec_id"]: (r["cell"], r["dist"]) for r in out.collect()}
    ids, vecs = _replay_frame(emb)
    a, dist, exp_cents = _numpy_kmeans(ids, vecs, k=8, iters=3)
    assert np.array_equal(np.asarray(cents, dtype=np.int64), exp_cents)
    for i, vid in enumerate(ids):
        assert got[int(vid)] == (int(a[i]), int(dist[i]))


def test_deterministic_across_partitionings(spark, emb):
    base = kmeans_cluster_stats(emb, dim=64, k=8, iters=2)
    alt = kmeans_cluster_stats(emb.repartition(7, "vec_id"), dim=64, k=8, iters=2)
    a = {tuple(r) for r in base.collect()}
    b = {tuple(r) for r in alt.collect()}
    assert a == b


def test_cell_sizes_consistent(spark, emb):
    out = kmeans_cluster_stats(emb, dim=64, k=8, iters=1)
    pdf = out.toPandas()
    by_cell = pdf.groupby("cell")["vec_id"].count().to_dict()
    for _, r in pdf.iterrows():
        assert by_cell[r["cell"]] == r["cell_size"]
    assert pdf["vec_id"].nunique() == len(pdf)


def test_iters_zero_assigns_to_seed_centroids(spark, emb):
    out, cents = kmeans_cluster(emb, dim=64, k=4, iters=0)
    ids, vecs = _replay_frame(emb)
    a, dist, exp_cents = _numpy_kmeans(ids, vecs, k=4, iters=0)
    assert np.array_equal(np.asarray(cents, dtype=np.int64), exp_cents)
    got = {r["vec_id"]: r["cell"] for r in out.collect()}
    for i, vid in enumerate(ids):
        assert got[int(vid)] == int(a[i])
    # the seed vectors themselves sit at distance 0 from their centroid
    seed_ids = sorted(ids)[:4]
    zero = {r["vec_id"]: r["dist"] for r in out.collect()}
    for sid in seed_ids:
        assert zero[int(sid)] == 0


def test_empty_cell_keeps_previous_centroid(spark):
    # 6 identical points + 2 seeds far away: after one round the two
    # far seeds' cells can go empty — centroids must carry over, never
    # NaN/reseed (deterministic contract)
    rows = [(i, [1.0] * 64) for i in range(6)] + [
        (10, [-1.0] * 64),
        (11, [-2.0] * 64),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out, cents = kmeans_cluster(df, dim=64, k=3, iters=2)
    got = {r["vec_id"]: r["cell"] for r in out.collect()}
    # all identical points land in one cell; far points elsewhere
    assert len({got[i] for i in range(6)}) == 1
    assert len(set(got.values())) >= 2
    assert np.isfinite(np.asarray(cents, dtype=np.float64)).all()


def test_k_exceeds_corpus_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds corpus size"):
        kmeans_cluster(df, dim=64, k=5, iters=1)


def test_wrong_dim_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim="):
        kmeans_cluster(df, dim=64, k=2, iters=1)


def test_assignment_plan_has_no_shuffle(spark, emb):
    # the final assignment pass must be scan -> project/eval -> (no
    # Exchange): centroids ride the UDF closure, never a join
    out, _ = kmeans_cluster(emb, dim=64, k=4, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
