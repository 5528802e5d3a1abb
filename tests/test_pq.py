"""Product quantization (operators/pq.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from olx_spark.operators.pq import (
    adc_table,
    pq_adc,
    pq_adc_topk,
    pq_encode,
    pq_train,
)

DIM, M, K = 64, 4, 8
SUB = DIM // M


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, dim=DIM, m=M, k=K, iters=1)


@pytest.fixture(scope="module")
def xq(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    q = np.floor(x * 1_000_000 + 0.5).astype(np.int64)
    return ids, q


def test_train_shape_and_determinism(emb, books):
    assert books.shape == (M, K, SUB) and books.dtype == np.int64
    again = pq_train(emb, dim=DIM, m=M, k=K, iters=1)
    assert np.array_equal(books, again)


def test_encode_matches_numpy_argmin(emb, books, xq):
    ids, q = xq
    got = {
        r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()
    }
    for j in range(M):
        c = books[j].astype(np.float64)
        xj = q[:, j * SUB : (j + 1) * SUB].astype(np.float64)
        d = ((xj[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        want = d.argmin(axis=1)
        assert all(got[i][j] == w for i, w in zip(ids, want))


def test_adc_matches_numpy(emb, books, xq):
    ids, q = xq
    query = emb.filter(F.col("vec_id") == int(ids[3])).first()["embedding"]
    dt = adc_table(books, list(query))
    enc = pq_encode(emb, books)
    got = {
        r["vec_id"]: r["adc"]
        for r in enc.select(
            "vec_id", pq_adc(enc, books, list(query)).alias("adc")
        ).collect()
    }
    codes = {r["vec_id"]: r["codes"] for r in enc.collect()}
    for i in ids:
        want = int(sum(dt[j][codes[i][j]] for j in range(M)))
        assert got[i] == want


def test_topk_recall_vs_exact(emb, books, xq):
    ids, q = xq
    query = emb.filter(F.col("vec_id") == int(ids[0])).first()["embedding"]
    qv = np.floor(np.asarray(query, np.float64) * 1e6 + 0.5).astype(np.float64)
    exact = ((q.astype(np.float64) - qv[None, :]) ** 2).sum(axis=1)
    true10 = set(ids[np.lexsort((ids, exact))][:10])
    got = pq_adc_topk(emb, books, list(query), topk=10).collect()
    assert [r["rk"] for r in got] == list(range(1, 11))
    hits = sum(1 for r in got if r["vec_id"] in true10)
    # 4x16-dim sub-quantizers at k=8 are coarse; the self-vector and
    # a meaningful share of true neighbors must still surface
    assert int(ids[0]) in {r["vec_id"] for r in got}
    assert hits >= 3


def test_training_reduces_distortion(emb, xq):
    ids, q = xq

    def distortion(bk):
        enc = {r["vec_id"]: r["codes"] for r in pq_encode(emb, bk).collect()}
        tot = 0
        for row, i in zip(q, ids):
            rec = np.concatenate([bk[j][enc[i][j]] for j in range(M)])
            tot += int(((row - rec) ** 2).sum())
        return tot

    d0 = distortion(pq_train(emb, dim=DIM, m=M, k=K, iters=0))
    d2 = distortion(pq_train(emb, dim=DIM, m=M, k=K, iters=2))
    assert d2 < d0


def test_bad_geometry_refused(emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, dim=DIM, m=5)
    with pytest.raises(ValueError, match="exceeds"):
        pq_train(emb, dim=DIM, m=M, k=10**6)


def test_adc_stays_jvm_side(emb, books):
    # encode needs one Arrow-batched UDF; the ADC lookup itself adds
    # no second Python eval and no Exchange
    query = [0.0] * DIM
    enc = pq_encode(emb, books)
    plan = (
        enc.select("vec_id", pq_adc(enc, books, query).alias("adc"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_topk_plan_take_ordered(emb, books):
    query = [0.0] * DIM
    plan = (
        pq_adc_topk(emb, books, query, topk=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
