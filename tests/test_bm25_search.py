"""BM25 query-time retrieval (operators/text_rank.bm25_search).

Scores pinned against a plain-Python BM25 replay, absent query terms
proven inert, the top-k cut and order asserted, and the global top-k
plan gate (TakeOrderedAndProject, never a global window).
"""

from __future__ import annotations

import math

import pytest

from olx_spark.operators.text_rank import bm25_search

DOCS = [
    (1, "spark shuffle join hash join"),
    (2, "hash table probe build hash hash"),
    (3, "sort merge join large tables"),
    (4, "unrelated text about nothing"),
]


def _py_bm25(docs, query, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    tf = {i: {} for i, _ in docs}
    for i, ts in toks.items():
        for t in ts:
            tf[i][t] = tf[i].get(t, 0) + 1
    dlen = {i: len(ts) for i, ts in toks.items()}
    n = len(docs)
    avg = sum(dlen.values()) / n
    out = {}
    for i, _ in docs:
        s = 0.0
        for q in set(query):
            if q not in tf[i]:
                continue
            df = sum(1 for j in tf if q in tf[j])
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            f = tf[i][q]
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dlen[i] / avg))
        if s > 0:
            out[i] = round(s, 6)
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scores_match_python_replay(spark, df):
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_search(df, ["hash", "join"], k=10).collect()
    }
    want = _py_bm25(DOCS, ["hash", "join"])
    assert got.keys() == want.keys()
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9, i


def test_absent_term_is_inert(spark, df):
    a = sorted(
        (r["doc_id"], r["score"])
        for r in bm25_search(df, ["hash", "join"], k=10).collect()
    )
    b = sorted(
        (r["doc_id"], r["score"])
        for r in bm25_search(df, ["hash", "join", "zzzmissing"], k=10).collect()
    )
    assert a == b


def test_topk_cut_and_order(spark, df):
    rows = bm25_search(df, ["hash", "join"], k=2).collect()
    assert len(rows) == 2
    ranked = sorted(rows, key=lambda r: r["rank_in_limit"])
    assert ranked[0]["score"] >= ranked[1]["score"]
    full = {
        r["doc_id"]: r["score"]
        for r in bm25_search(df, ["hash", "join"], k=10).collect()
    }
    top2 = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["doc_id"], r["score"]) for r in ranked] == top2


def test_n_terms_hit(spark, df):
    got = {
        r["doc_id"]: r["n_terms_hit"]
        for r in bm25_search(df, ["hash", "join"], k=10).collect()
    }
    assert got == {1: 2, 2: 1, 3: 1}


def test_validation(spark, df):
    with pytest.raises(ValueError, match="query_terms"):
        bm25_search(df, [])
    with pytest.raises(ValueError, match="query_terms"):
        bm25_search(df, [""])


def test_global_topk_plan(spark, df):
    plan = (
        bm25_search(df, ["hash"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
