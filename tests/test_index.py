"""Inverted index (operators/index.py).

Pinned against an independent Python replay (tokenize, cut, gap-encode,
fingerprint), plus the invariants that matter at scale: the salted
pre-cut bounds every task's posting slice while remaining row-identical
to the single-window cut; truncation is explicit and totals stay exact;
positions are dense ordinals over non-empty tokens.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.index import inverted_index, tokenize_positions

SF_DIR = "/root/testdata/sf0.001"


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replay(docs: list[tuple[int, str]], max_postings: int, min_df: int = 1):
    postings: dict[str, list[tuple[int, int]]] = {}
    for doc_id, text in docs:
        toks = [t for t in re.split("[^a-z]+", text.lower()) if t]
        for pos, t in enumerate(toks):
            postings.setdefault(t, []).append((doc_id, pos))
    out = {}
    for term, pl in postings.items():
        pl.sort()
        df = len({d for d, _ in pl})
        if df < min_df:
            continue
        cut = pl[:max_postings]
        parts, prev = [], 0
        for d, p in cut:
            parts.append(f"{d - prev}.{p}")
            prev = d
        out[term] = (df, len(pl), int(len(pl) > max_postings), _md5_60(",".join(parts)))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_matches_python_replay(spark, docs):
    got = {
        r["term"]: (r["df"], r["n_postings"], r["truncated"], r["postings_fp"])
        for r in inverted_index(docs, max_postings=64).collect()
    }
    raw = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    exp = _replay(raw, max_postings=64)
    assert got == exp


def test_untruncated_path_and_min_df(spark):
    rows = [
        (1, "alpha beta alpha"),
        (2, "beta gamma"),
        (3, "alpha"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["term"]: (r["df"], r["n_postings"], r["truncated"], r["postings_fp"])
        for r in inverted_index(df, max_postings=10, min_df=2).collect()
    }
    exp = _replay(rows, max_postings=10, min_df=2)
    assert got == exp
    assert "gamma" not in got  # df=1 < min_df
    assert all(t == 0 for (_, _, t, _) in got.values())


def test_positions_are_dense_over_nonempty_tokens(spark):
    df = spark.createDataFrame(
        [(7, "  Foo,  bar!! 42 baz  ")], "doc_id long, text string"
    )
    got = {(r["term"], r["pos"]) for r in tokenize_positions(df).collect()}
    assert got == {("foo", 0), ("bar", 1), ("baz", 2)}


def test_empty_and_nonletter_docs_drop(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "1234 !!"), (3, "ok")], "doc_id long, text string"
    )
    got = inverted_index(df, max_postings=4).collect()
    assert {r["term"] for r in got} == {"ok"}


def test_precut_equals_plain_window_cut(spark, docs):
    # the two-phase salted cut must be row-identical to a single
    # per-term window rank (same contract as the frontier budgets)
    from pyspark.sql import Window

    from olx_spark.operators.index import tokenize_positions

    toks = tokenize_positions(docs)
    w = Window.partitionBy("term").orderBy("doc_id", "pos")
    plain = toks.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= 16
    ).drop("__r")
    via_op = inverted_index(docs, max_postings=16)
    # recompute fingerprints from the plain cut and compare
    raw = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    exp = _replay(raw, max_postings=16)
    got = {
        r["term"]: (r["df"], r["n_postings"], r["truncated"], r["postings_fp"])
        for r in via_op.collect()
    }
    assert got == exp
    assert plain.count() == sum(min(n, 16) for (_, n, _, _) in exp.values())


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="max_postings"):
        inverted_index(docs, max_postings=0)
