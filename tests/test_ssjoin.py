"""Exact set-similarity join (operators/ssjoin.py).

The completeness claim — prefix filtering loses NO pair above the
threshold — is asserted empirically against a brute-force replay over
a randomized corpus, plus hand-pinned values, pruning evidence, and
validation.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from olx_spark.operators.ssjoin import jaccard_similarity_join


def _brute(docs, t):
    sets = {i: set(s.lower().split()) for i, s in docs}
    out = {}
    for (ia, sa), (ib, sb) in itertools.combinations(docs, 2):
        A, B = sets[ia], sets[ib]
        if not A or not B:
            continue
        inter = len(A & B)
        j = inter / len(A | B)
        if j >= t:
            lo, hi = min(ia, ib), max(ia, ib)
            out[(lo, hi)] = (inter, j)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    # randomized 40-doc corpus over a 30-word vocab: dense enough that
    # many pairs land on both sides of the threshold
    # purely alphabetic vocab: the operator tokenizes on [^a-z]+, so
    # digit-bearing words would collapse ("w00" -> "w")
    rng = np.random.default_rng(17)
    vocab = [
        chr(ord("a") + i % 26) + chr(ord("a") + (i * 3 + 1) % 26) + ("x" if i >= 26 else "q")
        for i in range(30)
    ]
    assert len(set(vocab)) == 30
    docs = []
    for i in range(40):
        k = int(rng.integers(3, 12))
        words = rng.choice(vocab, size=k, replace=False)
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return docs, df


@pytest.mark.parametrize("t", [0.4, 0.6, 0.8])
def test_matches_brute_force_exactly(spark, corpus, t):
    docs, df = corpus
    want = _brute(docs, t)
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["jaccard"])
        for r in jaccard_similarity_join(df, threshold=t).collect()
    }
    assert set(got) == set(want)
    for k, (inter, j) in want.items():
        assert got[k][0] == inter
        assert abs(got[k][1] - j) < 1e-12


def test_hand_pinned_pair(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "zeta eta theta iota"),
            (4, ""),  # empty docs never pair
        ],
        "doc_id long, text string",
    )
    rows = jaccard_similarity_join(df, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"], r["inter"]) == (1, 2, 3)
    assert abs(r["jaccard"] - 3 / 5) < 1e-12


def test_identical_docs_hit_threshold_one(spark):
    df = spark.createDataFrame(
        [(1, "same words here"), (2, "same words here"), (3, "other stuff")],
        "doc_id long, text string",
    )
    rows = jaccard_similarity_join(df, threshold=1.0).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="threshold"):
            jaccard_similarity_join(df, threshold=bad)
