"""Stupid-backoff bigram LM perplexity filter (operators/lm.py):
exact equality with an in-test pure-Python reference, OOV/sentinel
semantics, tercile bucketing, empty docs, plan gates."""

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from conftest import SF_DIR
from olx_spark.operators.lm import (
    fit_bigram_lm,
    perplexity_filter,
    perplexity_score,
    train_slice,
)


def _norm(t: str) -> str:
    return " ".join(t.split()).lower()


def _stream(t: str) -> list[str]:
    n = _norm(t)
    return ["<s>"] + (n.split(" ") if n else [])


def ref_scores(train_texts, score_texts, alpha=0.4):
    """Pure-Python stupid-backoff twin of fit_bigram_lm +
    perplexity_score."""
    uni, bi = {}, {}
    for t in train_texts:
        s = _stream(t)
        for w in s:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(s, s[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n_total = sum(uni.values())
    out = {}
    for did, t in score_texts.items():
        s = _stream(t)
        pairs = list(zip(s, s[1:]))
        if not pairs:
            out[did] = (0, None, None)
            continue
        lps = []
        for a, b in pairs:
            if (a, b) in bi:
                p = bi[(a, b)] / uni[a]
            elif b in uni:
                p = alpha * uni[b] / n_total
            else:
                p = alpha / n_total
            lps.append(math.log10(p))
        logprob = round(sum(lps) / len(pairs), 6)
        out[did] = (len(pairs), logprob, round(10 ** (-logprob), 4))
    return out


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
]
SCORE = {
    "seen": "the cat sat on the mat",
    "mixed": "the dog sat on a mat",
    "oov": "quantum flux capacitor overload",
    "empty": "   ",
}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_matches_python_reference(spark):
    train = _docs(spark, [(f"t{i}", t) for i, t in enumerate(TRAIN)])
    score = _docs(spark, list(SCORE.items()))
    uni, bi, tot = fit_bigram_lm(train)
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob"], r["ppl"])
        for r in perplexity_score(score, uni, bi, tot).collect()
    }
    want = ref_scores(TRAIN, SCORE)
    for k in SCORE:
        assert got[k][0] == want[k][0], k
        if want[k][1] is None:
            assert got[k][1] is None and got[k][2] is None
        else:
            assert got[k][1] == pytest.approx(want[k][1], abs=2e-6), k
            assert got[k][2] == pytest.approx(want[k][2], abs=2e-4), k


def test_seen_beats_oov(spark):
    # an all-in-training doc must score (much) lower perplexity than an
    # all-OOV doc under the same model
    train = _docs(spark, [(f"t{i}", t) for i, t in enumerate(TRAIN)])
    score = _docs(spark, [("seen", SCORE["seen"]), ("oov", SCORE["oov"])])
    uni, bi, tot = fit_bigram_lm(train)
    got = {r["doc_id"]: r["ppl"] for r in perplexity_score(score, uni, bi, tot).collect()}
    assert got["seen"] < got["oov"] / 10


def test_sentinel_contexts_first_token(spark):
    # "the ..." starts 2 of 3 training docs -> S(the|<s>) = 2/3; a doc
    # that IS just "the" must score exactly log10(2/3)
    train = _docs(spark, [(f"t{i}", t) for i, t in enumerate(TRAIN)])
    score = _docs(spark, [("one", "the")])
    uni, bi, tot = fit_bigram_lm(train)
    row = perplexity_score(score, uni, bi, tot).collect()[0]
    assert row["n_tokens"] == 1
    assert row["logprob"] == pytest.approx(round(math.log10(2 / 3), 6), abs=2e-6)


def test_train_slice_deterministic(spark):
    docs = entry_mod._t(spark, SF_DIR, "documents")
    a = sorted(r["doc_id"] for r in train_slice(docs).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in train_slice(docs).select("doc_id").collect())
    assert a == b
    n = docs.count()
    # ~30% with fate-hash variance
    assert 0.15 * n < len(a) < 0.45 * n


def test_filter_terciles_and_empty(spark):
    out = perplexity_filter(entry_mod._t(spark, SF_DIR, "documents")).collect()
    buckets = {}
    for r in out:
        buckets[r["bucket"]] = buckets.get(r["bucket"], 0) + 1
    scored = sum(v for k, v in buckets.items() if k != "empty")
    assert set(buckets) <= {"head", "middle", "tail", "empty"}
    for k in ("head", "middle", "tail"):
        # percentile terciles split the scored mass into thirds
        assert abs(buckets[k] - scored / 3) <= 2, buckets
    for r in out:
        if r["bucket"] == "empty":
            assert r["n_tokens"] == 0 and r["ppl"] is None


def test_plan_no_python_no_cartesian(spark):
    df = entry_mod.q_perplexity_filter(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
