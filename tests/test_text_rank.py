"""BM25 top-terms: semantics against an in-test Python reference."""

from __future__ import annotations

import math

from olx_spark.operators.text_rank import bm25_top_terms


def _py_bm25(corpus: dict[int, str], k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in corpus.items() if t.strip()}
    n = len(toks)
    avg = sum(len(v) for v in toks.values()) / n
    df: dict[str, int] = {}
    for ts in toks.values():
        for term in set(ts):
            df[term] = df.get(term, 0) + 1
    out = {}
    for d, ts in toks.items():
        tf: dict[str, int] = {}
        for term in ts:
            tf[term] = tf.get(term, 0) + 1
        scores = {
            term: round(
                math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                * c * (k1 + 1.0)
                / (c + k1 * (1.0 - b + b * len(ts) / avg)),
                6,
            )
            for term, c in tf.items()
        }
        out[d] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


CORPUS = {
    1: "the cat sat on the mat",
    2: "the dog sat on the log",
    3: "cat dog cat dog cat",
    4: "quantum flux capacitor flux",
    5: "   ",  # blank: no tokens, no output rows
}


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(d, t) for d, t in CORPUS.items()], ["doc_id", "text"]
    )
    got = bm25_top_terms(docs, k=3).collect()
    want = _py_bm25(CORPUS)
    assert {r["doc_id"] for r in got} == {1, 2, 3, 4}  # blank doc absent
    for r in got:
        w_term, w_score = want[r["doc_id"]][r["rk"] - 1]
        assert (r["term"], round(r["score"], 6)) == (w_term, w_score), r


def test_bm25_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [(d, t) for d, t in CORPUS.items()], ["doc_id", "text"]
    )
    top = {
        r["doc_id"]: r["term"]
        for r in bm25_top_terms(docs, k=1).collect()
    }
    # 'mat'/'log'/'capacitor' are unique to their docs; 'the'/'on'
    # appear corpus-wide and must not win
    assert top[1] == "mat" and top[2] == "log" and top[4] in ("capacitor", "quantum", "flux")
