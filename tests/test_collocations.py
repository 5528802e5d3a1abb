"""PMI collocation mining (operators/collocations.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.collocations import pmi_collocations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pmi_hand_computed(spark):
    # corpus: "a b" x 4 docs and "a c" x 4 docs.
    # tokens: a=8, b=4, c=4, N=16; pairs: (a,b)=4, (a,c)=4, B=8.
    # pmi(a,b) = ln(4*16*16 / (8*8*4)) = ln(4)
    out = {
        (r.w1, r.w2): r
        for r in pmi_collocations(
            _docs(spark, ["a b"] * 4 + ["a c"] * 4), min_count=1
        ).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c")}
    assert out[("a", "b")].c_pair == 4
    assert out[("a", "b")].pmi == pytest.approx(round(math.log(4.0), 6), abs=1e-9)
    assert out[("a", "c")].pmi == pytest.approx(round(math.log(4.0), 6), abs=1e-9)


def test_pmi_min_count_prunes(spark):
    out = pmi_collocations(
        _docs(spark, ["x y"] * 5 + ["x z"]), min_count=2
    ).collect()
    assert {(r.w1, r.w2) for r in out} == {("x", "y")}
    with pytest.raises(ValueError):
        pmi_collocations(_docs(spark, ["x y"]), min_count=0)


def test_pmi_no_cross_document_pairs(spark):
    # doc boundaries form no pair: "p" | "q" corpora have no bigrams
    assert pmi_collocations(_docs(spark, ["p", "q", ""]), min_count=1).count() == 0


def test_pmi_independent_words_near_zero(spark):
    # a balanced 2x2 design: pairs (a x), (a y), (b x), (b y) equally
    # often -> p(w1,w2) == p(w1)p(w2) restricted to slot structure;
    # here every first-slot word co-occurs equally with every second
    # -> all four PMIs equal.
    texts = ["a x", "a y", "b x", "b y"] * 3
    vals = {round(r.pmi, 6) for r in pmi_collocations(_docs(spark, texts), min_count=1).collect()}
    assert len(vals) == 1


def test_pmi_no_python_udfs(spark):
    plan = (
        pmi_collocations(_docs(spark, ["m n o"] * 4), min_count=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
