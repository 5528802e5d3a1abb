"""DSIR importance resampling (operators/dsir.py): pure-Python replay
equality, directional semantics (target-like docs up-weighted),
determinism, edge cases, plan gates."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from conftest import SF_DIR
from olx_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_resample,
    dsir_weights,
    reference_dsir,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


RAW = [
    ("r1", "the quick brown fox jumps over the lazy dog"),
    ("r2", "spark plans shuffle exchange broadcast join"),
    ("r3", "the lazy dog sleeps while the quick fox runs"),
    ("r4", "completely unrelated noise tokens xyzzy plugh"),
    ("r5", "quick brown foxes and lazy dogs again and again"),
    ("blank", "   "),
]
TARGET = [
    "the quick brown fox and the lazy dog",
    "quick foxes jump over lazy dogs",
]


def test_matches_python_reference(spark):
    raw = _docs(spark, RAW)
    tgt = _docs(spark, [(f"t{i}", t) for i, t in enumerate(TARGET)])
    got = dsir_resample(raw, tgt, k=4, n_buckets=64).collect()
    want = reference_dsir(RAW, TARGET, k=4, n_buckets=64)
    assert len(got) == len(want) == 4
    got = sorted(got, key=lambda r: r["rank_in_limit"])
    for g, w in zip(got, want):
        assert g["doc_id"] == w[0]
        assert g["n_feats"] == w[1]
        assert g["log_weight"] == pytest.approx(w[2], abs=2e-6)
        assert g["gkey"] == pytest.approx(w[3], abs=2e-6)
        assert g["rank_in_limit"] == w[4]


def test_target_like_up_weighted(spark):
    # EQUAL-LENGTH raw docs (DSIR log-weights are summed, not
    # length-normalized — longer docs legitimately swing further, so
    # direction is only a fair test at matched length): the doc drawn
    # from the target's vocabulary must out-weigh the off-distribution
    # one (bucket collisions aside at 256 buckets)
    raw = _docs(
        spark,
        [
            ("on", "alpha beta gamma delta epsilon"),
            ("off", "zippy quark mumble frotz veldt"),
            ("blank", "   "),
        ],
    )
    tgt = _docs(
        spark,
        [
            ("t0", "alpha beta gamma delta epsilon"),
            ("t1", "alpha beta gamma delta epsilon"),
        ],
    )
    ratios = dsir_log_ratios(tgt, raw)
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(raw, ratios).collect()
    }
    assert w["on"] > 0.0 > w["off"]
    assert w["blank"] == 0.0  # no features -> no evidence -> weight 1


def test_blank_and_coverage(spark):
    raw = _docs(spark, RAW)
    tgt = _docs(spark, [(f"t{i}", t) for i, t in enumerate(TARGET)])
    ratios = dsir_log_ratios(tgt, raw)
    rows = dsir_weights(raw, ratios).collect()
    assert {r["doc_id"] for r in rows} == {d for d, _ in RAW}
    blank = next(r for r in rows if r["doc_id"] == "blank")
    assert blank["n_feats"] == 0 and blank["log_weight"] == 0.0
    # unigrams + bigrams: 9 tokens -> 9 + 8 = 17 features
    r1 = next(r for r in rows if r["doc_id"] == "r1")
    assert r1["n_feats"] == 17
    # the lam table is dense: every bucket present exactly once
    assert ratios.count() == 256
    assert ratios.select("bucket").distinct().count() == 256


def test_deterministic_rerun(spark):
    raw = _docs(spark, RAW)
    tgt = _docs(spark, [(f"t{i}", t) for i, t in enumerate(TARGET)])
    a = [tuple(r) for r in dsir_resample(raw, tgt, k=3).collect()]
    b = [tuple(r) for r in dsir_resample(raw, tgt, k=3).collect()]
    assert a == b


def test_plan_gates(spark):
    df = entry_mod.q_dsir_resample(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the 256-row lam table must ride a broadcast join against the
    # exploded corpus (never a corpus-scale shuffle join)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the top-k is a distributed partial top-k, not a global window
    assert "TakeOrderedAndProject" in plan
    # pure JVM end to end
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
