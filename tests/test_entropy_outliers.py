"""Entropy quality signals + winsorization (operators/entropy.py,
operators/outliers.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.entropy import char_word_entropy
from olx_spark.operators.outliers import winsorize


def test_entropy_hand_computed(spark):
    # "aab" -> chars a:2, b:1, n=3; H = ln3 - (2ln2 + 0)/3
    df = spark.createDataFrame([(1, "aab"), (2, ""), (3, "x y")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in char_word_entropy(df).collect()}
    want = math.log(3) - (2 * math.log(2)) / 3
    assert out[1].char_entropy == pytest.approx(round(want, 6), abs=1e-9)
    assert out[1].word_entropy == 0.0  # single word
    assert out[1].n_chars_norm == 3 and out[1].n_words == 1
    # empty doc: zero entropy, zero counts, row present
    assert out[2].char_entropy == 0.0 and out[2].n_chars_norm == 0
    # "x y": 3 normalized chars (space counts), 2 distinct words
    assert out[3].n_chars_norm == 3 and out[3].n_words == 2
    assert out[3].word_entropy == pytest.approx(round(math.log(2), 6), abs=1e-9)


def test_entropy_detects_repetition(spark):
    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa aaaa"), (2, "the quick brown fox jumps")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in char_word_entropy(df).collect()}
    assert out[1].char_entropy < out[2].char_entropy
    assert out[1].word_entropy < out[2].word_entropy


def test_entropy_case_and_whitespace_normalized(spark):
    df = spark.createDataFrame([(1, "AB  ab"), (2, "ab ab")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in char_word_entropy(df).collect()}
    assert out[1].char_entropy == out[2].char_entropy
    assert out[1].n_chars_norm == out[2].n_chars_norm == 5


def test_winsorize_hand_computed(spark):
    # group g: values 0..100 -> p01 = 1.0, p99 = 99.0 (interpolated
    # over 101 points lands on integers)
    rows = [(i, "g", float(i)) for i in range(101)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r.event_id: r for r in winsorize(df, "value", ["event_type"]).collect()}
    assert out[0].value_w == 1.0 and out[0].clipped == -1
    assert out[100].value_w == 99.0 and out[100].clipped == 1
    assert out[50].value_w == 50.0 and out[50].clipped == 0
    assert sum(1 for r in out.values() if r.clipped != 0) == 2


def test_winsorize_nulls_and_groups_independent(spark):
    rows = [(1, "a", None), (2, "a", 5.0), (3, "b", 500.0), (4, "b", 501.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r.event_id: r for r in winsorize(df, "value", ["event_type"]).collect()}
    assert out[1].value_w is None and out[1].clipped == 0
    # group b's bounds come from group b only
    assert out[3].clipped == 0 or out[3].value_w >= 500.0


def test_winsorize_validation(spark):
    df = spark.createDataFrame([(1, "a", 1.0)],
                               "event_id long, event_type string, value double")
    with pytest.raises(ValueError):
        winsorize(df, "value", ["event_type"], p_lo=0.9, p_hi=0.1)
    with pytest.raises(ValueError):
        winsorize(df, "value", [])


def test_no_python_udfs(spark):
    df = spark.createDataFrame([(1, "a", 1.0)],
                               "doc_id long, text string, value double")
    for frame in (
        char_word_entropy(df.select("doc_id", "text")),
        winsorize(df.select(F.lit("g").alias("g"), "value"), "value", ["g"]),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestMadOutliers:
    def test_hand_computed(self, spark):
        from olx_spark.operators.outliers import mad_outliers

        # group g: values 1..9 plus a wild 1000
        rows = [("g", i, float(v)) for i, v in enumerate([1,2,3,4,5,6,7,8,9,1000])]
        df = spark.createDataFrame(rows, "grp string, id long, v double")
        got = {r["id"]: r.asDict() for r in mad_outliers(df, "grp", "id", "v").collect()}
        # median = 5.5, MAD = median(|x-5.5|) = median(4.5,3.5,...,994.5) = 2.5
        wild = got[9]
        assert wild["is_outlier"] == 1
        assert abs(wild["robust_z"] - round(0.6745 * (1000 - 5.5) / 2.5, 6)) < 1e-9
        assert sum(r["is_outlier"] for r in got.values()) == 1  # ONLY the wild one

    def test_sigma_rule_would_have_missed(self, spark):
        # the motivating property: the same wild value inflates stddev
        # enough that a 3-sigma rule misses it less robustly; here we
        # just assert MAD flags it while leaving all inliers unflagged
        from olx_spark.operators.outliers import mad_outliers

        import numpy as np

        vals = [float(v) for v in np.arange(100)] + [1e6]
        rows = [("g", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "grp string, id long, v double")
        got = mad_outliers(df, "grp", "id", "v").collect()
        flagged = {r["id"] for r in got if r["is_outlier"] == 1}
        assert flagged == {100}

    def test_zero_mad_group(self, spark):
        from olx_spark.operators.outliers import mad_outliers

        rows = [("c", 0, 5.0), ("c", 1, 5.0), ("c", 2, 5.0), ("c", 3, 99.0)]
        df = spark.createDataFrame(rows, "grp string, id long, v double")
        got = {r["id"]: r.asDict() for r in mad_outliers(df, "grp", "id", "v").collect()}
        assert got[0]["robust_z"] == 0.0 and got[0]["is_outlier"] == 0
        assert got[3]["robust_z"] is None and got[3]["is_outlier"] == 1
