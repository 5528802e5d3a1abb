"""Vocabulary coverage: rank/cum correctness vs a hand computation,
multi-partition prefix-sum equality with the single-window spelling,
determinism across n_parts, and the no-global-window plan."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from olx_spark.operators.vocab import vocab_coverage


def test_hand_computed(spark):
    # occurrences: b x3, a x3, c x1  -> rank: a(3),b(3 tie->lex),c
    terms = spark.createDataFrame(
        [("b",), ("a",), ("b",), ("c",), ("a",), ("b",), ("a",)],
        "term string",
    )
    out = {r.term: r for r in vocab_coverage(terms, top_k=2).collect()}
    assert (out["a"].rank, out["b"].rank, out["c"].rank) == (1, 2, 3)
    assert out["a"].cum_frac == round(3 / 7, 6)
    assert out["b"].cum_frac == round(6 / 7, 6)
    assert out["c"].cum_frac == 1.0
    assert (out["a"].in_vocab, out["b"].in_vocab, out["c"].in_vocab) == (1, 1, 0)


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_prefix_sum_matches_global_window(spark, n_parts):
    # 400 terms with a zipf-ish profile spanning many partitions
    terms = spark.createDataFrame(
        [(f"t{i % 37:02d}{i % 11}",) for i in range(4000)], "term string"
    )
    got = {
        r.term: (r.rank, r.cnt, r.cum_frac)
        for r in vocab_coverage(terms, top_k=50, n_parts=n_parts).collect()
    }
    c = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    total = 4000.0
    ref = {
        r.term: (r.rank, r.cnt, round(r.cum / total, 6))
        for r in c.select(
            "term", "cnt",
            F.row_number().over(w).alias("rank"),
            F.sum("cnt").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("cum"),
        ).collect()
    }
    assert got == ref


def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "term string")
    assert vocab_coverage(empty).count() == 0
    with pytest.raises(ValueError):
        vocab_coverage(empty, top_k=0)


def test_no_single_partition_global_window(spark):
    terms = spark.createDataFrame(
        [(f"t{i % 97}",) for i in range(1000)], "term string"
    )
    out = vocab_coverage(terms, top_k=10, n_parts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every window is partitioned by the pid column — no
    # Exchange SinglePartition feeding a Window
    assert "SinglePartition" not in plan.split("Initial Plan")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
