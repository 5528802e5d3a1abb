"""Benchmark decontamination (operators/decontam.py): planted-overlap
correctness, distinct-n-gram semantics, threshold knobs, plan gates."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from conftest import SF_DIR
from olx_spark.operators.decontam import decontaminate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def planted(spark):
    bench = _docs(
        spark,
        [
            ("b1", "the quick brown fox jumps over the lazy dog"),
            ("b2", "pack my box with five dozen liquor jugs"),
        ],
    )
    docs = _docs(
        spark,
        [
            # exact copy of b1 -> every 3-gram hits
            ("full", "the quick brown fox jumps over the lazy dog"),
            # shares exactly the 3-gram window "five dozen liquor jugs"
            # (2 of its 6 distinct 3-grams)
            ("part", "we shipped five dozen liquor jugs to warehouse nine"),
            # no overlap at all
            ("clean", "completely unrelated sentence about spark plans"),
            # shorter than n tokens -> no n-grams, never flagged
            ("short", "two words"),
            # blank
            ("blank", "   "),
        ],
    )
    return docs, bench


def test_planted_overlap(spark, planted):
    docs, bench = planted
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, n=3, min_overlap_frac=0.1).collect()
    }
    assert out["full"]["overlap_frac"] == 1.0 and out["full"]["contaminated"] == 1
    # "part": tokens 9 -> 7 distinct 3-grams, 2 hit ("shipped five dozen"?
    # no — hits are "five dozen liquor", "dozen liquor jugs")
    assert out["part"]["n_hits"] == 2
    assert out["part"]["overlap_frac"] == round(2 / out["part"]["n_ngrams"], 6)
    assert out["part"]["contaminated"] == 1
    assert out["clean"]["n_hits"] == 0 and out["clean"]["contaminated"] == 0
    assert out["short"]["n_ngrams"] == 0 and out["short"]["contaminated"] == 0
    assert out["blank"]["n_ngrams"] == 0 and out["blank"]["contaminated"] == 0


def test_distinct_ngram_semantics(spark):
    # a doc repeating one benchmark 3-gram 5x counts it ONCE on both
    # axes: evidence is set overlap, not multiplicity
    bench = _docs(spark, [("b", "alpha beta gamma")])
    docs = _docs(
        spark,
        [("rep", " ".join(["alpha beta gamma"] * 5))],
    )
    row = decontaminate(docs, bench, n=3).collect()[0]
    # tokens: a b g a b g ... -> distinct 3-grams: (a b g),(b g a),(g a b)
    assert row["n_ngrams"] == 3
    assert row["n_hits"] == 1
    assert row["overlap_frac"] == round(1 / 3, 6)


def test_threshold_knobs(spark, planted):
    docs, bench = planted
    strict = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, bench, n=3, min_overlap_frac=0.9).collect()
    }
    assert strict["full"] == 1 and strict["part"] == 0
    hits2 = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(
            docs, bench, n=3, min_overlap_frac=0.0, min_hits=3
        ).collect()
    }
    assert hits2["full"] == 1 and hits2["part"] == 0


def test_shuffled_mode_equals_broadcast(spark, planted):
    docs, bench = planted
    a = sorted(map(tuple, decontaminate(docs, bench, n=3).collect()))
    b = sorted(
        map(
            tuple,
            decontaminate(docs, bench, n=3, broadcast_benchmark=False).collect(),
        )
    )
    assert a == b


def test_plan_broadcast_and_no_python(spark):
    df = entry_mod.q_decontaminate(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the benchmark n-gram set must ride a broadcast join
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # pure JVM: no row-at-a-time or Arrow Python anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_entry_query_nontrivial(spark):
    # the fate-hash fixture must plant real contamination at sf0.001
    # (documents carries near-dup families) — the query is only a
    # meaningful gate if both classes are populated
    rows = entry_mod.q_decontaminate(spark, SF_DIR).collect()
    flags = {r["contaminated"] for r in rows}
    assert flags == {0, 1}
