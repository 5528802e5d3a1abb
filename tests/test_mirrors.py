"""Unit tests for mirror-host detection and document containment."""

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.mirrors import containment_pairs, host_mirrors


def test_host_mirrors_hand_computed(spark):
    docs = spark.createDataFrame(
        [("h1", f) for f in ["f1", "f2", "f3", "f4"]]
        + [("h2", f) for f in ["f1", "f2", "f3"]]   # full mirror of h1
        + [("h3", f) for f in ["f9", "f1"]]          # 1 shared: below min
        + [("h2", "f1")],                            # dup row: distinct-ed
        "host string, fp string",
    )
    out = {
        (r.host_a, r.host_b): r
        for r in host_mirrors(docs, min_containment=0.5, min_shared=2).collect()
    }
    assert list(out) == [("h1", "h2")]
    r = out[("h1", "h2")]
    assert (r.shared, r.n_a, r.n_b) == (3, 4, 3)
    assert r.containment == 1.0
    assert r.jaccard == 0.75


def test_host_mirrors_hot_fp_guard_is_conservative(spark):
    # fp 'boiler' on every host would pair everything; guarded out it
    # only LOWERS scores (denominators still count it)
    hosts = [f"h{i}" for i in range(6)]
    rows = [(h, "boiler") for h in hosts]
    rows += [("h0", "fx"), ("h1", "fx"), ("h0", "fy"), ("h1", "fy")]
    docs = spark.createDataFrame(rows, "host string, fp string")
    out = host_mirrors(
        docs, min_containment=0.5, min_shared=2, max_fp_hosts=4
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.host_a, r.host_b, r.shared) == ("h0", "h1", 2)
    assert (r.n_a, r.n_b) == (3, 3)  # denominator includes 'boiler'
    assert abs(r.containment - 2 / 3) < 1e-12
    with pytest.raises(ValueError):
        host_mirrors(docs, max_fp_hosts=1)
    with pytest.raises(ValueError):
        host_mirrors(docs, min_containment=0.0)


def test_containment_planted_quote_and_asymmetry(spark):
    orig = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, orig + " with plenty of additional trailing content here"),
            (2, orig),  # fully contained in 1
            (3, "completely unrelated words about other topics entirely"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.in_doc_id): r
        for r in containment_pairs(
            docs, n=4, min_containment=0.9, min_shingles=3
        ).collect()
    }
    # asymmetric: 2-in-1 scores 1.0; 1-in-2 fails (1 has extra grams)
    assert (2, 1) in out and (1, 2) not in out
    assert out[(2, 1)].containment == 1.0
    assert out[(2, 1)].shared == out[(2, 1)].n_shingles


def test_containment_short_doc_and_min_shingles(spark):
    docs = spark.createDataFrame(
        [
            (1, "too short"),                      # < n tokens: no shingles
            (2, "one two three four"),             # exactly 1 shingle
            (3, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    out = containment_pairs(
        docs, n=4, min_containment=0.5, min_shingles=2
    ).collect()
    # doc 2 (1 shingle) is ineligible despite being contained in 3
    assert all(r.doc_id != 2 and r.in_doc_id != 2 for r in out)
    with pytest.raises(ValueError):
        containment_pairs(docs, n=0)


def test_containment_no_python_udf(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon {i}") for i in range(10)],
        "doc_id long, text string",
    )
    plan = (
        containment_pairs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
