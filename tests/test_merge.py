"""MERGE INTO / CDC upsert (operators/merge.py).

Semantics pinned against a tiny hand-computed table: last-writer-wins
compaction, delete-beats-stale-upsert tiebreak, insert/update/delete
row routing, schema validation, and the scale plan gate (the target
side of the merge is never shuffled when the delta broadcasts).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.merge import compact_delta, merge_upsert

TGT = "k long, v string, n long"
DLT = "k long, v string, n long, op string, seq long"


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)], TGT
    )


def test_merge_routes_update_insert_delete(spark, target):
    delta = spark.createDataFrame(
        [
            (2, "b2", 21, "U", 1),     # update
            (3, "c", 30, "D", 1),      # delete
            (9, "i", 90, "U", 1),      # insert
        ],
        DLT,
    )
    got = {r["k"]: (r["v"], r["n"]) for r in merge_upsert(target, delta, ["k"]).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 21), 4: ("d", 40), 9: ("i", 90)}


def test_last_writer_wins_and_delete_tiebreak(spark, target):
    delta = spark.createDataFrame(
        [
            (1, "a1", 11, "U", 1),
            (1, "a2", 12, "U", 5),     # highest seq wins
            (1, "a3", 13, "U", 3),
            (2, "b1", 21, "U", 4),
            (2, "bX", 22, "D", 4),     # same seq: 'U' > 'D' in desc order? no —
                                       # op desc means 'U' sorts before 'D'...
        ],
        DLT,
    )
    last = {
        (r["k"], r["op"], r["seq"]): r["v"]
        for r in compact_delta(delta, ["k"]).collect()
    }
    assert last[(1, "U", 5)] == "a2"
    # op desc: 'U' > 'D' lexically, so the upsert wins a same-seq tie —
    # deterministic either way, pinned here so it can never drift
    assert (2, "U", 4) in last
    got = {r["k"]: r["v"] for r in merge_upsert(target, delta, ["k"]).collect()}
    assert got == {1: "a2", 2: "b1", 3: "c", 4: "d"}


def test_pure_delete_and_reinsert_same_batch(spark, target):
    delta = spark.createDataFrame(
        [(4, "d", 40, "D", 1), (4, "d9", 49, "U", 2)], DLT
    )
    got = {r["k"]: r["v"] for r in merge_upsert(target, delta, ["k"]).collect()}
    assert got[4] == "d9"   # later upsert supersedes the delete
    delta2 = spark.createDataFrame(
        [(4, "d", 40, "U", 1), (4, "dX", 49, "D", 2)], DLT
    )
    got2 = {r["k"]: r["v"] for r in merge_upsert(target, delta2, ["k"]).collect()}
    assert 4 not in got2    # later delete supersedes the upsert


def test_empty_delta_is_identity(spark, target):
    delta = spark.createDataFrame([], DLT)
    got = merge_upsert(target, delta, ["k"])
    assert sorted(r["k"] for r in got.collect()) == [1, 2, 3, 4]


def test_missing_columns_rejected(spark, target):
    bad = spark.createDataFrame([(1, "x", "U", 1)], "k long, v string, op string, seq long")
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(target, bad, ["k"])
    bad2 = spark.createDataFrame([(1, "x", 1)], "k long, v string, n long")
    with pytest.raises(ValueError, match="missing column"):
        compact_delta(bad2, ["k"])


def test_plan_target_side_never_shuffles(spark, target):
    # the 100-TB claim: with a broadcast delta the target side sees a
    # BroadcastHashJoin LeftAnti and NO exchange between its scan and
    # the join (scan -> filter -> broadcast anti join, map-side only)
    delta = spark.createDataFrame([(2, "b2", 21, "U", 1)], DLT)
    plan = merge_upsert(target, delta, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    head = plan.split("BroadcastHashJoin")[0]
    assert "Exchange" not in head, head  # nothing shuffles above the anti join
