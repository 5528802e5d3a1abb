"""BFS seed distance: shortest-path semantics, depth cap, cycles,
directedness, multi-seed min, and the early-exit drain."""

import pytest

from olx_spark.operators.graph import seed_distance


def _run(spark, edges, seeds, max_hops=6):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    out = seed_distance(e, s, max_hops=max_hops)
    return {r["id"]: r["dist"] for r in out.collect()}


def test_bfs_shortest_and_directed(spark):
    # 0->1->2->3 plus a shortcut 0->2; 9->0 is inbound only (directed:
    # must NOT pull 9 in); 7 is disconnected.
    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (9, 0), (7, 7)]
    got = _run(spark, edges, [0])
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_multi_seed_takes_min(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    got = _run(spark, edges, [0, 3])
    # node 4 is 4 hops from seed 0 but 1 hop from seed 3
    assert got == {0: 0, 3: 0, 1: 1, 4: 1, 2: 2}


def test_depth_cap_and_cycle(spark):
    # 6-cycle: cap at 2 keeps only 3 layers; the cycle never loops
    # (anti-join against visited) even when hops remain
    edges = [(i, (i + 1) % 6) for i in range(6)]
    got = _run(spark, edges, [0], max_hops=2)
    assert got == {0: 0, 1: 1, 2: 2}
    full = _run(spark, edges, [0], max_hops=50)
    assert full == {i: i for i in range(6)}


def test_seed_dedup_and_unknown_seed(spark):
    # duplicate seed rows collapse; a seed with no out-edges is still
    # reported at dist 0
    edges = [(0, 1)]
    got = _run(spark, edges, [0, 0, 42])
    assert got == {0: 0, 42: 0, 1: 1}
