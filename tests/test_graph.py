"""connected_components: distributed label propagation + pointer
jumping vs a driver-side union-find oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.graph import connected_components


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    comp_min: dict = {}
    for n in list(parent):
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _dfs(spark, nodes, edges):
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    e = (
        spark.createDataFrame(edges, "src long, dst long")
        if edges
        else spark.createDataFrame([], "src long, dst long")
    )
    return n, e


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_union_find_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(200))
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(rng.randrange(40, 180))
    ]
    n, e = _dfs(spark, nodes, edges)
    got = {
        r["id"]: r["comp"]
        for r in connected_components(n, e, node_col="id").collect()
    }
    assert got == _union_find(nodes, edges)


def test_long_chain_converges_logarithmically(spark):
    # a 512-node path graph: plain propagation needs 511 rounds; with
    # pointer jumping max_iter=16 must suffice (2**16 >> 512)
    nodes = list(range(512))
    edges = [(i, i + 1) for i in range(511)]
    n, e = _dfs(spark, nodes, edges)
    got = connected_components(n, e, node_col="id", max_iter=16)
    rows = got.collect()
    assert len(rows) == 512
    assert {r["comp"] for r in rows} == {0}


def test_singletons_and_self_loops(spark):
    nodes = [1, 2, 3, 4, 5]
    edges = [(2, 2), (4, 5)]  # self-loop ignored; one real edge
    n, e = _dfs(spark, nodes, edges)
    got = {r["id"]: r["comp"] for r in connected_components(n, e).collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 4}


def test_empty_graph(spark):
    n, e = _dfs(spark, [], [])
    assert connected_components(n, e).count() == 0


def test_connectivity_through_unlisted_node(spark):
    # 7 is an edge endpoint but not a requested node: 1 and 2 must
    # still land in one component, and 7 must not be returned
    n, e = _dfs(spark, [1, 2], [(1, 7), (7, 2)])
    got = {r["id"]: r["comp"] for r in connected_components(n, e).collect()}
    assert got == {1: 1, 2: 1}


def test_nonconvergence_raises(spark):
    # max_iter=0 never converges on a non-trivial graph -> loud error
    n, e = _dfs(spark, [1, 2], [(1, 2)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(n, e, max_iter=0)


# ------------------------------------------------------------- pagerank
def _py_pagerank(edges, damping=0.85, iters=6):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        nxt = {v: (1.0 - damping) / n for v in nodes}
        for u, v in edges:
            nxt[v] += damping * r[u] / deg[u]
        r = nxt
    return r


def test_pagerank_matches_python_reference(spark):
    from olx_spark.operators.graph import pagerank

    # cyclic + dangling (node 4 has no out-edges: its mass leaks,
    # matching the documented no-redistribution variant)
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (2, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["rank"] for r in pagerank(df, iters=8).collect()}
    want = _py_pagerank(edges, iters=8)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    assert sum(got.values()) < 1.0  # dangling node leaked mass


def test_pagerank_hub_outranks_leaf(spark):
    from olx_spark.operators.graph import pagerank

    # star: everyone links to 0, 0 links back to 1. Power iteration
    # oscillates on this near-bipartite shape, so compare against the
    # reference at the same iteration count rather than asserting the
    # (parity-sensitive) hub/leaf order directly.
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    want = _py_pagerank(edges, iters=10)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    # the un-pointed leaves hold exactly the teleport mass, always less
    # than the pointed-to nodes
    assert got[2] == got[3] == got[4] == got[5]
    assert min(got[0], got[1]) > got[2]


def test_pagerank_bucketed_equals_inline(spark):
    """The 100-TB edge layout (bucketed table, SMJ exchange-free edge
    side) and the broadcast-era inline layout are the same math —
    ranks must agree to the ulp. Also gates the bucketed plan: the
    edge scan must be bucketed and carry NO Exchange above it."""
    from olx_spark.operators.graph import pagerank

    random.seed(7)
    edges = [(random.randrange(40), random.randrange(40)) for _ in range(160)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    inline = {r["id"]: r["rank"] for r in pagerank(df, iters=5, edge_layout="inline").collect()}
    bucketed = {r["id"]: r["rank"] for r in pagerank(df, iters=5, edge_layout="bucketed").collect()}
    assert set(inline) == set(bucketed)
    for v in inline:
        assert abs(inline[v] - bucketed[v]) < 1e-15, (v, inline[v], bucketed[v])


def test_pagerank_bucketed_scan_is_exchange_free(spark):
    """Plan gate for the bucketed layout: joining the bucketed edge
    table on its bucket key must read the scan Bucketed: true with no
    Exchange between the scan and the join (the per-iteration shape
    pagerank relies on at beyond-broadcast node counts)."""
    import glob
    import tempfile

    from pyspark.sql import functions as F

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = spark.range(5000).select(
        (F.col("id") % 97).alias("src"),
        (F.col("id") % 83).alias("dst"),
        F.lit(2.0).alias("deg"),
    )
    path = tempfile.mkdtemp(prefix="prb_gate_")
    (
        e.repartition(n_part, "src")
        .write.bucketBy(n_part, "src")
        .sortBy("src")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable("prb_gate")
    )
    try:
        # one file per bucket: pre-repartitioned on the bucket key
        assert len(glob.glob(path + "/*.parquet")) == n_part
        ranks = spark.range(97).select(
            F.col("id").alias("src"), F.lit(0.5).alias("rank")
        )
        # force the SMJ regime (what beyond-broadcast ranks hit)
        joined = spark.table("prb_gate").hint("merge").join(ranks, "src")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # the only Exchange allowed is on the ranks side: no Exchange
        # may sit directly above the bucketed FileScan
        import re

        assert not re.search(r"Exchange[^\n]*\n[^\n]*FileScan", plan), plan
    finally:
        spark.sql("DROP TABLE IF EXISTS prb_gate")
        import shutil

        shutil.rmtree(path, ignore_errors=True)


# ------------------------------------------------------------- HITS ------

def _hits_py(edges, iters):
    """Plain-python HITS replay (L1 normalization, auth first)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(iters):
        auth = {v: sum(hub[u] for u, w in edges if w == v) for v in nodes}
        t = sum(auth.values())
        auth = {v: (s / t if t > 0 else 0.0) for v, s in auth.items()}
        hub = {v: sum(auth[w] for u, w in edges if u == v) for v in nodes}
        t = sum(hub.values())
        hub = {v: (s / t if t > 0 else 0.0) for v, s in hub.items()}
    return auth, hub


def test_hits_matches_python_reference(spark):
    from olx_spark.operators.graph import hits

    edges = [(1, 3), (2, 3), (2, 4)]
    want_auth, want_hub = _hits_py(edges, 2)
    # hand-checked closed form for this graph at iters=2:
    assert abs(want_auth[3] - 0.625) < 1e-12 and abs(want_hub[2] - 8 / 13) < 1e-12
    out = {
        r.id: r
        for r in hits(
            spark.createDataFrame(edges, "src long, dst long"), iters=2
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    for v in out:
        assert abs(out[v].auth - want_auth[v]) < 1e-9
        assert abs(out[v].hub - want_hub[v]) < 1e-9
    # pure hubs carry no authority and vice versa
    assert out[1].auth == 0.0 and out[3].hub == 0.0


def test_hits_star_center_is_top_authority(spark):
    from olx_spark.operators.graph import hits

    edges = [(i, 0) for i in range(1, 8)] + [(1, 9)]
    out = {r.id: r for r in hits(
        spark.createDataFrame(edges, "src long, dst long"), iters=4
    ).collect()}
    assert out[0].auth == max(r.auth for r in out.values())
    # every spoke is a hub; spoke 1 (also feeds 9) is the best hub
    assert out[1].hub == max(r.hub for r in out.values())


def test_hits_no_python_udfs_and_deterministic(spark):
    from olx_spark.operators.graph import hits

    df = spark.createDataFrame(
        [(i % 7, (i * 3) % 11 + 100) for i in range(50)], "src long, dst long"
    )
    a = sorted(map(tuple, hits(df, iters=3).collect()))
    b = sorted(map(tuple, hits(df, iters=3).collect()))
    assert a == b
    plan = hits(df, iters=1)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestLabelPropagation:
    EDGES = [
        # triangle A: 1-2-3; triangle B: 10-11-12; bridge 3-10; isolated 99
        (1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10),
    ]

    def _sym(self):
        return self.EDGES + [(b, a) for a, b in self.EDGES]

    @staticmethod
    def _reference_lpa(edges, iters):
        nodes = {v for e in edges for v in e}
        labels = {v: v for v in nodes}
        for _ in range(iters):
            nxt = dict(labels)
            incoming = {}
            for s, d in edges:
                incoming.setdefault(d, []).append(labels[s])
            for v, labs in incoming.items():
                counts = {}
                for l in labs:
                    counts[l] = counts.get(l, 0) + 1
                nxt[v] = min(
                    counts, key=lambda l: (-counts[l], l)
                )
            labels = nxt
        return labels

    def _run(self, spark, iters):
        from olx_spark.operators.graph import label_propagation

        df = spark.createDataFrame(
            self._sym() + [(99, 99)], "src long, dst long"
        )
        got = {
            r["id"]: r["label"]
            for r in label_propagation(df, iters=iters).collect()
        }
        return got

    def test_matches_reference_sim(self, spark):
        for iters in (0, 1, 2, 3):
            want = self._reference_lpa(self._sym() + [(99, 99)], iters)
            assert self._run(spark, iters) == want, f"iters={iters}"

    def test_communities_form(self, spark):
        got = self._run(spark, 3)
        # triangle A coalesces on its min label
        assert got[1] == got[2] == got[3] == 1
        # triangle B likewise (the bridge may pull 10, never 11/12)
        assert got[11] == got[12]
        # self-loop-only node keeps its own label
        assert got[99] == 99

    def test_deterministic(self, spark):
        assert self._run(spark, 3) == self._run(spark, 3)

    def test_source_only_node_keeps_label(self, spark):
        # r6 internals: the keep-own-label fallback is a weight-0
        # sentinel row in the count stream — pin the edge case it
        # encodes: a node with OUT-edges but no in-neighbors must keep
        # its own label every round, while its target adopts it
        from olx_spark.operators.graph import label_propagation

        df = spark.createDataFrame([(7, 3), (3, 7), (9, 3)], "src long, dst long")
        got = {
            r["id"]: r["label"]
            for r in label_propagation(df, iters=2).collect()
        }
        # 9 has no in-edges: the sentinel keeps it at 9 both rounds;
        # 3's in-labels are {7, 9} -> tie -> min = 7 (round 1), then
        # {3(from 7), 9} -> min count tie -> 3; 7 adopts 3's label
        assert got[9] == 9
        assert 3 in got and 7 in got

    def test_windowless_plan(self, spark):
        from olx_spark.operators.graph import label_propagation

        df = spark.createDataFrame(self._sym(), "src long, dst long")
        plan = (
            label_propagation(df, iters=1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan  # argmax is min-of-struct, not row_number


class TestTrustRank:
    @staticmethod
    def _ppr_py(edges, seeds, iters, d=0.85):
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        s = [v for v in nodes if v in seeds]
        deg = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        r = {v: (1.0 / len(s) if v in seeds else 0.0) for v in nodes}
        for _ in range(iters):
            nxt = {}
            for v in nodes:
                t = (1 - d) / len(s) if v in seeds else 0.0
                nxt[v] = t + d * sum(
                    r[u] / deg[u] for u, w in edges if w == v
                )
            r = nxt
        return r

    EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (9, 8), (8, 9)]

    def test_matches_python_reference(self, spark):
        from olx_spark.operators.graph import pagerank

        e = spark.createDataFrame(self.EDGES, "src long, dst long")
        seeds = spark.createDataFrame([(1,)], "id long")
        want = self._ppr_py(self.EDGES, {1}, iters=4)
        got = {r["id"]: r["rank"] for r in pagerank(
            e, iters=4, seeds=seeds, edge_layout="inline"
        ).collect()}
        assert set(got) == set(want)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-12, v

    def test_spam_island_starves(self, spark):
        from olx_spark.operators.graph import pagerank

        e = spark.createDataFrame(self.EDGES, "src long, dst long")
        seeds = spark.createDataFrame([(1,)], "id long")
        got = {r["id"]: r["rank"] for r in pagerank(
            e, iters=6, seeds=seeds, edge_layout="inline"
        ).collect()}
        # the 8<->9 island is unreachable from the trusted seed:
        # zero teleport + zero trusted in-flow = exactly zero rank
        assert got[8] == 0.0 and got[9] == 0.0
        assert got[1] > 0 and got[4] > 0  # reachable chain keeps rank

    def test_unknown_seeds_ignored_empty_raises(self, spark):
        from olx_spark.operators.graph import pagerank

        e = spark.createDataFrame(self.EDGES, "src long, dst long")
        ok = pagerank(
            e, iters=1,
            seeds=spark.createDataFrame([(1,), (777,)], "id long"),
            edge_layout="inline",
        ).collect()
        assert len(ok) == 7  # all graph nodes; the unknown seed is ignored
        with pytest.raises(ValueError, match="no seed"):
            pagerank(
                e, iters=1,
                seeds=spark.createDataFrame([(777,)], "id long"),
                edge_layout="inline",
            )
