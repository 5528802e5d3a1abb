"""Unit tests for redirect-chain resolution (pointer jumping with
exact hops and pigeonhole cycle detection)."""

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r.src: (r.final_url, r.hops, r.is_cycle)
        for r in resolve_redirects(df, **kw).collect()
    }


def test_chain_rho_cycle_and_min_dst(spark):
    out = _resolve(
        spark,
        [
            ("a", "b"), ("b", "c"), ("c", "T"),      # chain, hops 3/2/1
            ("x", "y"), ("y", "x"),                  # 2-cycle
            ("r", "x"),                              # rho: leads into it
            ("s", "s"),                              # self-loop: dropped
            ("m", "Z"), ("m", "T"),                  # multi-target: min wins
        ],
    )
    assert out["a"] == ("T", 3, 0)
    assert out["b"] == ("T", 2, 0)
    assert out["c"] == ("T", 1, 0)
    assert out["m"] == ("T", 1, 0)  # 'T' < 'Z'
    assert out["x"] == (None, None, 1)
    assert out["y"] == (None, None, 1)
    assert out["r"] == (None, None, 1)
    assert "s" not in out


def test_long_chain_exact_hops_via_doubling(spark):
    # length-20 chain: resolves in ceil(log2) rounds with EXACT hops
    edges = [(f"n{i}", f"n{i+1}") for i in range(20)]
    out = _resolve(spark, edges)
    for i in range(20):
        assert out[f"n{i}"] == ("n20", 20 - i, 0)


def test_odd_cycle_detected_by_pigeonhole(spark):
    # a 3-cycle never reaches a fixed point under doubling (stride
    # 2^k mod 3 != 0) — the pigeonhole rule must still prove it
    out = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("t", "a")])
    assert out["a"] == (None, None, 1)
    assert out["b"] == (None, None, 1)
    assert out["c"] == (None, None, 1)
    assert out["t"] == (None, None, 1)  # rho tail into the cycle


def test_landing_on_done_walk_stays_exact(spark):
    # fork: two chains share a suffix — the walk that lands mid-round
    # on an already-finished pointer must still report exact hops
    edges = [("p", "q"), ("q", "T"), ("a", "p"), ("b", "a")]
    out = _resolve(spark, edges)
    assert out["b"] == ("T", 4, 0)
    assert out["a"] == ("T", 3, 0)
    assert out["p"] == ("T", 2, 0)


def test_empty_and_validation(spark):
    df = (
        _resolve(spark, [("a", "a")])  # only self-loops -> empty result
    )
    assert df == {}
    with pytest.raises(ValueError):
        resolve_redirects(None, max_iter=0)  # validated before df use


def test_max_iter_guard(spark):
    df = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(10)], "src string, dst string"
    )
    with pytest.raises(RuntimeError, match="doubling"):
        resolve_redirects(df, max_iter=2)  # 10 sources need 4 rounds


def test_no_python_in_round_plan(spark):
    # every per-round step is JVM joins/aggregates — no Python UDFs
    df = spark.createDataFrame(
        [("a", "b"), ("b", "T")], "src string, dst string"
    )
    plan = (
        resolve_redirects(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
