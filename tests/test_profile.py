"""Column profiler (operators/profile.py).

Values pinned on a hand-computed frame (nulls, duplicates, negative
mins so native-type aggregation is distinguishable from lexicographic);
the one-scan claim is plan-gated: exact mode is a single aggregate over
one Expand, approx mode loses the Expand entirely.
"""

from __future__ import annotations

import pytest

from olx_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "a", None),
        (2, "a", 10.5),
        (3, None, -4.25),
        (4, "b", 10.5),
        (4, "b", None),
    ]
    return spark.createDataFrame(rows, "k long, s string, x double")


def test_exact_profile_values(spark, frame):
    got = {r["column_name"]: r for r in profile_table(frame).collect()}
    assert set(got) == {"k", "s", "x"}
    for r in got.values():
        assert r["n_rows"] == 5
    assert (got["k"]["n_nulls"], got["k"]["n_distinct"]) == (0, 4)
    assert (got["s"]["n_nulls"], got["s"]["n_distinct"]) == (1, 2)
    assert (got["x"]["n_nulls"], got["x"]["n_distinct"]) == (2, 2)
    # native-type aggregation, cast after: numeric min is -4.25, not
    # the lexicographic "-4.25" < "10.5" accident
    assert got["x"]["min_val"] == "-4.25" and got["x"]["max_val"] == "10.5"
    assert got["k"]["min_val"] == "1" and got["k"]["max_val"] == "4"
    assert got["s"]["min_val"] == "a" and got["s"]["max_val"] == "b"


def test_column_subset_and_validation(spark, frame):
    got = profile_table(frame, ["k"]).collect()
    assert len(got) == 1 and got[0]["column_name"] == "k"
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(frame, ["nope"])


def test_approx_mode_close_and_plan_drops_expand(spark):
    df = spark.range(0, 20000).selectExpr(
        "id as k", "cast(id % 997 as string) as s"
    )
    exact = {
        r["column_name"]: r["n_distinct"] for r in profile_table(df).collect()
    }
    approx = {
        r["column_name"]: r["n_distinct"]
        for r in profile_table(df, exact=False).collect()
    }
    assert exact == {"k": 20000, "s": 997}
    for c in exact:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.1
    plan_exact = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    plan_approx = (
        profile_table(df, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in plan_exact
    assert "Expand" not in plan_approx  # HLL++ mode: plain one-pass agg


def test_one_scan(spark, frame):
    # ONE aggregate over one source scan — no per-column jobs, no join
    plan = profile_table(frame)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1
    assert "Join" not in plan


class TestEquiDepthHistogram:
    def _hist(self, spark, vals, k):
        from olx_spark.operators.profile import equi_depth_histogram

        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        rows = equi_depth_histogram(df, "v", k=k).collect()
        return sorted((r["bucket"], r["lo"], r["hi"], r["n_rows"], r["n_distinct"])
                      for r in rows)

    def test_uniform_depths(self, spark):
        got = self._hist(spark, range(1, 41), k=4)  # 40 distinct values
        assert [g[0] for g in got] == [1, 2, 3, 4]
        assert all(g[3] == 10 and g[4] == 10 for g in got)
        # contiguous, ordered, non-overlapping ranges
        assert got[0][1] == 1.0 and got[-1][2] == 40.0
        for a, b in zip(got, got[1:]):
            assert a[2] < b[1]

    def test_heavy_hitter_widens_its_bucket(self, spark):
        vals = [5.0] * 30 + [1.0, 2.0, 3.0, 4.0, 6.0, 7.0]
        got = self._hist(spark, vals, k=3)
        by_bucket = {g[0]: g for g in got}
        heavy = next(g for g in got if g[1] <= 5.0 <= g[2])
        assert heavy[3] >= 30  # the hitter's full mass in ONE bucket
        assert sum(g[3] for g in got) == len(vals)
        assert len(by_bucket) <= 3

    def test_total_mass_and_empty(self, spark):
        from olx_spark.operators.profile import equi_depth_histogram

        got = self._hist(spark, [1.0, 1.0, 2.0], k=8)
        assert sum(g[3] for g in got) == 3
        empty = spark.createDataFrame([], "v double")
        assert equi_depth_histogram(empty, "v", k=4).count() == 0
        import pytest as _pytest
        with _pytest.raises(ValueError):
            equi_depth_histogram(empty, "v", k=0)

    def test_no_global_window(self, spark):
        from pyspark.sql import functions as F

        from olx_spark.operators.profile import equi_depth_histogram

        df = spark.range(1000).select((F.col("id") % 97).cast("double").alias("v"))
        plan = (
            equi_depth_histogram(df, "v", k=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # windows exist but are partitioned by __pid — never an empty
        # partition spec that would serialize the domain in one task
        win_lines = [l for l in plan.splitlines() if "Window [" in l]
        assert win_lines, "expected the running-sum window in the plan"
        assert all(", [__pid#" in l for l in win_lines), win_lines
