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
