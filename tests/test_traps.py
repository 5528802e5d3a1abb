"""Crawler-trap detection: template normalization rules, trap
thresholding, two-phase agg semantics (n_urls distinct vs n_hits
total), and the single-shuffle-pair plan shape."""

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.traps import mine_url_templates, url_template


@pytest.fixture(scope="module")
def mined(spark):
    rows = []
    # calendar trap on host a: 30 distinct urls, one template
    rows += [("a", f"https://a.example/cal/2024-01-{d:02d}/view") for d in range(1, 31)]
    # session-id trap on host a: 25 distinct 32-hex tokens
    rows += [("a", f"https://a.example/item/{('%032x' % (i * 2654435761)):s}/p") for i in range(25)]
    # bounded listing family on host a: 3 distinct urls, revisited often
    rows += [("a", f"https://a.example/page/{i % 3}") for i in range(12)]
    # host b: same calendar template but only 2 distinct urls — not a trap
    rows += [("b", "https://b.example/cal/2024-01-01/view"),
             ("b", "https://b.example/cal/2024-01-02/view")]
    df = spark.createDataFrame(rows, "host string, url string")
    out = mine_url_templates(df, trap_distinct_urls=10)
    return {(r["host"], r["template"]): r for r in out.collect()}


def test_template_rules(spark):
    got = (
        spark.range(1)
        .select(
            url_template(F.lit("https://h3.example/item/deadbeef01/x/9")).alias("a"),
            url_template(F.lit("https://x.example/cal/2024-01-05/view")).alias("b"),
        )
        .first()
    )
    # 10-char hex run -> {h} (before digits); remaining digit runs -> {d}
    assert got["a"] == "https://h{d}.example/item/{h}/x/{d}"
    assert got["b"] == "https://x.example/cal/{d}-{d}-{d}/view"


def test_trap_flags_and_counts(mined):
    cal_a = mined[("a", "https://a.example/cal/{d}-{d}-{d}/view")]
    assert (cal_a["n_urls"], cal_a["n_hits"], cal_a["is_trap"]) == (30, 30, 1)
    sess_a = mined[("a", "https://a.example/item/{h}/p")]
    assert (sess_a["n_urls"], sess_a["is_trap"]) == (25, 1)
    page_a = mined[("a", "https://a.example/page/{d}")]
    # 3 distinct urls but 12 frontier hits: distinct, not hits, decides
    assert (page_a["n_urls"], page_a["n_hits"], page_a["is_trap"]) == (3, 12, 0)
    # same template, different host: flagged per-host, not globally
    cal_b = mined[("b", "https://b.example/cal/{d}-{d}-{d}/view")]
    assert (cal_b["n_urls"], cal_b["is_trap"]) == (2, 0)
    assert cal_b["sample_url"] == "https://b.example/cal/2024-01-01/view"


def test_plan_is_two_phase_jvm_only(spark):
    df = spark.createDataFrame(
        [("a", "https://a.example/p/1")], "host string, url string"
    )
    plan = mine_url_templates(df)._jdf.queryExecution().executedPlan().toString()
    # pure JVM: no Python evaluation node anywhere in the plan
    assert "Python" not in plan
    # both aggregations have a partial (map-side) phase
    assert plan.count("partial_count") >= 1


class TestPathTreeRollup:
    def _run(self, spark, urls, max_depth=4):
        from olx_spark.operators.traps import path_tree_rollup

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return {
            (r["prefix"], r["depth"]): (r["n_pages"], r["n_hosts"])
            for r in path_tree_rollup(df, max_depth=max_depth).collect()
        }

    def test_counts_and_ancestors(self, spark):
        got = self._run(spark, [
            "https://a.ex/x/y/1",
            "https://a.ex/x/y/2",
            "https://b.ex/x/z",
            "https://b.ex/x",
        ])
        assert got[("/x", 1)] == (4, 2)
        assert got[("/x/y", 2)] == (2, 1)
        assert got[("/x/y/1", 3)] == (1, 1)
        assert got[("/x/z", 2)] == (1, 1)

    def test_max_depth_truncates(self, spark):
        got = self._run(spark, ["https://a.ex/1/2/3/4/5"], max_depth=2)
        assert set(got) == {("/1", 1), ("/1/2", 2)}

    def test_empty_and_root_paths(self, spark):
        got = self._run(spark, ["https://a.ex", "https://a.ex/", "https://a.ex/x"])
        assert set(got) == {("/x", 1)}  # no phantom root prefixes

    def test_bad_depth_refused(self, spark):
        import pytest as _pytest

        from olx_spark.operators.traps import path_tree_rollup

        df = spark.createDataFrame([("https://a.ex/x",)], "url string")
        with _pytest.raises(ValueError):
            path_tree_rollup(df, max_depth=0)
