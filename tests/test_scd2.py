"""SCD2 history: run collapsing, version numbering, valid_from/to
chaining, reverted-value runs staying separate versions, and the
one-Exchange plan."""

from datetime import datetime

import pytest

from olx_spark.operators.temporal import scd2_history


def _ts(d):
    return datetime(2024, 1, d)


@pytest.fixture(scope="module")
def hist(spark):
    rows = [
        # url 1: A A B B A  -> three versions (revert = NEW version)
        (1, _ts(1), 10, "A"), (1, _ts(2), 11, "A"), (1, _ts(3), 12, "B"),
        (1, _ts(4), 13, "B"), (1, _ts(5), 14, "A"),
        # url 2: single observation -> one current version
        (2, _ts(1), 20, "X"),
        # url 3: same-ts tie broken by obs_id (C before D)
        (3, _ts(1), 30, "C"), (3, _ts(1), 31, "D"),
    ]
    df = spark.createDataFrame(
        rows, "url_fp long, fetch_ts timestamp, obs_id long, content_hash string"
    )
    out = scd2_history(df, order_tiebreak="obs_id")
    return out, {(r["url_fp"], r["version"]): r for r in out.collect()}


def test_runs_and_versions(hist):
    _, h = hist
    assert len(h) == 3 + 1 + 2
    v1, v2, v3 = h[(1, 1)], h[(1, 2)], h[(1, 3)]
    assert (v1["content_hash"], v1["n_obs"]) == ("A", 2)
    assert (v2["content_hash"], v2["n_obs"]) == ("B", 2)
    assert (v3["content_hash"], v3["n_obs"], v3["is_current"]) == ("A", 1, 1)


def test_interval_chaining(hist):
    _, h = hist
    assert h[(1, 1)]["valid_from"] == _ts(1)
    assert h[(1, 1)]["valid_to"] == h[(1, 2)]["valid_from"] == _ts(3)
    assert h[(1, 2)]["valid_to"] == h[(1, 3)]["valid_from"] == _ts(5)
    assert h[(1, 3)]["valid_to"] is None
    assert h[(1, 1)]["is_current"] == 0 and h[(1, 2)]["is_current"] == 0
    assert (h[(2, 1)]["is_current"], h[(2, 1)]["valid_to"]) == (1, None)


def test_tiebreak_order(hist):
    _, h = hist
    # same fetch_ts: obs_id decides -> C is version 1, D version 2
    assert h[(3, 1)]["content_hash"] == "C"
    assert h[(3, 2)]["content_hash"] == "D"
    assert h[(3, 2)]["is_current"] == 1


def test_single_exchange_plan(hist):
    out, _ = hist
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # window -> groupBy(key, version) -> window: one hash Exchange on
    # the key serves all three. AQE's toString appends the pre-AQE
    # "Initial Plan" section — count only the final plan.
    final = plan.split("Initial Plan")[0]
    assert final.count("Exchange hashpartitioning") == 1
