"""Recrawl scheduler (operators/recrawl.py).

Backoff arithmetic pinned by hand, the due boundary is inclusive, the
per-host budget honors (priority desc, most-overdue-first) order, and
the two-phase salted cut is row-identical to the single-phase window.
"""

from __future__ import annotations

import pytest

from olx_spark.operators.recrawl import recrawl_due

SCHEMA = (
    "url_fp long, host long, last_fetch_ts timestamp, "
    "fail_count int, priority long"
)
T0 = "2024-01-01 00:00:00"


def _rows(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (fp, h, base + dt.timedelta(seconds=off), fc, pr)
            for fp, h, off, fc, pr in rows
        ],
        SCHEMA,
    )


def test_backoff_exponent_capped(spark):
    # all fetched at T0; now = T0 + 16 days; interval 1 day, cap 4:
    # fail 0..6 -> due at +1,2,4,8,16,16,16 days -> all due at +16d
    st = _rows(spark, [(i, 1, 0, i, 0) for i in range(7)])
    got = {
        r["url_fp"]: r["due_s"]
        for r in recrawl_due(st, "2024-01-17 00:00:00").collect()
    }
    t0 = 1704067200  # 2024-01-01 UTC
    day = 86_400
    assert got == {
        0: t0 + day, 1: t0 + 2 * day, 2: t0 + 4 * day, 3: t0 + 8 * day,
        4: t0 + 16 * day, 5: t0 + 16 * day, 6: t0 + 16 * day,
    }


def test_due_boundary_inclusive(spark):
    st = _rows(spark, [(1, 1, 0, 0, 0), (2, 1, 1, 0, 0)])
    # now = exactly T0 + 1 day: url 1 due (<=), url 2 one second late
    got = [r["url_fp"] for r in recrawl_due(st, "2024-01-02 00:00:00").collect()]
    assert got == [1]


def test_budget_order_and_two_phase_equality(spark):
    # one hot host with 40 urls: priority desc first, then most
    # overdue (due_s asc), then url_fp
    rows = [(i, 7, i * 60, i % 3, i % 5) for i in range(40)]
    st = _rows(spark, rows)
    kw = dict(base_interval_s=60, backoff_cap=2, per_host_budget=10)
    two = recrawl_due(st, "2024-01-01 02:00:00", salt_buckets=8, **kw)
    one = recrawl_due(st, "2024-01-01 02:00:00", salt_buckets=1, **kw)
    a = sorted(map(tuple, two.collect()))
    b = sorted(map(tuple, one.collect()))
    assert a == b and len(a) > 0
    ranked = sorted(a, key=lambda r: r[-1])  # rank_in_limit ascending
    keys = [(-r[4], r[5], r[0]) for r in ranked]  # (-prio, due_s, url_fp)
    assert keys == sorted(keys)
    assert len(a) == 10


def test_no_budget_returns_full_due_set(spark):
    st = _rows(spark, [(i, i % 4, 0, 0, 0) for i in range(20)])
    got = recrawl_due(st, "2024-01-03 00:00:00").collect()
    assert len(got) == 20
    assert "rank_in_limit" not in got[0].asDict()


def test_validation(spark):
    st = _rows(spark, [(1, 1, 0, 0, 0)])
    with pytest.raises(ValueError, match="base_interval_s"):
        recrawl_due(st, T0, base_interval_s=0)
    with pytest.raises(ValueError, match="backoff_cap"):
        recrawl_due(st, T0, backoff_cap=-1)
    with pytest.raises(ValueError, match="missing column"):
        recrawl_due(st.drop("priority"), T0)


# ------------------------------------------- change-rate estimation ----

def test_change_rate_hand_computed(spark):
    import math

    from olx_spark.operators.recrawl import estimate_change_rate

    obs = spark.createDataFrame(
        [(1, 1, 3600.0)] * 3 + [(1, 0, 3600.0)]      # 3/4 changed
        + [(2, 0, 7200.0)] * 4                        # never changed
        + [(3, 1, 1800.0)] * 2                        # always changed
        + [(9, 1, 60.0)],                             # 1 obs: filtered
        "url_fp long, changed int, interval_s double",
    )
    out = {r.url_fp: r for r in estimate_change_rate(obs, min_obs=2).collect()}
    assert 9 not in out

    r1 = out[1]
    r_hat = -math.log((4 - 3 + 0.5) / (4 + 0.5))
    assert (r1.n_obs, r1.n_changed, r1.avg_interval_s) == (4, 3, 3600.0)
    assert abs(r1.lambda_per_day - (r_hat / 3600.0) * 86400.0) < 1e-12
    assert abs(r1.next_interval_s - 3600.0 / r_hat) < 1e-9  # inside clamp

    # never-changed: r_hat == 0 -> max backoff, no division by zero
    assert out[2].lambda_per_day == 0.0 or out[2].lambda_per_day == -0.0
    assert out[2].next_interval_s == 7200.0 * 8

    # always-changed: finite (the +0.5 correction), clamped at /8
    r3 = out[3]
    assert r3.lambda_per_day > 0
    assert r3.next_interval_s >= 1800.0 / 8

    with pytest.raises(ValueError):
        estimate_change_rate(obs, min_obs=0)


def test_change_rate_single_shuffle_no_python(spark):
    from olx_spark.operators.recrawl import estimate_change_rate

    obs = spark.createDataFrame(
        [(i % 5, i % 2, 600.0) for i in range(50)],
        "url_fp long, changed int, interval_s double",
    )
    plan = (
        estimate_change_rate(obs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    final = plan.split("Initial Plan")[0]
    assert final.count("Exchange hashpartitioning") == 1  # one groupBy
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestFreshnessAllocation:
    @pytest.fixture(scope="class")
    def alloc(self, spark):
        from olx_spark.operators.recrawl import freshness_allocation

        import numpy as np

        rng = np.random.default_rng(11)
        rows = [
            (int(h), int(i), float(lam))
            for h in range(4)
            for i, lam in enumerate(rng.uniform(0.05, 5.0, size=40))
        ]
        df = spark.createDataFrame(rows, "host long, id long, lam double")
        out = freshness_allocation(df, "host", "id", "lam", budget_per_host=6.0)
        return rows, out.collect()

    def test_budget_exhausted_exactly(self, alloc):
        _, got = alloc
        by_host = {}
        for r in got:
            by_host.setdefault(r["host"], 0.0)
            by_host[r["host"]] += r["freq"]
        for h, tot in by_host.items():
            assert abs(tot - 6.0) < 1e-9, (h, tot)

    def test_kkt_optimality(self, alloc):
        # concave objective: equal marginal gain lam/(f+lam)^2 = mu on
        # the active set, and 1/lam <= mu for every inactive page —
        # these conditions CERTIFY the global optimum
        _, got = alloc
        by_host = {}
        for r in got:
            by_host.setdefault(r["host"], []).append(r)
        for h, rows in by_host.items():
            act = [r for r in rows if r["active"] == 1]
            inact = [r for r in rows if r["active"] == 0]
            mus = [r["lam"] / (r["freq"] + r["lam"]) ** 2 for r in act]
            mu = mus[0]
            assert all(abs(m - mu) < 1e-9 for m in mus), h
            for r in inact:
                assert 1.0 / r["lam"] <= mu + 1e-9, (h, r["lam"])

    def test_fastest_pages_skipped(self, alloc):
        # the paper's headline: pages changing too fast get ZERO visits
        _, got = alloc
        for h in range(4):
            rows = sorted(
                (r for r in got if r["host"] == h), key=lambda r: r["lam"]
            )
            actives = [r["active"] for r in rows]
            # active is a prefix of the lam-sorted order
            assert actives == sorted(actives, reverse=True)
            assert rows[0]["active"] == 1

    def test_nonnegative_and_freshness_formula(self, alloc):
        _, got = alloc
        for r in got:
            assert r["freq"] >= 0.0
            if r["freq"] > 0:
                want = r["freq"] / (r["freq"] + r["lam"])
                assert abs(r["freshness"] - want) < 1e-12
            else:
                assert r["freshness"] == 0.0
