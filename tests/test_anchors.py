"""Anchor-text profiles: counts, modal anchor, deterministic
tie-break, distinct-source counting, and the no-window/no-Python
plan."""

import pytest

from olx_spark.operators.anchors import anchor_text_profile


@pytest.fixture(scope="module")
def prof(spark):
    rows = [
        # dst 1: "home" x2 (from the SAME src twice), "shop" x2 from
        # two srcs -> tie on count, 'home' < 'shop' wins the tie-break
        (10, 1, "home"), (10, 1, "home"), (11, 1, "shop"), (12, 1, "shop"),
        # dst 2: clear winner "buy" x3, plus a singleton
        (10, 2, "buy"), (11, 2, "buy"), (12, 2, "buy"), (13, 2, "zzz"),
        # dst 3: one link
        (10, 3, "only"),
    ]
    df = spark.createDataFrame(rows, "src_fp long, dst_fp long, anchor string")
    out = anchor_text_profile(df)
    return out, {r.dst_fp: r for r in out.collect()}


def test_counts_and_mode(prof):
    _, h = prof
    assert h[2].n_links == 4 and h[2].n_unique_srcs == 4
    assert h[2].n_unique_anchors == 2
    assert (h[2].top_anchor, h[2].top_anchor_n) == ("buy", 3)
    assert (h[3].n_links, h[3].top_anchor, h[3].top_anchor_n) == (1, "only", 1)


def test_tie_break_lex_smallest(prof):
    _, h = prof
    assert h[1].n_links == 4
    assert h[1].n_unique_srcs == 3  # src 10 counted once
    assert (h[1].top_anchor, h[1].top_anchor_n) == ("home", 2)


def test_plan_no_window_no_python(prof):
    out, _ = prof
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # argmax is a single-expression agg
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
