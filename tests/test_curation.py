"""LAION/DataComp-style curation: rule precedence, survivor-only phash
dedup, deterministic rank winners, and the one-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.curation import curate_image_captions


@pytest.fixture(scope="module")
def verdicts(spark):
    rows = [
        # (image_id, w, h, caption, phash)
        ("img-ok", 64, 64, "red tower in kyiv", 1),
        ("img-tiny", 64, 32, "red tower in kyiv", 2),        # min side 32 < 48
        ("img-wide", 176, 64, "red tower in kyiv", 3),       # aspect 176/64 = 2.75 > 2.5
        ("img-aspect-edge", 160, 64 + 0, "x", 3),            # placeholder, replaced below
        ("img-one-word", 64, 64, "  tower  ", 4),
        ("img-empty", 64, 64, "   ", 5),
        ("img-null", 64, 64, None, 6),
        ("img-long", 64, 64, " ".join(["w"] * 65), 7),
        ("img-junk", 64, 64, "#### 1234 !!! 555", 8),
        # phash-dup family: aa- wins over img-ok (lexicographic)
        ("aa-dup", 64, 64, "blue tower in lviv", 1),
        ("zz-dup", 64, 64, "old tower in odesa", 1),
        # dup of a FAILING row: must still be kept (rank over passers only)
        ("ok-shadow", 64, 64, "clean caption here", 2),
        # both rules violated: FIRST failing rule names the drop
        ("img-tiny-and-junk", 16, 16, "####", 9),
    ]
    # fix the placeholder: aspect exactly 2.5 passes (rule is strict >)
    rows[3] = ("img-aspect-edge", 120, 48, "grey tower in dnipro", 10)
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, caption string, phash long"
    )
    out = curate_image_captions(df)
    return {r["image_id"]: (r["drop_reason"], r["kept"], r["n_words"]) for r in out.collect()}


def test_rule_precedence_and_reasons(verdicts):
    assert verdicts["img-tiny"] == ("resolution", 0, 4)
    assert verdicts["img-wide"] == ("aspect", 0, 4)
    assert verdicts["img-one-word"] == ("caption_short", 0, 1)
    assert verdicts["img-empty"] == ("caption_short", 0, 0)
    assert verdicts["img-null"] == ("caption_short", 0, 0)
    assert verdicts["img-long"] == ("caption_long", 0, 65)
    assert verdicts["img-junk"] == ("caption_quality", 0, 4)
    assert verdicts["img-tiny-and-junk"][0] == "resolution"  # first rule wins


def test_dedup_is_survivor_only_and_deterministic(verdicts):
    # smallest image_id among PASSING rows wins the phash group
    assert verdicts["aa-dup"][:2] == ("", 1)
    assert verdicts["img-ok"][:2] == ("dup_phash", 0)
    assert verdicts["zz-dup"][:2] == ("dup_phash", 0)
    # a failing row never shadows a keepable survivor
    assert verdicts["ok-shadow"][:2] == ("", 1)
    # boundary: aspect exactly max_aspect is kept
    assert verdicts["img-aspect-edge"][:2] == ("", 1)


def test_plan_one_shuffle_no_python(spark):
    from olx_spark.fixtures.images import make_image_row

    rows = [
        (r["image_id"], r["w"], r["h"], r["caption"], r["phash"])
        for r in (make_image_row(i, seed=3, with_bytes=False) for i in range(40))
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, caption string, phash long"
    )
    plan = (
        curate_image_captions(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one Exchange (the dedup window's hash partitioning on
    # (phash, passed)); every rule is a JVM expression — no Python
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- clip filter


def _clip_replay(rows, keep_frac):
    """Independent Python replay of clip_score_filter semantics:
    left-fold double cosine, rank by (score desc, id asc), keep
    ceil(frac * n_scored). Returns {id: (round(score,6)|None, kept)}."""
    import math as m

    scored = []
    out = {}
    for rid, a, b in rows:
        if a is None or b is None or not a or not b:
            out[rid] = (None, 0)
            continue
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        den = m.sqrt(na) * m.sqrt(nb)
        if den <= 0.0:
            out[rid] = (None, 0)
            continue
        scored.append((rid, dot / den))
    k = min(len(scored), m.ceil(keep_frac * len(scored)))
    keep = {rid for rid, _ in sorted(scored, key=lambda t: (-t[1], t[0]))[:k]}
    for rid, s in scored:
        out[rid] = (round(s, 6), int(rid in keep))
    return out


def _clip_rows(n=60, seed=11):
    import random

    rng = random.Random(seed)
    rows = [
        (f"p{i:03d}", [rng.uniform(-1, 1) for _ in range(6)],
         [rng.uniform(-1, 1) for _ in range(6)])
        for i in range(n)
    ]
    rows += [
        ("z-null-img", None, [1.0] * 6),
        ("z-null-txt", [1.0] * 6, None),
        ("z-zero-img", [0.0] * 6, [1.0] * 6),
        ("z-empty", [], []),
        # exact ties: identical vector pairs -> identical score; the
        # id tiebreak decides who crosses the cut
        ("t-tie-a", [1.0, 0.0, 0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 0.0, 0.0, 0.0, 0.0]),
        ("t-tie-b", [1.0, 0.0, 0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 0.0, 0.0, 0.0, 0.0]),
    ]
    return rows


@pytest.mark.parametrize("keep_frac", [0.0, 0.1, 1.0 / 3.0, 0.9, 1.0])
@pytest.mark.parametrize("score_buckets", [1, 4, 1024])
def test_clip_filter_matches_replay(spark, keep_frac, score_buckets):
    from olx_spark.operators.curation import clip_score_filter

    rows = _clip_rows()
    df = spark.createDataFrame(
        rows, "image_id string, img_vec array<double>, txt_vec array<double>"
    )
    got = {
        r["image_id"]: (r["clip_score"], r["kept"])
        for r in clip_score_filter(
            df, keep_frac=keep_frac, score_buckets=score_buckets
        ).collect()
    }
    assert got == _clip_replay(rows, keep_frac)


def test_clip_filter_degenerates_never_kept_and_dont_count(spark):
    from olx_spark.operators.curation import clip_score_filter

    # 3 scorable rows + 3 degenerate: ceil(0.5 * 3) = 2 kept (NOT
    # ceil(0.5 * 6) = 3 — degenerates are outside n)
    rows = [
        ("a", [1.0, 0.0], [1.0, 0.0]),   # cs = 1.0
        ("b", [1.0, 0.0], [1.0, 1.0]),   # cs ~ 0.707
        ("c", [1.0, 0.0], [0.0, 1.0]),   # cs = 0.0
        ("d", None, [1.0, 0.0]),
        ("e", [0.0, 0.0], [1.0, 0.0]),
        ("f", [], [1.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, img_vec array<double>, txt_vec array<double>"
    )
    got = {
        r["image_id"]: (r["clip_score"], r["kept"])
        for r in clip_score_filter(df, keep_frac=0.5).collect()
    }
    assert got["a"] == (1.0, 1)
    assert got["b"] == (0.707107, 1)
    assert got["c"] == (0.0, 0)
    for rid in ("d", "e", "f"):
        assert got[rid] == (None, 0)


def test_clip_filter_tie_at_cut_prefers_smaller_id(spark):
    from olx_spark.operators.curation import clip_score_filter

    # two identical-score rows straddle the cut: k=1 -> 'aa' wins
    rows = [
        ("aa", [1.0, 0.0], [1.0, 0.0]),
        ("bb", [1.0, 0.0], [1.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, img_vec array<double>, txt_vec array<double>"
    )
    got = {
        r["image_id"]: r["kept"]
        for r in clip_score_filter(df, keep_frac=0.5).collect()
    }
    assert got == {"aa": 1, "bb": 0}


def test_clip_filter_validates_params(spark):
    from olx_spark.operators.curation import clip_score_filter

    df = spark.createDataFrame(
        [("a", [1.0], [1.0])],
        "image_id string, img_vec array<double>, txt_vec array<double>",
    )
    with pytest.raises(ValueError):
        clip_score_filter(df, keep_frac=1.5)
    with pytest.raises(ValueError):
        clip_score_filter(df, score_buckets=0)


def test_clip_filter_plan_no_python_no_smj(spark):
    from olx_spark.operators.curation import clip_score_filter

    rows = _clip_rows(n=200, seed=7)
    df = spark.createDataFrame(
        rows, "image_id string, img_vec array<double>, txt_vec array<double>"
    )
    # 0.37 forces a within-bucket boundary cut at fine buckets
    out = clip_score_filter(df, keep_frac=0.37, score_buckets=1024)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # cosine + bucketing are codegen expressions; the boundary id-set
    # joins back broadcast, never a sort-merge shuffle of the corpus
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    if "Join" in plan:
        assert "BroadcastHashJoin" in plan


# -------------------------------------------------- domain rollup ----

def test_domain_rollup_hand_computed(spark):
    from pyspark.sql import functions as F

    from olx_spark.operators.curation import domain_quality_rollup

    rows = [
        (1, "good", 0.9), (2, "good", 0.8),   # mean 0.85
        (3, "bad", 0.1), (4, "bad", 0.2),     # mean 0.15
    ]  # corpus mean 0.5
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = {r.doc_id: r for r in domain_quality_rollup(df).collect()}
    assert len(out) == 4
    assert out[1].host_quality == 0.85 and out[1].host_n == 2
    assert out[1].domain_ok == 1 and out[2].domain_ok == 1
    assert out[3].host_quality == 0.15 and out[3].domain_ok == 0
    # a doc's own score does not rescue it from a bad domain
    good_doc_bad_domain = spark.createDataFrame(
        rows + [(5, "bad", 0.99)], "doc_id long, source string, score double"
    )
    out2 = {r.doc_id: r for r in domain_quality_rollup(good_doc_bad_domain).collect()}
    assert out2[5].domain_ok == 0


def test_domain_rollup_broadcast_single_fact_scan(spark):
    from olx_spark.operators.curation import domain_quality_rollup

    df = spark.createDataFrame(
        [(i, f"s{i % 5}", float(i % 10) / 10) for i in range(100)],
        "doc_id long, source string, score double",
    )
    plan = (
        domain_quality_rollup(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -------------------------------------------------- boilerplate ----

def _bp_rows():
    # domain A (4 docs): footer in all 4 (df=4, 100%), nav in 2 (50%),
    # unique content lines. domain B (2 docs): a line shared by both
    # (df=2, 100%) and singles. domain C (1 doc): its footer has df=1
    # -> min_df=2 keeps it content even at 100% frequency.
    rows = []
    for d in range(4):
        rows.append((d, "A", "footerA"))
        if d < 2:
            rows.append((d, "A", "navA"))
        rows.append((d, "A", f"contentA{d}"))
    for d in (10, 11):
        rows.append((d, "B", "sharedB"))
        rows.append((d, "B", f"uniqB{d}"))
    rows.append((20, "C", "footerC"))
    return rows


def test_boilerplate_verdicts(spark):
    from olx_spark.operators.curation import boilerplate_lines

    df = spark.createDataFrame(
        _bp_rows(), "doc_id long, source string, line string"
    )
    out = {r.doc_id: r for r in boilerplate_lines(df).collect()}
    # A: footer (4/4) and nav (2/4 = 50% >= df_frac) are boilerplate
    assert out[0].n_lines == 3 and out[0].n_boiler == 2
    assert out[0].kept_chars == len("contentA0")
    assert out[3].n_lines == 2 and out[3].n_boiler == 1  # no nav row
    assert out[3].boiler_frac == 0.5
    # B: sharedB df=2 (100%) boiler; uniqB survive
    assert out[10].n_boiler == 1 and out[10].kept_chars == len("uniqB10")
    # C: single doc -> df=1 < min_df: nothing stripped
    assert out[20].n_boiler == 0 and out[20].kept_chars == len("footerC")


def test_boilerplate_min_df_and_frac_cut(spark):
    from olx_spark.operators.curation import boilerplate_lines

    df = spark.createDataFrame(
        _bp_rows(), "doc_id long, source string, line string"
    )
    # raise the bar past 50%: navA (2/4) is no longer boilerplate
    out = {
        r.doc_id: r
        for r in boilerplate_lines(df, df_frac=0.75).collect()
    }
    assert out[0].n_boiler == 1 and out[0].n_lines == 3
    # min_df=1 at 100%: C's lone footer becomes boilerplate
    out1 = {
        r.doc_id: r
        for r in boilerplate_lines(df, df_frac=1.0, min_df=1).collect()
    }
    assert out1[20].n_boiler == 1 and out1[20].kept_chars == 0
    with pytest.raises(ValueError):
        boilerplate_lines(df, df_frac=0.0)


def test_boilerplate_plan_broadcast_back_no_python(spark):
    from olx_spark.operators.curation import boilerplate_lines

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", f"line{i % 7}") for i in range(200)],
        "doc_id long, source string, line string",
    )
    plan = (
        boilerplate_lines(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the boilerplate set and the domain totals come back by broadcast
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
