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
