"""Multinomial Naive Bayes classifier (operators/classify.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from olx_spark.operators.classify import nb_classify


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_nb_separable_corpus_ground_truth(spark):
    # two classes with disjoint vocabularies; hand-computed NB must
    # label every held-out doc with the class whose words it uses.
    # train_pct=100 would leave nothing to score, so mark fate by a
    # generous slice and check only scored docs.
    rows = [
        (i, "a", "apple apple banana") for i in range(0, 40, 2)
    ] + [
        (i, "b", "carrot daikon daikon") for i in range(1, 40, 2)
    ]
    out = nb_classify(_docs(spark, rows), train_pct=60).collect()
    assert out  # the fate hash leaves a non-empty held-out set
    for r in out:
        assert r.label_pred == r.label_true
        assert r.correct == 1


def test_nb_score_matches_hand_computation(spark):
    # tiny fixed split: force train/test by choosing ids whose fate
    # hashes land on each side, then verify one doc's winning score
    # against the closed-form add-one NB formula.
    from olx_spark.functions.text import md5_60

    base = _docs(
        spark,
        [(i, "x" if i % 2 == 0 else "y", "u v" if i % 2 == 0 else "u w")
         for i in range(60)],
    )
    fate = base.select(
        "doc_id",
        F.pmod(
            md5_60(F.concat(F.lit("nb-train-v1:"), F.col("doc_id").cast("string"))),
            F.lit(100),
        ).alias("f"),
    ).collect()
    train_ids = {r.doc_id for r in fate if r.f < 70}
    test_ids = {r.doc_id for r in fate if r.f >= 70}
    assert train_ids and test_ids
    out = {r.doc_id: r for r in nb_classify(base, train_pct=70).collect()}
    assert set(out) == test_ids

    # closed-form: counts over the train slice
    tr = [(i, "x" if i % 2 == 0 else "y") for i in sorted(train_ids)]
    n_tr = len(tr)
    nx = sum(1 for _, c in tr if c == "x")
    ny = n_tr - nx
    # class x docs: tokens (u, v); class y docs: tokens (u, w)
    c = {("x", "u"): nx, ("x", "v"): nx, ("y", "u"): ny, ("y", "w"): ny}
    t = {"x": 2 * nx, "y": 2 * ny}
    vocab = {"u", "v", "w"}
    v = len(vocab)
    prior = {"x": nx / n_tr, "y": ny / n_tr}

    def score(doc_tokens, cls):
        s = math.log(prior[cls])
        nd = sum(1 for w in doc_tokens if w in vocab)
        s -= nd * math.log(t[cls] + v)
        for w in doc_tokens:
            if w in vocab:
                s += math.log(c.get((cls, w), 0) + 1)
        return s

    some_id = sorted(test_ids)[0]
    toks = ["u", "v"] if some_id % 2 == 0 else ["u", "w"]
    sx, sy = score(toks, "x"), score(toks, "y")
    want_cls = "x" if sx >= sy else "y"  # label-asc tie-break
    got = out[some_id]
    assert got.label_pred == want_cls
    assert abs(got.nb_logscore - round(score(toks, want_cls), 6)) < 1e-6


def test_nb_oov_and_blank_docs_fall_back_to_prior(spark):
    # held-out docs whose tokens were never seen in training (or blank
    # docs) score prior-only: predicted label = majority train class
    # (ties broken label-asc), never a crash or a dropped row.
    rows = [(i, "big" if i % 3 else "small", "zig zag") for i in range(90)]
    # make the held-out docs OOV / blank
    rows = [
        (i, lang, "" if i % 7 == 0 else ("novel%d token%d" % (i, i)))
        if i % 5 == 0 else (i, lang, txt)
        for (i, lang, txt) in rows
    ]
    df = _docs(spark, rows)
    out = nb_classify(df, train_pct=50)
    test_n = out.count()
    # every held-out doc present exactly once
    from olx_spark.functions.text import md5_60

    expect = df.filter(
        F.pmod(
            md5_60(F.concat(F.lit("nb-train-v1:"), F.col("doc_id").cast("string"))),
            F.lit(100),
        ) >= 50
    ).count()
    assert test_n == expect
    assert out.filter(F.col("label_pred").isNull()).count() == 0


def test_nb_no_python_udfs_in_plan(spark):
    plan = nb_classify(
        _docs(spark, [(i, "a" if i % 2 else "b", "t%d x" % i) for i in range(30)])
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
