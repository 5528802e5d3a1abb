"""Multinomial Naive Bayes document classifier — the fastText-style
quality/language classifier stage of an LLM training-data pipeline
(GPT-3 / LLaMA data work trains a simple linear classifier on a
curated slice and scores the whole corpus; CCNet's fastText lang-id is
the same shape). The reference engine has no classifier stage (its
text columns are projected verbatim, `Model.scala:24`), so this backs
the pipeline brief rather than reference parity.

Model (multinomial NB, add-one smoothing, log domain):

- Train on a deterministic fate-hash slice (~``train_pct``% of docs,
  same salted md5-60 contract as ``lm.train_slice`` — re-runs and
  late-arriving docs land in the same slice), score the REMAINDER
  (the held-out docs a pipeline would actually label).
- ``score(d, c) = ln P(c) + sum_w tf_w(d) * ln((c_wc + 1)/(T_c + V))``
  over the doc's IN-VOCABULARY tokens (w seen anywhere in training).
  Out-of-vocabulary tokens are dropped — with add-one smoothing their
  likelihood ``1/(T_c+V)`` is what the vocabulary-restricted form
  already charges via the ``-n_d * ln(T_c + V)`` term only for known
  words; dropping OOV entirely keeps the decision rule a pure
  function of the training counts (the fastText convention for
  hash-bucket misses is analogous).
- Smoothing is FIXED at alpha=1: the per-(doc, class) sum then only
  needs the (w, c) pairs that exist in the count table — an absent
  pair contributes ``tf * ln(0 + 1) = 0``, so a left join + coalesce
  is EXACT, not an approximation. A general alpha would need a dense
  doc x class x vocab grid (corpus x V blow-up) or a second
  correction join; alpha=1 is also what the add-one references use.
- Prediction: argmax score, ties broken by label ascending (total
  order -> deterministic, oracle-replayable).

Scale design (100 TB):

- Fitting = one corpus-scale explode + TWO map-side-combinable
  groupBys ((label, w) counts; per-class totals fold from the first).
  Output is vocab x classes rows — millions, not corpus-scale.
- Scoring: per-doc term frequencies (one explode + groupBy, ONE
  corpus-scale shuffle on (doc, w)), then a vocabulary-keyed join
  against the count table — shuffled on ``w``, never broadcast by the
  operator (a web-scale vocabulary is billions of keys; AQE still
  broadcasts small fitted tables at small scale and splits hot
  stop-word keys at large). The class table (one row per class:
  prior, denominator) IS tiny by construction and rides an explicit
  broadcast cross join.
- The doc x class grid is |test docs| x |classes| rows — linear in
  the corpus with a small constant (5-100 classes), grouped back to
  one row per doc by the argmax window. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olx_spark.functions.text import md5_60, norm_text
from olx_spark.session import materialize


def _tokens(text_col: str):
    """Whitespace tokens of normalized text; empty array for blank."""
    c = F.col(text_col)
    return F.when(
        F.length(F.trim(c)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(norm_text(c), " "))


def nb_classify(
    docs: DataFrame,
    *,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 70,
    salt: str = "nb-train-v1",
) -> DataFrame:
    """Fit multinomial NB on the fate-hash train slice of ``docs`` and
    score the held-out remainder.

    Returns one row per held-out doc: ``(id_col, label_true,
    label_pred, nb_logscore, correct)`` with ``nb_logscore`` the
    winning class's log score rounded to 6 (prediction happens on the
    unrounded score).
    """
    fate = F.pmod(
        md5_60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        F.lit(100),
    )
    # materialized ONCE (round-6): the tokenized frame feeds the fit
    # explode, the class-prior counts, the train count and both test
    # paths — un-cut, each consumer re-runs the corpus tokenization
    # (the same one-materialized-pass trade as the MinHash signature
    # table); the cut is O(corpus tokens), executor-resident/spillable
    # n_train rides the materialize as an observe accumulator (r6) —
    # the former 1-row agg subquery was one extra plan stage
    from pyspark.sql import Observation

    nt_obs = Observation()
    marked = materialize(
        docs.select(
            F.col(id_col), F.col(label_col).alias("label_true"),
            _tokens(text_col).alias("toks"), (fate < train_pct).alias("is_train"),
        ).observe(
            nt_obs, F.sum(F.col("is_train").cast("long")).alias("n_train")
        )
    )
    train = marked.filter("is_train")
    test = marked.filter(~F.col("is_train"))

    # --- fit: (label, w) counts -> class totals + priors + vocab size
    tw = train.select(
        F.col("label_true").alias("label"), F.explode("toks").alias("w")
    )
    # materialized: the fitted count table is vocab x classes rows
    # (tiny) and has FOUR consumers (class totals, vocab size, the OOV
    # filter, the scoring join) — the cut is free and deletes three
    # re-aggregations
    c_wc = materialize(
        tw.groupBy("label", "w").agg(F.count(F.lit(1)).alias("c_wc"))
    )
    # class table: token total T_c, doc count, prior — one row/class
    t_c = c_wc.groupBy("label").agg(F.sum("c_wc").alias("t_c"))
    docs_c = train.groupBy(F.col("label_true").alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    v_tot = c_wc.select("w").distinct().agg(
        F.count(F.lit(1)).alias("v"),
    )
    n_train = int(nt_obs.get["n_train"] or 0)
    classes = (
        t_c.join(docs_c, "label")
        .crossJoin(F.broadcast(v_tot))
        .select(
            "label",
            F.log(
                F.col("n_docs").cast("double") / F.lit(float(n_train))
            ).alias("ln_prior"),
            F.log((F.col("t_c") + F.col("v")).cast("double")).alias("ln_denom"),
        )
    )

    # --- score: per-doc tf over the train vocabulary
    vocab = c_wc.select("w").distinct()
    # materialized (r6): tf feeds BOTH the seen-pair sum and the
    # per-doc token total — un-cut, the test-side explode + vocab
    # join + groupBy ran twice
    tf = materialize(
        test.select(id_col, F.explode("toks").alias("w"))
        .join(vocab, "w")  # drop OOV (see module doc)
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # per-(doc, class) sum over SEEN (w, c) pairs: tf * ln(c_wc + 1);
    # absent pairs contribute ln(1) = 0, so the later coalesce is exact
    seen = (
        tf.join(c_wc, "w")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("tf") * F.log(F.col("c_wc") + 1.0)).alias("s_seen"))
    )
    per_doc = tf.groupBy(id_col).agg(F.sum("tf").alias("n_d"))
    # every held-out doc (blank docs have no tf rows: n_d = 0 -> prior-only)
    grid = (
        test.select(id_col, "label_true")
        .join(per_doc, id_col, "left")
        .na.fill({"n_d": 0})
        .crossJoin(F.broadcast(classes))
        .join(seen, [id_col, "label"], "left")
        .na.fill({"s_seen": 0.0})
        .select(
            id_col, "label_true", "label",
            (
                F.col("ln_prior") + F.col("s_seen")
                - F.col("n_d").cast("double") * F.col("ln_denom")
            ).alias("score"),
        )
    )
    # windowless argmax (r6): min-of-struct over (-score, label) is
    # the same (score desc, label asc) total order as the former
    # row_number window, as a hash aggregate with no per-doc sort;
    # labels are distinct per doc so the trailing carried fields are
    # never consulted by the comparison
    return (
        grid.groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("ns"),
                    F.col("label").alias("l"),
                    F.col("score").alias("sc"),
                    F.col("label_true").alias("lt"),
                )
            ).alias("b")
        )
        .select(
            id_col,
            F.col("b.lt").alias("label_true"),
            F.col("b.l").alias("label_pred"),
            F.round("b.sc", 6).alias("nb_logscore"),
            (F.col("b.l") == F.col("b.lt")).cast("int").alias("correct"),
        )
    )
