"""N-gram language-model perplexity filtering — the CCNet-style
quality stage: train a bigram LM with stupid backoff on a deterministic
slice of the corpus, score every document's per-token log-probability,
and bucket the corpus into head/middle/tail by perplexity terciles.

The reference engine has no LM stage (its text columns are projected
verbatim, `Model.scala:24`); this backs the engine's LLM-training-data
pipeline brief (CCNet, Wenzek et al. 2020, uses a KenLM 5-gram; the
distributed shape — count tables + vocab-keyed score joins — is
identical, only the smoothing differs).

Model (stupid backoff, Brants et al. 2007):

- Token stream per document: ``['<s>'] ++ tokens`` (shared
  ``norm_text`` + single-space split; the sentinel gives the first
  token a context — a web token that literally normalizes to ``<s>``
  would alias it, acceptable for this heuristic stage).
- ``S(w | w_prev) = c(w_prev, w) / c(w_prev)`` when the bigram was
  seen in training, else ``alpha * c(w) / N`` when the unigram was,
  else ``alpha / N`` (OOV floor). ``N`` = total training stream
  tokens (sentinels included). Stupid backoff is an unnormalized
  score, which is exactly why it distributes: counts only, no
  discount normalization pass.
- Per document: ``logprob`` = mean log10 S over its ``n_tokens``
  transitions (rounded to 6), ``ppl = round(10^-logprob, 4)``,
  ``bucket`` = ``head``/``middle``/``tail`` by the corpus terciles of
  ``ppl`` (lower perplexity = head, the CCNet convention), or
  ``empty`` for zero-token documents.

Scale design (100 TB):

- Training counts are two map-side-combinable groupBys over the
  exploded train-slice stream (unigrams, bigrams) — vocabulary-sized
  outputs, corpus-sized inputs, each ONE shuffle.
- The train slice is a shuffle-free fate-hash filter (same salted
  md5-60 contract as ``sampling.py`` — re-runs and late docs land in
  the same slice).
- Scoring joins are VOCABULARY-keyed shuffled joins, never broadcast
  by the operator (a 100-TB vocabulary is billions of keys; AQE may
  still broadcast small fitted tables at small scale, and splits hot
  stop-word keys at large). ``c(w_prev)`` is folded INTO the bigram
  table at fit time (vocab-sized join once) so scoring pays exactly
  TWO corpus-scale joins: bigram lookup, then unigram backoff lookup.
- Tercile thresholds are two corpus-scalar percentiles riding a
  broadcast 1-row cross join (the ``bm25_top_terms`` stats pattern) —
  no global sort, no driver collect. At 100 TB swap ``percentile``
  for ``approx_percentile`` and relax the oracle to a tolerance
  check (same trade ``q_quantiles`` documents).
- No Python UDFs anywhere — stream/bigram construction is
  ``transform``/``sequence`` HOFs, scoring is codegen arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olx_spark.functions.text import let_, md5_60, norm_text

SENTINEL = "<s>"


def _token_stream(text_col: str) -> Column:
    """``['<s>'] ++ whitespace tokens of normalized text``; just the
    sentinel for blank text."""
    c = F.col(text_col)
    toks = F.when(
        F.length(F.trim(c)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(norm_text(c), " "))
    return F.concat(F.array(F.lit(SENTINEL)), toks)


def _bigrams(stream: Column) -> Column:
    """array<struct<w_prev,w>> of adjacent pairs; empty for the
    bare-sentinel stream. let_-bound: each pair references the stream
    twice (see functions.text.let_)."""

    def body(s: Column) -> Column:
        # guard the bare-sentinel stream: Spark's sequence(1, 0) DESCENDS
        # ([1, 0]) instead of yielding an empty range
        return F.when(
            F.size(s) < 2,
            F.array().cast("array<struct<w_prev:string,w:string>>"),
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(s) - 1),
                lambda i: F.struct(
                    F.element_at(s, i.cast("int")).alias("w_prev"),
                    F.element_at(s, (i + 1).cast("int")).alias("w"),
                ),
            )
        )

    return let_(stream, body)


def train_slice(docs: DataFrame, id_col: str = "doc_id", frac_pct: int = 30,
                salt: str = "lm-train-v1") -> DataFrame:
    """Deterministic fate-hash training slice (~``frac_pct``% of
    docs): shuffle-free filter, stable across re-runs/late rows."""
    h = md5_60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return docs.filter(F.pmod(h, F.lit(100)) < frac_pct)


def fit_bigram_lm(
    train: DataFrame, *, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables of the stupid-backoff bigram LM.

    Returns ``(unigrams, bigrams, totals)``: ``unigrams(w, c_w)``,
    ``bigrams(w_prev, w, c_bi, c_prev)`` (context count pre-joined —
    one vocab-sized join here saves a corpus-sized join per scoring
    pass), ``totals(n_total)`` — one row.
    """
    from olx_spark.session import materialize

    stream = train.select(F.explode(_token_stream(text_col)).alias("w"))
    # the unigram table feeds three branches with three DIFFERENT
    # downstream partitionings (join on w, join renamed to w_prev,
    # global total) — no exchange reuse applies, so without a cut the
    # train-corpus explode+count runs once per branch. The table is
    # vocab-sized (<< corpus), so materialize it once.
    unigrams = materialize(
        stream.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    )
    bigrams = (
        train.select(F.explode(_bigrams(_token_stream(text_col))).alias("bg"))
        .select("bg.w_prev", "bg.w")
        .groupBy("w_prev", "w")
        .agg(F.count(F.lit(1)).alias("c_bi"))
        .join(
            unigrams.select(F.col("w").alias("w_prev"), F.col("c_w").alias("c_prev")),
            "w_prev",
        )
    )
    totals = unigrams.agg(F.sum("c_w").alias("n_total"))
    return unigrams, bigrams, totals


def perplexity_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    totals: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document stupid-backoff score:
    ``(id_col, n_tokens, logprob, ppl)`` — ``n_tokens`` transitions
    scored (= token count), ``logprob`` mean log10 score rounded to 6,
    ``ppl = round(10^-logprob, 4)``; zero-token docs get
    ``n_tokens=0`` and null ``logprob``/``ppl``."""
    pairs = docs.select(
        F.col(id_col), F.explode(_bigrams(_token_stream(text_col))).alias("bg")
    ).select(id_col, "bg.w_prev", "bg.w")
    scored = (
        pairs.join(bigrams, ["w_prev", "w"], "left")
        .join(unigrams, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.log10(
                F.when(
                    F.col("c_bi").isNotNull(),
                    F.col("c_bi").cast("double") / F.col("c_prev"),
                )
                .when(
                    F.col("c_w").isNotNull(),
                    F.lit(alpha) * F.col("c_w") / F.col("n_total"),
                )
                .otherwise(F.lit(alpha) / F.col("n_total"))
            ).alias("lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("lp") / F.count(F.lit(1)), 6).alias("logprob"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.col("logprob"),
            F.round(F.pow(F.lit(10.0), -F.col("logprob")), 4).alias("ppl"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pct: int = 30,
    alpha: float = 0.4,
) -> DataFrame:
    """End-to-end CCNet-style stage: fit on the fate-hash slice, score
    ALL documents, bucket by corpus perplexity terciles.

    Returns ``(id_col, n_tokens, logprob, ppl, bucket)`` with
    ``bucket`` in ``head`` (lowest-ppl third) / ``middle`` / ``tail``
    / ``empty`` (zero tokens)."""
    uni, bi, tot = fit_bigram_lm(
        train_slice(docs, id_col=id_col, frac_pct=train_pct), text_col=text_col
    )
    # the scored frame feeds BOTH the tercile percentiles and the
    # output — materialize once (lineage cut via the repo's
    # reliable-checkpoint knob, session.materialize) so the
    # corpus-scale fit+score pipeline doesn't execute twice
    from pyspark.sql import Observation

    from olx_spark.session import materialize

    # the tercile cuts ride the materialize as observe accumulators
    # (r6): exact percentile is order-independent and skips nulls, so
    # the observed values equal the former filtered 1-row agg (and
    # its broadcast cross join) — one less plan stage per call; safe
    # because localCheckpoint computes every row (cf. the observe
    # caveat in similarity._productive_buckets, which is about
    # frames BELOW a join)
    obs = Observation()
    scores = materialize(
        perplexity_score(
            docs, uni, bi, tot, id_col=id_col, text_col=text_col, alpha=alpha
        ).observe(
            obs,
            F.percentile("ppl", 1.0 / 3.0).alias("t1"),
            F.percentile("ppl", 2.0 / 3.0).alias("t2"),
        )
    )
    cuts = obs.get
    t1 = F.lit(cuts["t1"]).cast("double")
    t2 = F.lit(cuts["t2"]).cast("double")
    return scores.select(
        id_col,
        "n_tokens",
        "logprob",
        "ppl",
        F.when(F.col("ppl").isNull(), F.lit("empty"))
        .when(F.col("ppl") <= t1, F.lit("head"))
        .when(F.col("ppl") <= t2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
