"""PMI collocation mining — pointwise mutual information over adjacent
word pairs, the classic phrase-detection stage (Church & Hanks 1990;
the word2vec phrase pass of Mikolov et al. 2013 is the same counts
with a different score). A training-data pipeline uses it to find
multi-word expressions worth treating as single tokens and to audit
boilerplate ("click here", "all rights reserved" score high). The
reference engine has no text-statistics stage (`Model.scala:24`
projects text verbatim), so this backs the pipeline brief.

Score, for an adjacent pair (a, b)::

    pmi(a, b) = ln( p(a,b) / (p(a) p(b)) )
              = ln( (c_ab * N * N) / (B * c_a * c_b) )

with ``c_ab`` the pair count over all adjacent positions, ``B`` the
total number of adjacent positions (bigram tokens), ``c_a``/``c_b``
unigram counts and ``N`` total tokens. The single-fraction form is
evaluated in ONE fixed double expression shape so the DuckDB oracle
reproduces it bit-for-bit before rounding; counts stay exact int64
end-to-end (the only floats are the final cast + ln).

Scale design (100 TB):

- Two corpus-scale explodes (unigrams, adjacent pairs), each feeding
  ONE map-side-combinable groupBy — partial aggregation absorbs the
  Zipf skew of hot words before the shuffle, so the shuffled rows are
  vocab-sized / pair-vocab-sized, not corpus-sized.
- The pair table joins unigram counts twice, keyed on the word —
  vocab-keyed shuffled joins of two already-aggregated tables (never
  corpus-scale); AQE broadcasts them while they fit.
- Corpus totals (N, B) are 1-row aggregates riding explicit broadcast
  cross joins.
- ``min_count`` prunes the pair table BEFORE the joins — the
  classic support threshold that also bounds output size; no
  silent cap beyond it.
- Adjacent pairs are built with ``transform``/``sequence`` HOFs over
  the token array (evaluated once per row via ``let_``) — no Python
  UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olx_spark.functions.text import let_, norm_text


def _tokens(text_col: str) -> Column:
    c = F.col(text_col)
    return F.when(
        F.length(F.trim(c)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(norm_text(c), " "))


def _adjacent_pairs(toks: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs (no sentinel —
    document boundaries do not form pairs); empty below 2 tokens."""

    def body(s: Column) -> Column:
        return F.when(
            F.size(s) < 2,
            F.array().cast("array<struct<w1:string,w2:string>>"),
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(s) - 1),
                lambda i: F.struct(
                    F.element_at(s, i.cast("int")).alias("w1"),
                    F.element_at(s, (i + 1).cast("int")).alias("w2"),
                ),
            )
        )

    return let_(toks, body)


def pmi_collocations(
    docs: DataFrame, *, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """All adjacent pairs with ``c_pair >= min_count`` and their PMI.

    Returns ``(w1, w2, c_pair, pmi)`` with ``pmi`` rounded to 6.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    uni = (
        docs.select(F.explode(_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    totals = uni.agg(F.sum("c_w").alias("n_tok"))
    pairs = (
        docs.select(F.explode(_adjacent_pairs(_tokens(text_col))).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
    )
    b_tot = pairs.agg(F.sum("c_pair").alias("n_pair"))
    return (
        pairs.filter(F.col("c_pair") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_w2")), "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(b_tot))
        .select(
            "w1", "w2", "c_pair",
            F.round(
                F.log(
                    (F.col("c_pair").cast("double") * F.col("n_tok") * F.col("n_tok"))
                    / (
                        F.col("n_pair").cast("double")
                        * F.col("c_w1")
                        * F.col("c_w2")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
