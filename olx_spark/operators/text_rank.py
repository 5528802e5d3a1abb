"""BM25 term scoring over a document corpus — the quality-weighting /
retrieval primitive of a training-data pipeline (salient-term
extraction, dedup-cluster representative choice, retrieval-augmented
filtering).

The reference engine has no text-ranking operator (its text columns
are projected verbatim, `Model.scala:24`); this backs the engine's
pipeline brief alongside the dedup/quality family.

Scale design (100 TB):

- Tokenize with the same `norm_text` + single-space split the rest of
  the text family uses (JVM codegen, no Python).
- ONE explode pass: the exploded token stream collapses immediately
  into the (doc, term) frequency table, which is materialized once
  (``session.materialize``, reliable-knob) because every downstream
  branch — document length, document frequency, and the scoring join
  — derives from it. Document length is ``sum(tf)`` per doc (equal to
  the token count by construction), so nothing else ever re-reads the
  token stream; without the cut Spark would re-run the explode per
  branch (4x on this shape).
- The document-frequency table is vocabulary-sized — potentially
  billions of terms — so it joins on ``term`` as a regular shuffled
  hash join (NEVER broadcast); AQE handles stop-word skew by
  splitting the hot term partitions.
- The corpus-global scalars (doc count, average length) ride a
  broadcast 1-row cross join, not a driver collect.
- Top-k per document is one ``row_number`` window, partitioned by the
  document id — embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olx_spark.functions.text import norm_text


def bm25_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_dec: int = 6,
) -> DataFrame:
    """Top-``k`` terms per document by BM25 weight (the classic
    Robertson/Sparck-Jones probabilistic idf — always positive in the
    ``ln(1 + ...)`` form), deterministic tie-break by term.

    Returns ``(id_col, rk, term, score)`` with ``score`` rounded to
    ``round_dec`` and ``rk`` ranked on the ROUNDED score so the order
    is reproducible across engines computing in double precision.
    Blank documents produce no rows (no tokens, no terms).
    """
    from olx_spark.session import materialize

    toks = docs.select(
        F.col(id_col), F.explode(F.split(norm_text(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = materialize(
        toks.groupBy(id_col, "term").agg(F.count("*").cast("double").alias("tf"))
    )
    # dlen == token count == sum of per-term counts: derive it from tf
    # so the explode never runs a second time
    dlen = tf.groupBy(id_col).agg(F.sum("tf").alias("dlen"))
    stats = dlen.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dlen").alias("avg_dlen"),
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dlen") / F.col("avg_dlen")
    )
    scored = (
        tf.join(dlen, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            "term",
            F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / denom, round_dec).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "rk", "term", "score")
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_dec: int = 6,
) -> DataFrame:
    """Query-time retrieval: the global top-``k`` documents by summed
    BM25 over ``query_terms`` — the search half of the
    index/BM25 stack (``operators/index.py`` builds the posting lists;
    this scores against them at query time).

    Scale design: corpus statistics (tf, doc length, avg length) come
    from the SAME one-explode materialized tf table as
    :func:`bm25_top_terms`; the query filter — an ``isin`` over a
    literal term set — cuts the scoring join to ``|query|`` terms
    BEFORE any join runs, so per-query cost is proportional to the
    query terms' posting lists, not the corpus. The final top-k is a
    global :func:`~olx_spark.operators.ranking.ordered_limit`
    (``TakeOrderedAndProject`` — distributed partial top-k, never a
    global window). Query terms absent from the corpus contribute
    nothing (no tf rows). The doc score is rounded to ``round_dec``
    and ranked on the ROUNDED value with a doc-id tie-break, so the
    ranking is reproducible across engines summing doubles in
    different orders.
    """
    from olx_spark.operators.ranking import ordered_limit
    from olx_spark.session import materialize

    terms = sorted({t for t in query_terms if t})
    if not terms:
        raise ValueError("query_terms must contain at least one non-empty term")
    toks = docs.select(
        F.col(id_col), F.explode(F.split(norm_text(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = materialize(
        toks.groupBy(id_col, "term").agg(F.count("*").cast("double").alias("tf"))
    )
    dlen = tf.groupBy(id_col).agg(F.sum("tf").alias("dlen"))
    stats = dlen.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dlen").alias("avg_dlen"),
    )
    qtf = tf.filter(F.col("term").isin(terms))
    dfreq = qtf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dlen") / F.col("avg_dlen")
    )
    scored = (
        qtf.join(dlen, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * F.lit(k1 + 1.0) / denom), round_dec
            ).alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    return ordered_limit(
        scored, k, order_cols=[F.col("score").desc(), F.col(id_col).asc()]
    )
