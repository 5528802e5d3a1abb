"""Exact set-similarity self-join via prefix filtering (AllPairs /
PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08).

MinHash+LSH (``operators/similarity.py``) finds near-duplicate pairs
*approximately*; this operator finds EVERY pair with token-set Jaccard
>= t, exactly, without the all-pairs product. The trick is the prefix
filter: order each document's distinct tokens by ascending global
frequency (rarest first) and keep only the first
``|d| - ceil(t * |d|) + 1`` as its *prefix*. Two sets with Jaccard >=
t MUST share at least one prefix token (pigeonhole on the overlap
bound ``ceil(t/(1+t) * (|a|+|b|))``), so the candidate set is the
self-join of prefixes — which, because prefixes hold the RAREST
tokens, is structurally skew-proof: the hot stop-words that would
explode a naive token self-join are exactly the tokens prefixes
exclude.

Stages (each one shuffle, all JVM until the final arithmetic):

1. distinct (doc, token) pairs — explode + distinct;
2. global token frequencies — map-side-combinable groupBy;
3. in-doc rank by (freq asc, token asc) — a per-doc window (docs are
   token-bounded, never skew-pinned like a global window);
4. prefix cut + self-join on token with the length filter
   ``t * |b| <= |a| <= |b| / t`` pushed into the join condition
   (equal-token candidates outside the size band can never reach t);
5. exact verification: join candidate pairs back to both token sets,
   count the true intersection, keep ``inter / union >= t``.

At 100 TB the candidate count — not the corpus — is the cost driver,
and it shrinks as t rises (prefixes shorten). Every value in the
output is an exact integer except ``jaccard`` itself, which is one
IEEE division of two exact integers — identical cross-engine, so the
full value oracle holds.

Reference parity: no analog in stanikol/olx; this is the exact-dedup
complement of the engine's MinHash scale path (SURVEY §2 ext).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olx_spark.functions.text import norm_text


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (doc, token) pairs under the engine's tokenization
    convention (lowercase, split on non-letters, empties dropped)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("token"),
    ).filter(F.col("token") != "")
    return toks.distinct()


def jaccard_similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
) -> DataFrame:
    """Every unordered pair with token-set Jaccard >= ``threshold``,
    exactly (see module doc). Output: (doc_a, doc_b, size_a, size_b,
    inter, jaccard) with doc_a < doc_b."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)

    from olx_spark.session import materialize

    # materialized ONCE: the distinct (doc, token) table feeds FIVE
    # consumers (freq, sizes, the ranked prefix window, and both
    # verification sides) — un-cut, each consumer re-runs the corpus
    # explode + distinct
    toks = materialize(_doc_tokens(df, id_col, text_col))
    freq = toks.groupBy("token").agg(F.count("*").alias("tok_freq"))

    # |d| via a count window over the SAME doc partitioning the rank
    # window establishes (guide §2.4: operations keyed the same way
    # share one exchange) — the former separate groupBy(doc) sizes
    # aggregation plus its join back are gone, and `size` rides every
    # prefix row from here on (r6: 4 fewer exchanges end to end)
    ranked = (
        toks.join(freq, "token")
        .withColumn("size", F.count("*").over(Window.partitionBy("doc")))
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc").orderBy(
                    F.col("tok_freq").asc(), F.col("token").asc()
                )
            )
            - 1,
        )
    )
    # prefix length |d| - ceil(t*|d|) + 1; materialized because BOTH
    # self-join sides consume it — un-cut, the rank window re-runs per
    # side (the frame is the corpus prefixes: smaller than toks, and
    # the window above it is the expensive part)
    prefix = materialize(
        ranked.filter(
            F.col("pos")
            < F.col("size") - F.ceil(F.lit(t) * F.col("size")) + F.lit(1)
        ).select("doc", "token", "size")
    )

    a = prefix.select(
        F.col("doc").alias("doc_a"), "token", F.col("size").alias("size_a")
    ).alias("a")
    b = prefix.select(
        F.col("doc").alias("doc_b"), "token", F.col("size").alias("size_b")
    ).alias("b")
    # sizes ride the candidate rows (functionally determined by the
    # doc ids, so the wider distinct has the same cardinality) — no
    # per-side size join is needed after verification
    cand = (
        a.join(
            b,
            on=[
                F.col("a.token") == F.col("b.token"),
                F.col("a.doc_a") < F.col("b.doc_b"),
                # length filter, both directions: t*|x| <= |y|
                F.col("a.size_a") * F.lit(t) <= F.col("b.size_b"),
                F.col("b.size_b") * F.lit(t) <= F.col("a.size_a"),
            ],
        )
        .select("doc_a", "doc_b", "size_a", "size_b")
        .distinct()
    )

    # exact verify: true intersection via the full token sets
    ta = toks.select(F.col("doc").alias("doc_a"), "token")
    tb = toks.select(F.col("doc").alias("doc_b"), "token")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast(
                "double"
            ),
        )
        .filter(F.col("jaccard") >= t)
        .select("doc_a", "doc_b", "size_a", "size_b", "inter", "jaccard")
    )
