"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The reference engine has no data-selection stage (it stores every
fetched ad verbatim, ``DownloadAds.scala:45``); this backs the engine's
LLM-training-data pipeline brief: given a small TARGET corpus (the
distribution you want — e.g. held-out high-quality pages) and the huge
RAW crawl corpus, re-weight every raw document by how target-like its
hashed n-gram profile is, then sample ``k`` documents with probability
proportional to that importance weight.

Model (the paper's recipe, distributed Spark-first):

- Features: word unigrams + bigrams of normalized text, hashed into
  ``n_buckets`` buckets (``pmod(md5_60(gram), B)`` — the same portable
  60-bit hash every other operator uses, so the DuckDB twin can replay
  it bit-for-bit).
- Two bag-of-buckets multinomials with Laplace smoothing ``s``:
  ``p[b] = (c_target[b] + s) / (T + s*B)`` and likewise ``q[b]`` from
  the raw corpus. Per-bucket log-ratio ``lam[b] = ln p[b] - ln q[b]``.
- Per raw document: ``log_weight = sum_over_grams lam[bucket(gram)]``
  (each OCCURRENCE counts, the paper's unigram-model likelihood ratio).
- Gumbel top-k resampling: sampling k items without replacement with
  probability proportional to ``w = exp(log_weight)`` is exactly
  taking the top k of ``log_weight + Gumbel(0,1)`` (Vieira 2014,
  "Gumbel-max trick"). The Gumbel draw is DETERMINISTIC here —
  ``u = (md5_60(salt:doc_id) % M + 0.5) / M``, ``g = -ln(-ln u)`` — so
  re-runs, resumes, and the SQL oracle all select the identical set.

Scale design (100 TB):

- Bucket count tables are ONE map-side-combined groupBy per side
  (corpus-scale input, ``B``-row output). The ``lam`` table is ``B``
  rows (10^2-10^5) — broadcast, never shuffled against the corpus.
- Scoring is explode -> broadcast-join ``lam`` -> groupBy(doc_id)
  sum/count: exactly ONE corpus-scale shuffle, partial-aggregated
  map-side (sum/count combine before the exchange).
- The top-k cut is :func:`ranking.ordered_limit`'s global form —
  ``TakeOrderedAndProject``, a distributed partial top-k, never a
  single-task global sort/window.
- No Python UDFs anywhere: shingling is the shared ``word_shingles``
  HOF expression, the Gumbel draw is codegen arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olx_spark.functions.text import md5_60, word_shingles
from olx_spark.operators.ranking import ordered_limit

#: modulus for the uniform draw behind the deterministic Gumbel noise
GUMBEL_M = 1 << 20


def _features(text_col: str) -> Column:
    """Word unigrams ++ bigrams (the paper's feature set) of normalized
    text; empty array for blank text (``word_shingles`` already yields
    ``[]`` when there are fewer than ``k`` tokens, and a blank row has
    zero tokens after the trim guard below)."""
    c = F.col(text_col)
    grams = F.concat(word_shingles(c, 1), word_shingles(c, 2))
    return F.when(
        F.length(F.trim(c)) == 0, F.array().cast("array<string>")
    ).otherwise(grams)


def _bucket(gram: Column, n_buckets: int) -> Column:
    return F.pmod(md5_60(gram), F.lit(n_buckets)).cast("int")


def _bucket_counts(
    docs: DataFrame, text_col: str, n_buckets: int
) -> DataFrame:
    """``(bucket, c)`` hashed-feature occurrence counts — one
    map-side-combined shuffle, ``n_buckets``-row output."""
    return (
        docs.select(F.explode(_features(text_col)).alias("g"))
        .select(_bucket(F.col("g"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = 256,
    smoothing: float = 1.0,
    raw_buckets: DataFrame | None = None,
) -> DataFrame:
    """Per-bucket importance log-ratio table
    ``(bucket, lam = ln p_target[bucket] - ln q_raw[bucket])`` over a
    dense ``range(n_buckets)`` spine (buckets unseen on either side get
    the smoothing floor, not a dropped row). ``n_buckets + 2`` rows of
    state total — broadcastable at any corpus scale."""
    from olx_spark.session import materialize

    spark = target.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    # each count table feeds BOTH the spine join and its own total
    # aggregate below — without a cut Spark re-runs the corpus-scale
    # explode+hash pass per branch (2x per side). The tables are
    # <= n_buckets rows, so the materialize is free.
    cp = materialize(_bucket_counts(target, text_col, n_buckets))
    # ``raw_buckets`` (r6): an already-exploded (.., bucket) frame —
    # lets :func:`dsir_resample` share ONE raw-corpus feature pass
    # between this fit and the scoring pass instead of shingling +
    # hashing the whole raw corpus twice
    if raw_buckets is not None:
        cq = materialize(
            raw_buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
        )
    else:
        cq = materialize(_bucket_counts(raw, text_col, n_buckets))
    # totals ride the join as 1-row broadcast cross joins (no collect)
    tp = cp.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("t_p"))
    tq = cq.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("t_q"))
    s = float(smoothing)
    return (
        spine.join(cp.withColumnRenamed("c", "c_p"), "bucket", "left")
        .join(cq.withColumnRenamed("c", "c_q"), "bucket", "left")
        .crossJoin(F.broadcast(tp))
        .crossJoin(F.broadcast(tq))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("c_p"), F.lit(0)) + F.lit(s))
                    / (F.col("t_p") + F.lit(s * n_buckets))
                )
                - F.log(
                    (F.coalesce(F.col("c_q"), F.lit(0)) + F.lit(s))
                    / (F.col("t_q") + F.lit(s * n_buckets))
                )
            ).alias("lam"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    ratios: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    gumbel_salt: str = "dsir-gumbel-v1",
    grams: DataFrame | None = None,
) -> DataFrame:
    """Score every raw document:
    ``(doc_id, n_feats, log_weight, gkey)`` where ``log_weight`` is the
    summed bucket log-ratio (rounded 6), and
    ``gkey = round(log_weight + Gumbel(doc_id), 6)`` is the
    deterministic Gumbel-perturbed resampling key. Featureless (blank /
    one-token-bigram-less is fine — unigrams still fire; truly blank)
    docs keep ``log_weight = 0`` (weight 1: no evidence either way).

    ONE corpus-scale shuffle: explode -> broadcast lam join ->
    groupBy(doc_id). The lam join is explicitly ``F.broadcast`` — the
    table is ``n_buckets`` rows by construction.
    """
    if grams is None:
        grams = raw.select(
            F.col(id_col), F.explode(_features(text_col)).alias("g")
        ).select(id_col, _bucket(F.col("g"), n_buckets).alias("bucket"))
    scored = (
        grams.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("lam"), 6).alias("log_weight"),
        )
    )
    u = (
        F.pmod(
            md5_60(F.concat(F.lit(f"{gumbel_salt}:"), F.col(id_col).cast("string"))),
            F.lit(GUMBEL_M),
        )
        + F.lit(0.5)
    ) / F.lit(float(GUMBEL_M))
    gumbel = -F.log(-F.log(u))
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("bigint").alias("n_feats"),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
            F.round(F.coalesce(F.col("log_weight"), F.lit(0.0)) + gumbel, 6).alias(
                "gkey"
            ),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    smoothing: float = 1.0,
    gumbel_salt: str = "dsir-gumbel-v1",
) -> DataFrame:
    """End-to-end DSIR: fit the bucket log-ratios, weight the raw
    corpus, take the Gumbel top-``k``
    (``order by gkey desc, doc_id`` — total order, so the selected set
    is unique and replayable). Returns
    ``(doc_id, n_feats, log_weight, gkey, rank_in_limit)``."""
    from olx_spark.session import materialize

    # ONE raw-corpus feature pass (r6): the exploded (doc, bucket)
    # frame — two narrow columns, the same order of bytes the scoring
    # shuffle moves anyway — is cut once and feeds BOTH the q-side
    # bucket counts and the per-doc scoring join; before, the
    # shingle+md5 explode over the whole raw corpus ran twice
    grams_raw = materialize(
        raw.select(
            F.col(id_col), F.explode(_features(text_col)).alias("g")
        ).select(id_col, _bucket(F.col("g"), n_buckets).alias("bucket"))
    )
    ratios = dsir_log_ratios(
        target,
        raw,
        text_col=text_col,
        n_buckets=n_buckets,
        smoothing=smoothing,
        raw_buckets=grams_raw,
    )
    w = dsir_weights(
        raw,
        ratios,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        gumbel_salt=gumbel_salt,
        grams=grams_raw,
    )
    return ordered_limit(w, k, [F.col("gkey").desc(), F.col(id_col).asc()])


def reference_dsir(
    raw: list[tuple[str, str]],
    target: list[str],
    *,
    k: int,
    n_buckets: int = 256,
    smoothing: float = 1.0,
    gumbel_salt: str = "dsir-gumbel-v1",
) -> list[tuple]:
    """Pure-Python replay of the whole pipeline (test oracle twin —
    mirrors the hash via hashlib.md5). ``raw`` is ``[(doc_id, text)]``,
    ``target`` is ``[text]``."""
    import hashlib
    import re

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def norm(t: str) -> str:
        return re.sub(r"\s+", " ", t).strip().lower()

    def feats(t: str) -> list[str]:
        if not t.strip():
            return []
        toks = norm(t).split(" ")
        return toks + [
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        ]

    def counts(texts):
        c: dict[int, int] = {}
        tot = 0
        for t in texts:
            for g in feats(t):
                b = h60(g) % n_buckets
                c[b] = c.get(b, 0) + 1
                tot += 1
        return c, tot

    cp, tp = counts(target)
    cq, tq = counts(t for _, t in raw)
    s = smoothing
    lam = {
        b: math.log((cp.get(b, 0) + s) / (tp + s * n_buckets))
        - math.log((cq.get(b, 0) + s) / (tq + s * n_buckets))
        for b in range(n_buckets)
    }
    rows = []
    for doc_id, text in raw:
        fs = feats(text)
        lw = round(math.fsum(lam[h60(g) % n_buckets] for g in fs), 6) if fs else 0.0
        u = (h60(f"{gumbel_salt}:{doc_id}") % GUMBEL_M + 0.5) / GUMBEL_M
        gkey = round(lw + -math.log(-math.log(u)), 6)
        rows.append((doc_id, len(fs), lw, gkey))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return [r + (i,) for i, r in enumerate(rows[:k])]
