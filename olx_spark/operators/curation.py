"""LAION/DataComp-style image+caption curation over the input_hint
table (image_id, bytes, w, h, fmt, caption, phash).

The reference crawler stores every parsed ad row unconditionally
(``db/H2.scala:61`` insert path); a training-data pipeline over the
same payload additionally needs a CURATION pass — the LAION-400M /
DataComp recipe: drop tiny images, extreme aspect ratios, and junk
captions, then deduplicate survivors by perceptual hash. All rules
here are pure JVM expressions over the metadata columns (the payload
``bytes`` column is never touched, so Catalyst prunes it from the
scan — at 100 TB the curation pass reads only the ~100-byte metadata
stripe, not the payload); the only shuffle is the phash-dedup window,
keyed by the 64-bit phash (near-uniform outside true duplicate
clusters, and per-group work is a linear row_number).

Rule precedence (first failing rule names the drop): resolution →
aspect → caption_short → caption_long → caption_quality → dup_phash.
Dedup ranks ONLY rows that passed every metadata rule (partitioning
the window by (phash, passed) keeps failing rows from shadowing a
keepable survivor at rank 1), deterministically keeping the smallest
image_id — crawl-order-stable under the fixture's id scheme.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DROP_REASONS = (
    "resolution",
    "aspect",
    "caption_short",
    "caption_long",
    "caption_quality",
    "dup_phash",
)


def _caption_words(c: Column) -> Column:
    """Whitespace-token count; null/blank captions count 0 words."""
    t = F.trim(F.coalesce(c, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def _alpha_frac(c: Column) -> Column:
    """Fraction of caption characters that are letters or spaces —
    the junk-caption signal (all-punctuation/digit captions → 0)."""
    t = F.coalesce(c, F.lit(""))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(t, "[^a-zA-Z ]", ""))
        / F.length(t).cast("double")
    )


def curate_image_captions(
    df: DataFrame,
    min_side: int = 48,
    max_aspect: float = 2.5,
    min_words: int = 2,
    max_words: int = 64,
    min_alpha_frac: float = 0.5,
) -> DataFrame:
    """Per-row curation verdict: ``(image_id, n_words, drop_reason,
    kept)`` where ``drop_reason`` is the FIRST failing rule ('' when
    kept) and ``kept`` ∈ {0,1}. Emitting every row with its verdict
    (rather than only survivors) is the auditable shape — drop-rate
    dashboards and rule tuning need the negatives.
    """
    side_lo = F.least("w", "h")
    side_hi = F.greatest("w", "h")
    words = _caption_words(F.col("caption"))
    meta_reason = (
        F.when(side_lo < min_side, F.lit("resolution"))
        .when(side_hi / side_lo.cast("double") > max_aspect, F.lit("aspect"))
        .when(words < min_words, F.lit("caption_short"))
        .when(words > max_words, F.lit("caption_long"))
        .when(_alpha_frac(F.col("caption")) < min_alpha_frac, F.lit("caption_quality"))
        .otherwise(F.lit(""))
    )
    staged = df.select(
        "image_id",
        "phash",
        words.alias("n_words"),
        meta_reason.alias("meta_reason"),
    )
    rn = F.row_number().over(
        Window.partitionBy("phash", F.col("meta_reason") == "").orderBy("image_id")
    )
    reason = F.when(F.col("meta_reason") != "", F.col("meta_reason")).when(
        rn > 1, F.lit("dup_phash")
    ).otherwise(F.lit(""))
    return staged.select(
        "image_id",
        "n_words",
        reason.alias("drop_reason"),
        (reason == "").cast("int").alias("kept"),
    )


def clip_score_filter(
    df: DataFrame,
    img_col: str = "img_vec",
    txt_col: str = "txt_vec",
    id_col: str = "image_id",
    keep_frac: float = 0.25,
    score_buckets: int = 1024,
) -> DataFrame:
    """DataComp-style CLIP-score alignment filter: keep the top
    ``ceil(keep_frac * n)`` image+caption pairs by the cosine between
    their image and text embedding columns (the DataComp "CLIP score
    L/14 top-30%" headline baseline, re-expressed over pre-computed
    embedding columns — model inference happens upstream; this is the
    SELECTION operator).

    Semantics (exact, deterministic): score = cosine(img, txt) in
    double; rows rank by (score desc, ``id_col`` asc); ``n`` counts
    rows with a defined score (both vectors non-null, non-empty, with
    nonzero norms — degenerate rows get ``clip_score = null`` and are
    never kept). Output is the auditable per-row verdict shape shared
    with :func:`curate_image_captions`: ``(id, clip_score, kept)`` for
    EVERY input row, ``clip_score`` rounded to 6 dp.

    Scale design (100 TB): a global top-fraction cut must not sort the
    corpus. The plan here is the classic two-pass histogram select:

    1. one corpus pass builds a ``<= 2*score_buckets+1``-row histogram
       of ``floor(score * score_buckets)`` (map-side combined groupBy;
       collected to the driver — KB-sized),
    2. the driver walks buckets from the top to find the threshold
       bucket ``tb`` and the remainder ``r`` still needed from inside
       it,
    3. only the boundary bucket (~``n / score_buckets`` rows) runs an
       exact distributed top-``r`` (``TakeOrderedAndProject`` via
       :func:`olx_spark.operators.ranking.ordered_limit`) whose id set
       is broadcast back,
    4. the verdict pass is then a shuffle-free map: ``kept = bucket >
       tb OR id in boundary-set``.

    No shuffle ever moves the corpus: the histogram exchange carries
    ``score_buckets``-sized partials and the boundary top-``r`` carries
    one bucket. ``score_buckets`` trades driver/boundary size against
    histogram width. No Python UDFs anywhere (cosine is an
    ``aggregate``/``zip_with`` codegen expression).

    The reference stores every parsed ad unconditionally
    (``db/H2.scala:61``); alignment filtering is part of the engine's
    LLM-training-data brief over the same image+caption payload.
    """
    if not 0.0 <= keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in [0,1], got {keep_frac}")
    if score_buckets < 1:
        raise ValueError(f"score_buckets must be >= 1, got {score_buckets}")
    from olx_spark.operators.ranking import ordered_limit
    from olx_spark.operators.similarity import _dot, _norm

    img, txt = F.col(img_col), F.col(txt_col)
    norms = _norm(img) * _norm(txt)
    score = F.when(
        img.isNotNull() & txt.isNotNull() & (norms > 0.0),
        _dot(img, txt) / norms,
    )  # else null: degenerate pair, never kept
    from olx_spark.session import materialize

    # (id, score, bucket) feeds three passes (histogram, boundary
    # top-r, verdict) — materialize once so the embedding dot product
    # (the expensive part: an aggregate/zip_with over d-dim arrays) is
    # computed once; the cut frame is 3 narrow columns per row.
    scored = materialize(
        df.select(
            F.col(id_col).alias("__clip_id"),
            score.alias("__clip_score"),
        ).withColumn(
            "__clip_sb",
            F.floor(F.col("__clip_score") * F.lit(float(score_buckets))).cast("long"),
        )
    )
    hist = {
        r["__clip_sb"]: r["cnt"]
        for r in scored.filter(F.col("__clip_score").isNotNull())
        .groupBy("__clip_sb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n = sum(hist.values())
    k = min(n, math.ceil(keep_frac * n))

    if k <= 0:
        kept = F.lit(False)
    else:
        cum, tb, r = 0, None, 0
        for b in sorted(hist, reverse=True):
            if cum + hist[b] >= k:
                tb, r = b, k - cum
                break
            cum += hist[b]
        if r == hist[tb]:
            # bucket boundary lands exactly on k: no within-bucket cut
            kept = F.col("__clip_sb") >= tb
        else:
            boundary = ordered_limit(
                scored.filter(F.col("__clip_sb") == tb),
                r,
                [F.col("__clip_score").desc(), F.col("__clip_id").asc()],
            ).select(F.col("__clip_id"), F.lit(1).alias("__clip_bkeep"))
            scored = scored.join(F.broadcast(boundary), "__clip_id", "left")
            # left-join miss gives null __clip_bkeep: coalesce, or the
            # three-valued OR would propagate null into kept
            kept = (F.col("__clip_sb") > tb) | (
                F.coalesce(F.col("__clip_bkeep"), F.lit(0)) == 1
            )
    return scored.select(
        F.col("__clip_id").alias(id_col),
        F.round("__clip_score", 6).alias("clip_score"),
        (F.col("__clip_score").isNotNull() & kept).cast("int").alias("kept"),
    )


def boilerplate_lines(
    lines: DataFrame,
    *,
    doc_col: str = "doc_id",
    domain_col: str = "source",
    line_col: str = "line",
    df_frac: float = 0.5,
    min_df: int = 2,
) -> DataFrame:
    """Host-frequency boilerplate removal — the CCNet/RefinedWeb line
    dedup rule: a line appearing in ≥ ``df_frac`` of a domain's
    documents (and in at least ``min_df`` of them) is chrome
    (copyright footer, nav bar, cookie banner), not content, and is
    stripped before training. The reference parser keeps whole ad
    pages (``Ads.scala`` textarea extraction); a training pipeline
    over the same crawl additionally needs this pass.

    Input: one row per (doc, domain, line). Returns one row per doc:
    ``(doc_col, domain_col, n_lines, n_boiler, kept_chars,
    boiler_frac)`` — ``kept_chars`` sums the length of surviving
    lines, ``boiler_frac`` is rounded to 6 dp.

    The frequency cut is evaluated in EXACT integer arithmetic
    (``df_docs * 1e6 >= round(df_frac*1e6) * domain_docs``) so the
    verdict is replayable cross-engine with no float-threshold drift.

    Scale design (100 TB): the line table shuffles ONCE, on
    (domain, line), for the per-line document frequency (count of
    distinct docs — Spark's two-phase distinct-agg absorbs hot lines
    map-side); per-domain doc totals are a tiny rollup of that same
    aggregate (no second scan of the line table) joined by broadcast;
    the surviving boilerplate set is, by construction, small (each
    domain contributes at most docs/df_frac·min_df distinct frequent
    lines) and broadcasts back onto the line table, so the verdict
    pass is shuffle-free; the final per-doc rollup is a map-side
    combinable groupBy on the doc id. The corpus is never sorted and
    never shuffled on a skewed key.
    """
    if not 0.0 < df_frac <= 1.0:
        raise ValueError(f"df_frac must be in (0,1], got {df_frac}")
    frac_ppm = int(round(df_frac * 1_000_000))
    from olx_spark.session import materialize

    # materialized ONCE (r6): the line table feeds THREE consumers —
    # the per-line frequency agg, the per-domain doc totals, and the
    # verdict pass that joins the boilerplate set back — and the
    # caller's per-doc line construction (chunk transform + explode)
    # is corpus-scale work that otherwise re-executes per consumer
    base = materialize(
        lines.select(
            F.col(doc_col).alias("__bp_doc"),
            F.col(domain_col).alias("__bp_dom"),
            F.col(line_col).alias("__bp_line"),
        )
    )
    # one shuffle: per-(domain, line) distinct-doc frequency
    line_df = base.groupBy("__bp_dom", "__bp_line").agg(
        F.countDistinct("__bp_doc").alias("__bp_df")
    )
    # per-domain doc totals from the per-line table — NOT a second
    # scan of the corpus: max(df) is wrong (no line need appear in
    # all docs), so roll up distinct docs from the base's (dom, doc)
    # projection; Spark collapses this to the same scan pre-shuffle.
    totals = base.groupBy("__bp_dom").agg(
        F.countDistinct("__bp_doc").alias("__bp_docs")
    )
    boiler = (
        line_df.join(F.broadcast(totals), "__bp_dom")
        .filter(
            (F.col("__bp_df") >= min_df)
            & (
                F.col("__bp_df") * F.lit(1_000_000)
                >= F.lit(frac_ppm) * F.col("__bp_docs")
            )
        )
        .select("__bp_dom", "__bp_line", F.lit(1).alias("__bp_is_boiler"))
    )
    flagged = base.join(
        F.broadcast(boiler), ["__bp_dom", "__bp_line"], "left"
    ).withColumn("__bp_b", F.coalesce("__bp_is_boiler", F.lit(0)))
    out = flagged.groupBy("__bp_doc", "__bp_dom").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("__bp_b").alias("n_boiler"),
        F.sum(
            F.when(F.col("__bp_b") == 0, F.length("__bp_line")).otherwise(0)
        ).alias("kept_chars"),
    )
    return out.select(
        F.col("__bp_doc").alias(doc_col),
        F.col("__bp_dom").alias(domain_col),
        "n_lines",
        F.col("n_boiler").cast("long").alias("n_boiler"),
        F.col("kept_chars").cast("long").alias("kept_chars"),
        F.round(F.col("n_boiler") / F.col("n_lines"), 6).alias("boiler_frac"),
    )


def domain_quality_rollup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    domain_col: str = "source",
    score_col: str = "score",
) -> DataFrame:
    """Domain-level quality filtering — the Dolma/RefinedWeb pattern:
    a document's fate depends on its HOST's aggregate quality, not
    just its own (content farms emit individually-plausible pages;
    the per-domain mean exposes them). Rolls the per-doc score up to
    a per-domain mean and flags every doc by whether its domain beats
    the corpus-wide mean (a RELATIVE cut — corpus drift moves the
    bar, the standard percentile-style choice; a fixed threshold is a
    caller-side filter on ``host_quality``).

    Callers pass a ROUNDED ``score_col`` (e.g. ``round(quality, 6)``)
    and both means are re-rounded to 6 before the comparison, so the
    flag is replayable cross-engine (the oracle contract).

    Returns one row per doc: ``(id_col, domain_col, host_n,
    host_quality, domain_ok)``.

    Scale design (100 TB): ONE map-side-combinable groupBy builds the
    per-domain table (web corpora have ~10^7-10^8 domains — tiny next
    to the doc table), which joins back via explicit broadcast; the
    corpus mean is a 1-row agg on a broadcast cross join. The fact
    table is scanned once and never shuffled. Domain skew (one host
    with 10^9 docs) is absorbed by the partial aggregation."""
    s = docs.select(id_col, domain_col, score_col)
    host = s.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("host_n"),
        F.round(F.avg(score_col), 6).alias("host_quality"),
    )
    glob = s.agg(F.round(F.avg(score_col), 6).alias("gq"))
    return (
        s.join(F.broadcast(host), domain_col)
        .crossJoin(F.broadcast(glob))
        .select(
            id_col,
            domain_col,
            "host_n",
            "host_quality",
            (F.col("host_quality") >= F.col("gq")).cast("int").alias("domain_ok"),
        )
    )
