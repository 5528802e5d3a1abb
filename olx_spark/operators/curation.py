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
