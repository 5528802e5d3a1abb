"""Benchmark decontamination — flag training documents whose word
n-grams overlap a held-out evaluation/benchmark set (the GPT-3
appendix-C / Dolma pre-training hygiene stage).

The reference engine has no decontamination operator (its text columns
are projected verbatim, `Model.scala:24`); this backs the engine's
LLM-training-data pipeline brief alongside the dedup/quality family.

Semantics (distinct-n-gram overlap):

- Both sides tokenize with the shared ``norm_text`` + single-space
  split and form word ``n``-gram shingles (``word_shingles``), hashed
  with the portable md5-60 so the DuckDB oracle replays them exactly.
- A document's contamination evidence is its set of DISTINCT n-gram
  hashes that also occur anywhere in the benchmark corpus; the
  overlap fraction is ``n_hits / n_ngrams`` over distinct n-grams.
- ``contaminated`` = has n-grams AND ``n_hits >= min_hits`` AND
  ``overlap_frac >= min_overlap_frac``. Documents shorter than ``n``
  tokens have no n-grams and are never flagged (standard practice:
  they carry no n-gram evidence either way).

Scale design (100 TB corpus vs a benchmark-sized eval set):

- The corpus side is the big side: distinct (doc_id, ngram_hash)
  pairs are one map-side-combinable shuffle, then one per-doc
  aggregation — both keyed, both partial-agg'd.
- The benchmark n-gram set is eval-benchmark-sized (10^5-10^8
  hashes, not corpus-sized), so it rides a BROADCAST join against
  the exploded corpus stream — zero shuffle added to the big side.
  ``broadcast_benchmark=False`` switches to a shuffled join for a
  benchmark too large to broadcast (then the big side pays one
  hash-key shuffle; AQE splits hot n-grams).
- No Python anywhere: shingling, hashing, joining, flagging are all
  JVM Column expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olx_spark.functions.text import md5_60, word_shingles


def _ngram_hashes(df: DataFrame, id_cols: list[str], text_col: str, n: int) -> DataFrame:
    """Distinct md5-60 hashes of word n-grams, one row per
    (id_cols..., ngram_h)."""
    return (
        df.select(*id_cols, F.explode(word_shingles(text_col, k=n)).alias("_ng"))
        .select(*id_cols, md5_60(F.col("_ng")).alias("ngram_h"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 3,
    min_overlap_frac: float = 0.1,
    min_hits: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document benchmark-overlap stats + contamination flag.

    Returns one row per input document:
    ``(id_col, n_ngrams, n_hits, overlap_frac, contaminated)`` where
    ``n_ngrams``/``n_hits`` count DISTINCT word n-grams (bigint),
    ``overlap_frac`` is rounded to 6 decimals (0.0 when the document
    has no n-grams), and ``contaminated`` is int (1/0 — int rather
    than boolean for oracle portability).
    """
    doc_h = _ngram_hashes(docs, [id_col], text_col, n)
    bench_h = _ngram_hashes(
        benchmark.select(F.col(bench_text_col).alias("text")), [], "text", n
    ).withColumn("hit", F.lit(1))
    if broadcast_benchmark:
        bench_h = F.broadcast(bench_h)

    per_doc = (
        doc_h.join(bench_h, "ngram_h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
    )
    out = (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_ngrams", F.lit(0)).cast("bigint").alias("n_ngrams"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        )
        .withColumn(
            "overlap_frac",
            F.when(F.col("n_ngrams") == 0, F.lit(0.0)).otherwise(
                F.round(F.col("n_hits") / F.col("n_ngrams"), 6)
            ),
        )
        .withColumn(
            "contaminated",
            (
                (F.col("n_ngrams") > 0)
                & (F.col("n_hits") >= min_hits)
                & (F.col("overlap_frac") >= min_overlap_frac)
            ).cast("int"),
        )
    )
    return out
