"""Corpus inverted index: term -> delta-encoded posting lists.

The retrieval-side primitive the engine's text stack implies but did
not yet ship (BM25 scores documents; decontamination probes n-grams;
neither materializes the index a search / dedup-audit / decontam-serve
pass reads). One job builds, per term: document frequency, total
posting count, and a gap-encoded posting-list fingerprint over the
first ``max_postings`` postings in (doc_id, position) order.

Scale shape (100-TB contract):

- Tokenize + posexplode is pure JVM (one ``split`` + array ``filter``
  per row, positions = token ordinals over the non-empty tokens).
- Term statistics are ONE map-side-combinable shuffle (count + distinct
  doc count per term).
- **Hot terms never pin a task.** A stop word's posting stream at
  corpus scale is millions of rows; sorting or collecting them under a
  single ``term`` partition is the classic inverted-index skew trap.
  The posting list is therefore bounded FIRST through the engine's
  two-phase salted top-k (``ranking.salted_precut``: rank within
  (term, salt) slices, keep <= max_postings per slice, then one exact
  per-term rank over the <= salt_buckets * max_postings survivors) —
  the same machinery the frontier's per-host budgets use. Truncation
  is explicit (``truncated`` flag + total count kept exact), never
  silent.
- ``collect_list`` runs only over the bounded (<= max_postings) set;
  the gap encoding is a whole-stage-codegen ``aggregate`` fold.

Gap encoding: postings sorted by (doc_id, pos); each emits
``(doc_id - prev_doc_id) . pos`` joined by ``,`` (first gap is from 0).
The fingerprint is the portable md5-60 of that string — byte-exact
replayable in SQL (the DuckDB twin uses ``lag`` + ordered
``string_agg``), which is what makes the whole index oracle-checkable.

Reference parity: stanikol/olx has no text indexing; this extends the
LLM-pipeline toolkit (SURVEY.md LLM-ops table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olx_spark.operators.ranking import salted_precut

TOKEN_SPLIT = "[^a-z]+"


def tokenize_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, pos, term)`` — pos is the 0-based ordinal among the
    doc's NON-EMPTY lowercase tokens (empty split artifacts filtered
    before position assignment, so positions are dense)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != F.lit("")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "term")
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 256,
    min_df: int = 1,
    salt_buckets: int = 8,
) -> DataFrame:
    """Build the index. Output per term:

    - ``df``          distinct documents containing the term (exact)
    - ``n_postings``  total occurrences (exact, pre-truncation)
    - ``truncated``   1 if the posting list was cut at ``max_postings``
    - ``postings_fp`` md5-60 of the gap-encoded first ``max_postings``
      postings in (doc_id, pos) order
    """
    if max_postings < 1:
        raise ValueError("max_postings >= 1 required")
    toks = tokenize_positions(docs, id_col, text_col)
    stats = toks.groupBy("term").agg(
        F.count("*").alias("n_postings"),
        F.countDistinct("doc_id").alias("df"),
    )
    order = [F.col("doc_id"), F.col("pos")]
    bounded = salted_precut(
        toks,
        order,
        max_postings,
        salt_buckets=salt_buckets,
        partition_cols=("term",),
        salt_src=F.xxhash64("doc_id", "pos"),
    )
    w = Window.partitionBy("term").orderBy(*order)
    bounded = (
        bounded.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= max_postings)
        .drop("__r")
    )
    lists = bounded.groupBy("term").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "pos"))).alias("pl")
    )
    enc = F.aggregate(
        F.col("pl"),
        F.struct(F.lit("").alias("s"), F.lit(0).cast("long").alias("prev")),
        lambda acc, x: F.struct(
            F.concat(
                acc["s"],
                F.when(acc["s"] == "", F.lit("")).otherwise(F.lit(",")),
                (x["doc_id"] - acc["prev"]).cast("string"),
                F.lit("."),
                x["pos"].cast("string"),
            ).alias("s"),
            x["doc_id"].alias("prev"),
        ),
        lambda acc: acc["s"],
    )
    from olx_spark.functions.text import md5_60

    out = lists.select("term", md5_60(enc).alias("postings_fp")).join(
        stats, "term"
    )
    return out.filter(F.col("df") >= F.lit(min_df)).select(
        "term",
        "df",
        "n_postings",
        (F.col("n_postings") > F.lit(max_postings)).cast("int").alias("truncated"),
        "postings_fp",
    )
