"""In-batch negative sampling — deterministic contrastive batch
construction, the data-side half of CLIP-style training (Radford et
al. 2021 train against in-batch negatives; LAION-scale pipelines
pre-materialize the batch assignment so every rerun sees identical
pairs). Each example is assigned to a pseudo-random batch, and its
negatives are the next ``k`` members of the SAME batch in a
deterministic cyclic order — never itself, never a duplicate slot.
The reference engine has no training-pairs stage, so this backs the
pipeline brief.

Determinism contract: batch id and in-batch order both derive from
salted md5-60 of the example id (the same portable fate-hash used by
``sampling.py``/``lm.train_slice`` — identical in Spark, DuckDB and
driver python), so re-runs, resumed jobs, and late-arriving shards
reproduce the exact pair set. Ties are impossible (the order key is
(hash, id), a total order).

Scale design (100 TB):

- One shuffle on ``batch`` assigns the cyclic order (window
  ``row_number`` + ``count`` per batch partition — bounded work per
  partition because a batch is ~``n / n_batches`` rows; callers
  scale ``n_batches`` with the corpus exactly like a training run
  scales its global batch count).
- Negatives come from a self-join on ``(batch, target_rank)`` — both
  sides hash-partitioned on the same key, ONE co-partitioned join,
  row multiplicity exactly ``k``. No broadcast of corpus-scale data,
  no Python UDFs.
- Batches with ``<= k`` members yield the full batch minus self
  (cyclic stepping never wraps onto the anchor; a singleton batch
  yields no rows) — no silent duplicates, stated so consumers and
  the oracle agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olx_spark.functions.text import md5_60


def in_batch_negatives(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    n_batches: int = 16,
    k: int = 3,
    salt: str = "negbatch-v1",
) -> DataFrame:
    """Deterministic (anchor, negative, slot) triples.

    Returns ``(id_col as anchor_id, neg_id, slot, batch)`` with
    ``slot`` in ``1..k`` (capped by batch size - 1).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_batches < 1:
        raise ValueError(f"n_batches must be >= 1, got {n_batches}")
    h = md5_60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col).alias("anchor_id"),
        F.pmod(h, F.lit(n_batches)).alias("batch"),
        h.alias("h"),
    )
    w = Window.partitionBy("batch").orderBy("h", "anchor_id")
    ranked = base.select(
        "anchor_id", "batch",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("batch")).alias("bn"),
    )
    # one row per (anchor, slot), slot bounded by batch size - 1 so
    # cyclic stepping never returns to the anchor
    slots = ranked.select(
        "anchor_id", "batch", "rk", "bn",
        # guard the singleton batch: Spark's sequence(1, 0) DESCENDS
        # ([1, 0]) instead of yielding an empty range
        F.explode(
            F.when(F.col("bn") <= 1, F.array().cast("array<int>")).otherwise(
                F.sequence(F.lit(1), F.least(F.lit(k), F.col("bn") - 1).cast("int"))
            )
        ).alias("slot"),
    ).withColumn(
        "target_rk", F.pmod(F.col("rk") - 1 + F.col("slot"), F.col("bn")) + 1
    )
    victims = ranked.select(
        F.col("batch").alias("batch"),
        F.col("rk").alias("target_rk"),
        F.col("anchor_id").alias("neg_id"),
    )
    return slots.join(victims, ["batch", "target_rk"]).select(
        "anchor_id", "neg_id", "slot", "batch"
    )
