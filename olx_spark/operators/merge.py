"""MERGE INTO / CDC upsert — the lakehouse write primitive.

Applies a change-delta (full-row upserts + deletes, possibly several
versions per key) onto a target table: the semantics of Delta/Iceberg
``MERGE INTO t USING d ON t.k = d.k WHEN MATCHED [AND d.op='D'] THEN
DELETE / THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``. This is
how every incremental pipeline over the engine's snapshot store —
re-crawled pages, refreshed captions, revoked documents — lands
changes without rewriting history by hand.

Scale design (100 TB target, small-to-modest delta — the CDC shape):

- **Compact the delta first** (last-writer-wins per key by
  ``(seq, tiebreak)``): one ``row_number`` window over the DELTA only
  — the 100-TB target is never windowed. Per-key version counts are
  small by construction (a CDC batch), so the plain key-partitioned
  window is the right plan; the two-phase salted ladder exists in
  ``ranking.py`` if a pathological feed ever pins one key.
- **The target side never shuffles.** The merge decomposes into
    survivors = target ANTI JOIN delta-keys   (matched rows drop out)
    result    = survivors UNION ALL (delta WHERE op <> 'D')
  Matched-update rows re-enter via the delta copy, deletes simply
  never re-enter, and not-matched delta rows are the inserts. With
  ``broadcast_delta=True`` (the default — a CDC batch fits in one
  executor) the anti join is a BroadcastHashJoin: ZERO shuffle and
  zero sort of the 100-TB side, one scan, map-side filter. This beats
  the naive FULL OUTER JOIN formulation, which shuffles both sides on
  the key. When the delta is genuinely huge, pass
  ``broadcast_delta=False`` and the anti join becomes a shuffled hash
  join on the key — the same key the snapshot store buckets by
  (``plans/snapshot.py``), so on the bucketed layout even that is a
  co-partitioned read.
- Full-row semantics (``UPDATE SET * / INSERT *``): delta rows carry
  the complete target schema plus ``op``/``seq``. Partial-column
  updates are a projection the caller applies before the merge.

Reference parity: stanikol/olx only ever INSERTs new ads
(``UpdateDB.scala`` writes, never merges); this operator serves the
engine's own incremental-pipeline brief (SURVEY §2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact_delta(
    delta: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Last-writer-wins per key: keep the row with the highest
    ``seq_col``. Same-seq ties (a malformed CDC feed — seqs are unique
    per key upstream) break by ``op_col`` descending, which is merely
    deterministic: 'U' sorts above 'D', so a tied upsert wins. Windows
    the DELTA only — never the target."""
    for c in (*keys, seq_col, op_col):
        if c not in delta.columns:
            raise ValueError(f"delta is missing column {c!r}")
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    return (
        delta.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    delta: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
    broadcast_delta: bool = True,
) -> DataFrame:
    """MERGE the compacted ``delta`` into ``target`` (see module doc).

    ``delta`` must carry every ``target`` column plus ``op_col`` (row
    operation; ``delete_op`` means delete, anything else is upsert)
    and ``seq_col`` (version; the per-key max wins). Returns the
    merged table with exactly ``target``'s columns.
    """
    missing = [c for c in target.columns if c not in delta.columns]
    if missing:
        raise ValueError(f"delta is missing target columns: {missing}")
    last = compact_delta(delta, keys, seq_col=seq_col, op_col=op_col)
    delta_keys = last.select(*keys).distinct()
    if broadcast_delta:
        delta_keys = F.broadcast(delta_keys)
    survivors = target.join(delta_keys, on=keys, how="left_anti")
    incoming = last.filter(F.col(op_col) != delete_op).select(*target.columns)
    return survivors.unionByName(incoming)
