"""Bloom-filter semi-join reduction: prune the big side of a join
BEFORE its shuffle with a broadcast Bloom filter built from the small
side's join keys.

This is Spark's own runtime-filter optimization (AQE
``InjectRuntimeFilter``, ``spark.sql.optimizer.runtime.bloomFilter.*``)
made explicit and guaranteed: the built-in rewrite only fires when the
planner's SIZE ESTIMATES clear its creation/application thresholds, so
a selective-but-misestimated build side (a filtered subquery, a
mapInPandas output with unknown stats, a freshly-written delta) silently
gets no filter — and at 100 TB the difference between shuffling 100 TB
and shuffling the ~1% that can actually match IS the job. The explicit
operator always builds, and the caller controls geometry.

Shape (the same one the JVM rewrite produces):

- build: hash the small side's key to int64 ON THE JVM
  (``xxhash64``), then one ``mapInPandas`` pass emits ONE partial
  bitmap row per partition (vectorized position math shared with the
  URL-seen filter, ``dedup._bloom_positions``); the partials are
  OR-reduced on the driver — n_partitions rows of m/8 bytes, the
  identical collect Spark's ``BloomFilterAggregate`` performs — and
  rebroadcast as one read-only byte blob;
- probe: the big side computes the same JVM hash and a vectorized
  Arrow-batched membership test filters it BEFORE the join's
  Exchange. No false negatives (every matching row survives), so the
  exact join that follows returns byte-identical results; false
  positives only cost shuffle bytes, bounded by ``fpp``.

Only inner and (left-)semi joins may prune the probe side this way —
an outer join must keep non-matching rows, so :func:`bloom_filtered_join`
refuses anything else rather than silently corrupt results.

Geometry: m = -n*ln(fpp)/ln(2)^2, k = ln(2)*m/n (standard optima).
``expected`` (distinct build keys) triggers one count() on the small
side when not supplied — an O(small) agg, which is the side that is
cheap by assumption. The bitmap is capped (default 2^30 bits = 128 MB)
because it rides a broadcast: past that, prefer the bucketed
storage-partitioned layout (``dedup.colocated_pending``) instead of a
broadcast filter.

The reference has no joins at all (single-table inserts,
``Db.scala:34-43``); this backs the engine's 100-TB brief, where
FK-stamp joins against a pruned dimension are the per-round hot path
(``plans/scaled.py``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olx_spark.operators.dedup import _bloom_positions

DEFAULT_MAX_M_BITS = 1 << 30


def bloom_geometry(expected: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for ``expected`` keys at false-positive rate
    ``fpp`` — the standard optima, m rounded up to a whole byte."""
    if expected <= 0:
        return 8, 1
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-expected * math.log(fpp) / (math.log(2) ** 2))
    m = (m + 7) & ~7
    k = max(1, round(math.log(2) * m / expected))
    return m, k


def _key_hash(cols: list[str]) -> Column:
    return F.xxhash64(*[F.col(c) for c in cols])


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    fpp: float = 0.01,
    expected: int | None = None,
    max_m_bits: int = DEFAULT_MAX_M_BITS,
) -> DataFrame:
    """``big`` minus the rows whose join key CANNOT appear in
    ``small`` (no false negatives; ~``fpp`` of the non-matching rows
    survive as false positives). Columns unchanged."""
    keys = [on] if isinstance(on, str) else list(on)
    spark = big.sparkSession

    n = expected if expected is not None else small.select(*keys).distinct().count()
    m_bits, k = bloom_geometry(n, fpp)
    if m_bits > max_m_bits:
        raise ValueError(
            f"bloom for {n} keys at fpp={fpp} needs {m_bits} bits "
            f"(> max_m_bits={max_m_bits}): a filter this large should be "
            "a bucketed storage-partitioned layout, not a broadcast"
        )

    hashed = small.select(_key_hash(keys).alias("__h"))

    def _build(batches):
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            fps = pdf["__h"].to_numpy(dtype=np.int64)
            pos = _bloom_positions(fps, k, m_bits).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = hashed.mapInPandas(_build, schema="bits binary").collect()
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in partials:
        bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    bcast = spark.sparkContext.broadcast(bits.tobytes())

    @F.pandas_udf("boolean")
    def _member(h: pd.Series) -> pd.Series:
        b = np.frombuffer(bcast.value, dtype=np.uint8)
        fps = h.to_numpy(dtype=np.int64)
        pos = _bloom_positions(fps, k, m_bits)
        hit = ((b[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        return pd.Series(hit)

    return big.filter(_member(_key_hash(keys)))


def bloom_filtered_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    *,
    fpp: float = 0.01,
    expected: int | None = None,
    max_m_bits: int = DEFAULT_MAX_M_BITS,
) -> DataFrame:
    """Exact ``big.join(small, on, how)`` with the big side Bloom-pruned
    before its Exchange. ``how`` must be inner/semi — the only join
    types where dropping provably-unmatched probe rows is sound."""
    if how not in ("inner", "semi", "leftsemi", "left_semi"):
        raise ValueError(
            f"bloom_filtered_join: how={how!r} would change results — a "
            "bloom prefilter on the probe side is only sound for "
            "inner/semi joins"
        )
    pruned = bloom_prefilter(
        big, small, on, fpp=fpp, expected=expected, max_m_bits=max_m_bits
    )
    return pruned.join(small, on=on, how=how)
