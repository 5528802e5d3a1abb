"""HyperLogLog distinct-count sketches — deterministic and portable.

The 100-TB cardinality primitive: "how many distinct URLs / users /
hosts" without materializing a global ``distinct`` (whose shuffle
moves every key). A sketch reduces each group to at most ``m = 2**p``
register rows via one map-side-combinable ``groupBy().max()``; the
shuffle moves O(m) rows per group regardless of input size, and
sketches MERGE by register-wise max — the property that lets per-
partition / per-day sketches roll up without re-reading the data
(Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007).

Spark ships ``approx_count_distinct`` (HLL++) but its hash and
register encoding are engine-private — results can't be reproduced
outside the JVM. This implementation is PORTABLE BY CONSTRUCTION:
the hash is the repo's md5-60 convention (``functions/text.py``), the
register index is the top ``p`` bits, the rank is the zero-run of the
remaining ``W = 60 - p`` bits computed by exact integer/string ops
(no float log2), and the estimator's harmonic sum is kept as an EXACT
integer (``sum(2**(W+1-rho))`` — max addend ``2**(W+1)``, so bigint-
safe for p >= 4 up to m*2^57 < 2^63 at p=6; guard below) so Spark and
DuckDB produce bit-identical registers and (to double rounding)
identical estimates — the oracle gate checks equality, not tolerance.

Bias handling is classic HLL (not ++): small-range linear counting
below ``2.5*m``, no large-range correction (irrelevant in a 60-bit
hash space at any realistic cardinality).

Reference analog: none — the reference crawler (stanikol/olx) keeps
exact sets in Postgres (`DownloadAds.scala:33`); this is part of the
engine's training-data-pipeline surface (corpus stats at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olx_spark.functions.text import md5_60


def _alpha(m: int) -> float:
    """Flajolet's bias constant. Python-side so the Spark plan and the
    SQL oracle embed the SAME double literal."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    key: Column | str,
    group_cols: list[str] | tuple[str, ...] = (),
    p: int = 12,
) -> DataFrame:
    """Sketch ``key`` into HLL registers, one sketch per group:
    ``group_cols... , idx int, rho int`` with at most ``2**p`` register
    rows per group. Registers from disjoint inputs (other partitions,
    other days) merge via :func:`hll_merge`; :func:`hll_estimate`
    turns them into a count.

    ``rho`` is ``1 +`` the leading-zero count of the low ``60 - p``
    hash bits (the zero-run rank), computed with exact integer/string
    ops — ``locate('1', lpad(bin(w), W, '0'))`` — never float log2.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    w_bits = 60 - p
    h = md5_60(key if isinstance(key, Column) else F.col(key))
    idx = F.shiftright(h, w_bits).cast("int").alias("idx")
    w = h.bitwiseAND(F.lit((1 << w_bits) - 1))
    # rho = position of the first set bit in the W-bit word (1-based
    # from the top), W+1 when the word is zero. bin() drops leading
    # zeros, so the zero-pad restores fixed width and locate() is the
    # leading-zero count + 1 directly.
    rho = (
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.locate("1", F.lpad(F.bin(w), w_bits, "0")))
        .cast("int")
        .alias("rho")
    )
    gcols = list(group_cols)
    return (
        df.select(*gcols, idx, rho)
        .groupBy(*gcols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str] | tuple[str, ...] = ()) -> DataFrame:
    """Merge register tables built with the SAME ``p`` (union the
    frames first): register-wise max. Lossless — merging the sketches
    of two halves equals sketching the union (pytest-pinned)."""
    return registers.groupBy(*list(group_cols), "idx").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(
    registers: DataFrame,
    p: int,
    group_cols: list[str] | tuple[str, ...] = (),
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """Estimate per-group cardinality from a register table.

    The harmonic sum is carried as the exact integer
    ``sum(2**(W+1-rho)) + absent_registers * 2**(W+1)`` (absent
    register == rho 0), so the only floats are one division and —
    on the linear-counting branch — one ``ln``: deterministic across
    engines to the last double bit (division) / last ulp (ln).
    """
    m = 1 << p
    w_bits = 60 - p
    scale = 1 << (w_bits + 1)  # 2**(W+1): the rho=0 (absent) addend
    if m.bit_length() + w_bits + 1 > 62:
        raise ValueError(f"p={p} overflows the exact bigint harmonic sum")
    alpha = _alpha(m)
    gcols = list(group_cols)
    agg = registers.groupBy(*gcols).agg(
        F.count("*").alias("__nz"),
        F.sum(F.expr(f"shiftleft(1L, {w_bits + 1} - rho)")).alias("__s"),
    )
    s_total = F.col("__s") + (F.lit(m) - F.col("__nz")) * F.lit(scale)
    raw = F.lit(alpha * m * m * scale) / s_total
    zeros = F.lit(m) - F.col("__nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(raw)
    return agg.select(*gcols, est.alias(out_col))


def hll_distinct(
    df: DataFrame,
    key: Column | str,
    group_cols: list[str] | tuple[str, ...] = (),
    p: int = 12,
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """``hll_estimate(hll_registers(...))`` in one call — per-group
    approximate distinct counts with standard error ``1.04/sqrt(2**p)``
    and O(2**p) shuffled rows per group."""
    return hll_estimate(
        hll_registers(df, key, group_cols, p), p, group_cols, out_col
    )
