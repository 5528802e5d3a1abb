"""Z-order (Morton) multi-column data layout.

The physical-layout primitive behind Delta/Iceberg ``OPTIMIZE ZORDER``
and the engine's own bucketed snapshot store: map N columns onto one
interleaved-bit key so that range predicates on ANY prefix-queried
column prune most files — the standard answer to "the table is sorted
by orderkey, but half our scans filter partkey".

Everything is pure JVM whole-stage-codegen expressions (bit shifts,
masks, adds — no UDF anywhere) and fully deterministic cross-engine:

- **normalize**: each column min-max scales to ``[0, 2^bits)`` via
  ``floor((x - min) * (2^bits - 1) / (max - min) + 0.5)`` — the stats
  come from ONE metadata-scale aggregate (a single row to the driver;
  on a real lakehouse these come from table/file statistics, not a
  scan). All intermediates stay inside float64's exact-integer range
  for any realistic key domain (|x| < 2^42 at bits<=10), and IEEE
  division of identical doubles is identical everywhere, so the
  quantization is engine-portable (same argument as
  ``operators/clustering.py``).
- **interleave**: ``z = sum_j sum_b bit(x_j, b) << (b*N + j)`` —
  ``bits * N`` codegen terms, column j owning bit-lane offset j.
- **bucket**: the top ``log2(n_buckets)`` bits of z — i.e. the quadrant
  / octant of the space — so each bucket is a tight axis-aligned cell,
  which is exactly the file-pruning property (per-bucket min/max spans
  ~1/sqrt(n_buckets) of each dimension instead of one dimension fully
  sorted and the other unpruned).

At 100 TB: the z-key costs one projection; writing clustered files is
``repartition(n_files, bucket)`` + ``sortWithinPartitions(z)`` — one
shuffle, the same cost as any repartition write, after which every
engine reading parquet min/max footers prunes on all N columns.

Reference parity: no analog in stanikol/olx (single-table inserts);
this serves the engine's own SURVEY §1.4 layout story.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _interleave(norm_cols: list[Column], bits: int) -> Column:
    """Bit-interleave pre-normalized ints: column j's bit b lands at
    position ``b * n + j``. Pure codegen (shift/mask/add)."""
    n = len(norm_cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(norm_cols):
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + j
            ).cast("long")
    return z


def zorder_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    """Per-column (min, max) — ONE aggregate, one row to the driver.
    On a production table these come from catalog statistics."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    stats: dict[str, tuple[int, int]] | None = None,
    out_col: str = "zval",
) -> DataFrame:
    """Append the Morton key over ``cols`` (integer columns). ``stats``
    overrides the min/max scan (pass catalog values at scale)."""
    if not 1 <= bits <= 20:
        raise ValueError("bits in [1, 20] required")
    if len(cols) < 2:
        raise ValueError("z-order needs >= 2 columns (1 column = plain sort)")
    st = stats or zorder_stats(df, cols)
    top = float((1 << bits) - 1)
    norm = []
    for c in cols:
        mn, mx = st[c]
        if mn is None or mx is None:
            raise ValueError(f"column {c} has no stats (all-null?)")
        if mx == mn:
            norm.append(F.lit(0).cast("long"))
        else:
            scaled = (
                (F.col(c).cast("double") - F.lit(float(mn)))
                * F.lit(top)
                / F.lit(float(mx - mn))
            )
            norm.append(F.floor(scaled + F.lit(0.5)).cast("long"))
    return df.withColumn(out_col, _interleave(norm, bits))


def zorder_buckets(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_buckets: int = 16,
    stats: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Z-key + file-bucket assignment (top log2(n_buckets) bits of z).
    ``n_buckets`` must be a power of two <= 2^(bits * n_cols)."""
    lb = int(math.log2(n_buckets))
    if 2**lb != n_buckets:
        raise ValueError("n_buckets must be a power of two")
    width = bits * len(cols)
    if lb > width:
        raise ValueError(f"n_buckets exceeds key space 2^{width}")
    z = zorder_key(df, cols, bits, stats)
    return z.withColumn(
        "file_bucket", F.shiftright(F.col("zval"), width - lb).cast("int")
    )


def zorder_bucket_profile(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_buckets: int = 16,
    stats: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """The pruning-quality profile: per bucket, row count and each
    dimension's min/max span — what a parquet reader's footer check
    would see. Tight per-bucket spans on EVERY column = multi-column
    pruning works."""
    b = zorder_buckets(df, cols, bits, n_buckets, stats)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return b.groupBy("file_bucket").agg(*aggs)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 16,
    stats: dict[str, tuple[int, int]] | None = None,
) -> None:
    """Materialize the clustered layout: one shuffle
    (``repartition(n_files, file_bucket)``) + an in-partition z sort,
    written ``partitionBy(file_bucket)`` — the directory split
    guarantees one z-cell per file even when two bucket ids hash to
    the same task, after which min/max footer pruning works on all
    ``cols``."""
    b = zorder_buckets(df, cols, bits, n_files, stats)
    (
        b.repartition(n_files, "file_bucket")
        .sortWithinPartitions("file_bucket", "zval")
        .drop("zval")
        .write.mode("overwrite")
        .partitionBy("file_bucket")
        .parquet(path)
    )


def size_balanced_assignment(
    df: DataFrame,
    bytes_col: str,
    order_cols: list[str],
    target_bytes: int,
    n_parts: int | None = None,
) -> DataFrame:
    """Output-file planning against the small-files problem: assign
    every row a ``file_id`` so each output file holds ~``target_bytes``
    of payload IN the given sort order (clustered files — the property
    row-count-based ``repartition(n)`` loses the moment row sizes are
    skewed, which multimodal payloads always are: one 4K image weighs
    like 500 captions). ``file_id = floor(running_bytes_before_row /
    target)``, so file boundaries land exactly where the cumulative
    payload crosses the target — deterministic, order-preserving,
    and a row LARGER than the target gets a file of its own plus the
    spill accounted to the next boundary (no splitting, no starving).

    Scale shape: the ``vocab_coverage``/``equi_depth`` distributed
    prefix-sum — range-partition by ``order_cols``, per-partition
    running sums, broadcast partition offsets. One shuffle, no global
    window. Returns the input columns + ``file_id`` (0-based).
    """
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    sess = df.sparkSession
    if n_parts is None:
        n_parts = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    order = [F.col(c).asc() for c in order_cols]
    ranged = (
        df.repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
    )
    from olx_spark.session import materialize

    ranged = materialize(ranged)  # pin physical partition ids
    parts = sorted(
        ranged.groupBy("__pid").agg(F.sum(bytes_col).alias("b")).collect(),
        key=lambda r: r["__pid"],
    )
    off, offsets = 0, {}
    for p in parts:
        offsets[p["__pid"]] = off
        off += p["b"]
    off_df = F.broadcast(
        sess.createDataFrame(
            [(pid, o) for pid, o in offsets.items()], "__pid int, __off long"
        )
    )
    w = Window.partitionBy("__pid").orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # bytes BEFORE this row = running-inclusive minus own size
    before = F.sum(bytes_col).over(run) + F.col("__off") - F.col(bytes_col)
    return (
        ranged.join(off_df, "__pid")
        .withColumn(
            "file_id",
            F.floor(before / F.lit(float(target_bytes))).cast("int"),
        )
        .drop("__pid", "__off")
    )


def footer_stats_audit(
    df: DataFrame,
    bucket_col: str,
    value_cols: list[str],
    out_dir: str | None = None,
) -> DataFrame:
    """Write ``df`` hive-partitioned by ``bucket_col`` and report,
    per bucket, what the written parquet FOOTERS claim — row counts
    and each value column's min/max aggregated across every row
    group of every file — without scanning a single data page.

    This is the audit behind the whole pruning story: Z-order,
    bucketing and partition layout only pay off if the files' footer
    statistics actually carry tight, correct min/max values for the
    clustered columns. Comparing this frame against the same
    aggregate computed FROM the data (the oracle does exactly that)
    certifies the writer end-to-end; a writer that drops or corrupts
    statistics surfaces as NULL/mismatched rows, loudly.

    Footers are read with pyarrow via a distributed ``mapInPandas``
    over the file list — on a real cluster each executor reads only
    the ~KB metadata tail of its files from the object store (the
    same access pattern a scan planner uses), so auditing a
    million-file table costs file-count metadata reads, zero data
    I/O, and one tiny shuffle to merge per-bucket partials. Output
    is independent of how many files each bucket got (stats are
    order- and split-invariant aggregates).

    Returns ``(bucket, n_rows, min_<c>, max_<c> ...)``; the bucket
    column keeps its original name.
    """
    import glob as _glob
    import tempfile

    import pandas as pd  # noqa: F401

    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="olx_footer_audit_")
    df.write.mode("overwrite").partitionBy(bucket_col).parquet(out_dir)

    files = sorted(_glob.glob(f"{out_dir}/{bucket_col}=*/*.parquet"))
    if not files:
        raise RuntimeError(f"no parquet files written under {out_dir}")
    paths = spark.createDataFrame([(p,) for p in files], "path string")

    in_fields = {f.name: f.dataType for f in df.schema.fields}
    out_fields = [StructField(bucket_col, LongType()),
                  StructField("n_rows", LongType())]
    for c in value_cols:
        out_fields += [StructField(f"min_{c}", in_fields[c]),
                       StructField(f"max_{c}", in_fields[c])]
    schema = StructType(out_fields)

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                bucket = int(path.split(f"{bucket_col}=")[1].split("/")[0])
                md = pq.ParquetFile(path).metadata
                names = [md.schema.column(i).name
                         for i in range(md.num_columns)]
                row = {bucket_col: bucket, "n_rows": 0}
                for c in value_cols:
                    row[f"min_{c}"] = None
                    row[f"max_{c}"] = None
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    row["n_rows"] += g.num_rows
                    for c in value_cols:
                        st = g.column(names.index(c)).statistics
                        if st is None or not st.has_min_max:
                            continue  # stays NULL -> audit mismatch
                        mn, mx = st.min, st.max
                        if row[f"min_{c}"] is None or mn < row[f"min_{c}"]:
                            row[f"min_{c}"] = mn
                        if row[f"max_{c}"] is None or mx > row[f"max_{c}"]:
                            row[f"max_{c}"] = mx
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in out_fields])

    per_file = paths.mapInPandas(read_footers, schema=schema)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for c in value_cols:
        aggs += [F.min(f"min_{c}").alias(f"min_{c}"),
                 F.max(f"max_{c}").alias(f"max_{c}")]
    return per_file.groupBy(bucket_col).agg(*aggs)


def similarity_order(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_keys: int = 4,
    rows_per_shard: int = 1000,
    n_parts: int | None = None,
) -> DataFrame:
    """Similarity-ordered shard layout: assign every document a
    ``(shard, pos)`` by GLOBAL rank under its MinHash-prefix key, so
    near-duplicate and template-sharing documents land ADJACENT in
    the same output shard. General-purpose compressors are
    window-local — zstd/snappy only deduplicate bytes they see close
    together — so similarity ordering is the storage-layer trick
    that makes a boilerplate-heavy web corpus compress measurably
    smaller than hash ordering at zero read-path cost (tested:
    >=15% on a paragraph-recombination corpus). The key is the
    first ``n_keys`` values of the md5-60 MinHash signature
    (`functions/text.minhash_signature` — deterministic, JVM-exact,
    so the layout is reproducible cross-engine), tie-broken by id;
    empty texts sort first via a -1 sentinel.

    Scale shape: the ``equi_depth_histogram`` distributed-prefix-sum
    pattern — range-partition by key, per-partition ``row_number``
    plus broadcast partition-count offsets — gives exact global
    ranks with NO single-task global sort; cost is one range shuffle
    of ``(keys, id)`` and a metadata-scale offsets collect. Returns
    ``(id_col, shard, pos)``; writing means
    ``repartition(shard).sortWithinPartitions(pos)``.
    """
    from olx_spark.functions.text import minhash_signature, word_shingles
    from olx_spark.session import materialize

    if rows_per_shard < 1 or n_keys < 1:
        raise ValueError("rows_per_shard and n_keys must be >= 1")
    sess = df.sparkSession
    if n_parts is None:
        n_parts = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    sig = minhash_signature(word_shingles(F.col(text_col)), n_perm=n_keys)
    # materialized ONCE: repartitionByRange's range-bound sampling pass
    # is a hidden second consumer, and un-cut it would run the whole
    # shingle + n_keys-way md5 MinHash expression tree twice (sampling
    # + the real shuffle) — the signature pass dominates this operator
    keyed = materialize(
        df.select(
            F.col(id_col),
            *[
                F.coalesce(F.element_at(sig, j + 1), F.lit(-1)).alias(f"__k{j}")
                for j in range(n_keys)
            ],
        )
    )
    order = [F.col(f"__k{j}").asc() for j in range(n_keys)] + [
        F.col(id_col).asc()
    ]
    ranged = materialize(  # pin physical partition ids before counting
        keyed.repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
    )
    parts = sorted(
        ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect(),
        key=lambda r: r["__pid"],
    )
    cum, offsets = 0, {}
    for p in parts:
        offsets[p["__pid"]] = cum
        cum += p["c"]
    off_df = F.broadcast(
        sess.createDataFrame(
            list(offsets.items()) or [(0, 0)], "__pid int, __off long"
        )
    )
    w = Window.partitionBy("__pid").orderBy(*order)
    rank0 = F.row_number().over(w) + F.col("__off") - 1
    return ranged.join(off_df, "__pid").select(
        F.col(id_col),
        F.floor(rank0 / rows_per_shard).cast("int").alias("shard"),
        (rank0 % rows_per_shard).cast("int").alias("pos"),
    )
