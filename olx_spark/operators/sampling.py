"""Deterministic corpus sampling — the subset-selection primitives of
a training-data pipeline (corpus balancing, throughput-bounded dev
sets, ablation slices).

The reference engine has no sampling surface (it downloads every ad it
schedules, `DownloadAds.scala:33`); this backs the engine's
training-data-pipeline brief alongside the dedup/quality family.

Both samplers key on a SALTED PORTABLE HASH of a stable row id
(md5-60, the repo's cross-engine hash convention — see
``functions/text.py``), never on ``rand()``:

- re-runs, resumed runs and late-arriving rows sample identically
  (the holdout contract: a document's fate is a pure function of its
  id and the salt version);
- any engine can reproduce the exact subset (the DuckDB oracle does);
- changing the salt string draws a fresh independent sample.

Scale shapes (100 TB):

- :func:`hash_bernoulli_sample` is a pure filter — no shuffle, no
  state, pushes down next to the scan. The right tool when a FRACTION
  is wanted.
- :func:`stratified_sample` needs exact per-stratum counts, so it pays
  one shuffle on the strata columns; the rank runs as the same
  TWO-PHASE salted window as ``ordered_limit``'s per-group path, so a
  hot stratum (90% of a web corpus is ``en``/``web``) sorts in
  ``salt_buckets`` parallel slices instead of one task (AQE skew-split
  does not apply to window partitions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olx_spark.functions.text import md5_60
from olx_spark.operators.ranking import ordered_limit


def _salted_hash(id_col: str, salt: str) -> Column:
    return md5_60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))


def hash_bernoulli_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep each row iff ``md5_60(salt:id) % 1_000_000 < fraction * 1e6``
    — a deterministic Bernoulli(fraction) draw over ids (md5 is
    uniform over the 60-bit range, and 2**60 % 1e6 leaves a relative
    modulo bias < 1e-12). Shuffle-free, state-free, scan-adjacent.

    Rows sharing an id share a fate (by design: sampling is per
    DOCUMENT, so duplicate rows of one id stay together). Disjoint
    salts give independent draws — the standard trick for carving
    non-overlapping dev/test slices is disjoint threshold WINDOWS of
    one salt, e.g. ``[0, 0.05)`` and ``[0.05, 0.10)``.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * 1_000_000))
    return df.filter(F.pmod(_salted_hash(id_col, salt), F.lit(1_000_000)) < cut)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str] | tuple[str, ...],
    n_per_stratum: int,
    id_col: str,
    salt: str = "sample-v1",
    salt_buckets: int = 8,
) -> DataFrame:
    """Exactly ``min(n_per_stratum, |stratum|)`` rows per stratum,
    chosen deterministically: rank rows within each stratum by
    ``(md5_60(salt:id), id)`` — a salted total order, i.e. a uniform
    random permutation reproducible across engines — and keep ranks
    below ``n_per_stratum``. The balanced-corpus primitive (equal
    documents per (lang, source) cell regardless of raw skew).

    Output: the input columns plus ``rank_in_limit`` (0-based rank
    within the stratum under the salted order). One shuffle on the
    strata columns; the rank is the two-phase salted window of
    :func:`olx_spark.operators.ranking.ordered_limit`, so a dominant
    stratum's sort spreads over ``salt_buckets`` tasks.
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    if not strata_cols:
        raise ValueError("strata_cols must name at least one column")
    h = _salted_hash(id_col, salt)
    return ordered_limit(
        df.withColumn("__h", h),
        n_per_stratum,
        [F.col("__h"), F.col(id_col)],
        partition_cols=list(strata_cols),
        salt_buckets=salt_buckets,
    ).drop("__h")


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    dim: int,
    cap: int,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
    salt: str = "cluster-v1",
    salt_buckets: int = 8,
    train: bool = False,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Cluster-balanced subset selection over an embedding column —
    the DataComp/SemDeDup-family "image-based" curation step: assign
    each vector to its nearest-centroid CLUSTER, then keep at most
    ``cap`` rows per cluster so the kept corpus covers the embedding
    space evenly instead of mirroring the raw density skew (web
    corpora are dominated by a few dense modes).

    Composition of two audited primitives: cluster assignment is the
    IVF cell assigner (vectorized pandas UDF, one numpy
    ``batch @ centroids.T`` argmax per Arrow batch, centroids a
    broadcast closure constant, ties to the LARGER centroid id —
    ``similarity._cell_assigner``); the per-cluster cap is
    :func:`stratified_sample` on the cell column (salted md5-60
    permutation, two-phase window). Scale shape: one shuffle total (on
    ``cell``), assignment is shuffle-free, and the hot cluster sorts
    in ``salt_buckets`` parallel slices.

    Centroid source mirrors ``ivf_topk``: explicit ``centroids`` >
    ``train=True`` (seeded sample-based spherical k-means —
    production) > seeded random (SQL-oracle-recomputable default).

    Output: input columns plus ``cell`` (cluster id) and
    ``rank_in_limit`` (0-based salted rank within the cluster).
    """
    from olx_spark.operators.similarity import (
        _cell_assigner,
        ivf_centroids,
        kmeans_centroids,
    )

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if centroids is not None:
        cents = centroids
    elif train:
        cents = kmeans_centroids(
            df, dim, n_clusters, seed, id_col=id_col, vec_col=vec_col
        )
    else:
        cents = ivf_centroids(dim, n_clusters, seed)
    assigned = df.withColumn("cell", _cell_assigner(cents)(F.col(vec_col)))
    return stratified_sample(
        assigned, ["cell"], cap, id_col, salt=salt, salt_buckets=salt_buckets
    )


def corpus_mix_sample(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Per-group Bernoulli rates — the PRETRAINING-MIX step: sample
    each source/domain at its own rate (e.g. wiki 1.0, web 0.1) so the
    kept corpus approaches a target mixture. Same fate contract as
    :func:`hash_bernoulli_sample` (salted md5-60 of the id: re-runs,
    resumes and late rows agree; disjoint salts draw independently),
    same scale shape (a pure filter — the per-group cut is a broadcast
    CASE over ``group_col``, no shuffle, scan-adjacent).

    Groups absent from ``fractions`` keep ``default_fraction`` (0.0 =
    drop unknown sources — the safe default for a curated mix).
    """
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    cut = F.lit(int(round(default_fraction * 1_000_000)))
    for g, f in sorted(fractions.items()):
        cut = F.when(F.col(group_col) == g, F.lit(int(round(f * 1_000_000)))).otherwise(cut)
    return df.filter(F.pmod(_salted_hash(id_col, salt), F.lit(1_000_000)) < cut)


def leakage_safe_split(
    comps: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "component",
    salt: str = "split-v1",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Dedup-aware train/val/test assignment: the holdout unit is the
    near-dup COMPONENT, not the document. A per-doc hash split (the
    plain ``split-v1`` contract) leaks: two near-duplicate documents
    can land in train and test, and the eval measures memorization.
    Hashing the component id instead gives every member of a dup
    group the same fate — the leakage guard every serious
    pretraining holdout applies (cf. the dedup-then-split protocols
    of GPT-3/Gopher appendixes).

    ``comps`` is one row per doc with its transitive component id
    (``graph.connected_components`` output; singletons carry their
    own id), so this is a pure JVM projection on top of the dedup
    pass — no shuffle of its own, deterministic under re-runs and
    late-arriving members (the component id, min doc id of the
    group, is stable once the group is known).

    Returns (id, component, bucket, split)."""
    if not (0 < train_pct and 0 < val_pct and train_pct + val_pct < 100):
        raise ValueError(
            f"need 0 < train_pct, 0 < val_pct, train_pct + val_pct < 100; "
            f"got {train_pct}/{val_pct}"
        )
    bucket = md5_60(
        F.concat(F.lit(f"{salt}:"), F.col(comp_col).cast("string"))
    ) % 100
    return comps.select(
        id_col,
        comp_col,
        bucket.alias("bucket"),
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ares-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    "Weighted random sampling with a reservoir", IPL 2006, A-Res):
    each row draws u ~ U(0,1] and competes with key ``-ln(u)/w`` —
    the k SMALLEST keys are a correctly-distributed weighted sample
    (inclusion probability proportional to weight, jointly without
    replacement), the quality-weighted corpus subsampling primitive
    (sample pretraining docs by quality score, hosts by traffic)
    that per-row Bernoulli (:func:`hash_bernoulli_sample`) cannot
    express when an EXACT output size is required.

    ``u`` is the salted md5-60 of the id mapped to (0, 1] — the
    engine's deterministic-fate contract: re-runs, resumes, engines
    agree row by row; disjoint salts draw independent samples. The
    k-smallest selection is :func:`ranking.ordered_limit`
    (TakeOrderedAndProject — distributed partial top-k, no global
    sort). Rows with weight <= 0 never win (key = +inf analog via a
    filter). Returns (rank, id, weight, key) with ``rank`` 1-based.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    u = (md5_60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))) + 1) / F.lit(
        float(1 << 60)
    )
    key = -F.log(u) / w
    scored = (
        df.filter(w > 0)
        .select(
            F.col(id_col).alias("id"),
            w.alias("weight"),
            key.alias("key"),
        )
    )
    top = ordered_limit(scored, k, ["key", "id"])
    return top.select(
        (F.col("rank_in_limit") + 1).cast("int").alias("rank"),
        "id",
        "weight",
        F.round("key", 9).alias("key"),
    )
