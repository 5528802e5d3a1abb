"""Deterministic sampling operators (operators/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from olx_spark.operators.sampling import hash_bernoulli_sample, stratified_sample


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, n=400):
    rows = [
        (i, f"doc text {i}", ["en", "en", "en", "de"][i % 4], ["web", "wiki"][i % 2])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


# ---------------------------------------------------------------- bernoulli
def test_bernoulli_matches_hash_threshold_exactly(spark):
    df = _docs(spark)
    got = sorted(
        r["doc_id"] for r in hash_bernoulli_sample(df, "doc_id", 0.25).collect()
    )
    want = sorted(
        i for i in range(400) if _md5_60(f"sample-v1:{i}") % 1_000_000 < 250_000
    )
    assert got == want
    assert 0.15 < len(got) / 400 < 0.35  # sane rate on 400 draws


def test_bernoulli_deterministic_across_partitioning(spark):
    df = _docs(spark)
    a = set(r["doc_id"] for r in hash_bernoulli_sample(df, "doc_id", 0.1).collect())
    b = set(
        r["doc_id"]
        for r in hash_bernoulli_sample(df.repartition(7), "doc_id", 0.1).collect()
    )
    assert a == b


def test_bernoulli_salts_draw_differently(spark):
    df = _docs(spark)
    a = set(r["doc_id"] for r in hash_bernoulli_sample(df, "doc_id", 0.5, "s-a").collect())
    b = set(r["doc_id"] for r in hash_bernoulli_sample(df, "doc_id", 0.5, "s-b").collect())
    assert a != b  # independent draws (P(equal) ~ 2^-400)


def test_bernoulli_edge_fractions_and_validation(spark):
    import pytest

    df = _docs(spark, 50)
    assert hash_bernoulli_sample(df, "doc_id", 0.0).count() == 0
    assert hash_bernoulli_sample(df, "doc_id", 1.0).count() == 50
    with pytest.raises(ValueError):
        hash_bernoulli_sample(df, "doc_id", 1.5)


# --------------------------------------------------------------- stratified
def test_stratified_exact_counts_per_stratum(spark):
    df = _docs(spark)  # strata sizes: en/web 100, en/wiki 200, de/wiki 100...
    out = stratified_sample(df, ["lang", "source"], 30, "doc_id")
    counts = {
        (r["lang"], r["source"]): r["n"]
        for r in out.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        (r["lang"], r["source"]): r["n"]
        for r in df.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {k: min(30, v) for k, v in sizes.items()}


def test_stratified_matches_driver_side_oracle(spark):
    df = _docs(spark, 120)
    out = stratified_sample(df, ["lang"], 5, "doc_id").collect()
    rows = [(i, ["en", "en", "en", "de"][i % 4]) for i in range(120)]
    want = {}
    for lang in ("en", "de"):
        ids = sorted(
            (i for i, l in rows if l == lang),
            key=lambda i: (_md5_60(f"sample-v1:{i}"), i),
        )[:5]
        for rk, i in enumerate(ids):
            want[i] = (lang, rk)
    got = {r["doc_id"]: (r["lang"], r["rank_in_limit"]) for r in out}
    assert got == want


def test_stratified_two_phase_equals_single_phase(spark):
    df = _docs(spark)
    a = sorted(
        (r["doc_id"], r["rank_in_limit"])
        for r in stratified_sample(df, ["lang"], 17, "doc_id", salt_buckets=8).collect()
    )
    b = sorted(
        (r["doc_id"], r["rank_in_limit"])
        for r in stratified_sample(df, ["lang"], 17, "doc_id", salt_buckets=1).collect()
    )
    assert a == b


def test_stratified_validation(spark):
    import pytest

    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        stratified_sample(df, [], 5, "doc_id")
    with pytest.raises(ValueError):
        stratified_sample(df, ["lang"], 0, "doc_id")


class TestCorpusMix:
    def test_rates_and_fate_stability(self, spark):
        from olx_spark.operators.sampling import corpus_mix_sample

        df = spark.range(20_000).select(
            F.col("id").cast("string").alias("doc_id"),
            F.when(F.col("id") % 3 == 0, "en")
            .when(F.col("id") % 3 == 1, "de")
            .otherwise("zh")
            .alias("lang"),
        )
        out = corpus_mix_sample(
            df, "lang", {"en": 1.0, "de": 0.5}, "doc_id", default_fraction=0.1
        )
        rates = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert rates["en"] == 6667  # fraction 1.0 keeps every row
        assert abs(rates["de"] / 6667 - 0.5) < 0.05
        assert abs(rates["zh"] / 6666 - 0.1) < 0.03
        # fate stability: same ids kept on a re-run
        again = corpus_mix_sample(
            df, "lang", {"en": 1.0, "de": 0.5}, "doc_id", default_fraction=0.1
        )
        assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0

    def test_mix_subset_of_bernoulli(self, spark):
        # a group at fraction f keeps exactly the rows the plain
        # Bernoulli sampler at f keeps under the same salt (shared
        # threshold-window contract)
        from olx_spark.operators.sampling import (
            corpus_mix_sample,
            hash_bernoulli_sample,
        )

        df = spark.range(5_000).select(
            F.col("id").cast("string").alias("doc_id"), F.lit("de").alias("lang")
        )
        mix = corpus_mix_sample(df, "lang", {"de": 0.3}, "doc_id", salt="s9")
        bern = hash_bernoulli_sample(df, "doc_id", 0.3, salt="s9")
        assert mix.exceptAll(bern).count() == 0 and bern.exceptAll(mix).count() == 0

    def test_validation(self):
        from olx_spark.operators.sampling import corpus_mix_sample

        import pytest as _pt

        with _pt.raises(ValueError):
            corpus_mix_sample(None, "g", {"a": 1.5}, "id")
        with _pt.raises(ValueError):
            corpus_mix_sample(None, "g", {"a": 0.5}, "id", default_fraction=-0.1)


# ------------------------------------------------- cluster-balanced sample
def _vecs(spark, n=90, dim=8, seed=3):
    import numpy as np

    rng = np.random.default_rng(np.random.PCG64(seed))
    x = rng.standard_normal((n, dim))
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), x


def test_cluster_sample_matches_numpy_replay(spark):
    import numpy as np

    from olx_spark.operators.sampling import cluster_balanced_sample
    from olx_spark.operators.similarity import ivf_centroids

    df, x = _vecs(spark)
    cents = np.asarray(ivf_centroids(8, 4, seed=7))
    dots = x @ cents.T
    # argmax with ties to the LARGER centroid id (the assigner contract)
    cells = (cents.shape[0] - 1 - dots[:, ::-1].argmax(axis=1)).astype(int)
    expect = {}
    for cell in set(cells):
        members = sorted(
            (int(i) for i in np.nonzero(cells == cell)[0]),
            key=lambda i: (_md5_60(f"cluster-v1:{i}"), i),
        )
        for rank, i in enumerate(members[:3]):
            expect[i] = (cell, rank)
    got = {
        r["vec_id"]: (r["cell"], r["rank_in_limit"])
        for r in cluster_balanced_sample(df, "vec_id", dim=8, cap=3, n_clusters=4).collect()
    }
    assert got == expect


def test_cluster_sample_cap_and_determinism(spark):
    from olx_spark.operators.sampling import cluster_balanced_sample

    df, _ = _vecs(spark, n=120)
    out = cluster_balanced_sample(df, "vec_id", dim=8, cap=5, n_clusters=4).collect()
    per_cell = {}
    for r in out:
        per_cell.setdefault(r["cell"], []).append(r["rank_in_limit"])
    assert set(per_cell) <= set(range(4))
    for ranks in per_cell.values():
        assert len(ranks) <= 5 and sorted(ranks) == list(range(len(ranks)))
    again = cluster_balanced_sample(
        df.repartition(7), "vec_id", dim=8, cap=5, n_clusters=4
    ).collect()
    assert sorted((r["vec_id"], r["cell"]) for r in out) == sorted(
        (r["vec_id"], r["cell"]) for r in again
    )


def test_cluster_sample_trained_centroids(spark):
    # train=True fits seeded spherical k-means on the corpus sample;
    # still deterministic, still capped, cells still in range
    from olx_spark.operators.sampling import cluster_balanced_sample

    df, _ = _vecs(spark, n=100)
    a = cluster_balanced_sample(df, "vec_id", dim=8, cap=4, n_clusters=4, train=True).collect()
    b = cluster_balanced_sample(df, "vec_id", dim=8, cap=4, n_clusters=4, train=True).collect()
    assert sorted((r["vec_id"], r["cell"], r["rank_in_limit"]) for r in a) == sorted(
        (r["vec_id"], r["cell"], r["rank_in_limit"]) for r in b
    )
    per_cell = {}
    for r in a:
        per_cell[r["cell"]] = per_cell.get(r["cell"], 0) + 1
    assert set(per_cell) <= set(range(4))
    assert all(c <= 4 for c in per_cell.values())


def test_cluster_sample_validation(spark):
    import pytest

    from olx_spark.operators.sampling import cluster_balanced_sample

    df, _ = _vecs(spark, n=10)
    with pytest.raises(ValueError):
        cluster_balanced_sample(df, "vec_id", dim=8, cap=0)


class TestLeakageSafeSplit:
    def _comps(self, spark):
        # components: {1,2,3} together, {10,11} together, 20 singleton
        return spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
            "doc_id long, component long",
        )

    def test_dup_groups_share_fate(self, spark):
        from olx_spark.operators.sampling import leakage_safe_split

        out = leakage_safe_split(self._comps(spark)).collect()
        by_comp = {}
        for r in out:
            by_comp.setdefault(r["component"], set()).add(r["split"])
        assert all(len(s) == 1 for s in by_comp.values())
        assert {r["split"] for r in out} <= {"train", "val", "test"}

    def test_deterministic_and_salted(self, spark):
        from olx_spark.operators.sampling import leakage_safe_split

        a = leakage_safe_split(self._comps(spark)).collect()
        b = leakage_safe_split(self._comps(spark)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        c = leakage_safe_split(self._comps(spark), salt="split-v2").collect()
        assert {r["doc_id"]: r["bucket"] for r in c} != {
            r["doc_id"]: r["bucket"] for r in a
        }

    def test_split_proportions_roughly_hold(self, spark):
        from olx_spark.operators.sampling import leakage_safe_split

        comps = spark.range(2000).select(
            F.col("id").alias("doc_id"), F.col("id").alias("component")
        )
        counts = {
            r["split"]: r["n"]
            for r in leakage_safe_split(comps)
            .groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert 1700 < counts["train"] < 1900
        assert 50 < counts["val"] < 160
        assert 50 < counts["test"] < 160

    def test_bad_percents_refused(self, spark):
        from olx_spark.operators.sampling import leakage_safe_split

        with pytest.raises(ValueError):
            leakage_safe_split(self._comps(spark), train_pct=96, val_pct=5)

    def test_no_shuffle_projection(self, spark):
        from olx_spark.operators.sampling import leakage_safe_split

        plan = (
            leakage_safe_split(self._comps(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestWeightedSample:
    def test_exact_k_and_determinism(self, spark):
        from olx_spark.operators.sampling import weighted_sample

        df = spark.range(500).select(
            F.col("id").alias("doc"), (F.col("id") % 7 + 1).alias("w")
        )
        a = weighted_sample(df, "doc", "w", k=40).collect()
        b = weighted_sample(df, "doc", "w", k=40).collect()
        assert len(a) == 40
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert [r["rank"] for r in a] == list(range(1, 41))
        # disjoint salts draw differently
        c = weighted_sample(df, "doc", "w", k=40, salt="ares-v2").collect()
        assert {r["id"] for r in a} != {r["id"] for r in c}

    def test_nonpositive_weights_never_win(self, spark):
        from olx_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)], "doc long, w double"
        )
        got = {r["id"] for r in weighted_sample(df, "doc", "w", k=4).collect()}
        assert got == {1, 4}

    def test_inclusion_proportional_to_weight(self, spark):
        from olx_spark.operators.sampling import weighted_sample

        # 100 heavy (w=10) + 900 light (w=1); k=100 over 30 salts:
        # heavy inclusion rate must dominate light by several x
        rows = [(i, 10.0 if i < 100 else 1.0) for i in range(1000)]
        df = spark.createDataFrame(rows, "doc long, w double").cache()
        heavy = light = 0
        for s in range(30):
            got = weighted_sample(df, "doc", "w", k=100, salt=f"t{s}").collect()
            heavy += sum(1 for r in got if r["id"] < 100)
            light += sum(1 for r in got if r["id"] >= 100)
        rate_h = heavy / (30 * 100)
        rate_l = light / (30 * 900)
        assert rate_h > 4 * rate_l, (rate_h, rate_l)

    def test_take_ordered_plan(self, spark):
        from olx_spark.operators.sampling import weighted_sample

        df = spark.range(100).select(F.col("id").alias("doc"), F.lit(1.0).alias("w"))
        plan = (
            weighted_sample(df, "doc", "w", k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
