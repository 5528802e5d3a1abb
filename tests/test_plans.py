"""Physical-plan quality gates (SURVEY.md §4): predicate pushdown,
column pruning, broadcast joins, whole-stage codegen, and no
row-at-a-time Python in any hot path.

These tests pin the *plan shape*, not timings — a regression that
un-pushes a filter or silently inserts BatchEvalPython fails here long
before it shows up in bench numbers.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from conftest import SF_DIR


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = entry_mod.q_scan_filter(spark, SF_DIR)
    plan = plan_of(df)
    assert "PushedFilters:" in plan
    assert "c_mktsegment" in plan.split("PushedFilters:")[1][:300]


def test_column_pruning(spark):
    df = entry_mod.q_scan_filter(spark, SF_DIR)
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1][:400]
    assert "c_custkey" in read_schema and "c_name" in read_schema
    # untouched wide columns must NOT be read
    assert "c_nationkey" not in read_schema


def test_fk_join_is_broadcast(spark):
    df = entry_mod.q_fk_stamp_join(spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_agg_uses_whole_stage_codegen_and_partial_agg(spark):
    df = entry_mod.q_metrics_agg(spark, SF_DIR)
    df.collect()  # finalize the AQE plan before inspecting it
    plan = plan_of(df)
    # whole-stage codegen spans render as "*(n)" in executedPlan strings
    assert "*(1)" in plan and "*(2)" in plan
    # partial (map-side) aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_no_python_udf_in_jvm_queries(spark):
    """Every query that can be pure JVM must be pure JVM: no
    BatchEvalPython (row-at-a-time) and no Arrow eval either."""
    jvm_only = [
        "q_scan_filter", "q_filter_conj", "q_explode_links", "q_string_fns",
        "q_ordered_limit", "q_parse_project", "q_map_brief", "q_fk_stamp_join",
        "q_politeness_budget", "q_dedup_first_seen", "q_duration_parse",
        "q_metrics_agg", "q_window_rank", "q_rollup_metrics",
        "q_token_count", "q_quality_score", "q_lang_id", "q_doc_fingerprint",
        "q_dedup_exact", "q_simhash16", "q_ngram_jaccard", "q_embed_cosine_topk",
    ]
    queries = entry_mod.queries()
    for key in jvm_only:
        plan = plan_of(queries[key](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{key}: row-at-a-time Python!"
        assert "ArrowEvalPython" not in plan, f"{key}: unexpected Python UDF"
        assert "MapInPandas" not in plan, f"{key}: unexpected mapInPandas"


def test_no_row_at_a_time_python_anywhere(spark):
    """Pandas-UDF paths (canonicalize, fetch) must be Arrow-vectorized,
    never BatchEvalPython (input_hint: no per-row Python)."""
    from olx_spark.functions.urls import canonicalize_reference

    df = spark.createDataFrame(
        [("/a/", "https://h.example/l/?q=1")], "href string, base string"
    ).select(canonicalize_reference(F.col("href"), F.col("base")))
    plan = plan_of(df)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_events_filter_pushdown_on_type(spark):
    df = entry_mod.q_filter_conj(spark, SF_DIR)
    plan = plan_of(df)
    pushed = plan.split("PushedFilters:")[1][:300]
    assert "event_type" in pushed and "value" in pushed


def test_ordered_limit_is_take_ordered(spark):
    """Global top-k must compile to TakeOrderedAndProject (distributed
    partial top-k), never a no-partition window that funnels the whole
    table through one task ("WindowExec: No Partition Defined")."""
    import re

    for q in (entry_mod.q_ordered_limit, entry_mod.q_join_agg_topk):
        df = q(spark, SF_DIR)
        df.collect()  # finalize AQE
        plan = plan_of(df)
        assert "TakeOrderedAndProject" in plan, q.__name__
        # every Window operator left must carry a partition spec (the
        # constant-partitioned rank over the limited rows qualifies);
        # an empty windowspecdefinition partition list is the scale bug
        for m in re.finditer(r"windowspecdefinition\(", plan):
            spec = plan[m.end() : m.end() + 120]
            assert not spec.startswith(("o_", "l_", "rev_raw DESC")), (
                q.__name__,
                spec,
            )


def test_ordered_limit_operator_take_ordered(spark):
    from olx_spark.operators.ranking import ordered_limit

    df = spark.range(100000).select(
        F.col("id"), (F.col("id") * 7 % 1000).alias("v")
    )
    out = ordered_limit(df, 5, [F.col("v").desc(), F.col("id")])
    plan = plan_of(out)
    assert "TakeOrderedAndProject" in plan
    got = [r["id"] for r in out.orderBy("rank_in_limit").collect()]
    assert len(got) == 5


def test_per_host_budget_precut_plan_shape(spark):
    """The two-phase salted top-k must materialize as TWO window ops
    when the budget can cut (salted pre-rank + final per-host rank),
    and collapse to ONE when the budget ceiling is unbounded — where
    the pre-cut would be a pure extra shuffle fixing nothing."""
    import re

    from olx_spark.operators.politeness import per_host_budget

    f = (
        spark.createDataFrame(
            [
                (f"https://h.example/a/{i}/", "h.example", 1, 0, i, 1)
                for i in range(20)
            ],
            "url string, host string, priority int, discovery_round int, "
            "discovery_pos long, parent_fp long",
        )
        .withColumn("url_fp", F.xxhash64("url"))
        .withColumn("crawl_delay_ms", F.lit(0))
    )
    n_windows = lambda df: len(re.findall(r"\bWindow\b", plan_of(df)))
    bounded = per_host_budget(f, round_budget_ms=600, default_per_round=4, salt_buckets=8)
    assert n_windows(bounded) == 2
    unbounded = per_host_budget(
        f, round_budget_ms=10_000_000, default_per_round=1_000_000, salt_buckets=8
    )
    assert n_windows(unbounded) == 1


def test_anti_join_strategy(spark):
    from olx_spark.operators.dedup import anti_join_unseen

    frontier = spark.range(0, 100000).select(F.xxhash64("id").alias("url_fp"))
    seen = spark.range(0, 1000).select(F.xxhash64("id").alias("url_fp"))
    out = anti_join_unseen(frontier, seen)
    plan = plan_of(out)
    # small seen side must broadcast (no full shuffle of the frontier)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_corpus_mix_no_exchange(spark):
    # the pretraining-mix sampler is a pure filter: no shuffle anywhere
    from olx_spark.operators.sampling import corpus_mix_sample

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = corpus_mix_sample(df, "lang", {"en": 1.0, "de": 0.5}, "doc_id")
    assert "Exchange" not in plan_of(out)


def test_cms_lookup_broadcasts_probes(spark):
    # a small query set must broadcast against the counter grid — the
    # big sketch never moves for a point lookup
    from olx_spark.operators.cms import cms_build, cms_lookup

    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    grid = cms_build(df, "user_id", 4, 256)
    q = df.select("user_id").distinct().limit(10)
    plan = plan_of(cms_lookup(grid, q, "user_id", 4, 256))
    assert "BroadcastHashJoin" in plan


def test_hll_registers_single_mapside_combined_exchange(spark):
    # one shuffle, partial-aggregated before it: the sketch moves
    # <= 2**p register rows per map task, never the raw keys
    from olx_spark.operators.sketches import hll_registers

    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = plan_of(hll_registers(df, F.col("user_id").cast("string"), p=10))
    assert plan.count("Exchange") == 1
    # tree prints top-down: the map-side (partial) aggregate sits
    # BELOW the Exchange, i.e. after it in the string
    _, _, below = plan.partition("Exchange")
    assert "HashAggregate" in below  # map-side combine feeds the shuffle


def test_semantic_dedup_plan_no_cartesian(spark):
    # the within-cluster prune must be an EQUI join on cell (shuffled
    # hash / sort-merge), never a cartesian or nested-loop product —
    # the cosine threshold is a post-join filter, not a join condition
    # Catalyst could degrade on
    from olx_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    plan = plan_of(semantic_dedup(emb, dim=64, n_clusters=16, threshold=0.35))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # no per-row Python on the pair path: the only Python stage is the
    # vectorized cell assigner (ArrowEvalPython), never BatchEvalPython
    assert "BatchEvalPython" not in plan


def test_bpe_pair_count_is_mapside_combined(spark):
    # one merge step's pair aggregation: partial HashAggregate BELOW
    # the single Exchange — pairs combine map-side, the shuffle carries
    # (pair, partial count) rows, never one row per pair occurrence
    from olx_spark.operators.bpe import word_vocab, _initial_symbols

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 50
    )
    vocab = word_vocab(docs, "text").select(
        _initial_symbols(F.col("word")).alias("s"), "cnt"
    )
    arr = F.split("s", " ")
    pairs = vocab.select(
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, F.size(arr) - 1).alias("a"),
                F.slice(arr, 2, F.size(arr) - 1).alias("b"),
            )
        ).alias("p"),
        "cnt",
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
    agg = pairs.groupBy("a", "b").agg(F.sum("cnt").alias("c"))
    plan = plan_of(agg)
    # two Exchanges total: word-count shuffle + pair shuffle; the
    # partial aggregate for the PAIR shuffle sits below the topmost one
    _, _, below = plan.partition("Exchange")
    assert "HashAggregate" in below
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_encode_docs_plan_is_vocab_joined(spark):
    # the corpus-scale encode: the merge chain runs on the
    # DISTINCT-word frame (vocab-sized) as ONE Arrow-vectorized pass
    # (round-6: replaced n_merges chained interpreted JVM folds), the
    # corpus maps through a JOIN — never a cartesian/NLJ, never
    # per-row pickled Python, never Python over the corpus; the
    # per-doc reassembly is a sort-free collect_list aggregate
    # (array_sort inside the agg)
    from olx_spark.operators.bpe import bpe_encode_docs, bpe_train

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 50
    )
    merges = bpe_train(docs, "text", n_merges=4)
    out = bpe_encode_docs(docs, "text", merges)
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the only Python eval is the vectorized encode over the distinct
    # vocab: Arrow-batched (no pickled per-row BatchEvalPython), one
    # node, and its child is the distinct-word aggregate — i.e. it
    # sees vocab rows, not corpus rows
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1
    assert "HashAggregate(keys=[word" in plan.partition("ArrowEvalPython")[2]
    # no GLOBAL Sort: document order is restored via array_sort over
    # (pos, toks) structs inside the aggregate, not a shuffle-sort.
    # (SortMergeJoin's partition-local sorts print `], false, 0`.)
    assert "], true, 0" not in plan
