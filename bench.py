"""Benchmark runner (driver contract): headline queries at
``$SPARK_GRAFT_SF_DIR`` on ``local[$SPARK_GRAFT_CPUS]``, plus the
synthetic-crawl throughput. Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "crawl_urls_per_sec": ..., "cpus": ...}

Timing protocol (BASELINE.md): one warm-up execution, then 3 timed
repetitions per query, median reported. Results sunk via the noop
writer so collection cost is excluded.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from olx_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_metrics_agg",
    "q_window_rank",
    "q_fk_stamp_join",
    "q_dedup_first_seen",
    "q_ordered_limit",
    "q_explode_links",
    "q_fetch_batch",
    "q_token_count",
    "q_quality_score",
    "q_lang_id",
    "q_doc_fingerprint",
    "q_simhash16",
    "q_ngram_jaccard",
    "q_minhash_lsh",
    "q_embed_cosine_topk",
    "q_ann_lsh",
    "q_ivf_ann",
    "q_multi_join",
    "q_politeness_budget",
    "q_phash_near_dup",
    "q_audio_features",
    # round-5 additions (absent from r4 binaries; adjust suite-total
    # comparisons across rounds accordingly — see BENCH.md)
    "q_repetition_stats",
    "q_pii_scrub",
    "q_video_features",
    "q_chunk_dedup",
    "q_dup_components",
    "q_asof_join",
    "q_range_join",
    "q_sessionize",
    "q_bm25_top_terms",
    "q_quantiles",
    "q_split_assign",
    "q_stratified_sample",
    "q_pack_shards",
    "q_corpus_mix",
    "q_hll_distinct",
    "q_cms_hot_keys",
    "q_pagerank",
    "q_semdedup",
    "q_bpe_merges",
    "q_bpe_encode",
    "q_decontaminate",
    "q_perplexity_filter",
    "q_dsir_resample",
    "q_curate_images",
    "q_clip_filter",
    "q_ar_batches",
    "q_cluster_sample",
    "q_dup_spans",
    # round-5 late additions (absent from earlier round-5 triples;
    # suite totals are only comparable at equal key counts)
    "q_kmeans",
    "q_inverted_index",
    "q_zorder",
    "q_merge_upsert",
    "q_profile_table",
    "q_tile_stats",
    "q_recrawl_due",
    "q_rand_proj",
    "q_ssjoin",
    "q_bm25_search",
    "q_nb_classify",
    "q_pmi_collocations",
    "q_hits",
    "q_char_entropy",
    "q_winsorize",
    "q_neg_pairs",
    "q_minhash_delta",
    "q_dedup_decisions",
    "q_blur_scores",
    "q_domain_quality",
    "q_url_templates",
    "q_seed_distance",
    "q_sniff_types",
    # round-5 final additions (same comparability caveat)
    "q_scd2_history",
    "q_boilerplate",
    "q_anchor_profile",
    "q_image_borders",
    "q_vocab_coverage",
    "q_sitemap_entries",
    # round-5 continuation additions (same comparability caveat).
    # q_snapshot_history is excluded by design: it measures store
    # commit I/O (covered by the crawl benchmark), not query perf.
    "q_gopher_rules",
    "q_c4_clean",
    "q_main_content",
    "q_bloom_join",
    "q_warc_roundtrip",
    "q_leakage_split",
    "q_pq_encode",
    "q_label_prop",
    "q_cdx_index",
    "q_jpeg_quality",
    "q_charset",
    "q_freshness_alloc",
    "q_link_directives",
    "q_cdc_chunks",
    "q_path_tree",
    "q_equi_depth",
    "q_revalidation",
    "q_canonical_dedup",
    "q_cache_ttl",
    "q_robots_sitemaps",
    "q_mojibake",
    "q_colorfulness",
    "q_file_plan",
    "q_consistent_shard",
    "q_weighted_sample",
    "q_recency_scores",
    "q_ssim_verify",
    "q_mad_outliers",
    "q_registrable_domain",
    "q_exif_features",
    "q_oriented_phash",
    "q_crop_dups",
    "q_aimd_delay",
    "q_footer_stats",
    "q_trustrank",
    "q_sim_order",
    "q_decompress",
    "q_spoof_hosts",
    "q_topk_heavy",
    "q_edge_density",
]

REPS = 3


def _sink(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def time_query(fn, spark, sf_dir) -> float:
    _sink(fn(spark, sf_dir))  # warm-up (plans + code paths + page cache)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sink(fn(spark, sf_dir))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def crawl_throughput(spark) -> dict:
    """Scaled-mode crawl over the bench graph; URLs fetched per second
    (listings + ads) — the frontier-throughput metric of BASELINE.md."""
    from olx_spark.fixtures.crawl_graph import make_scaling_graph
    from olx_spark.plans.crawl import CrawlConfig
    from olx_spark.plans.scaled import ScaledCrawlEngine

    # wide synth graph: 64 host chains x 1 page x 500 ads -> one fat ad
    # round, so the metric measures parallel fetch throughput, not
    # sequential round latency (pagination chains are inherently serial)
    n_hosts, pages, app = 64, 1, 500
    graph = make_scaling_graph(n_hosts=n_hosts, pages_per_host=pages, ads_per_page=app)
    cfg = CrawlConfig(
        mode="scaled",
        dedup_scope="global_bloom",
        checkpoint_dir=tempfile.mkdtemp(prefix="olx_bench_crawl_"),
        max_rounds=10,
        with_payload=True,
        store_payload_bytes=False,  # payload computed, metadata sunk
        bloom_shards=16,
        bloom_bits_per_shard=1 << 20,
        per_host_per_round=1_000_000,
        round_budget_ms=10_000_000,  # politeness off the critical path
    )
    eng = ScaledCrawlEngine(spark, graph, cfg)
    t0 = time.perf_counter()
    eng.run(graph.seeds)
    elapsed = time.perf_counter() - t0
    urls = eng.fetch_log().count() + n_hosts * pages
    return {
        "crawl_urls": urls,
        "crawl_sec": round(elapsed, 3),
        "crawl_urls_per_sec": round(urls / elapsed, 2),
        "crawl_rounds": len(eng.store.committed_rounds()),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("olx_spark_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    queries = entry_mod.queries()

    per_query: dict[str, float] = {}
    for key in HEADLINE:
        per_query[key] = round(time_query(queries[key], spark, sf_dir), 3)

    crawl = crawl_throughput(spark)
    total = round(sum(per_query.values()), 3)
    out = {
        "metric": "headline_query_suite_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "cpus": cpus,
        **crawl,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
