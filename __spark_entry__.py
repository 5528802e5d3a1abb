"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator from SURVEY.md §2 to a
PySpark callable over the driver testdata; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL. Column names + float rounding are aligned
on both sides (the driver compares row-count + schema + order-
insensitive value hash).

EVERY key carries a DuckDB twin — including the probabilistic
MinHash/SimHash/sign-LSH/IVF pipelines (portable md5-60 hashes +
seeded-constant hyperplanes/centroids make the approximate paths
exactly recomputable), the flagship crawl (the reference's
unfold/graft/per-page-dedup/take/brief semantics re-derived from the
raw fixture graph in pure SQL over inline VALUES), and the binary
image decode (expected features computed independently of Spark in
driver-side numpy, inlined as VALUES; the oracle checks the
distributed plumbing). The crawl and image keys are additionally
pinned by exact pytests (tests/test_crawl_order.py,
tests/test_multimodal.py).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from olx_spark.functions.text import (
    LANG_MARKERS,
    doc_fingerprint,
    lang_id,
    quality_score,
    simhash16,
    token_count,
)

DEC = 4  # common float rounding for oracle comparison


_TABLE_CACHE: dict = {}


#: corpus tables: opaque per-row payloads whose queries are dominated
#: by per-row expression work — these always get the scan-parallelism
#: floor below. ``embeddings`` is deliberately NOT here: at 2k vectors
#: its pandas-UDF stages finish in one Arrow batch and the forced
#: exchange measurably loses (q_kmeans 1.2s -> 1.6-2.0s, q_rand_proj
#: 0.27 -> 0.45); the two genuinely batch-heavy embedding queries
#: (semdedup's cosine pair join, brute-force cosine top-k) opt in
_CORPUS_TABLES = frozenset({"documents"})


def _t(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool | None = None
) -> DataFrame:
    """Base-table reader with a LAZY-PLAN cache: ``spark.read.parquet``
    re-lists the directory and re-reads the footer schema on the
    driver every call, and the bench calls every query (hence every
    reader) 4x — pure driver latency inside the timed region. The
    cache holds the unexecuted DataFrame only (same object a catalog
    ``spark.table()`` would return): NO rows, NO persist — every
    execution still scans the parquet files. Keyed by applicationId so
    a stopped/recreated session never serves stale plans.

    SCAN-PARALLELISM FLOOR (guide §2.5 input skew): the testdata
    tables are single-file, SINGLE-ROW-GROUP parquet — an unsplittable
    scan, so without intervention every narrow per-row stage (md5
    trees, HOF chains, Arrow batches) runs on ONE core of local[N].
    With ``parallel`` (default: on for the corpus tables, off for the
    relational fact tables), a round-robin repartition right after the
    read costs one exchange of the base table and parallelizes all
    downstream per-row work. Adaptive, not constant: it fires only
    when the scan yields fewer splits than the floor
    (``spark.olx.scan.min_parallelism``, default the session's core
    count), so multi-row-group production inputs — which Spark already
    splits — skip it entirely. Fact tables default OFF because their
    queries aggregate immediately: map-side partial aggregation
    reduces the data before any exchange, and a forced repartition
    would insert a full-table shuffle that costs more than the
    single-task scan it parallelizes (measured: q_metrics_agg
    0.45s -> 0.77s with a blanket floor). CPU-heavy call sites over
    fact tables opt in with ``parallel=True``."""
    if parallel is None:
        parallel = name in _CORPUS_TABLES
    key = (spark.sparkContext.applicationId, sf_dir, name, parallel)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if parallel:
            n_min = int(
                spark.conf.get(
                    "spark.olx.scan.min_parallelism",
                    str(spark.sparkContext.defaultParallelism),
                )
            )
            if n_min > 1 and df.rdd.getNumPartitions() < n_min:
                df = df.repartition(n_min)
        _TABLE_CACHE[key] = df
    return df


_CORPUS_CACHE: dict = {}


def _image_corpus_rows(kind: str, n: int, seed: int) -> list[tuple]:
    """Driver-side image fixture rows, memoized: encoding ~100 images
    (zlib/DCT) costs ~1 s of SERIAL driver Python per call — test
    scaffolding, not the operator under measurement — so repeated
    bench/parity invocations reuse the tuples (read-only)."""
    key = (kind, n, seed)
    if key not in _CORPUS_CACHE:
        from olx_spark.fixtures.images import (
            make_image_corpus,
            make_near_dup_image_corpus,
        )

        if kind == "jpeg":
            # real-world lossy format corpus (pure-numpy baseline JPEG,
            # fixtures/jpeg.py); 32x32 keeps the Python Huffman coder's
            # driver cost to ~10ms/image — codec edge cases (odd sizes,
            # subsampling, restarts) are covered by tests/test_jpeg.py
            import numpy as np

            from olx_spark.fixtures.images import encode_image, make_image_array

            rows = []
            for i in range(n):
                rng = np.random.default_rng(
                    np.random.PCG64(np.random.SeedSequence([seed, i]))
                )
                arr = make_image_array(rng, 32, 32)
                rows.append((f"jpg-{i:05d}", encode_image(arr, "jpeg"), "jpeg"))
            _CORPUS_CACHE[key] = rows
            return rows
        if kind == "charset":
            # mixed-encoding text corpus for charset_stats: every
            # ladder branch (ascii / utf-8 / three BOMs / latin-1
            # fallback / broken utf-16 tail) keyed by index
            rows = []
            for i in range(n):
                # latin-1-encodable on purpose (branch 5 encodes it so)
                accented = f"página {i} résumé naïve {i * 7}"
                k = i % 7
                if k == 0:
                    data = f"plain ascii doc {i} {seed}".encode("ascii")
                elif k == 1:
                    data = accented.encode("utf-8")
                elif k == 2:
                    data = b"\xef\xbb\xbf" + accented.encode("utf-8")
                elif k == 3:
                    data = b"\xff\xfe" + accented.encode("utf-16-le")
                elif k == 4:
                    data = b"\xfe\xff" + accented.encode("utf-16-be")
                elif k == 5:
                    data = accented.encode("latin-1")
                else:
                    # BOM promises utf-16 but the tail has odd length
                    data = b"\xff\xfe" + accented.encode("utf-16-le")[:-1]
                rows.append((f"cs-{i:05d}", data))
            _CORPUS_CACHE[key] = rows
            return rows
        if kind == "jpegq":
            # varied-quality jpeg corpus (step_cap=None so the DQT is
            # the pure IJG scaling — what jpeg_quality_stats inverts);
            # every (i % 9 == 7)th payload is garbage for parse_ok=0
            import numpy as np

            from olx_spark.fixtures.images import make_image_array
            from olx_spark.fixtures.jpeg import jpeg_encode

            qualities = [35, 50, 65, 75, 85, 92]
            rows = []
            for i in range(n):
                rng = np.random.default_rng(
                    np.random.PCG64(np.random.SeedSequence([seed, i]))
                )
                arr = make_image_array(rng, 32, 32)
                data = (
                    b"\xff\xd8\x00garbage"
                    if i % 9 == 7
                    else jpeg_encode(
                        arr, quality=qualities[i % 6], step_cap=None
                    )
                )
                rows.append((f"jq-{i:05d}", data, "jpeg"))
            _CORPUS_CACHE[key] = rows
            return rows
        if kind == "boxed":
            # planted letterbox/pillarbox/uniform corpus (lossless
            # fmts), with every (i % 8 == 5)th payload truncated to
            # exercise the decode_ok=0 path
            from olx_spark.fixtures.images import encode_image, letterbox_pixels

            rows = []
            for i in range(n):
                _, _, fmt, arr = letterbox_pixels(i, seed=seed)
                data = b"\x00\x01\x02" if i % 8 == 5 else encode_image(arr, fmt)
                rows.append((f"box-{i:05d}", data, fmt))
            _CORPUS_CACHE[key] = rows
            return rows
        maker = make_near_dup_image_corpus if kind == "near_dup" else make_image_corpus
        _CORPUS_CACHE[key] = [
            (r["image_id"], r["bytes"], r["fmt"]) for r in maker(n, seed=seed)
        ]
    return _CORPUS_CACHE[key]


# --------------------------------------------------------------------------
# flagship: frontier-style scheduling over the events stream — per-user
# priority rank + politeness budget + inter-arrival gap (the engine's
# core window pattern, SURVEY.md §2.2 "window functions")
def entry(spark: SparkSession) -> DataFrame:
    return q_politeness_budget(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# individual queries (each has an oracle_sql twin unless noted)

def q_scan_filter(spark, sf):
    return (
        _t(spark, sf, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000))
        .select("c_custkey", "c_name", F.round("c_acctbal", DEC).alias("acctbal"))
    )


def q_filter_conj(spark, sf):
    return (
        _t(spark, sf, "events")
        .filter((F.col("event_type") == "error") & (F.col("value") > 100))
        .select("event_id", "user_id", F.round("value", DEC).alias("value"))
    )


def q_explode_links(spark, sf):
    # Links.ads flatten (SURVEY §2.1 row 8): posexplode of an array col
    return _t(spark, sf, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.round(F.col("val").cast("double"), 6).alias("val"))


def q_string_fns(spark, sf):
    # canonicalize-shaped string ops (split/slice/concat/regexp_extract)
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.concat_ws("-", F.slice(F.split(F.col("text"), " "), 1, 3)).alias("slug"),
        F.regexp_extract("source", r"(\d+)", 1).alias("src_num"),
    )


def q_canonicalize(spark, sf):
    # the reference's URL graft (SURVEY §2.1 row 6) as a vectorized
    # pandas UDF, checked against an independent SQL string construction:
    # href grafted onto base scheme://authority, base query RETAINED
    from olx_spark.functions.urls import canonicalize_reference

    d = _t(spark, sf, "documents")
    base = F.concat(
        F.lit("https://host"), (F.col("doc_id") % 10).cast("string"),
        F.lit(".example/list/"), F.col("lang"),
        F.lit("/?page="), (F.col("doc_id") % 5).cast("string"),
        F.lit("&currency=UAH"),
    )
    href = F.concat(
        F.lit("/d/ad/"), F.col("source"), F.lit("-"),
        F.col("doc_id").cast("string"), F.lit("/"),
    )
    return d.select(
        "doc_id", canonicalize_reference(href, base).alias("canon_url")
    )


def q_canonicalize_modern(spark, sf):
    # modern normalization (urljoin + sorted query, tracking stripped);
    # fixture params are already alphabetical so the SQL twin is exact
    from olx_spark.functions.urls import canonicalize_modern

    d = _t(spark, sf, "documents")
    base = F.concat(
        F.lit("https://host"), (F.col("doc_id") % 10).cast("string"),
        F.lit(".example/list/"), F.col("lang"),
        F.lit("/?currency=UAH&page="), (F.col("doc_id") % 5).cast("string"),
    )
    href = F.concat(
        F.lit("/d/ad/"), F.col("source"), F.lit("-"),
        F.col("doc_id").cast("string"), F.lit("/"),
    )
    # modern mode resolves href against base -> query dropped (urljoin)
    return d.select(
        "doc_id", canonicalize_modern(href, base).alias("canon_url")
    )


def q_ordered_limit(spark, sf):
    # deterministic global top-k (SURVEY §4.2 item 1): sort+limit
    # compiles to TakeOrderedAndProject — distributed partial top-k,
    # deterministic given the total order; rank derived on the <= k
    # surviving rows (constant-partitioned window, never a global one
    # that would move all data to a single task at scale)
    from olx_spark.operators.ranking import constant_partitioned_window

    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    top = _t(spark, sf, "orders").orderBy(*order).limit(10)
    w = constant_partitioned_window(order)
    return top.withColumn("rk", F.row_number().over(w)).select(
        "rk", "o_orderkey", F.round("o_totalprice", DEC).alias("total")
    )


def q_fetch_batch(spark, sf):
    # mapInPandas batch passthrough + derived column (fetch-batch shape);
    # proves Arrow batch boundary preserves values exactly
    import pandas as pd

    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )

    def add_net(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["net_price"] = pdf["l_extendedprice"] * (1.0 - pdf["l_discount"])
            yield pdf

    out_schema = "l_orderkey long, l_linenumber int, l_extendedprice double, l_discount double, net_price double"
    return li.mapInPandas(add_net, schema=out_schema).select(
        "l_orderkey", "l_linenumber", F.round("net_price", DEC).alias("net_price")
    )


def q_parse_project(spark, sf):
    # parse-layer shape: extract typed field from a serialized payload
    return _t(spark, sf, "events").select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k"),
    )


def q_map_brief(spark, sf):
    # brief-map build + reference flatten "k -> v" (H2.scala:60 shape)
    e = _t(spark, sf, "events")
    m = F.create_map(F.lit("k"), F.regexp_extract("props", r'"k": (\d+)', 1))
    return e.select(
        "event_id",
        F.concat_ws(
            "; ",
            F.transform(
                F.map_entries(m),
                lambda kv: F.concat(kv["key"], F.lit(" -> "), kv["value"]),
            ),
        ).alias("brief_flat"),
    )


def q_fk_stamp_join(spark, sf):
    # broadcast equi join (FK-stamp shape, SURVEY §2.1 row 13)
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "AUTOMOBILE")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", F.round("o_totalprice", DEC).alias("total"))
    )


def q_politeness_budget(spark, sf):
    # per-key rate limit: rank per user + inter-arrival gap via lag
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ timestamps can't cast straight to long in Spark 4; go through
    # LTZ (session tz is pinned UTC, matching DuckDB's epoch())
    ts_s = F.col("ts").cast("timestamp_ltz").cast("long")
    return (
        e.withColumn("rk", F.row_number().over(w))
        .withColumn("gap_s", ts_s - F.lag(ts_s).over(w))
        .filter(F.col("rk") <= 5)
        .select("user_id", "event_id", "rk", "gap_s")
    )


def q_dedup_first_seen(spark, sf):
    # first-occurrence-wins dedup via window rn=1 (SURVEY §2.1 row 5)
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", F.col("event_type").alias("first_type"))
    )


def q_unfold_rounds(spark, sf):
    # the reference's unfold loop shape (SURVEY §2.1 row 3): driver-side
    # rounds, one bounded batch per round, results unioned. 8 rounds over
    # l_orderkey ranges; equivalent to a single grouped agg for the oracle.
    li = _t(spark, sf, "lineitem")
    hi = li.agg(F.max("l_orderkey")).first()[0] or 0
    step = (int(hi) // 8) + 1
    parts = []
    for rnd in range(8):
        lo, up = rnd * step, (rnd + 1) * step
        parts.append(
            li.filter((F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < up))
            .groupBy()
            .agg(
                F.lit(rnd).alias("round"),
                F.coalesce(F.round(F.sum("l_quantity"), DEC), F.lit(0.0)).alias("qty"),
                F.count("*").alias("n"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("round", "qty", "n")


def q_duration_parse(spark, sf):
    # SURVEY §2.1 row 18, full reference semantics: synthesize the
    # proxy table's "N units [M units] ago" strings, then parse them
    # back with the regexp-extract-all + unit-multiplier fold of
    # FreeProxy.scala:59-70 (duration_ago_seconds), plus the original
    # timestamp arithmetic
    from olx_spark.functions.durations import duration_ago_seconds

    e = _t(spark, sf, "events")
    ts_s = F.col("ts").cast("timestamp_ltz").cast("long")
    epoch0 = F.to_timestamp(F.lit("2024-01-01 00:00:00")).cast("timestamp_ltz").cast("long")
    unit = F.element_at(
        F.array(F.lit("secs"), F.lit("mins"), F.lit("hours"), F.lit("days")),
        (F.col("event_id") % 4 + 1).cast("int"),
    )
    n1 = (F.col("event_id") % 23 + 1).cast("string")
    n2 = (F.col("event_id") % 59 + 1).cast("string")
    dur_str = F.when(
        F.col("event_id") % 3 == 0,
        F.concat(n1, F.lit(" "), unit, F.lit(" "), n2, F.lit(" mins ago")),
    ).otherwise(F.concat(n1, F.lit(" "), unit, F.lit(" ago")))
    return e.select(
        "event_id",
        dur_str.alias("dur_str"),
        duration_ago_seconds(dur_str).alias("ago_s"),
        F.floor((ts_s - epoch0) / 3600).cast("bigint").alias("hours_since"),
    )


def q_metrics_agg(spark, sf):
    # TPC-H Q1-shaped metrics aggregate (SURVEY §2.1 row 17)
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), DEC).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), DEC).alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("n"),
        )
    )


def q_window_rank(spark, sf):
    # per-host priority queue shape: top-3 per customer by total price
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", F.round("o_totalprice", DEC).alias("total"))
    )


def q_rollup_metrics(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), DEC).alias("qty"))
    )


def q_asof_join(spark, sf):
    # backward as-of join: each click attaches the latest prior view
    # by the same user (operators/temporal.asof_join — union+window,
    # one shuffle on user_id, no theta-join)
    from olx_spark.operators.temporal import asof_join

    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
        F.col("value").alias("view_value"),
    )
    j = asof_join(
        clicks, views, key="user_id", left_ts="ts", right_ts="vts",
        payload_cols=["view_id", "view_value"],
    )
    return j.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        # unmatched clicks (no prior view) keep their row with -1
        # sentinels — the driver hash treats None/NaN inconsistently
        F.coalesce(F.col("view_id_asof"), F.lit(-1)).alias("view_id"),
        F.coalesce(F.round("view_value_asof", DEC), F.lit(-1.0)).alias("view_value"),
        F.coalesce(
            F.unix_timestamp("ts") - F.unix_timestamp("ts_asof"), F.lit(-1)
        ).alias("lag_s"),
    )


def q_range_join(spark, sf):
    # interval join: clicks landing inside [error_ts, error_ts + 6h]
    # of the same user (operators/temporal.range_join — interval rows
    # explode onto epoch buckets, hash equi-join + exact refine)
    from olx_spark.operators.temporal import range_join

    ev = _t(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 21600 SECONDS")).alias("hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    j = range_join(
        clicks, errors, point_ts="ts", lo_ts="lo", hi_ts="hi",
        eq_keys=["user_id"], bucket_s=21600,
    )
    return j.select(
        "user_id",
        "error_id",
        "click_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("lo")).alias("delta_s"),
    )


def q_recency_scores(spark, sf):
    # recency-weighted per-user activity score (operators/temporal.
    # recency_weighted_scores): value halved once per elapsed 3-day
    # half-life against an explicit now — step-decay in pure integer
    # shift arithmetic, so unlike float exp decay the sum is exact
    # and order-independent (full oracle). One map-side-combinable
    # shuffle.
    from olx_spark.operators.temporal import recency_weighted_scores

    ev = _t(spark, sf, "events").select(
        (F.col("user_id") % 40).alias("grp_in"), "ts", "value"
    )
    return recency_weighted_scores(
        ev, "grp_in", "ts", "value", now="2024-03-01 00:00:00",
        half_life_s=3 * 86400,
    )


def q_sessionize(spark, sf):
    # gap sessionization: per-user sessions split on >6 h idle,
    # aggregated to one row per session (operators/temporal.sessionize
    # — lag + running sum over one window partitioning)
    from olx_spark.operators.temporal import sessionize

    ev = _t(spark, sf, "events")
    s = sessionize(ev, key="user_id", ts="ts", gap_s=21600, order_tiebreak="event_id")
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_timestamp("ts")).alias("start_s"),
            F.max(F.unix_timestamp("ts")).alias("end_s"),
        )
        .withColumn("duration_s", F.col("end_s") - F.col("start_s"))
    )


def q_funnel(spark, sf):
    # ordered first-conversion funnel view -> click -> purchase per
    # user (operators/temporal.funnel — stacked running-min gates over
    # ONE window partitioning; one shuffle, no per-stage self-joins)
    from olx_spark.operators.temporal import funnel

    ev = _t(spark, sf, "events")
    return funnel(
        ev,
        key="user_id",
        ts="ts",
        type_col="event_type",
        stages=["view", "click", "purchase"],
        order_tiebreak="event_id",
    )


def q_json_props(spark, sf):
    # semi-structured extraction + rollup: pull props.$.k out of the
    # JSON payload column (JVM get_json_object — the WARC-metadata /
    # event-payload pattern) and aggregate per event type. One
    # map-side-combinable shuffle; the JSON parse never leaves codegen.
    ev = _t(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


def q_bm25_top_terms(spark, sf):
    # BM25 salient-term extraction: top-5 terms per document
    # (operators/text_rank.bm25_top_terms — shuffled df join, broadcast
    # corpus scalars, one top-k window)
    from olx_spark.operators.text_rank import bm25_top_terms

    docs = _t(spark, sf, "documents", parallel=False)
    return bm25_top_terms(docs, text_col="text", id_col="doc_id", k=5)


def q_quantiles(spark, sf):
    # exact interpolated percentiles per group (Spark `percentile` ==
    # DuckDB `quantile_cont`, verified identical to the ulp). Exact
    # quantiles hold memory per distinct value per group — at 100-TB
    # continuous metrics, switch to approx_percentile (t-digest) and
    # drop the oracle to a tolerance check.
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.9), 6).alias("p90"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
    )


def q_split_assign(spark, sf):
    # deterministic train/val/test assignment: salted md5-60 of the
    # stable doc id, mod 100 -> 90/5/5. Pure JVM expression; the salt
    # version-pins the split so re-runs and late-arriving docs land
    # identically (the training-pipeline holdout contract).
    from olx_spark.functions.text import md5_60

    d = _t(spark, sf, "documents")
    bucket = md5_60(F.concat(F.lit("split-v1:"), F.col("doc_id").cast("string"))) % 100
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").alias("split"),
    )


def q_weighted_sample(spark, sf):
    # A-Res weighted sampling without replacement (operators/
    # sampling.weighted_sample): exactly 50 documents drawn with
    # probability proportional to token count — key = -ln(u)/w with
    # deterministic salted-hash uniforms, k-smallest via
    # TakeOrderedAndProject. Oracle: same formula + window top-k.
    from olx_spark.operators.sampling import weighted_sample

    d = _t(spark, sf, "documents").select(
        "doc_id", token_count("text").alias("ntok")
    )
    return weighted_sample(d, "doc_id", "ntok", k=50)


def q_stratified_sample(spark, sf):
    # corpus balancing: exactly min(12, |stratum|) documents per
    # (lang, source) cell, picked by the salted-hash total order
    # (operators/sampling.stratified_sample — the two-phase salted
    # window, so the dominant stratum sorts in parallel slices). The
    # oracle replays the same rank in SQL.
    from olx_spark.operators.sampling import stratified_sample

    d = _t(spark, sf, "documents", parallel=False)
    return stratified_sample(d, ["lang", "source"], 12, "doc_id").select(
        "doc_id", "lang", "source", "rank_in_limit"
    )


def q_pack_shards(spark, sf):
    # context-window construction: lay the corpus on a salted-hash
    # token tape and cut 2000-token training shards (boundary docs not
    # split). The distributed two-phase prefix sum of
    # operators/packing.pack_token_shards — no global window anywhere;
    # the oracle replays the same tape order as one SQL running sum.
    from olx_spark.functions.text import token_count
    from olx_spark.operators.packing import pack_token_shards

    d = _t(spark, sf, "documents")
    return pack_token_shards(
        d, "doc_id", token_count("text"), budget=2000, n_buckets=32
    ).select("doc_id", "n_tokens", "start_offset", "shard_id")


def q_corpus_mix(spark, sf):
    # pretraining-mix sampling: per-language Bernoulli rates (en 1.0,
    # de/fr 0.5, everything else 0.2) via the salted md5-60 fate hash
    # — a pure scan-adjacent filter, no shuffle; the oracle replays
    # the same CASE cut in SQL.
    from olx_spark.operators.sampling import corpus_mix_sample

    d = _t(spark, sf, "documents")
    return corpus_mix_sample(
        d, "lang", {"en": 1.0, "de": 0.5, "fr": 0.5}, "doc_id",
        default_fraction=0.2, salt="mix-v1",
    ).select("doc_id", "lang", "source")


def q_hll_distinct(spark, sf):
    # cardinality at scale: per-type distinct-user estimate via a
    # PORTABLE HyperLogLog (operators/sketches — md5-60 hash, exact
    # integer harmonic sum) next to the exact count. The sketch
    # shuffles <= 2**p register rows per group instead of every key;
    # determinism by construction lets the oracle replay the identical
    # registers + estimator in SQL (equality, not tolerance).
    from olx_spark.operators.sketches import hll_distinct

    e = _t(spark, sf, "events")
    est = hll_distinct(
        e, F.col("user_id").cast("string"), ["event_type"], p=8,
        out_col="n_users_est",
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_users_exact", F.round("n_users_est", 6).alias("n_users_est")
    )


def q_cms_hot_keys(spark, sf):
    # heavy-hitter / hot-key estimation: a 4x256 count-min grid over
    # event user_ids (operators/cms — portable md5-60 row hashes,
    # exact bigint counters) probed for the exact top-20 users. The
    # grid shuffles <= d*w counter rows instead of every distinct key
    # (the crawl's hot-host detection shape); estimates one-sidedly
    # overcount, and the oracle replays the identical grid in SQL.
    from olx_spark.operators.cms import cms_build, cms_lookup
    from olx_spark.operators.ranking import ordered_limit

    e = _t(spark, sf, "events")
    exact = e.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    top = ordered_limit(
        exact, 20, [F.desc("n_exact"), F.asc("user_id")]
    ).drop("rank_in_limit")
    grid = cms_build(e, "user_id", d=4, w=256)
    return cms_lookup(grid, top, "user_id", d=4, w=256).select(
        "user_id", "n_exact", "n_est"
    )


def _op_pairs(spark, sf):
    """Materialized distinct (o, p) bipartite pair table shared by the
    graph queries (r6): the symmetrizing union used to re-run the
    600k-row scan + distinct once PER BRANCH (two identical-cost AQE
    stages under the operators' edge cut); cutting the pair table
    first makes both direction projections cheap checkpoint reads."""
    from olx_spark.session import materialize

    return materialize(
        _t(spark, sf, "lineitem")
        .select(
            (F.col("l_orderkey") * 2).alias("o"),
            (F.col("l_partkey") * 2 + 1).alias("p"),
        )
        .distinct()
    )


def q_pagerank(spark, sf):
    # entity-importance scoring: fixed-iteration PageRank over the
    # bipartite order<->part co-occurrence graph (node id = 2*orderkey
    # for orders, 2*partkey+1 for parts). Fixed iters make the result
    # a deterministic function of the graph, so the oracle unrolls the
    # same 6 power-iteration steps in SQL.
    from olx_spark.operators.graph import pagerank

    li = _op_pairs(spark, sf)
    edges = li.select(F.col("o").alias("src"), F.col("p").alias("dst")).union(
        li.select(F.col("p").alias("src"), F.col("o").alias("dst"))
    )
    pr = pagerank(edges, damping=0.85, iters=6)
    return pr.select("id", F.round("rank", 9).alias("rank"))


def q_label_prop(spark, sf):
    # density-based communities over the same bipartite order<->part
    # graph as q_pagerank: synchronous label propagation, 3 rounds,
    # ties to the smallest label — deterministic by construction, so
    # the oracle unrolls the same rounds (join + count + argmax) in
    # SQL. Windowless min-of-struct argmax on the Spark side.
    from olx_spark.operators.graph import label_propagation

    li = _op_pairs(spark, sf)
    edges = li.select(F.col("o").alias("src"), F.col("p").alias("dst")).union(
        li.select(F.col("p").alias("src"), F.col("o").alias("dst"))
    )
    return label_propagation(edges, iters=3)


def q_hits(spark, sf):
    # hub/authority scoring over the DIRECTED order->part graph
    # (hubs = orders/listing pages, authorities = parts/ad pages) —
    # the frontier-ranking complement of q_pagerank. Fixed 6
    # iterations, L1 normalization; the oracle unrolls the same steps.
    from olx_spark.operators.graph import hits

    li = _t(spark, sf, "lineitem").select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    h = hits(li, iters=6)
    return h.select(
        "id", F.round("auth", 8).alias("auth"), F.round("hub", 8).alias("hub")
    )


def q_export_csv(spark, sf):
    # csv sink round-trip (SURVEY §2.1 row 20)
    import tempfile

    out = tempfile.mkdtemp(prefix="olx_csv_") + "/region"
    r = _t(spark, sf, "region")
    r.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.option("header", True).schema(r.schema).csv(out)


def q_snapshot_history(spark, sf):
    # the snapshot store's commit / time-travel / incremental-read
    # semantics surfaced in the oracle gate (they were pytest-only):
    # three committed rounds of orders slices (o_orderkey % 3), then
    # six window reads — as-of each round, since each round, and the
    # half-open (0, 2] window — each aggregated to (rows, total). The
    # oracle recomputes every window straight from the base table, so
    # hash equality certifies that commit_round + read_table expose
    # exactly-once, correctly-windowed history.
    from olx_spark.plans.snapshot import SnapshotStore

    import tempfile

    root = tempfile.mkdtemp(prefix="olx_snap_q_")
    store = SnapshotStore(root, spark)
    ords = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    for r in range(3):
        store.commit_round(
            r, {"ords": ords.filter(F.col("o_orderkey") % 3 == r)}, {"r": r}
        )

    def agg(win: str, df):
        return df.agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        ).select(F.lit(win).alias("win"), "n_rows", "total")

    parts = [
        agg(f"asof:{a}", store.read_table("ords", as_of_round=a))
        for a in range(3)
    ] + [
        agg(f"since:{s}", store.read_table("ords", since_round=s))
        for s in range(2)
    ] + [agg("win:0-2", store.read_table("ords", since_round=0, as_of_round=2))]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def q_main_content(spark, sf):
    # HTML main-content extraction (functions/html.py): wrap each
    # document in a deterministic page skeleton — nav, main div,
    # footer, and an ad block on every third doc — then recover the
    # article text by line-wise text density. The nav dies on length,
    # the ad and footer die on link fraction (anchor text dominates),
    # and the main div survives: n_kept is 1 for every doc and
    # main_text round-trips the normalized document text, which the
    # oracle certifies by running the same lambda pipeline in SQL.
    from olx_spark.functions.html import extract_main_content

    did = F.col("doc_id")
    page = F.concat_ws(
        "\n",
        F.concat(
            F.lit('<html><head><title>Doc '),
            did.cast("string"),
            F.lit("</title></head><body>"),
        ),
        F.lit(
            '<nav><a href="/">home</a> <a href="/about">about</a> '
            '<a href="/contact">contact</a></nav>'
        ),
        F.concat(
            F.lit('<div class="main"><p>'), F.col("text"), F.lit("</p></div>")
        ),
        F.when(
            did % 3 == 0,
            F.lit(
                '<div class="ad"><a href="/buy">click here to buy the '
                "best value deal now</a></div>"
            ),
        ),
        F.lit(
            '<footer><a href="/tos">terms of service</a> '
            '<a href="/privacy">privacy policy</a></footer>'
        ),
        F.lit("</body></html>"),
    )
    return (
        _t(spark, sf, "documents")
        .select("doc_id", page.alias("html"))
        .select("doc_id", *extract_main_content("html"))
    )


def q_consistent_shard(spark, sf):
    # consistent-hash fetch-fleet routing (functions/urls.
    # consistent_shard): ring hashing over 8 workers x 16 vnodes as a
    # literal struct array — zero shuffle, whole-stage codegen; the
    # resize-stability property (one worker added remaps ~1/n of the
    # keys) is pinned in tests/test_warc.py::TestConsistentShard. The
    # oracle replays the identical ring (same md5 positions) with an
    # arg_min over a cross join.
    from olx_spark.functions.urls import consistent_shard

    url = F.concat(F.lit("https://s.example/p/"), F.col("o_orderkey").cast("string"))
    return _t(spark, sf, "orders", parallel=True).select(
        F.col("o_orderkey").alias("key"),
        consistent_shard(url, [f"w{i}" for i in range(8)], 16).alias("worker"),
    )


def q_canonical_dedup(spark, sf):
    # head-metadata extraction + canonical-URL dedup (functions/
    # html.head_metadata): <link rel="canonical"> is the server's own
    # duplicate declaration — groups of 4 synthesized pages share a
    # canonical parent (some pages omit the tag = self-canonical),
    # and the decision log reports each page's canonical target, the
    # keep verdict, and the variant count per target (map-side
    # combinable count + broadcast join back).
    from olx_spark.functions.html import head_metadata

    did = F.col("doc_id")
    url = F.concat(F.lit("https://ex.org/p/"), did.cast("string"))
    parent = (did - (did % 4)).cast("string")
    page = F.concat(
        F.lit("<html><head><title>Doc "),
        did.cast("string"),
        F.lit("</title>"),
        F.when(
            (did % 4 != 0) & (did % 8 != 1),
            F.concat(
                F.lit('<link rel="canonical" href="https://ex.org/p/'),
                parent,
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit('<meta property="og:title" content="OG '),
                did.cast("string"),
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit('<meta property="og:image" content="https://img.ex/'),
                did.cast("string"),
                F.lit('.jpg">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"),
    )
    d = _t(spark, sf, "documents").select(
        "doc_id", url.alias("url"), page.alias("page")
    )
    m = head_metadata("page")
    ex = d.select(
        "doc_id",
        "url",
        m.getField("title").alias("title"),
        m.getField("og_title").alias("og_title"),
        m.getField("og_image").alias("og_image"),
        F.coalesce(m.getField("canonical"), F.col("url")).alias("canon_target"),
    )
    counts = ex.groupBy("canon_target").agg(F.count("*").alias("n_variants"))
    return ex.join(F.broadcast(counts), "canon_target").select(
        "doc_id",
        "title",
        "og_title",
        "og_image",
        "canon_target",
        (F.col("url") == F.col("canon_target")).cast("int").alias("is_canonical"),
        "n_variants",
    )


def q_link_directives(spark, sf):
    # REP crawl directives beyond robots.txt (which politeness.py
    # enforces): page-level <meta name="robots"> noindex/nofollow and
    # link-level rel="nofollow" filtering of discovered hrefs —
    # deterministic page synthesis exercises every branch (noindex,
    # none, combined, ugc-nofollow, sponsored-but-followable). Pure
    # JVM regexp + array lambdas; the frontier gate composes: page
    # nofollow suppresses the whole follow list.
    from olx_spark.functions.html import (
        ANCHOR_TAG_RE,
        followable_links,
        robots_meta,
    )

    did = F.col("doc_id")
    meta = (
        F.when(
            did % 10 == 0,
            F.lit('<meta name="robots" content="noindex, nofollow">'),
        )
        .when(did % 15 == 0, F.lit('<meta name="robots" content="none">'))
        .when(did % 7 == 3, F.lit('<meta name="robots" content="noindex">'))
        .otherwise(F.lit(""))
    )

    def link(j):
        rel = (
            F.when((did + j) % 3 == 0, F.lit(' rel="nofollow"'))
            .when(
                (F.lit(j) == 3) & (did % 4 == 0), F.lit(' rel="sponsored"')
            )
            .when(
                (F.lit(j) == 2) & (did % 5 == 0), F.lit(' rel="ugc nofollow"')
            )
            .otherwise(F.lit(""))
        )
        return F.concat(
            F.lit('<a href="/doc/'),
            did.cast("string"),
            F.lit(f'-{j}"'),
            rel,
            F.lit(f">t{j}</a>"),
        )

    page = F.concat(
        F.lit("<html><head>"),
        meta,
        F.lit("</head><body>"),
        link(0), link(1), link(2), link(3),
        F.lit("</body></html>"),
    )
    d = _t(spark, sf, "documents").select("doc_id", page.alias("page"))
    m = robots_meta("page")
    fl = followable_links("page")
    return d.select(
        "doc_id",
        m.getField("noindex").alias("noindex"),
        m.getField("nofollow").alias("nofollow"),
        F.size(F.regexp_extract_all("page", F.lit(ANCHOR_TAG_RE), 0)).alias(
            "n_anchors"
        ),
        F.size(fl).alias("n_followable"),
        F.when(m.getField("nofollow") == 1, F.lit(""))
        .otherwise(F.array_join(fl, ","))
        .alias("follow_list"),
    )


def q_warc_roundtrip(spark, sf):
    # WARC (ISO 28500) sink -> source round-trip over the documents
    # table: serialize into per-archive blobs (applyInPandas — the
    # one co-locating shuffle a real WARC file sink needs), parse
    # back length-driven (mapInPandas, zero shuffle). The oracle
    # derives the EXPECTED records directly from the base table, so
    # rows+hash equality certifies the whole write->read identity,
    # including byte lengths and payload md5.
    from olx_spark.sources.warc import warc_read_records, warc_write_records

    did = F.col("doc_id")
    d = _t(spark, sf, "documents").select(
        (did % 25).alias("archive_id"),
        F.concat(F.lit("https://archive.example/doc/"), did.cast("string")).alias("uri"),
        F.concat(
            F.lit("2026-01-"),
            F.lpad(((did % 28) + 1).cast("string"), 2, "0"),
            F.lit("T00:00:00Z"),
        ).alias("date"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    recs = warc_read_records(warc_write_records(d))
    return recs.select(
        "archive_id",
        "rec_idx",
        "warc_type",
        "target_uri",
        "warc_date",
        "content_length",
        F.md5("payload").alias("payload_md5"),
        "parse_ok",
    )


def q_cdx_index(spark, sf):
    # CDX archive index (the Common Crawl / wayback lookup layer over
    # WARC): synthesize multi-host pages into WARC blobs, parse them
    # back, and emit one index row per record — SURT sort key
    # (reversed-host canonical ordering, functions/urls.surt), byte
    # offset + record length inside the blob (what a random-access
    # reader seeks), payload digest. The oracle reconstructs every
    # record's exact serialized byte length in SQL and window-sums
    # offsets in the sink's uri order, so hash equality certifies the
    # writer's byte layout, the parser's offset accounting, and the
    # SURT transform together.
    from olx_spark.functions.urls import surt
    from olx_spark.sources.warc import warc_read_records, warc_write_records

    did = F.col("doc_id")
    uri = F.concat(
        F.lit("https://www.host"),
        (did % 7).cast("string"),
        F.lit(".example.org/doc/"),
        did.cast("string"),
        F.when(did % 2 == 0, F.lit("?v=2")).otherwise(F.lit("")),
    )
    d = _t(spark, sf, "documents").select(
        (did % 25).alias("archive_id"),
        uri.alias("uri"),
        F.concat(
            F.lit("2026-02-"),
            F.lpad(((did % 28) + 1).cast("string"), 2, "0"),
            F.lit("T00:00:00Z"),
        ).alias("date"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    recs = warc_read_records(warc_write_records(d))
    return recs.select(
        surt("target_uri").alias("surt_key"),
        "archive_id",
        "offset",
        "rec_len",
        F.col("content_length").alias("length"),
        F.md5("payload").alias("digest"),
    )


# ---------------------------- training-data pipeline ops (documents) ------

def q_token_count(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )


def q_quality_score(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality")
    )


def q_lang_id(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", lang_id("text").alias("lang_pred")
    )


def q_doc_fingerprint(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", doc_fingerprint("text").alias("fp")
    )


def q_repetition_stats(spark, sf):
    # Gopher-style repetition filters: word-2-gram duplicate fraction
    # (1 - distinct/total over shingles) + most-frequent-word fraction
    # via a shuffle-free higher-order fold (no per-word explode at
    # 100 TB). The repetitive flag is the filter a training-data
    # pipeline applies.
    from olx_spark.functions.text import dup_ngram_frac, top_word_frac

    return _t(spark, sf, "documents").select(
        "doc_id",
        F.round(dup_ngram_frac("text", 2), 6).alias("dup_2gram_frac"),
        F.round(top_word_frac("text"), 6).alias("top_word_frac"),
        (dup_ngram_frac("text", 2) > 0.55).cast("int").alias("repetitive"),
    )


def q_gopher_rules(spark, sf):
    # Gopher quality-rule battery (Rae et al. 2021 App. A) — the
    # standard pre-training corpus filter — over deterministically
    # augmented documents so every rule actually fires on the fixture
    # corpus (the raw docs are single-line symbol-free prose): %7
    # appends ellipsis-ended lines, %11 a symbol run, %13 numeric
    # tokens (alpha-frac), %17 a bullet list. All signals are JVM
    # higher-order-function expressions over ONE let_-bound token
    # array + ONE line array: no explode, no shuffle, whole-stage
    # codegen — the correct 100-TB shape for a row-local filter.
    from olx_spark.functions.text import gopher_rules

    bullets = "".join(f"\n- item {k}" for k in range(10))
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.lit("\nto be continued...\nmore soon…\nsee part two..."),
        ).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit(" # ## ### #### … ...")).otherwise(
            F.lit("")
        ),
        F.when(did % 13 == 0, F.lit(" 12345" * 10)).otherwise(F.lit("")),
        F.when(did % 17 == 0, F.lit(bullets)).otherwise(F.lit("")),
    )
    return (
        _t(spark, sf, "documents")
        .select("doc_id", aug.alias("aug"))
        .select("doc_id", *gopher_rules("aug"))
    )


def q_c4_clean(spark, sf):
    # C4 cleaning battery (Raffel et al. 2020 §2.2) over documents
    # deterministically expanded into multi-line pages (the fixture
    # corpus is single-line and punctuation-free): a proper sentence
    # line, a too-short line, a no-terminal line, and mod-keyed
    # javascript / multi-sentence / code-brace / lorem-ipsum lines so
    # every line rule and both doc rules fire. Same zero-shuffle
    # let_-bound shape as q_gopher_rules.
    from olx_spark.functions.text import c4_clean

    did = F.col("doc_id")
    aug = F.concat_ws(
        "\n",
        F.concat(F.col("text"), F.lit(".")),
        F.lit("Short one."),
        F.lit("this line has no terminal punctuation at all"),
        F.when(did % 5 == 0, F.lit("Enable javascript to view this page.")),
        F.when(
            did % 7 == 0,
            F.lit("It was a dark night. The rain fell hard. Nothing moved."),
        ),
        F.when(did % 9 == 0, F.lit("function f() { return 1; }")),
        F.when(did % 13 == 0, F.lit("Lorem ipsum dolor sit amet.")),
    )
    return (
        _t(spark, sf, "documents")
        .select("doc_id", aug.alias("aug"))
        .select("doc_id", *c4_clean("aug"))
    )


def q_cdc_chunks(spark, sf):
    # content-defined chunking (functions/text.cdc_chunk_fps): the
    # shift-resilient upgrade of q_chunk_dedup's fixed token windows —
    # an md5-window rolling boundary condition plus greedy min-size
    # resolution, all JVM higher-order expressions (no shuffle, no
    # Python). The oracle replays the same candidates and resolves
    # the greedy scan with a recursive CTE.
    from olx_spark.functions.text import cdc_boundaries, cdc_chunk_fps
    from olx_spark.session import materialize

    # fork-recompute doctrine: the chunk pipeline is an interpreted
    # HOF chain (no codegen CSE), so deriving three output columns
    # from it inline re-ran it 3x (measured 8.1s -> 2.9s at sf0.1);
    # materialize the array frame once and derive cheap projections
    # one candidate scan total: bind the cuts array, reuse it for fps
    from olx_spark.functions.text import let_

    arr = let_(
        F.struct(
            F.col("text").alias("t"),
            cdc_boundaries("text").alias("cuts"),
        ),
        lambda b: F.struct(
            b.getField("cuts").alias("cuts"),
            cdc_chunk_fps(
                b.getField("t"), cuts=b.getField("cuts")
            ).alias("fp_arr"),
        ),
    )
    # the struct is ONE column in the materialized frame, so the
    # whole pipeline runs exactly once; field access afterwards is
    # free projection over checkpointed data
    arrays = materialize(
        _t(spark, sf, "documents").select("doc_id", arr.alias("s"))
    )
    return arrays.select(
        "doc_id",
        F.size("s.cuts").alias("n_cuts"),
        F.size("s.fp_arr").alias("n_chunks"),
        F.array_join(
            F.transform("s.fp_arr", lambda x: x.cast("string")), ","
        ).alias("fps"),
    )


def q_mojibake(spark, sf):
    # encoding-damage detection (functions/text.mojibake_score): the
    # downstream complement of q_charset — U+FFFD replacement chars
    # and latin-1-double-encoding artifacts planted on mod-keyed
    # docs; flag + fraction per doc. Pure length-arithmetic JVM.
    from olx_spark.functions.text import mojibake_score

    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(did % 9 == 0, F.lit(" cafÃ© naÃ¯ve rÃ©sumÃ©")).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit(" bad � char � here")).otherwise(F.lit("")),
        F.when(did % 13 == 0, F.lit(" â€œquotedâ€ text Â dash")).otherwise(F.lit("")),
    )
    return (
        _t(spark, sf, "documents")
        .select("doc_id", aug.alias("aug"))
        .select("doc_id", *mojibake_score("aug"))
    )


def q_chunk_dedup(spark, sf):
    # Chunk-level exact dedup (CCNet's line-dedup pass over fixed
    # 20-token windows): globally-first occurrence wins, per-doc
    # survival stats. Skew-safe first-occurrence selection via a
    # map-side-combinable min-struct agg (hot boilerplate chunks are
    # the target workload) — see operators/dedup.chunk_dedup_stats.
    from olx_spark.operators.dedup import chunk_dedup_stats

    return chunk_dedup_stats(
        _t(spark, sf, "documents"), "doc_id", "text", chunk_tokens=20
    )


def q_pii_scrub(spark, sf):
    # PII redaction pass: the corpus has no PII, so deterministic
    # synthetic PII is appended to a doc_id-keyed subset IN THE QUERY
    # (identically in the SQL oracle) — the scrub then has real
    # matches to count and redact. Patterns restricted to the regex
    # subset Java and RE2 agree on.
    from olx_spark.functions.text import pii_counts, pii_scrub

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    did = F.col("doc_id").cast("string")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), did, F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit(" call +1 555-01"), did, F.lit(" or ping 10.0.")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.lit(" host 192.168.1."), (F.col("doc_id") % 250).cast("string"), F.lit(" up")),
        ).otherwise(F.lit("")),
    )
    d = d.select("doc_id", aug.alias("aug"))
    return d.select(
        "doc_id",
        *pii_counts("aug"),
        F.md5(pii_scrub("aug")).alias("scrubbed_md5"),
    )


def q_dedup_exact(spark, sf):
    # exact dedup by content fingerprint: keep lowest doc_id per fp
    d = _t(spark, sf, "documents").withColumn("fp", doc_fingerprint("text"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("fp", F.col("doc_id").alias("keep_id"))
    )


def q_simhash16(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", simhash16("text").alias("sh16")
    )


def q_ngram_jaccard(spark, sf):
    # exact n-gram Jaccard near-dup pairs (shingle explode + self-join)
    from olx_spark.functions.text import word_shingles

    d = (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", F.array_distinct(word_shingles("text", 3)).alias("sh"))
        .filter(F.size("sh") > 0)
        # materialize the shingle sets once (executor-resident, scoped
        # to this plan): they feed BOTH sides of the self-join plus the
        # size dimension — without this the md5-free but regex-heavy
        # shingling runs ~4x per execution
        .localCheckpoint(eager=True)
    )
    ex = d.select("doc_id", F.explode("sh").alias("s"))
    pairs = (
        ex.alias("a")
        .join(ex.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sizes = d.select("doc_id", F.size("sh").alias("n"))
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jac_raw", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jac_raw") >= 0.2)  # filter BEFORE rounding (oracle parity)
        .select("doc_a", "doc_b", F.round("jac_raw", 6).alias("jaccard"))
    )


def _dup_comps(spark, sf):
    """Shared derivation for q_dup_components / q_dedup_decisions:
    n-gram-Jaccard near-dup pairs over doc_id < 300 -> connected
    components -> (doc_id, component)."""
    from olx_spark.functions.text import word_shingles
    from olx_spark.operators.graph import connected_components
    from olx_spark.session import materialize

    d = (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", F.array_distinct(word_shingles("text", 3)).alias("sh"))
    )
    dd = materialize(d.filter(F.size("sh") > 0))  # feeds both join sides
    ex = dd.select("doc_id", F.explode("sh").alias("s"))
    sizes = dd.select("doc_id", F.size("sh").alias("n"))
    edges = (
        ex.alias("a")
        .join(ex.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .filter(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")) >= 0.2)
        .select("doc_a", "doc_b")
    )
    comps = connected_components(
        d.select("doc_id"), edges, node_col="doc_id", src="doc_a", dst="doc_b"
    )
    return comps.select("doc_id", F.col("comp").alias("component"))


def q_dup_components(spark, sf):
    # transitive dedup groups: n-gram-Jaccard near-dup pairs -> connected
    # components (min-label propagation + pointer jumping, O(log n)
    # rounds) -> one deterministic component id per document (the min
    # doc_id in the group = the keep-first-seen representative). The
    # oracle is a DuckDB recursive-CTE transitive closure over the same
    # pair derivation.
    return _dup_comps(spark, sf)


def q_leakage_split(spark, sf):
    # dedup-aware holdout: hash the near-dup COMPONENT (not the doc)
    # into train/val/test, so near-duplicates can never straddle the
    # split boundary — the leakage guard a per-doc hash split
    # (q_split_assign) lacks. Pure projection over the dedup pass.
    from olx_spark.operators.sampling import leakage_safe_split

    return leakage_safe_split(_dup_comps(spark, sf))


def q_dedup_decisions(spark, sf):
    # the APPLY step of dedup: per transitive group keep the best doc
    # (rounded quality score, ties -> min doc_id), emit keep/drop for
    # every doc. Composes _dup_comps with keep_canonical; the oracle
    # extends the transitive-closure CTE with the same argmax window.
    from olx_spark.operators.dedup import keep_canonical

    scores = _t(spark, sf, "documents").filter(F.col("doc_id") < 300).select(
        "doc_id", F.round(quality_score("text"), 6).alias("score")
    )
    return keep_canonical(_dup_comps(spark, sf), scores)


def q_file_plan(spark, sf):
    # size-balanced output-file planning (operators/layout.
    # size_balanced_assignment): documents weighed by synthetic
    # payload sizes — every 5th row carries an image-sized 400 KB
    # payload, the exact skew that breaks row-count repartitioning —
    # assigned clustered file_ids at a 1 MB target via the
    # distributed prefix-sum. Oracle: one window cumsum in the same
    # order.
    from olx_spark.operators.layout import size_balanced_assignment

    d = _t(spark, sf, "documents").select(
        "doc_id",
        (
            F.length("text") * 50
            + F.when(F.col("doc_id") % 5 == 0, F.lit(400_000)).otherwise(F.lit(0))
        ).cast("long").alias("nbytes"),
    )
    return size_balanced_assignment(
        d, "nbytes", ["doc_id"], target_bytes=1_000_000
    ).select("doc_id", "nbytes", "file_id")


def q_equi_depth(spark, sf):
    # exact equi-depth histogram of l_extendedprice (operators/
    # profile.equi_depth_histogram): the optimizer statistic, built
    # with the distributed-prefix-sum pattern (range partition +
    # per-partition running sums + broadcast offsets) instead of a
    # global window — no single-task sort of the distinct domain.
    from olx_spark.operators.profile import equi_depth_histogram

    return equi_depth_histogram(
        _t(spark, sf, "lineitem", parallel=True).select("l_extendedprice"),
        "l_extendedprice",
        k=8,
    )


def q_bloom_join(spark, sf):
    # Bloom-filter semi-join reduction (operators/joins.py): lineitem
    # pruned by a broadcast Bloom built from the ~2% of orders above
    # the price threshold BEFORE the join's Exchange — the explicit
    # version of AQE's InjectRuntimeFilter, guaranteed to fire. No
    # false negatives, so the exact join after the prune returns
    # byte-identical rows to the plain join the oracle runs.
    from olx_spark.operators.joins import bloom_filtered_join

    li = _t(spark, sf, "lineitem")
    hot = (
        _t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 490000)
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    return bloom_filtered_join(li, hot, "l_orderkey").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_extendedprice").alias("extprice"),
        "totalprice",
        "priority",
    )


def q_multi_join(spark, sf):
    # TPC-H Q5-shaped 6-table join (lineitem-orders-customer-supplier-
    # nation-region, local-supplier predicate c_nationkey=s_nationkey):
    # exercises Catalyst join reordering with a mix of broadcast dims
    # (region/nation/supplier) and shuffled facts
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                DEC,
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .select("n_name", "revenue", "n_lines")
    )


def q_winnow_fingerprint(spark, sf):
    # winnowing rolling-hash fingerprints (MOSS), exploded to rows so
    # the value hash compares scalars
    from olx_spark.functions.text import winnow_fingerprints

    d = _t(spark, sf, "documents").select(
        "doc_id", winnow_fingerprints("text", k=3, w=4).alias("fps")
    )
    return d.select("doc_id", F.posexplode("fps").alias("pos", "fp"))


def q_embed_cosine_topk(spark, sf):
    # brute-force cosine top-k (similarity-search baseline); double math
    from olx_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf, "embeddings", parallel=True).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, q, k=5).select(
        "query_id", "cand_id", "rank", F.round("cos_sim", 6).alias("cos_sim")
    )


def q_join_agg_topk(spark, sf):
    # TPC-H Q3-shaped: filter both sides -> join -> grouped agg ->
    # deterministic top-k (exercises join reordering + partial agg)
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    )
    li = _t(spark, sf, "lineitem")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
                "rev_raw"
            ),
            F.count("*").alias("n_lines"),
        )
    )
    # rank on the RAW value (the oracle does too); round only the output.
    # sort+limit -> TakeOrderedAndProject (distributed top-k), rank
    # derived on the 20-row result — no single-partition global window
    from olx_spark.operators.ranking import constant_partitioned_window

    order = [F.col("rev_raw").desc(), F.col("l_orderkey")]
    top = j.orderBy(*order).limit(20)
    w = constant_partitioned_window(order)
    return top.withColumn("rk", F.row_number().over(w)).select(
        "rk", "l_orderkey", F.round("rev_raw", DEC).alias("revenue"), "n_lines"
    )


def q_embed_near_dup(spark, sf):
    # embedding-cosine near-duplicate pairs (dedup family): exact over a
    # bounded id range; the approximate scale path is q_ann_lsh
    from olx_spark.operators.similarity import cosine

    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 300).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cs", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cs") >= 0.3)  # filter raw, round for output
        .select("id_a", "id_b", F.round("cs", 6).alias("cos_sim"))
    )
    return pairs


def q_crawl_reference(spark, sf):
    # flagship crawl: reference-exact engine over the fixture graph.
    # Checked THREE ways: simulator-equality pytest
    # (tests/test_crawl_order.py), and a full DuckDB oracle that
    # re-derives the reference's unfold/graft/per-page-dedup/take/brief
    # semantics from the RAW fixture graph in pure SQL
    # (_sql_crawl_reference).
    from olx_spark.fixtures import make_crawl_graph
    from olx_spark.plans.crawl import CrawlConfig, CrawlEngine

    g = make_crawl_graph(hot_host_factor=2)  # small graph: driver-check budget
    eng = CrawlEngine(spark, g, CrawlConfig(with_payload=False))
    return eng.run(g.seeds).select(
        "name", "seq", "round", "pos", "href", "title", "price", "brief_flat"
    )


def q_minhash_lsh(spark, sf):
    # MinHash+LSH near-dup pairs: shingle -> 16 md5-60 minhashes ->
    # 4 band hashes -> bucket join -> exact-Jaccard verify >= 0.5.
    # The ENTIRE pipeline (incl. probabilistic banding) has a DuckDB
    # twin because every hash is the portable md5-60.
    from olx_spark.operators.similarity import minhash_near_dups

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return minhash_near_dups(d, "doc_id", "text", threshold=0.5).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_simhash_near_dups(spark, sf):
    # portable 60-bit simhash (md5-60 token hash) with banding DERIVED
    # from max_dist (max_dist+1 bands -> complete candidate recall by
    # pigeonhole), so the result set equals the brute-force pair set —
    # which is exactly what the DuckDB oracle computes
    from olx_spark.operators.similarity import simhash_near_dups

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    return simhash_near_dups(d, "doc_id", "text", max_dist=10, nbits=60)


def q_ann_lsh(spark, sf):
    from olx_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 10)
    # dim=64 is the embeddings table's fixed width (TESTDATA.md); at
    # scale this is table metadata — never derived by a driver job
    return lsh_topk(emb, q, dim=64, k=5, n_planes=4).select(
        "query_id", "cand_id", "rank", F.round("cos_sim", 6).alias("cos_sim")
    )


def q_ivf_ann(spark, sf):
    # IVF-style ANN (second scale path next to q_ann_lsh): seeded
    # random unit centroids, zero-shuffle cell assignment (vectorized
    # pandas UDF, one numpy matmul/argmax per Arrow batch), nprobe
    # nearest cells per query, exact-cosine rescoring (pure JVM).
    # Centroids are constants -> full oracle.
    from olx_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, q, dim=64, k=5, n_centroids=16, nprobe=4).select(
        "query_id", "cand_id", "rank", F.round("cos_sim", 6).alias("cos_sim")
    )


def q_semdedup(spark, sf):
    # SemDeDup semantic dedup (Abbas et al. 2023): seeded-random cells
    # (the SQL-oracle-recomputable path; train=True fits k-means at
    # scale), within-cell upper-triangular prune at cos >= 0.35 —
    # per-cluster pairwise, never corpus-global. Full DuckDB twin
    # replays cells + prune (_sql_semdedup).
    from olx_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf, "embeddings", parallel=True).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return semantic_dedup(emb, dim=64, n_clusters=16, threshold=0.35).select(
        F.col("vec_id").alias("doc_id"), "cell", "kept", "dup_of"
    )


def q_bpe_merges(spark, sf):
    # distributed BPE tokenizer training (Sennrich 2016): ONE
    # corpus-scale word-count shuffle compresses the corpus to its
    # vocabulary; 12 merge steps iterate on the small vocab frame
    # (pair-count agg + 1-row argmax + JVM fold rewrite per step).
    # Deterministic -> full oracle: the DuckDB twin unrolls the same
    # steps as materialized CTEs (_sql_bpe_merges).
    from olx_spark.operators.bpe import bpe_merges_df

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 120)
    return bpe_merges_df(d, "text", n_merges=12)


def q_bpe_encode(spark, sf):
    # BPE ENCODE at corpus scale: train the same 12 merges as
    # q_bpe_merges, then tokenize EVERY document via the vocab-level
    # path — each distinct word encoded once through 12 chained JVM
    # folds, corpus mapped through a vocab-keyed join, per-doc token
    # stream fingerprinted (md5-60) in word order. Full DuckDB twin
    # replays train + encode chains (_sql_bpe_encode).
    from olx_spark.operators.bpe import bpe_encode_docs, bpe_train

    docs = _t(spark, sf, "documents")
    merges = bpe_train(docs.filter(F.col("doc_id") < 120), "text", n_merges=12)
    return bpe_encode_docs(docs, "text", merges)


def _bench_selector():
    # deterministic fate-hash split of `documents` into a benchmark
    # "eval set" (~1/37 of docs) and the training corpus — the
    # decontamination fixture (no external data per the brief)
    from olx_spark.functions.text import md5_60

    return (
        F.pmod(
            md5_60(F.concat(F.lit("bench-v1:"), F.col("doc_id").cast("string"))),
            F.lit(37),
        )
        == 0
    )


def q_decontaminate(spark, sf):
    # benchmark DECONTAMINATION (GPT-3 appendix C / Dolma): flag
    # training docs whose distinct word 3-grams overlap the held-out
    # eval set. Benchmark n-gram hashes broadcast against the exploded
    # corpus stream; full DuckDB twin replays shingles + overlap.
    from olx_spark.operators.decontam import decontaminate

    docs = _t(spark, sf, "documents")
    sel = _bench_selector()
    return decontaminate(
        docs.filter(~sel), docs.filter(sel), n=3, min_overlap_frac=0.1
    )


def q_perplexity_filter(spark, sf):
    # CCNet-style LM QUALITY stage: bigram stupid-backoff LM fit on a
    # 30% fate-hash slice, every doc scored (2 vocab-keyed joins),
    # corpus bucketed head/middle/tail by perplexity terciles. Full
    # DuckDB twin replays counts, backoff, and the tercile cut.
    from olx_spark.operators.lm import perplexity_filter

    return perplexity_filter(_t(spark, sf, "documents", parallel=False))


def q_nb_classify(spark, sf):
    # fastText-style corpus classifier stage: multinomial Naive Bayes
    # (add-one smoothing) fit on a 70% fate-hash slice with `lang` as
    # the label, held-out docs scored and argmax-labeled (ties broken
    # by label asc). Full DuckDB twin replays tokenization, counts,
    # the log-domain score, and the argmax window.
    from olx_spark.operators.classify import nb_classify

    # parallel=False: tokenize is explode-then-aggregate (map-side
    # combine reduces before any exchange) — interleaved A/B r6:
    # floor_on 5.36s vs floor_off 1.92s median
    return nb_classify(_t(spark, sf, "documents", parallel=False))


def q_pmi_collocations(spark, sf):
    # phrase-detection stage: PMI over adjacent word pairs, support
    # threshold 5. Counts stay exact int64; the score is ONE fixed
    # double expression shape, replayed identically by the twin.
    from olx_spark.operators.collocations import pmi_collocations

    return pmi_collocations(_t(spark, sf, "documents", parallel=False), min_count=5)


def q_char_entropy(spark, sf):
    # gibberish/boilerplate detector: char- + word-level Shannon
    # entropy per doc, one single-division expression shape shared
    # with the twin; counts exact int64 until the final expression.
    from olx_spark.operators.entropy import char_word_entropy

    # parallel=False: both explodes feed map-side-combined groupBys —
    # interleaved A/B r6: floor_on 1.54s vs floor_off 1.04s median
    return char_word_entropy(_t(spark, sf, "documents", parallel=False))


def q_mad_outliers(spark, sf):
    # robust per-group outlier flags (operators/outliers.mad_outliers,
    # Iglewicz-Hoaglin modified z-score): o_totalprice by order
    # priority — exact medians/MADs per group, broadcast back; the
    # MAD threshold is immune to the outliers it hunts, unlike the
    # 3-sigma rule. Oracle: DuckDB medians (same linear
    # interpolation) + the same formula.
    from olx_spark.operators.outliers import mad_outliers

    return mad_outliers(
        _t(spark, sf, "orders", parallel=True), "o_orderpriority", "o_orderkey",
        "o_totalprice", k=3.5,
    )


def q_winsorize(spark, sf):
    # heavy-tail robustness pass: per-event_type exact p01/p99
    # clipping, broadcast bounds join, codegen clip — no second
    # shuffle of the facts.
    from olx_spark.operators.outliers import winsorize

    ev = _t(spark, sf, "events")
    return winsorize(ev, "value", ["event_type"]).select(
        "event_id", "event_type", "value",
        F.round("value_w", 6).alias("value_w"), "clipped",
    )


def q_neg_pairs(spark, sf):
    # contrastive batch construction: deterministic in-batch negatives
    # (CLIP-style), k=3 over 16 fate-hash batches; cyclic next-k in
    # the (hash, id) total order — re-runs reproduce the exact pairs.
    from olx_spark.operators.negatives import in_batch_negatives

    return in_batch_negatives(
        _t(spark, sf, "documents"), n_batches=16, k=3
    )


def q_minhash_delta(spark, sf):
    # continuous-crawl incremental dedup: a fate-split "new batch"
    # (doc_id % 10 == 0) probed against the standing corpus — banding
    # joins delta x corpus only, never corpus x corpus.
    from olx_spark.operators.similarity import minhash_delta_probe

    docs = _t(spark, sf, "documents")
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return minhash_delta_probe(
        corpus, delta, "doc_id", "text", threshold=0.5
    ).select("new_id", "dup_of", F.round("jaccard", 6).alias("jaccard"))


def q_dsir_resample(spark, sf):
    # DSIR importance resampling (Xie et al. 2023): hashed
    # unigram+bigram bucket log-ratios between a fate-hash TARGET
    # slice (~1/11 of docs — the "high-quality held-out" proxy, no
    # external data per the brief) and the raw remainder; every raw
    # doc scored through a broadcast 256-row lam table (one
    # corpus-scale shuffle), then deterministic Gumbel top-k
    # (TakeOrderedAndProject). Full DuckDB twin replays hashing,
    # smoothing, scoring, and the Gumbel draw.
    from olx_spark.functions.text import md5_60
    from olx_spark.operators.dsir import dsir_resample

    docs = _t(spark, sf, "documents")
    sel = (
        F.pmod(
            md5_60(F.concat(F.lit("dsir-target-v1:"), F.col("doc_id").cast("string"))),
            F.lit(11),
        )
        == 0
    )
    return dsir_resample(docs.filter(~sel), docs.filter(sel), k=200)


def q_image_features(spark, sf):
    # multimodal plumbing: decode + features over a binary image column
    # (Arrow-batched mapInPandas). The DuckDB twin
    # (_sql_image_features) carries the expected features computed
    # INDEPENDENTLY of Spark (driver-side numpy over the same
    # deterministic corpus), so the oracle checks the distributed
    # plumbing — schema, batch boundaries, value transport — end to end.
    from olx_spark.operators.multimodal import image_features

    df = spark.createDataFrame(
        _image_corpus_rows("plain", 64, 7),
        "image_id string, bytes binary, fmt string",
    )
    return image_features(df).select(
        "image_id", "w", "h", "fmt",
        F.round("mean_r", 4).alias("mean_r"), F.round("std_gray", 4).alias("std_gray"),
        "phash", "decode_ok",
    )


def q_charset(spark, sf):
    # charset detection + UTF-8 transcoding (operators/charset.py):
    # the ingestion step before every text filter. Fixed mixed-
    # encoding corpus exercising each ladder branch; the oracle
    # carries driver-side expected rows from the same detector
    # (plumbing oracle; branch semantics pinned by
    # tests/test_charset.py against hand-built byte strings).
    from olx_spark.operators.charset import charset_stats

    df = spark.createDataFrame(
        _image_corpus_rows("charset", 42, 23), "text_id string, bytes binary"
    )
    return charset_stats(df)


def q_colorfulness(spark, sf):
    # Hasler-Süsstrunk colourfulness + brightness curation triage
    # (operators/multimodal.colorfulness_stats) over the letterbox
    # corpus (uniform/bordered images give real low-color cases, the
    # planted garbage exercises decode_ok=0). VALUES plumbing oracle;
    # the metric itself is pinned by tests/test_multimodal.py
    # (grayscale ~ 0, saturated-opponent ~ large).
    from olx_spark.operators.multimodal import colorfulness_stats

    df = spark.createDataFrame(
        _image_corpus_rows("boxed", 64, 9),
        "image_id string, bytes binary, fmt string",
    )
    return colorfulness_stats(df)


def q_jpeg_quality(spark, sf):
    # header-only JPEG quality triage (operators/multimodal.py
    # jpeg_quality_stats): DQT scan + exact IJG quality-factor
    # inversion, no entropy decode — the cheap corpus-curation floor
    # for scraped images. Corpus cycles qualities 35..92 plus planted
    # garbage; the oracle carries driver-side expected rows computed
    # by the same scan (plumbing oracle); the ESTIMATOR itself is
    # pinned independently by tests/test_multimodal.py, which inverts
    # the encoder exactly for every quality 5..100.
    from olx_spark.operators.multimodal import jpeg_quality_stats

    df = spark.createDataFrame(
        _image_corpus_rows("jpegq", 36, 17),
        "image_id string, bytes binary, fmt string",
    )
    return jpeg_quality_stats(df)


def q_jpeg_features(spark, sf):
    # the input_hint's lossy-format branch on a REAL-WORLD format:
    # baseline JPEG decoded by the pure-numpy T.81 codec inside the
    # Arrow-batched feature scanner; the DuckDB twin carries features
    # computed independently (driver numpy decode of the same bytes),
    # so the oracle certifies the distributed jpeg decode end to end.
    from olx_spark.operators.multimodal import image_features

    df = spark.createDataFrame(
        _image_corpus_rows("jpeg", 48, 13),
        "image_id string, bytes binary, fmt string",
    )
    return image_features(df).select(
        "image_id", "w", "h", "fmt",
        F.round("mean_r", 4).alias("mean_r"), F.round("std_gray", 4).alias("std_gray"),
        "phash", "decode_ok",
    )


def _audio_corpus_rows(n: int, seed: int) -> list[tuple]:
    """Driver-side WAV fixture rows (memoized like _image_corpus_rows);
    the last two rows are deliberate garbage (truncated header / plain
    bytes) so the decode_ok=0 flag path is oracle-checked too."""
    key = ("audio", n, seed)
    if key not in _CORPUS_CACHE:
        from olx_spark.fixtures.audio import make_audio_corpus

        rows = [
            (r["audio_id"], r["bytes"], r["fmt"])
            for r in make_audio_corpus(n - 2, seed=seed)
        ]
        rows.append(("bad-trunc", b"RIFF\x10\x00\x00\x00WAVEfmt ", "wav"))
        rows.append(("bad-bytes", b"not audio at all", "wav"))
        _CORPUS_CACHE[key] = rows
    return _CORPUS_CACHE[key]


def q_audio_features(spark, sf):
    # multimodal AUDIO: PCM/WAV decode + frame-averaged RMS/ZCR/
    # spectral-centroid features in the Arrow-batched scanner (stdlib
    # wave + numpy, fixtures/audio.py — the jpeg playbook applied to
    # the former stub). The DuckDB twin carries features computed by an
    # independent driver-side decode of the same bytes, so the oracle
    # certifies the distributed decode + transport end to end;
    # deliberate garbage rows certify the decode_ok=0 flag path.
    from olx_spark.operators.multimodal import audio_features

    df = spark.createDataFrame(
        _audio_corpus_rows(34, 29), "audio_id string, bytes binary, fmt string"
    )
    return audio_features(df).select(
        "audio_id", "sr", "channels", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("zcr", 6).alias("zcr"),
        F.round("spectral_centroid", 4).alias("spectral_centroid"),
        "decode_ok",
    )


def _video_corpus_rows(n: int, seed: int) -> list[tuple]:
    """Driver-side AVI fixture rows (memoized); last two rows are
    deliberate garbage (truncated container / plain bytes) so the
    decode_ok=0 flag path is oracle-checked."""
    key = ("video", n, seed)
    if key not in _CORPUS_CACHE:
        from olx_spark.fixtures.video import make_video_corpus

        rows = [
            (r["video_id"], r["bytes"], r["fmt"])
            for r in make_video_corpus(n - 2, seed=seed)
        ]
        rows.append(("bad-trunc", b"RIFF\x28\x00\x00\x00AVI LIST", "avi"))
        rows.append(("bad-bytes", b"definitely not a video", "avi"))
        _CORPUS_CACHE[key] = rows
    return _CORPUS_CACHE[key]


def q_video_features(spark, sf):
    # multimodal VIDEO: AVI (RIFF) container parse + per-clip features
    # in the Arrow-batched scanner — the former ffmpeg stub un-stubbed
    # via fixtures/video.py (MJPG frames through the in-repo T.81
    # codec, uncompressed DIB losslessly). The DuckDB twin carries
    # features from an independent driver-side decode of the same
    # bytes; garbage rows certify the decode_ok=0 flag path.
    from olx_spark.operators.multimodal import video_features

    df = spark.createDataFrame(
        _video_corpus_rows(26, 17), "video_id string, bytes binary, fmt string"
    )
    return video_features(df).select(
        "video_id", "fps", "n_frames", "w", "h",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("mean_gray", 4).alias("mean_gray"),
        "decode_ok",
    )


def q_video_frames(spark, sf):
    # VIDEO frame sampling: every-2nd-frame rows with timestamps,
    # channel means and phash64 — the frame-level training input and
    # the feed for cross-video phash near-dup mining. Oracle: same
    # bytes decoded driver-side; garbage clips contribute zero rows.
    from olx_spark.operators.multimodal import video_sample_frames

    df = spark.createDataFrame(
        _video_corpus_rows(26, 17), "video_id string, bytes binary, fmt string"
    )
    return video_sample_frames(df, every_n=2).select(
        "video_id", "frame_idx",
        F.round("t_s", 6).alias("t_s"),
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
        "phash",
    )


def q_ssim_verify(spark, sf):
    # the VERIFY stage after phash banding (operators/multimodal.
    # ssim_verify_pairs): decode each candidate pair and confirm with
    # global SSIM — hash distance finds look-alike signatures, SSIM
    # confirms look-alike pixels. Oracle: brute-force pairs + the
    # same numpy SSIM, driver-side VALUES.
    from olx_spark.operators.multimodal import ssim_verify_pairs

    df = spark.createDataFrame(
        _image_corpus_rows("near_dup", 96, 11),
        "image_id string, bytes binary, fmt string",
    )
    return ssim_verify_pairs(df)


def q_phash_near_dup(spark, sf):
    # image DEDUP: decode -> phash64 -> banded Hamming pairing (bands
    # derived from max_dist => complete recall => equals brute force,
    # which is exactly what the numpy-computed oracle VALUES hold).
    # Corpus has planted near-dup pairs (odd index = perturbed copy of
    # its predecessor).
    from olx_spark.operators.multimodal import phash_near_dups

    df = spark.createDataFrame(
        _image_corpus_rows("near_dup", 96, 11),
        "image_id string, bytes binary, fmt string",
    )
    return phash_near_dups(df, max_dist=6)


def _curation_corpus_rows(n: int = 72, seed: int = 5) -> list[tuple]:
    """Metadata rows (image_id, w, h, caption, phash) for the curation
    query: the deterministic fixture corpus (sizes {32,64,96} plant
    resolution and aspect violations naturally) plus hand-planted
    caption violations and phash duplicates — one dup that LOSES the
    rank (id sorts after the original), one that WINS (id sorts
    before), and one whose original FAILS a metadata rule (the passing
    copy must still rank 1). Memoized like the image corpora."""
    key = ("curation", n, seed)
    if key not in _CORPUS_CACHE:
        from olx_spark.fixtures.images import make_image_row

        base = [make_image_row(i, seed=seed, with_bytes=False) for i in range(n)]
        rows = [(r["image_id"], r["w"], r["h"], r["caption"], r["phash"]) for r in base]
        first_pass = next(
            r for r in base if min(r["w"], r["h"]) >= 48 and max(r["w"], r["h"]) * 2 <= 5 * min(r["w"], r["h"])
        )
        first_fail = next(r for r in base if min(r["w"], r["h"]) < 48)
        rows += [
            ("planted-caption-empty", 64, 64, "", 9001),
            ("planted-caption-one", 64, 64, "tower", 9002),
            ("planted-caption-long", 64, 64, " ".join(["w"] * 65), 9003),
            ("planted-caption-junk", 64, 64, "#### 1234 !!! 555", 9004),
            ("planted-caption-null", 64, 64, None, 9005),
            # dup that loses: 'zz-dup' > original image_id
            ("zz-dup-late", first_pass["w"], first_pass["h"], first_pass["caption"], first_pass["phash"]),
            # dup that wins: 'aa-dup' < 'img-...'
            ("aa-dup-early", first_pass["w"], first_pass["h"], "a fine copy of it", first_pass["phash"]),
            # same phash as a rule-FAILING row: must still be kept at rank 1
            ("ok-shadow-of-fail", 64, 64, "clean caption here", first_fail["phash"]),
        ]
        _CORPUS_CACHE[key] = rows
    return _CORPUS_CACHE[key]


def q_curate_images(spark, sf):
    # LAION/DataComp-style image+caption CURATION over the input_hint
    # table: resolution / aspect / caption-length / caption-quality
    # rules (pure JVM exprs; payload bytes column never read) then
    # phash dedup of survivors via one windowed shuffle. Full DuckDB
    # twin replays the rule logic itself (_sql_curate_images), not
    # inlined expected values.
    from olx_spark.operators.curation import curate_image_captions

    df = spark.createDataFrame(
        _curation_corpus_rows(),
        "image_id string, w int, h int, caption string, phash long",
    )
    return curate_image_captions(df)


#: CLIP-filter fixture embedding dimension (tiny: the operator is the
#: unit under test, not the embedding model)
_CLIP_D = 6


def _clip_component(prefix: str, c, j: int):
    """Deterministic pseudo-embedding component in [-1, 1]: the shared
    portable md5_60 hash of ``prefix || value || ':' || j`` mapped to a
    multiple of 1/1000 — exact-double replayable in DuckDB. A stand-in
    for model inference (not available in-sandbox); the OPERATOR under
    test only sees two array<double> columns."""
    from olx_spark.functions.text import md5_60

    h = md5_60(F.concat(F.lit(prefix), c, F.lit(f":{j}")))
    return (F.pmod(h, F.lit(2001)) - F.lit(1000)) / F.lit(1000.0)


def q_clip_filter(spark, sf):
    # DataComp-style CLIP-score alignment filter: keep the top 25% of
    # image+caption pairs by embedding cosine. Scale path is the
    # two-pass histogram select (no global sort; only the boundary
    # bucket runs an exact top-r); the oracle replays the SEMANTICS
    # (rank by score desc, id asc; rn <= ceil(frac*n)) directly, so a
    # drift in the histogram/boundary machinery fails the hash.
    from olx_spark.operators.curation import clip_score_filter

    df = spark.createDataFrame(
        _curation_corpus_rows(),
        "image_id string, w int, h int, caption string, phash long",
    )
    cap = F.coalesce(F.col("caption"), F.lit(""))
    vecs = df.select(
        "image_id",
        F.array(
            *[_clip_component("img:", F.col("image_id"), j) for j in range(_CLIP_D)]
        ).alias("img_vec"),
        F.array(
            *[_clip_component("txt:", cap, j) for j in range(_CLIP_D)]
        ).alias("txt_vec"),
    )
    return clip_score_filter(vecs, keep_frac=0.25)


def q_ar_batches(spark, sf):
    # SDXL/NovelAI-style aspect-ratio bucket batching over the
    # input_hint metadata: snap each image to the nearest AR bucket
    # (exact integer cross-ratio argmin — one codegen array_min, no
    # shuffle, no libm drift) and cut each bucket into full size-4
    # batches in the salted md5-60 order via the two-phase prefix
    # (the hot ~1:1 bucket sorts in n_sub parallel slices). The
    # oracle replays ladder, argmin and batching logic in SQL.
    from olx_spark.operators.packing import ar_bucket_batches

    df = spark.createDataFrame(
        _curation_corpus_rows(),
        "image_id string, w int, h int, caption string, phash long",
    )
    return ar_bucket_batches(
        df, "image_id", "w", "h", batch_size=4, n_sub=4
    ).select(
        "image_id", "bucket_id", "bucket_w", "bucket_h",
        "sample_idx", "batch_id", "slot",
    )


def q_cluster_sample(spark, sf):
    # DataComp-style cluster-balanced subset selection: nearest-
    # centroid cluster per embedding (vectorized IVF cell assigner,
    # zero shuffle) then at most 4 rows per cluster by the salted
    # md5-60 permutation (stratified_sample's two-phase window) —
    # even embedding-space coverage instead of raw density. Seeded
    # constant centroids -> full oracle (same cells CTE as q_ivf_ann).
    from olx_spark.operators.sampling import cluster_balanced_sample

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return cluster_balanced_sample(emb, "vec_id", dim=64, cap=4, n_clusters=16).select(
        "vec_id", "cell", "rank_in_limit"
    )


def q_dup_spans(spark, sf):
    # ExactSubstr-style duplicate-SPAN detection (Lee et al. 2022, at
    # word granularity): positional 8-gram md5-60 fingerprints (one
    # transform + posexplode, pure JVM), corpus gram counts via a
    # map-side-combined groupBy + skew-splittable join back (never a
    # count-window pinned to hot boilerplate grams), then per-doc
    # gaps-and-islands merge into maximal spans. The oracle replays
    # the same gram/count/island logic in SQL.
    from olx_spark.operators.dedup import duplicate_spans

    d = _t(spark, sf, "documents")
    return duplicate_spans(d, "doc_id", "text", n=8, min_count=2)


def q_zorder(spark, sf):
    # Z-order (Morton) layout profile over (l_orderkey, l_partkey):
    # the Delta/Iceberg OPTIMIZE ZORDER primitive — min-max normalize
    # (one metadata-scale agg), interleave bits (pure codegen
    # shift/mask/add), bucket by the top z bits, then report what a
    # parquet footer reader would see: per-bucket row count + each
    # dimension's span. Tight spans on BOTH columns = multi-column
    # file pruning. The oracle replays normalize/interleave/bucket
    # bit-for-bit in SQL.
    from olx_spark.operators.layout import zorder_bucket_profile

    li = _t(spark, sf, "lineitem")
    return zorder_bucket_profile(
        li, ["l_orderkey", "l_partkey"], bits=8, n_buckets=16
    )


def q_inverted_index(spark, sf):
    # corpus inverted index: per term df / total postings / gap-encoded
    # posting-list fingerprint over the first 256 postings in (doc_id,
    # pos) order. Hot stop-terms are bounded through the two-phase
    # salted top-k BEFORE any collect_list (no task ever holds an
    # unbounded posting stream); truncation is an explicit flag with
    # the exact total kept. The oracle replays tokenization, the cut
    # and the lag-based gap encoding in SQL.
    from olx_spark.operators.index import inverted_index

    # parallel=False: posting explode feeds map-side-combined aggs —
    # interleaved A/B r6: floor_on 1.28s vs floor_off 0.84s median
    d = _t(spark, sf, "documents", parallel=False)
    return inverted_index(d, max_postings=256, min_df=1)


def q_pq_encode(spark, sf):
    # product quantization (operators/pq.py): train m=4 sub-codebooks
    # (one joint Lloyd round, exact-integer arithmetic), encode every
    # vector to 4 codes, and compute the ADC distance to vec_id 7's
    # vector via a JVM literal-table lookup. Same bit-determinism
    # doctrine as q_kmeans, so training + encoding + ADC all carry a
    # full value oracle (_sql_pq, subspace handled as data).
    from olx_spark.operators.pq import pq_adc, pq_encode, pq_train

    emb = _t(spark, sf, "embeddings")
    books = pq_train(emb, dim=64, m=4, k=8, iters=1)
    qvec = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    enc = pq_encode(emb, books)
    return enc.select(
        "vec_id",
        F.array_join(
            F.transform("codes", lambda c: c.cast("string")), ","
        ).alias("codes"),
        pq_adc(enc, books, qvec).alias("adc_dist"),
    )


def q_kmeans(spark, sf):
    # distributed k-means (Lloyd's): the general clustering primitive
    # behind semdedup cells / cluster-balanced sampling / IVF training.
    # Assignment is a zero-shuffle vectorized pandas UDF; each update
    # round is ONE map-side-combinable (cell, dim) sum shuffle; only
    # the k x dim centroid table ever reaches the driver (MLlib
    # layout). Exact-integer arithmetic (quantize -> integer distances
    # -> floor-div updates, every value < 2^53) makes the whole
    # iteration bit-deterministic across Spark/numpy/DuckDB, so unlike
    # MLlib's k-means this carries a FULL value oracle: the DuckDB
    # twin unrolls the same 3 Lloyd rounds as materialized CTEs
    # (_sql_kmeans).
    from olx_spark.operators.clustering import kmeans_cluster_stats

    emb = _t(spark, sf, "embeddings")
    return kmeans_cluster_stats(emb, dim=64, k=8, iters=3)


def _merge_delta(ords):
    """Deterministic CDC delta derived from orders: two upsert versions
    for keys %7 (last-writer-wins picks seq=2), deletes for %13 (seq=3,
    so on %91 overlap keys the delete beats both upserts), inserts at
    key+1_000_000 for %11. Derived by expression so the same delta is
    replayed verbatim in the SQL oracle at any sf."""
    k = F.col("o_orderkey")
    up1 = ords.filter(k % 7 == 0).select(
        "o_orderkey", "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(500.0)).alias("o_totalprice"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    up2 = ords.filter(k % 7 == 0).select(
        "o_orderkey", "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
        F.lit("U").alias("op"), F.lit(2).alias("seq"),
    )
    dels = ords.filter(k % 13 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.lit("D").alias("op"), F.lit(3).alias("seq"),
    )
    ins = ords.filter(k % 11 == 0).select(
        (k + F.lit(1_000_000)).alias("o_orderkey"), "o_custkey",
        F.lit("N").alias("o_orderstatus"), "o_totalprice",
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    return up1.unionByName(up2).unionByName(dels).unionByName(ins)


def q_merge_upsert(spark, sf):
    # lakehouse MERGE INTO / CDC upsert: compact a multi-version delta
    # (last-writer-wins window over the DELTA only), then apply it so
    # the 100-TB target side never shuffles — broadcast ANTI JOIN drops
    # matched rows, the compacted delta re-inserts updates and
    # not-matched rows, deletes never re-enter. The oracle replays
    # delta derivation, LWW compaction and the anti-join/union merge in
    # SQL. All values flow exactly (parquet doubles + exactly
    # representable literal adds), so this is a full value oracle.
    from olx_spark.operators.merge import merge_upsert

    ords = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return merge_upsert(ords, _merge_delta(ords), keys=["o_orderkey"])


def q_profile_table(spark, sf):
    # ANALYZE TABLE-style column profiler: per-column n_nulls /
    # n_distinct / min / max in ONE scan (all measures in a single
    # agg; exact NDV via one Expand, approx HLL++ mode for 100 TB),
    # one row to the driver, stack-unpivoted metadata-side. This is
    # the catalog-stats feeder q_zorder's injectable stats come from.
    # A nullable column is derived (nullif) so the null path is
    # oracle-checked. The oracle replays each column's aggregates.
    from olx_spark.operators.profile import profile_table

    d = _t(spark, sf, "documents").withColumn(
        "lang_opt", F.expr("nullif(lang, 'en')")
    )
    return profile_table(
        d, ["doc_id", "lang", "source", "n_chars", "lang_opt"], exact=True
    )


def q_tile_stats(spark, sf):
    # ViT-patch / region-stats plumbing over the image payload: each
    # decoded image splits into a 4x4 tile lattice and emits exact
    # int64 channel sums per tile (two vectorized reduceat passes, no
    # per-pixel Python) — the letterbox/watermark/saliency primitive.
    # Zero shuffle (tiles inherit input partitioning). The oracle
    # carries tiles computed INDEPENDENTLY driver-side (numpy over the
    # same deterministic corpus), certifying the distributed decode +
    # tiling end to end; all values are exact integers.
    from olx_spark.operators.multimodal import image_tile_stats

    df = spark.createDataFrame(
        _image_corpus_rows("plain", 64, 7),
        "image_id string, bytes binary, fmt string",
    )
    return image_tile_stats(df, grid=4)


def q_domain_quality(spark, sf):
    # Dolma-style domain filtering: per-source mean quality vs the
    # corpus mean; every doc flagged by its domain's standing. Both
    # means rounded to 6 before the comparison (replayable flag).
    from olx_spark.operators.curation import domain_quality_rollup

    docs = _t(spark, sf, "documents").select(
        "doc_id", "source", F.round(quality_score("text"), 6).alias("score")
    )
    return domain_quality_rollup(docs)


def q_boilerplate(spark, sf):
    # CCNet/RefinedWeb boilerplate-line removal: deterministic "lines"
    # per doc (a per-source copyright footer in 100% of the source's
    # docs, a nav line in the even half, then 5-word content chunks),
    # per-(source, line) doc frequency in ONE shuffle, frequent lines
    # (>=50% of the domain's docs, >=2 docs) broadcast back as the
    # boilerplate set, per-doc kept/stripped rollup. The oracle
    # replays the same line construction + integer-ppm cut in SQL.
    from olx_spark.operators.curation import boilerplate_lines

    docs = _t(spark, sf, "documents")
    words = F.split("text", " ")
    nchunks = F.ceil(F.size(words) / F.lit(5.0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nchunks - F.lit(1)),
        lambda i: F.array_join(F.slice(words, i * 5 + 1, 5), " "),
    )
    header = F.concat(F.lit("(c) "), "source", F.lit(" all rights reserved"))
    nav = F.concat(F.lit("home | about | "), "source")
    arr = F.concat(
        F.array(header),
        F.when(F.pmod("doc_id", F.lit(2)) == 0, F.array(nav)).otherwise(
            F.array().cast("array<string>")
        ),
        chunks,
    )
    lines = docs.select("doc_id", "source", F.explode(arr).alias("line"))
    return boilerplate_lines(lines)


def q_anchor_profile(spark, sf):
    # per-target anchor-text rollup: modal anchor with deterministic
    # (cnt desc, anchor asc) tie-break via single-expression
    # min(struct(-cnt, anchor)) argmax — no window; histogram and
    # distinct-src aggs both land hash-partitioned on dst so the
    # final join adds no exchange. Oracle replays with a row_number
    # window over the same histogram.
    from olx_spark.operators.anchors import anchor_text_profile

    ev = _t(spark, sf, "events")
    u5 = F.pmod("user_id", F.lit(5))
    anchor = (
        F.when(u5 == 0, F.lit("click here"))
        .when(u5 == 1, F.lit("home"))
        .when(u5 == 2, F.lit("buy now"))
        .when(u5 == 3, F.lit("details"))
        .otherwise(F.lit("next page"))
    )
    links = ev.select(
        F.pmod("event_id", F.lit(500)).alias("src_fp"),
        F.pmod(F.col("event_id") * 7 + F.col("user_id"), F.lit(200)).alias(
            "dst_fp"
        ),
        anchor.alias("anchor"),
    )
    return anchor_text_profile(links)


def q_vocab_coverage(spark, sf):
    # tokenizer-training vocab curve over corpus bigrams: global
    # (count desc, term asc) ranks + cumulative coverage computed by
    # a DISTRIBUTED prefix-sum (range repartition + per-partition
    # windows + driver offsets) — never a single-partition global
    # window. Oracle replays with an ordinary global window (fine at
    # oracle scale).
    from olx_spark.operators.vocab import vocab_coverage

    docs = _t(spark, sf, "documents")
    words = F.split("text", " ")
    idx = F.when(
        F.size(words) >= 2, F.sequence(F.lit(1), F.size(words) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1)
        ),
    )
    terms = docs.select(F.explode(bigrams).alias("term"))
    return vocab_coverage(terms, top_k=200)


def q_sitemap_entries(spark, sf):
    # sitemaps.org discovery: per-host <urlset> docs plus one
    # <sitemapindex> hub are BUILT as XML strings in Spark, then
    # parsed back by the tag-anchored zero-shuffle operator. The
    # oracle does NOT re-parse — it synthesizes the expected typed
    # rows directly from events (independent path), so the whole
    # build→parse plumbing is value-checked.
    from olx_spark.operators.sitemaps import parse_sitemaps

    ev = _t(spark, sf, "events", parallel=True)
    h = F.pmod("event_id", F.lit(8))
    host = F.concat(F.lit("h"), h.cast("string"), F.lit(".example"))
    day = F.pmod("event_id", F.lit(28)) + 1
    lastmod = F.when(
        F.pmod("event_id", F.lit(3)) == 0,
        F.concat(
            F.lit("<lastmod>2024-01-"),
            F.lpad(day.cast("string"), 2, "0"),
            F.lit("</lastmod>"),
        ),
    ).otherwise(F.lit(""))
    prio = F.when(
        F.pmod("event_id", F.lit(5)) == 0, F.lit("<priority>0.8</priority>")
    ).otherwise(F.lit(""))
    cf = F.when(
        F.pmod("event_id", F.lit(7)) == 0,
        F.lit("<changefreq>daily</changefreq>"),
    ).otherwise(F.lit(""))
    entry = F.concat(
        F.lit("<url><loc>https://"), host, F.lit("/p/"),
        F.col("event_id").cast("string"), F.lit("</loc>"),
        lastmod, prio, cf, F.lit("</url>"),
    )
    maps = ev.groupBy(host.alias("host")).agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.concat_ws("", F.sort_array(F.collect_list(entry))),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    index = (
        maps.select(
            F.concat(
                F.lit("<sitemap><loc>https://"), F.col("host"),
                F.lit("/sitemap.xml</loc></sitemap>"),
            ).alias("e")
        )
        .agg(
            F.concat(
                F.lit('<?xml version="1.0"?><sitemapindex>'),
                F.concat_ws("", F.sort_array(F.collect_list("e"))),
                F.lit("</sitemapindex>"),
            ).alias("xml")
        )
        .select(F.lit("hub.example").alias("host"), "xml")
    )
    return parse_sitemaps(maps.unionByName(index))


def q_rate_limit_audit(spark, sf):
    # politeness compliance auditor: trailing [t-W, t] RANGE-frame
    # request counts per host over the fetch log — one shuffle, no
    # self-join. Oracle replays the identical RANGE window in SQL.
    from olx_spark.operators.politeness import rate_limit_audit

    ev = _t(spark, sf, "events")
    log = ev.select(
        "event_id",
        F.concat(F.lit("h"), F.pmod("user_id", F.lit(20)).cast("string")).alias(
            "host"
        ),
        F.unix_timestamp("ts").alias("ts_s"),
    )
    return rate_limit_audit(log, window_s=3600, max_in_window=5)


def q_budget_alloc(spark, sf):
    # largest-remainder (Hamilton) split of a global fetch budget
    # across hosts by integer weight: allocations sum EXACTLY to the
    # budget; remainder winners picked by TakeOrderedAndProject, not
    # a global window. Oracle replays quota/floor/frac-rank in SQL.
    from olx_spark.operators.ranking import allocate_budget

    ev = _t(spark, sf, "events")
    hosts = ev.groupBy(
        F.concat(F.lit("h"), F.pmod("user_id", F.lit(50)).cast("string")).alias(
            "host"
        )
    ).agg(F.count(F.lit(1)).alias("weight"))
    return allocate_budget(hosts, 1000)


def q_redirect_resolve(spark, sf):
    # redirect-map resolution by pointer jumping (O(log chain) rounds,
    # exact hop counts, pigeonhole cycle proof): synthesized chains of
    # length <=4 ending at each group's r0 terminal, with every 10th
    # group closed into a 5-cycle. The oracle is a true recursive-CTE
    # walk with terminal anti-join and no-terminal => cycle.
    from olx_spark.operators.redirects import resolve_redirects

    ev = _t(spark, sf, "events")
    u = lambda c: F.concat(F.lit("u"), c.cast("string"))  # noqa: E731
    chain = ev.filter(F.pmod("event_id", F.lit(5)) != 0).select(
        u(F.col("event_id")).alias("src"),
        u(F.col("event_id") - 1).alias("dst"),
    )
    loop = ev.filter(
        (F.pmod("event_id", F.lit(5)) == 0)
        & (F.expr("(event_id div 5) % 10") == 0)
    ).select(
        u(F.col("event_id")).alias("src"),
        u(F.col("event_id") + 4).alias("dst"),
    )
    return resolve_redirects(chain.unionByName(loop))


def q_host_mirrors(spark, sf):
    # mirror-host detection: containment of distinct content
    # fingerprints between host pairs (a complete small mirror scores
    # 1.0 where Jaccard dilutes). Hot-fp guard is a no-op at these
    # moduli (<= 7 hosts per fp); the oracle replays pairing + both
    # scores exactly.
    from olx_spark.operators.mirrors import host_mirrors

    d = _t(spark, sf, "documents")
    fp = F.concat(
        F.lit("f"),
        F.when(
            F.pmod("doc_id", F.lit(3)) == 0,
            F.pmod("doc_id", F.lit(101)) + 1000,
        )
        .otherwise(F.pmod("doc_id", F.lit(23)))
        .cast("string"),
    )
    docs = d.select(
        F.concat(F.lit("h"), F.pmod("doc_id", F.lit(7)).cast("string")).alias(
            "host"
        ),
        fp.alias("fp"),
    )
    return host_mirrors(docs, min_containment=0.3, min_shared=2)


def q_containment(spark, sf):
    # Broder containment (asymmetric near-dup: quote/aggregator
    # detection) over word 4-gram shingles, with planted prefix-quote
    # docs guaranteeing true positives; range-bounded corpus (the
    # guard-bounded pair join is exact, so the oracle twin replays it
    # completely).
    from olx_spark.operators.mirrors import containment_pairs

    d = _t(spark, sf, "documents")
    base = d.filter(F.pmod("doc_id", F.lit(5)) == 0).select("doc_id", "text")
    quotes = d.filter(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.substring("text", 1, 150).alias("text"),
    )
    return containment_pairs(
        base.unionByName(quotes), n=4, min_containment=0.6, min_shingles=5
    )


def q_change_rate(spark, sf):
    # Cho & Garcia-Molina Poisson change-rate estimation from revisit
    # observations — one map-side-combinable groupBy + scalar math;
    # the oracle replays the bias-reduced -ln((n-X+.5)/(n+.5))
    # estimator and the clamped next-interval policy exactly.
    from olx_spark.operators.recrawl import estimate_change_rate

    ev = _t(spark, sf, "events")
    obs = ev.select(
        F.col("user_id").alias("url_fp"),
        (F.pmod("event_id", F.lit(3)) == 0).cast("int").alias("changed"),
        (F.lit(600) + F.pmod("event_id", F.lit(7)) * 300)
        .cast("double")
        .alias("interval_s"),
    )
    return estimate_change_rate(obs, min_obs=2)


def q_edit_verify(spark, sf):
    # edit-distance verification of candidate near-dup pairs: JVM
    # banded levenshtein (threshold short-circuit, exact w.r.t. the
    # ratio filter) over planted single-char mutants (pass) plus
    # neighbor pairs (overwhelmingly fail). Oracle computes the full
    # unthresholded distance and applies the same filter.
    from olx_spark.operators.similarity import verify_pairs_editdist

    d = _t(spark, sf, "documents")
    mutants = d.filter(F.pmod("doc_id", F.lit(6)) == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("x"), F.expr("substring(text, 2)")).alias("text"),
    )
    docs = d.select("doc_id", "text").unionByName(mutants)
    pairs = d.filter(F.pmod("doc_id", F.lit(4)) == 0).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
    ).unionByName(
        d.filter(F.pmod("doc_id", F.lit(6)) == 0).select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 200000).alias("doc_b"),
        )
    )
    return verify_pairs_editdist(pairs, docs, min_ratio=0.6, max_len=400)


def q_path_tree(spark, sf):
    # site-tree rollup (operators/traps.path_tree_rollup): page +
    # distinct-host counts per directory prefix at every depth — the
    # subtree quota input beside q_url_templates' trap report. URLs
    # synthesized from events with two path shapes; two map-side-
    # combinable shuffles, hot subtrees collapse before the exchange.
    from olx_spark.operators.traps import path_tree_rollup

    ev = _t(spark, sf, "events", parallel=True)
    host = F.concat(F.lit("h"), F.pmod("event_id", F.lit(8)).cast("string"))
    url = F.concat(
        F.lit("https://"),
        host,
        F.lit(".example"),
        F.lit("/cat"),
        F.pmod("user_id", F.lit(5)).cast("string"),
        F.when(
            F.pmod("event_id", F.lit(2)) == 0,
            F.concat(
                F.lit("/sub"),
                F.pmod("event_id", F.lit(3)).cast("string"),
                F.lit("/item"),
                F.col("event_id").cast("string"),
            ),
        ).otherwise(
            F.concat(F.lit("/page"), F.pmod("event_id", F.lit(7)).cast("string"))
        ),
    )
    return path_tree_rollup(ev.select(url.alias("url")), max_depth=3)


def q_url_templates(spark, sf):
    # crawler-trap detection (Heritrix path-quota recipe): volatile
    # tokens stripped to a URL template (hex runs then digit runs —
    # pure JVM regexp chain), two-phase agg so trap templates can't
    # skew the first shuffle, flag templates minting >100 distinct
    # urls. The fixture plants a calendar trap (/cal/<id>) and a
    # session-id trap (/item/<md5-prefix>) beside a bounded /page/<k>
    # listing family on every host; the oracle replays the same
    # regexp chain + thresholds in SQL.
    from olx_spark.operators.traps import mine_url_templates

    ev = _t(spark, sf, "events", parallel=True)
    host = F.concat(F.lit("h"), F.pmod("event_id", F.lit(8)).cast("string"))
    stem = F.concat(F.lit("https://"), host, F.lit(".example"))
    url = (
        F.when(
            F.pmod("event_id", F.lit(3)) == 0,
            F.concat(stem, F.lit("/cal/"), F.col("event_id").cast("string"), F.lit("/view")),
        )
        .when(
            F.pmod("event_id", F.lit(3)) == 1,
            F.concat(
                stem,
                F.lit("/item/"),
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 16),
                F.lit("/p"),
            ),
        )
        .otherwise(
            F.concat(stem, F.lit("/page/"), F.pmod("event_id", F.lit(30)).cast("string"))
        )
    )
    urls = ev.select(host.alias("host"), url.alias("url"))
    return mine_url_templates(urls, trap_distinct_urls=100)


def q_seed_distance(spark, sf):
    # crawl-depth map: BFS shortest hop-distance from the seed set
    # over a directed link graph (one frontier-join + anti-join per
    # hop — the crawl engine's pending-minus-seen shape), depth-capped
    # at 6 like a crawler's depth limit. The oracle is an EXACT
    # recursive CTE (UNION-dedup BFS, min(dist) per node) — one of
    # the few genuinely recursive oracles in the suite.
    from olx_spark.operators.graph import seed_distance

    ev = _t(spark, sf, "events")
    edges = ev.select(
        F.pmod("event_id", F.lit(2000)).alias("src"),
        F.pmod(F.col("user_id") * 13 + F.col("event_id") * 7 + 1, F.lit(2000)).alias("dst"),
    )
    seeds = spark.range(3).select(F.col("id").cast("long").alias("id"))
    return seed_distance(edges, seeds, max_hops=6)


def q_sniff_types(spark, sf):
    # WHATWG-style magic-byte sniffing: 12-byte payloads synthesized
    # per event (8 real file-format magics + md5 filler), declared
    # type shifted on every 13th event to plant Content-Type lies.
    # Spark genuinely round-trips binary (unhex -> substring -> hex);
    # the oracle replays the same prefix-case logic on the hex string.
    from olx_spark.functions.magic import sniff_payloads

    types = ["jpeg", "png", "gif", "bmp", "wav", "gzip", "pdf", "html"]
    magics = {
        "jpeg": ("FFD8FF", 18), "png": ("89504E470D0A1A0A", 8),
        "gif": ("47494638", 16), "bmp": ("424D", 20),
        "gzip": ("1F8B", 20), "pdf": ("255044462D", 14),
        "html": ("3C68746D6C3E", 12),
    }
    k = F.pmod("event_id", F.lit(8))
    filler = F.upper(F.md5(F.col("event_id").cast("string")))
    hexstr = F.lit(None).cast("string")
    for i, t in enumerate(types):
        if t == "wav":
            h = F.concat(F.lit("52494646"), F.substring(filler, 1, 8), F.lit("57415645"))
        else:
            m, n = magics[t]
            h = F.concat(F.lit(m), F.substring(filler, 1, n))
        hexstr = F.when(k == i, h).otherwise(hexstr)
    decl_idx = F.pmod(
        k + F.when(F.pmod("event_id", F.lit(13)) == 0, 1).otherwise(0), F.lit(8)
    )
    ev = _t(spark, sf, "events").select(
        F.col("event_id").alias("image_id"),
        F.unhex(hexstr).alias("bytes"),
        F.element_at(F.array(*[F.lit(t) for t in types]), decl_idx.cast("int") + 1).alias("fmt"),
    )
    return sniff_payloads(ev)


def q_scd2_history(spark, sf):
    # recrawl change ledger: SCD type-2 intervals over a synthetic
    # observation stream (url_fp revisited across events; content
    # flips among 4 variants keyed by user_id). One shuffle on url_fp
    # — window, per-version groupBy and valid_to window all reuse the
    # same partitioning. The oracle replays lag/run-sum/lead in SQL.
    from olx_spark.operators.temporal import scd2_history

    ev = _t(spark, sf, "events")
    obs = ev.select(
        F.pmod("event_id", F.lit(300)).alias("url_fp"),
        F.col("ts").alias("fetch_ts"),
        F.col("event_id").alias("obs_id"),
        F.substring(
            F.md5(
                F.concat(
                    F.pmod("event_id", F.lit(300)).cast("string"),
                    F.lit("#"),
                    F.pmod("user_id", F.lit(4)).cast("string"),
                )
            ),
            1,
            12,
        ).alias("content_hash"),
    )
    return scd2_history(obs, order_tiebreak="obs_id")


def q_blur_scores(spark, sf):
    # LAION-style blur filter: Laplacian variance per image with exact
    # int64 sums (luma-sum gray, 4-neighbor Laplacian); variance +
    # is_blurry derived from the integers in ONE fixed double shape.
    # The oracle carries driver-numpy-computed exact sums as VALUES.
    from olx_spark.operators.multimodal import image_sharpness

    df = spark.createDataFrame(
        _image_corpus_rows("plain", 64, 7),
        "image_id string, bytes binary, fmt string",
    )
    return image_sharpness(df)


def q_image_borders(spark, sf):
    # ffmpeg-cropdetect-style letterbox/pillarbox measurement with
    # exact-integer edge runs; content_frac and is_boxed derived
    # JVM-side from the integers. The oracle recomputes the border
    # runs INDEPENDENTLY driver-side (numpy over the same planted
    # corpus) and inlines them as VALUES.
    from olx_spark.operators.multimodal import image_borders

    df = spark.createDataFrame(
        _image_corpus_rows("boxed", 64, 9),
        "image_id string, bytes binary, fmt string",
    )
    return image_borders(df)


def q_freshness_alloc(spark, sf):
    # freshness-optimal revisit allocation (Cho & Garcia-Molina 2003,
    # operators/recrawl.freshness_allocation): per-host water-filling
    # over change rates λ derived from orders — closed-form
    # f = t·√λ − λ with the largest-valid-prefix threshold, one
    # window shuffle + one broadcast join. Every arithmetic step is
    # elementwise IEEE over an order-pinned prefix sum, so the SQL
    # twin is bit-identical.
    from olx_spark.operators.recrawl import freshness_allocation

    o = _t(spark, sf, "orders").select(
        (F.col("o_custkey") % 50).alias("host"),
        F.col("o_orderkey").alias("id"),
        (F.col("o_totalprice") / 100000.0).alias("lam"),
    )
    return freshness_allocation(o, "host", "id", "lam", budget_per_host=10.0)


def q_cache_ttl(spark, sf):
    # RFC 9111 shared-cache freshness (functions/durations.
    # cache_control_ttl): every directive branch exercised — s-maxage
    # precedence, no-store/no-cache/private blocks (incl. the
    # no-cache="set-cookie" field-argument lookalike), bare
    # extension tokens, heuristic (null) freshness. Scan-local JVM
    # regexp; pairs with q_revalidation's validator ledger.
    from olx_spark.functions.durations import cache_control_ttl

    e = F.col("event_id")
    hdr = (
        F.when(e % 7 == 0, F.concat(F.lit("max-age="), (60 * (e % 24)).cast("string"), F.lit(", public")))
        .when(e % 7 == 1, F.lit("no-store"))
        .when(e % 7 == 2, F.concat(F.lit("s-maxage="), (30 * (e % 10)).cast("string"), F.lit(", max-age=999")))
        .when(e % 7 == 3, F.lit(""))
        .when(e % 7 == 4, F.lit('no-cache="set-cookie", max-age=60'))
        .when(e % 7 == 5, F.lit("private, max-age=30"))
        .otherwise(F.concat(F.lit("immutable, max-age="), (e % 500).cast("string")))
    )
    d = _t(spark, sf, "events").select("event_id", hdr.alias("cc"))
    m = cache_control_ttl("cc")
    return d.select(
        "event_id",
        "cc",
        m.getField("cacheable").alias("cacheable"),
        m.getField("ttl_s").alias("ttl_s"),
    )


def q_robots_sitemaps(spark, sf):
    # sitemap discovery from robots.txt (operators/politeness.
    # robots_sitemap_urls — RFC 9309 §2.3 other-records + sitemaps.org
    # protocol): per-host robots bodies with 0-3 declarations in mixed
    # case, one with a trailing comment; one row per discovered URL in
    # file order. This is the frontier-seeding hop between the robots
    # fetch (politeness.py) and sitemap parsing (sitemaps.py).
    from olx_spark.operators.politeness import robots_sitemap_urls

    k = F.col("s_suppkey")
    host = F.concat(F.lit("h"), k.cast("string"))
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /private\n"),
        F.when(
            k % 4 >= 1,
            F.concat(F.lit("Sitemap: https://"), host, F.lit(".ex/a.xml\n")),
        ).otherwise(F.lit("")),
        F.when(
            k % 4 >= 2,
            F.concat(F.lit("sitemap:https://"), host, F.lit(".ex/b.xml # alt\n")),
        ).otherwise(F.lit("")),
        F.when(
            k % 4 >= 3,
            F.concat(F.lit("SITEMAP: https://cdn.ex/"), host, F.lit(".xml.gz\n")),
        ).otherwise(F.lit("")),
        F.lit("Crawl-delay: 2\n"),
    )
    d = _t(spark, sf, "supplier").select(
        host.alias("host"), robots_sitemap_urls(body).alias("sm")
    )
    return d.select(
        "host", F.posexplode("sm").alias("pos", "sitemap_url")
    )


def q_revalidation(spark, sf):
    # RFC 9110 conditional-fetch accounting (operators/fetch.py
    # revalidation_plan + revalidation_outcomes): due set joined to a
    # validator cache -> full/conditional modes, resolved against
    # deterministic server state -> 200/304/404 with the bandwidth
    # ledger (bytes_saved on 304s). Pure joins + CASE, broadcastable
    # cache side; the oracle replays both joins in SQL.
    from olx_spark.functions.text import md5_60
    from olx_spark.operators.fetch import (
        revalidation_outcomes,
        revalidation_plan,
    )

    k = F.col("o_orderkey")
    ords = _t(spark, sf, "orders")
    due = ords.select(k.alias("url_fp"))
    cache = ords.filter(k % 3 != 0).select(
        k.alias("url_fp"),
        F.concat(F.lit("e"), (k % 10).cast("string")).alias("etag"),
        md5_60(F.concat(F.lit("v1:"), k.cast("string"))).alias("payload_fp"),
        ((k % 1000) + 100).cast("long").alias("body_bytes"),
    )
    changed = k % 4 == 1
    server = ords.filter(k % 17 != 5).select(
        k.alias("url_fp"),
        F.when(changed, F.concat(F.lit("e"), ((k % 10) + 1).cast("string")))
        .otherwise(F.concat(F.lit("e"), (k % 10).cast("string")))
        .alias("etag"),
        F.when(changed, md5_60(F.concat(F.lit("v2:"), k.cast("string"))))
        .otherwise(md5_60(F.concat(F.lit("v1:"), k.cast("string"))))
        .alias("payload_fp"),
        ((k % 1000) + 120).cast("long").alias("body_bytes"),
    )
    return revalidation_outcomes(revalidation_plan(due, cache), server)


def q_recrawl_due(spark, sf):
    # the refresh half of a standing frontier: exponential-backoff
    # next-due times (shiftleft power of two — exact integers, no
    # float pow), an explicit `now` (scheduling is a pure function of
    # state + now, replayable from snapshots), then the per-host
    # politeness budget via the same two-phase salted top-k as the
    # first-visit scheduler. The oracle replays backoff, due filter
    # and budget window in SQL.
    from olx_spark.operators.recrawl import recrawl_due

    ev = _t(spark, sf, "events")
    state = ev.select(
        F.col("event_id").alias("url_fp"),
        F.pmod(F.col("user_id"), F.lit(50)).alias("host"),
        F.col("ts").alias("last_fetch_ts"),
        F.pmod(F.col("event_id"), F.lit(5)).cast("int").alias("fail_count"),
        F.pmod(F.col("event_id"), F.lit(97)).alias("priority"),
    )
    return recrawl_due(
        state,
        "2024-01-20 00:00:00",
        base_interval_s=86_400,
        backoff_cap=3,
        per_host_budget=16,
    ).select("url_fp", "host", "due_s", "priority", "rank_in_limit")


def q_rand_proj(spark, sf):
    # JL embedding compression: exact-integer {-1,+1} sign projection
    # (dim 64 -> 16) where the matrix derives from the engine's
    # portable md5-60 — a pure function of (tag,i,j), identical in
    # driver numpy, Spark and DuckDB, no stored state. One Arrow-
    # batched int64 matmul per batch, zero shuffle. The oracle is a
    # FULL logic twin: it re-derives the sign matrix from md5 in SQL
    # and replays quantize + join + sum.
    from olx_spark.operators.projection import projected_components

    emb = _t(spark, sf, "embeddings")
    return projected_components(emb, in_dim=64, out_dim=16)


def q_ssjoin(spark, sf):
    # exact set-similarity self-join (AllPairs/PPJoin prefix filter):
    # EVERY pair with token-set Jaccard >= 0.6, no approximation, no
    # all-pairs product — prefixes hold each doc's RAREST tokens
    # (ascending global frequency), so candidate buckets are
    # structurally skew-proof and the length filter rides the join
    # condition. The exact complement of q_minhash_lsh. Corpus subset
    # (doc_id % 5 = 0) bounds the oracle twin, same discipline as
    # q_ngram_jaccard — the synthetic corpus is pathologically
    # templated (>50% of all pairs similar). Full value oracle: all
    # integers + one IEEE division.
    from olx_spark.operators.ssjoin import jaccard_similarity_join

    d = _t(spark, sf, "documents").filter(F.col("doc_id") % 5 == 0)
    return jaccard_similarity_join(d, "doc_id", "text", threshold=0.6)


def q_bm25_search(spark, sf):
    # the search half of the index/BM25 stack: global top-25 docs by
    # summed BM25 over a fixed query — the isin literal filter cuts
    # the scoring join to the query terms' postings BEFORE any join,
    # df/dlen stats ride broadcasts, top-k is TakeOrderedAndProject.
    # "spill" is deliberately absent from the corpus vocabulary (a
    # no-hit term must contribute nothing). Rank on the rounded score
    # + doc_id tie-break keeps the order engine-reproducible.
    from olx_spark.operators.text_rank import bm25_search

    docs = _t(spark, sf, "documents")
    return bm25_search(
        docs, ["hash", "join", "filter", "spill"], k=25
    ).select("doc_id", "score", "n_terms_hit", "rank_in_limit")


def q_normalize_images(spark, sf):
    # composition certified end-to-end: contrast-stretch normalize
    # (EXACT integer round-half-up, no float anywhere in the mapping)
    # then the feature scanner over the normalized bytes — two
    # Arrow-batched stages, zero shuffle. The oracle carries features
    # computed INDEPENDENTLY driver-side (numpy decode -> identical
    # stretch -> features over the same corpus), so decode, stretch,
    # re-encode and transport are all on the hook.
    from olx_spark.operators.multimodal import image_features, normalize_images

    df = spark.createDataFrame(
        _image_corpus_rows("plain", 64, 7),
        "image_id string, bytes binary, fmt string",
    )
    return image_features(normalize_images(df, out_fmt="png")).select(
        "image_id", "w", "h", "fmt",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("std_gray", 4).alias("std_gray"),
        "phash", "decode_ok",
    )


_PSL_TLDS = [
    "com", "co.uk", "ck", "kawasaki.jp", "city.kawasaki.jp",
    "com.au", "zz", "k12.ma.us", "ac.jp",
]
_PSL_RULES = [
    "com", "uk", "co.uk", "au", "com.au", "jp", "ac.jp",
    "*.kawasaki.jp", "!city.kawasaki.jp", "*.ck", "!www.ck",
    "us", "ma.us", "k12.ma.us",
]


def q_registrable_domain(spark, sf):
    # public-suffix-list eTLD+1 extraction (operators/psl): the key
    # every per-site politeness/dedup budget hangs off at web scale.
    # Hosts synthesized from customer keys cover normal longest-match
    # (co.uk beats uk), wildcard (*.ck, *.kawasaki.jp), exception
    # (!city.kawasaki.jp prevailing over the wildcard), unlisted TLDs
    # under the implicit "*" default rule, and hosts that ARE a
    # public suffix (registrable_domain NULL). Matching runs over
    # distinct hosts only and broadcast-joins back; the oracle
    # replays the full PSL algorithm over the same candidate
    # explosion in SQL.
    from olx_spark.operators.psl import psl_rules, registrable_domains

    k = F.col("c_custkey")
    tld = F.element_at(
        F.array(*[F.lit(t) for t in _PSL_TLDS]), ((k % 9) + 1).cast("int")
    )
    base = F.concat(F.lit("shop"), (k % 97).cast("string"))
    host = (
        F.when(k % 3 == 0, F.concat(base, F.lit("."), tld))
        .when(k % 3 == 1, F.concat(F.lit("www."), base, F.lit("."), tld))
        .otherwise(tld)
    )
    df = _t(spark, sf, "customer", parallel=True).select(k.alias("custkey"), host.alias("host"))
    return registrable_domains(df, psl_rules(spark, _PSL_RULES)).select(
        "custkey", "host", "public_suffix", "registrable_domain"
    )


def q_exif_features(spark, sf):
    # EXIF orientation/provenance extraction (operators/exif): a
    # bounds-checked TIFF-IFD walk over Exif APP1 segments in real
    # fixture-codec jpegs (both byte orders, out-of-line ASCII
    # values, Exif sub-IFD dimensions); damaged rows — no APP1,
    # truncated segment, bad magic, wild IFD offset — flag exif_ok=0
    # with NULL fields. The oracle inlines the WRITER's generated
    # truth (fixtures/exif.exif_truth), which the parser never sees:
    # encoder and decoder are independent implementations checking
    # each other.
    from olx_spark.operators.exif import exif_features

    key = ("exif", 64, 8)
    if key not in _CORPUS_CACHE:  # memoized driver scaffolding, like
        from olx_spark.fixtures.exif import make_exif_corpus  # the image corpora

        _CORPUS_CACHE[key] = [
            (r["image_id"], bytearray(r["bytes"]))
            for r in make_exif_corpus(64, n_bad=8)
        ]
    df = spark.createDataFrame(
        _CORPUS_CACHE[key], "image_id string, bytes binary"
    )
    return exif_features(df)


def _sql_exif_features() -> str:
    """DuckDB twin of q_exif_features: the generator's ground-truth
    fields inlined as VALUES — independent of the parser under test."""
    from olx_spark.fixtures.exif import make_exif_corpus

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    vals = ", ".join(
        f"('{r['image_id']}', {lit(r['orientation'])}, {lit(r['make'])}, "
        f"{lit(r['model'])}, {lit(r['datetime'])}, {lit(r['pixel_x'])}, "
        f"{lit(r['pixel_y'])}, {r['exif_ok']})"
        for r in make_exif_corpus(64, n_bad=8)
    )
    return f"""
        select image_id, orientation::int as orientation, make, model,
               datetime, pixel_x::int as pixel_x, pixel_y::int as pixel_y,
               exif_ok::int as exif_ok
        from (values {vals})
             t(image_id, orientation, make, model, datetime,
               pixel_x, pixel_y, exif_ok)
    """


def q_oriented_phash(spark, sf):
    # EXIF-oriented perceptual hashing (operators/exif.oriented_phash):
    # each group stores ONE upright image under orientations 1/3/6/8
    # (pixels pre-rotated, tag set) — the raw phash of a rotated
    # variant misses its twin by 30+ bits while the oriented phash
    # agrees within jpeg noise (pinned in tests/test_exif.py). The
    # oracle recomputes decode+orient+phash driver-side with the same
    # fixture codec (plumbing oracle, q_jpeg_features pattern); the
    # parser/transform pair is independently pinned by the
    # writer-vs-parser tests.
    from olx_spark.operators.exif import oriented_phash

    key = ("oriented", 12)
    if key not in _CORPUS_CACHE:  # memoized driver scaffolding
        from olx_spark.fixtures.exif import make_oriented_corpus

        _CORPUS_CACHE[key] = [
            (r["image_id"], r["group_id"], bytearray(r["bytes"]))
            for r in make_oriented_corpus(12)
        ]
    df = spark.createDataFrame(
        _CORPUS_CACHE[key], "image_id string, group_id int, bytes binary"
    )
    return oriented_phash(df)


def _sql_oriented_phash() -> str:
    """DuckDB twin of q_oriented_phash: expected rows computed by the
    same decode+orient+phash driver-side, inlined as VALUES."""
    import numpy as np

    from olx_spark.fixtures.exif import make_oriented_corpus
    from olx_spark.fixtures.images import decode_image, phash64
    from olx_spark.operators.exif import apply_orientation, parse_exif

    vals = []
    for r in make_oriented_corpus(12):
        meta = parse_exif(r["bytes"])
        arr = decode_image(r["bytes"], "jpeg")
        oriented = np.ascontiguousarray(
            apply_orientation(arr, meta["orientation"])
        )
        vals.append(
            f"('{r['image_id']}', {r['group_id']}, {meta['orientation']}, "
            f"{phash64(arr)}, {phash64(oriented)}, 1)"
        )
    return f"""
        select image_id, group_id::int as group_id,
               orientation::int as orientation,
               phash_raw::bigint as phash_raw,
               phash_oriented::bigint as phash_oriented,
               decode_ok::int as decode_ok
        from (values {", ".join(vals)})
             t(image_id, group_id, orientation, phash_raw,
               phash_oriented, decode_ok)
    """


def q_crop_dups(spark, sf):
    # cropped-duplicate detection by tile-phash voting (operators/
    # crops): whole-image phash misses crops; an aligned 16-px tile
    # lattice makes the original and its crop agree on every retained
    # tile. Planted corpus: 10 groups of (base, grid-aligned 48x48
    # crop sharing 9/16 tiles, distractor). The tiling stage is
    # plumbing-oracled (driver-side numpy over the same lossless png
    # corpus); the MATCHING stage — mega-bucket frequency guard,
    # self-join, vote threshold — is replayed exactly in SQL.
    from olx_spark.operators.crops import crop_candidates, tile_phashes

    key = ("crop", 10)
    if key not in _CORPUS_CACHE:  # memoized driver scaffolding
        from olx_spark.fixtures.images import make_crop_corpus

        _CORPUS_CACHE[key] = [
            (r["image_id"], bytearray(r["bytes"]), r["fmt"])
            for r in make_crop_corpus(10)
        ]
    df = spark.createDataFrame(
        _CORPUS_CACHE[key], "image_id string, bytes binary, fmt string"
    )
    return crop_candidates(tile_phashes(df), min_votes=4).select(
        "id_a", "id_b", F.col("votes").cast("long").alias("votes")
    )


def _sql_crop_dups(min_votes: int = 4, max_hash_freq: int = 32) -> str:
    """DuckDB twin of q_crop_dups: the tile-hash table computed
    driver-side with the same numpy path (png is lossless, so hashes
    are bit-identical), inlined as VALUES; the guard + self-join +
    vote-count logic replayed in SQL."""
    import numpy as np

    from olx_spark.fixtures.images import (
        decode_image,
        make_crop_corpus,
        phash64,
    )

    vals = []
    for r in make_crop_corpus(10):
        arr = decode_image(r["bytes"], r["fmt"])
        for ty in range(arr.shape[0] // 16):
            for tx in range(arr.shape[1] // 16):
                t = np.ascontiguousarray(
                    arr[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
                )
                vals.append(f"('{r['image_id']}', {phash64(t)})")
    return f"""
        with tiles(id, h) as (values {", ".join(vals)}),
        productive as (
            select id, h from tiles
            where h in (
                select h from tiles group by h
                having count(*) <= {max_hash_freq}
            )
        )
        select a.id as id_a, b.id as id_b, count(*)::bigint as votes
        from productive a join productive b on a.h = b.h and a.id < b.id
        group by a.id, b.id
        having count(*) >= {min_votes}
    """


def q_aimd_delay(spark, sf):
    # AIMD adaptive crawl-delay controller (operators/aimd): integer
    # multiplicative backoff on throttle signals, additive recovery
    # on success, clamped to [250, 64000] ms — replayed per host over
    # the events log (host = user bucket, throttle = 'error' events,
    # order = event_id). Exact integer state recurrence; the oracle
    # unrolls the identical recurrence with a recursive CTE.
    from olx_spark.operators.aimd import adaptive_crawl_delay

    ev = _t(spark, sf, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string")).alias(
            "host"
        ),
        F.col("event_id").cast("long").alias("seq"),
        F.when(F.col("event_type") == "error", "throttle")
        .otherwise("ok")
        .alias("outcome"),
    )
    return adaptive_crawl_delay(ev)


_SQL_AIMD = """
    with recursive ev as (
        select 'h' || (user_id % 40) as host, event_id::bigint as seq,
               case when event_type = 'error' then 'throttle'
                    else 'ok' end as outcome,
               row_number() over (
                   partition by (user_id % 40) order by event_id
               ) as k
        from events
    ), rec as (
        select host, seq, outcome, k, 1000 as delay_before,
               case when outcome = 'throttle' then least(64000, 1000 * 2)
                    else greatest(250, 1000 - 100) end as delay_after
        from ev where k = 1
        union all
        select ev.host, ev.seq, ev.outcome, ev.k, rec.delay_after,
               case when ev.outcome = 'throttle'
                    then least(64000, rec.delay_after * 2)
                    else greatest(250, rec.delay_after - 100) end
        from rec join ev on ev.host = rec.host and ev.k = rec.k + 1
    )
    select host, seq, outcome, delay_before::int as delay_before,
           delay_after::int as delay_after
    from rec
"""


def q_footer_stats(spark, sf):
    # parquet footer-statistics audit (operators/layout.
    # footer_stats_audit): write orders hive-partitioned by
    # o_orderkey % 8, then report per bucket what the FOOTERS claim
    # (row counts + min/max of o_orderkey / o_totalprice aggregated
    # across every row group, zero data pages read). The oracle
    # computes the same aggregate FROM the data — hash equality
    # certifies that the writer's pruning statistics are present and
    # exact, the property every layout op (zorder, bucketing) banks
    # on at 100 TB.
    from olx_spark.operators.layout import footer_stats_audit

    df = _t(spark, sf, "orders").select(
        (F.col("o_orderkey") % 8).alias("b"), "o_orderkey", "o_totalprice"
    )
    return footer_stats_audit(df, "b", ["o_orderkey", "o_totalprice"])


def q_trustrank(spark, sf):
    # TrustRank / personalized PageRank (operators/graph.pagerank
    # with seeds): teleport mass restricted to a trusted seed set
    # (order nodes with o_orderkey % 97 == 0) over the symmetrized
    # order<->part graph — the web-spam demotion primitive: rank
    # reaches a node only through real link paths from trust.
    # Fixed 6 iterations; the oracle unrolls the identical seeded
    # recurrence.
    from olx_spark.operators.graph import pagerank

    li = _op_pairs(spark, sf)
    edges = li.select(F.col("o").alias("src"), F.col("p").alias("dst")).union(
        li.select(F.col("p").alias("src"), F.col("o").alias("dst"))
    )
    seeds = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderkey") % 97 == 0)
        .select((F.col("o_orderkey") * 2).alias("id"))
    )
    r = pagerank(edges, iters=6, seeds=seeds)
    return r.select("id", F.round("rank", 9).alias("rank"))


def _sql_trustrank(iters: int = 6, damping: float = 0.85) -> str:
    """Unrolled seeded power iteration — _sql_pagerank with the
    teleport restricted to the effective (in-graph) seed set."""
    base = f"""
        with e as (
            select * from (
                select distinct l_orderkey * 2 as src, l_partkey * 2 + 1 as dst
                from lineitem
                union all
                select distinct l_partkey * 2 + 1 as src, l_orderkey * 2 as dst
                from lineitem
            )
        ), nodes as (
            select distinct id from (
                select src as id from e union select dst from e
            )
        ), eff as (
            select nodes.id from nodes
            join (select o_orderkey * 2 as id from orders
                  where o_orderkey % 97 = 0) s using (id)
        ), ns as (select count(*)::double as n from eff
        ), deg as (
            select src, count(*)::double as deg from e group by src
        ), pr0 as (
            select nodes.id,
                   case when eff.id is not null then 1.0 / ns.n
                        else 0.0 end as rank
            from nodes cross join ns
            left join eff on eff.id = nodes.id
        )"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""", pr{k} as (
            select nodes.id,
                   case when eff.id is not null
                        then (1.0 - {damping}) / ns.n else 0.0 end
                   + {damping} * coalesce(s.in_sum, 0.0) as rank
            from nodes cross join ns
            left join eff on eff.id = nodes.id
            left join (
                select e.dst as id, sum(p.rank / deg.deg) as in_sum
                from e
                join pr{k - 1} p on p.id = e.src
                join deg on deg.src = e.src
                group by e.dst
            ) s on s.id = nodes.id
        )""")
    return (
        base + "".join(steps)
        + f" select id, round(rank, 9) as rank from pr{iters}"
    )


def q_sim_order(spark, sf):
    # similarity-ordered shard layout (operators/layout.
    # similarity_order): global (shard, pos) rank under the 4-value
    # MinHash-prefix key, computed with the distributed prefix-sum
    # pattern (no single-task sort). Near-dup/template docs become
    # adjacent, which makes zstd shards ~5.8x smaller on a
    # boilerplate-heavy corpus (measured in
    # tests/test_similarity_order.py). The oracle recomputes the same
    # md5-60 keys in SQL and ranks with one row_number.
    from olx_spark.operators.layout import similarity_order

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    return similarity_order(docs, "text", "doc_id", rows_per_shard=64)


def _sql_sim_order(n_keys: int = 4, rows_per_shard: int = 64) -> str:
    keys = ", ".join(
        "coalesce(list_min([(('0x' || substr(md5('"
        + str(j)
        + ":' || s), 1, 15))::bigint) for s in sh]), -1) as k"
        + str(j)
        for j in range(n_keys)
    )
    order = ", ".join(f"k{j}" for j in range(n_keys)) + ", doc_id"
    return f"""
        with d as (
            select doc_id, {_sql_shingles(3)} as sh from documents
        ), keyed as (
            select doc_id, {keys} from d
        ), ranked as (
            select doc_id,
                   row_number() over (order by {order}) - 1 as r
            from keyed
        )
        select doc_id, (r // {rows_per_shard})::int as shard,
               (r % {rows_per_shard})::int as pos
        from ranked
    """


def _payload_corpus():
    """Deterministic compressed-payload corpus shared by
    q_decompress and its oracle: the oracle inlines the GENERATED
    truth (status/text/encoding), which the decoder never sees."""
    import gzip
    import zlib

    rows = []
    for i in range(60):
        text = f"payload {i} " + " ".join(f"tok{i}{j}" for j in range(i % 30 + 5))
        raw = text.encode()
        kind = i % 3
        if kind == 0:
            blob, enc = gzip.compress(raw, mtime=0), "gzip"
        elif kind == 1:
            blob, enc = zlib.compress(raw), "zlib"
        else:
            co = zlib.compressobj(wbits=-15)
            blob, enc = co.compress(raw) + co.flush(), "deflate"
        rows.append((f"p{i:03d}", blob, "ok", text, enc))
    bomb = zlib.compress(b"\x00" * (8 << 20), 9)
    rows.append((f"p{900}", bomb, "bomb", None, "zlib"))
    whole = gzip.compress(b"truncated " * 200, mtime=0)
    rows.append((f"p{901}", whole[: len(whole) // 2], "corrupt", None, "gzip"))
    rows.append((f"p{902}", b"plainly not compressed", "corrupt", None,
                 "deflate"))
    rows.append((f"p{903}", b"", "empty", None, None))
    return rows


def q_decompress(spark, sf):
    # compressed fetch-payload decoding with bomb guards (operators/
    # compression): gzip/zlib/raw-deflate sniffed from bytes (headers
    # lie), decoded STREAMING with max_bytes and max_ratio caps
    # enforced mid-stream — an 8 MB zlib bomb is flagged after 1 MB,
    # never materialized; truncated/garbage rows flag corrupt. The
    # oracle inlines the corpus GENERATOR's truth, which the decoder
    # never sees — encoder and decoder check each other (the EXIF
    # pattern).
    from olx_spark.operators.compression import decompress_payloads

    rows = _payload_corpus()
    df = spark.createDataFrame(
        [(rid, bytearray(blob)) for rid, blob, _, _, _ in rows],
        "rid string, body binary",
    )
    out = decompress_payloads(df, max_bytes=1 << 20, max_ratio=200.0)
    return out.select(
        "rid", "status", "encoding",
        F.col("payload").cast("string").alias("text"),
        "n_out",
    )


def _sql_decompress() -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    vals = ", ".join(
        f"({lit(rid)}, {lit(status)}, {lit(enc)}, {lit(text)}, "
        f"{len(text.encode()) if text is not None else 'NULL'})"
        for rid, _, status, text, enc in _payload_corpus()
    )
    return f"""
        select rid, status, encoding, text, n_out::int as n_out
        from (values {vals}) t(rid, status, encoding, text, n_out)
    """


_SPOOF_ATTACKS = [
    ("аpple.com", "apple.com"),
    ("gооgle.com", "google.com"),
    ("αmazon.com", "amazon.com"),
    ("micrоsоft.com", "microsoft.com"),
    ("goo​gle.com", "google.com"),
    ("еbay.com", "ebay.com"),
    ("Examplе.ORG", "example.org"),
    ("päypal.com", "paypal.com"),
]
_SPOOF_TRUSTED = ["apple.com", "google.com", "amazon.com",
                  "microsoft.com", "ebay.com", "example.org", "paypal.com"]
_SPOOF_POOL = [a for a, _ in _SPOOF_ATTACKS] + _SPOOF_TRUSTED + [
    "unrelated.net", "shop.example.net"
]


def q_spoof_hosts(spark, sf):
    # IDN homograph / confusable host-spoof detection (functions/
    # urls.confusable_skeleton + spoof_candidates): UTS #39-lite
    # skeleton folding via a pure-JVM translate table (Cyrillic/
    # Greek/accented lookalikes + zero-width strip); hosts whose
    # skeleton collides with a trusted host while the raw form
    # differs are the crawl-poisoning review queue. Customers pick
    # from a 17-entry host pool (8 attacks, 7 trusted, 2 noise); the
    # oracle replays the identical translate table and broadcast
    # join shape in SQL.
    from olx_spark.functions.urls import spoof_candidates

    k = F.col("c_custkey")
    pool = F.array(*[F.lit(h) for h in _SPOOF_POOL])
    hosts = _t(spark, sf, "customer", parallel=True).select(
        k.alias("custkey"),
        F.element_at(pool, ((k % 17) + 1).cast("int")).alias("host"),
    )
    trusted = spark.createDataFrame(
        [(t,) for t in _SPOOF_TRUSTED], "host string"
    )
    return spoof_candidates(hosts, trusted).join(
        hosts.select("custkey", "host"), "host"
    ).select("custkey", "host", "matches_trusted", "skeleton").distinct()


def _sql_spoof_hosts() -> str:
    from olx_spark.functions.urls import (
        CONFUSABLES_FROM,
        CONFUSABLES_TO,
        _ZERO_WIDTH,
    )

    pool = ", ".join("'" + h + "'" for h in _SPOOF_POOL)
    trusted = ", ".join("('" + t + "')" for t in _SPOOF_TRUSTED)
    sk = (
        "translate(regexp_replace(lower({0}), '" + _ZERO_WIDTH + "', '', 'g'),"
        " '" + CONFUSABLES_FROM + "', '" + CONFUSABLES_TO + "')"
    )
    return f"""
        with hosts as (
            select c_custkey as custkey,
                   list_value({pool})[(c_custkey % 17) + 1] as host
            from customer
        ), t(th) as (values {trusted}
        ), tk as (select lower(th) as t_raw, {sk.format('th')} as sk from t)
        select distinct hosts.custkey, hosts.host,
               tk.t_raw as matches_trusted, tk.sk as skeleton
        from hosts join tk on {sk.format('hosts.host')} = tk.sk
        where lower(hosts.host) <> tk.t_raw
    """


def q_topk_heavy(spark, sf):
    # certified exact top-k heavy hitters (operators/cms.
    # exact_topk_heavy): per-partition weighted Misra-Gries candidate
    # pruning + broadcast-semi exact recount — the tail never
    # shuffles, and the k-th count clearing the N/capacity loss bound
    # certifies the result IS the true top-k (reported per row, not
    # assumed). Keys are exponential buckets of o_orderkey (a skewed
    # host-like distribution); the oracle computes the brute-force
    # top-k and the same certificate arithmetic in SQL.
    from olx_spark.operators.cms import exact_topk_heavy

    df = _t(spark, sf, "orders").select(
        F.concat(
            F.lit("h"),
            F.floor(F.log2(F.col("o_orderkey") + 1)).cast("long").cast(
                "string"
            ),
        ).alias("key")
    )
    return exact_topk_heavy(df, "key", k=8)


_SQL_TOPK_HEAVY = """
    with keyed as (
        select 'h' || floor(log2(o_orderkey + 1))::bigint as key
        from orders
    ), counts as (
        select key, count(*)::bigint as cnt from keyed group by key
    ), topk as (
        select key, cnt from counts
        order by cnt desc, key asc limit 8
    ), cert as (
        select (min(cnt) * 512 > (select count(*) from keyed)) as c
        from topk
    )
    select topk.key, topk.cnt, cert.c as certified
    from topk cross join cert
"""


def q_edge_density(spark, sf):
    # Sobel edge-density screenshot/text-overlay signal (operators/
    # multimodal.edge_density): fraction of pixels over a hard-edge
    # gradient threshold + mean magnitude — the cheap meme/UI-chrome
    # flag, complementing blur (low-frequency deficit) and
    # colorfulness. Plumbing oracle: the same exact arithmetic
    # (edge_stats_np) recomputed driver-side over the shared corpus,
    # inlined as VALUES.
    from olx_spark.operators.multimodal import edge_density

    df = spark.createDataFrame(
        _image_corpus_rows("plain", 64, 21),
        "image_id string, bytes binary, fmt string",
    )
    return edge_density(df).select(
        "image_id", "fmt",
        F.round("edge_frac", 6).alias("edge_frac"),
        F.round("mean_grad", 4).alias("mean_grad"),
        "decode_ok",
    )


def _sql_edge_density(n: int = 64, seed: int = 21) -> str:
    from olx_spark.fixtures.images import decode_image
    from olx_spark.operators.multimodal import edge_stats_np

    vals = []
    for image_id, data, fmt in _image_corpus_rows("plain", n, seed):
        ef, mg = edge_stats_np(decode_image(data, fmt))
        vals.append(f"('{image_id}', '{fmt}', {ef!r}::double, "
                    f"{mg!r}::double, 1)")
    return f"""
        select image_id, fmt, round(edge_frac, 6) as edge_frac,
               round(mean_grad, 4) as mean_grad, decode_ok::int as decode_ok
        from (values {", ".join(vals)})
             t(image_id, fmt, edge_frac, mean_grad, decode_ok)
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_scan_filter": q_scan_filter,
        "q_filter_conj": q_filter_conj,
        "q_canonicalize": q_canonicalize,
        "q_canonicalize_modern": q_canonicalize_modern,
        "q_explode_links": q_explode_links,
        "q_string_fns": q_string_fns,
        "q_ordered_limit": q_ordered_limit,
        "q_fetch_batch": q_fetch_batch,
        "q_parse_project": q_parse_project,
        "q_map_brief": q_map_brief,
        "q_fk_stamp_join": q_fk_stamp_join,
        "q_politeness_budget": q_politeness_budget,
        "q_dedup_first_seen": q_dedup_first_seen,
        "q_unfold_rounds": q_unfold_rounds,
        "q_duration_parse": q_duration_parse,
        "q_metrics_agg": q_metrics_agg,
        "q_window_rank": q_window_rank,
        "q_rollup_metrics": q_rollup_metrics,
        "q_asof_join": q_asof_join,
        "q_range_join": q_range_join,
        "q_sessionize": q_sessionize,
        "q_recency_scores": q_recency_scores,
        "q_funnel": q_funnel,
        "q_json_props": q_json_props,
        "q_bm25_top_terms": q_bm25_top_terms,
        "q_quantiles": q_quantiles,
        "q_split_assign": q_split_assign,
        "q_stratified_sample": q_stratified_sample,
        "q_weighted_sample": q_weighted_sample,
        "q_pack_shards": q_pack_shards,
        "q_corpus_mix": q_corpus_mix,
        "q_hll_distinct": q_hll_distinct,
        "q_cms_hot_keys": q_cms_hot_keys,
        "q_pagerank": q_pagerank,
        "q_label_prop": q_label_prop,
        "q_export_csv": q_export_csv,
        "q_main_content": q_main_content,
        "q_snapshot_history": q_snapshot_history,
        "q_warc_roundtrip": q_warc_roundtrip,
        "q_cdx_index": q_cdx_index,
        "q_link_directives": q_link_directives,
        "q_canonical_dedup": q_canonical_dedup,
        "q_consistent_shard": q_consistent_shard,
        "q_token_count": q_token_count,
        "q_quality_score": q_quality_score,
        "q_lang_id": q_lang_id,
        "q_doc_fingerprint": q_doc_fingerprint,
        "q_repetition_stats": q_repetition_stats,
        "q_gopher_rules": q_gopher_rules,
        "q_c4_clean": q_c4_clean,
        "q_mojibake": q_mojibake,
        "q_chunk_dedup": q_chunk_dedup,
        "q_cdc_chunks": q_cdc_chunks,
        "q_pii_scrub": q_pii_scrub,
        "q_dedup_exact": q_dedup_exact,
        "q_simhash16": q_simhash16,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_dup_components": q_dup_components,
        "q_leakage_split": q_leakage_split,
        "q_embed_cosine_topk": q_embed_cosine_topk,
        "q_embed_near_dup": q_embed_near_dup,
        "q_join_agg_topk": q_join_agg_topk,
        "q_bloom_join": q_bloom_join,
        "q_equi_depth": q_equi_depth,
        "q_file_plan": q_file_plan,
        "q_multi_join": q_multi_join,
        "q_winnow_fingerprint": q_winnow_fingerprint,
        "q_minhash_lsh": q_minhash_lsh,
        "q_simhash_near_dups": q_simhash_near_dups,
        "q_ann_lsh": q_ann_lsh,
        "q_ivf_ann": q_ivf_ann,
        "q_semdedup": q_semdedup,
        "q_bpe_merges": q_bpe_merges,
        "q_bpe_encode": q_bpe_encode,
        "q_decontaminate": q_decontaminate,
        "q_perplexity_filter": q_perplexity_filter,
        "q_nb_classify": q_nb_classify,
        "q_pmi_collocations": q_pmi_collocations,
        "q_hits": q_hits,
        "q_char_entropy": q_char_entropy,
        "q_winsorize": q_winsorize,
        "q_mad_outliers": q_mad_outliers,
        "q_registrable_domain": q_registrable_domain,
        "q_exif_features": q_exif_features,
        "q_oriented_phash": q_oriented_phash,
        "q_crop_dups": q_crop_dups,
        "q_aimd_delay": q_aimd_delay,
        "q_footer_stats": q_footer_stats,
        "q_trustrank": q_trustrank,
        "q_sim_order": q_sim_order,
        "q_decompress": q_decompress,
        "q_spoof_hosts": q_spoof_hosts,
        "q_topk_heavy": q_topk_heavy,
        "q_edge_density": q_edge_density,
        "q_neg_pairs": q_neg_pairs,
        "q_minhash_delta": q_minhash_delta,
        "q_dedup_decisions": q_dedup_decisions,
        "q_blur_scores": q_blur_scores,
        "q_domain_quality": q_domain_quality,
        "q_url_templates": q_url_templates,
        "q_path_tree": q_path_tree,
        "q_seed_distance": q_seed_distance,
        "q_sniff_types": q_sniff_types,
        "q_scd2_history": q_scd2_history,
        "q_boilerplate": q_boilerplate,
        "q_anchor_profile": q_anchor_profile,
        "q_image_borders": q_image_borders,
        "q_vocab_coverage": q_vocab_coverage,
        "q_sitemap_entries": q_sitemap_entries,
        "q_rate_limit_audit": q_rate_limit_audit,
        "q_budget_alloc": q_budget_alloc,
        "q_redirect_resolve": q_redirect_resolve,
        "q_host_mirrors": q_host_mirrors,
        "q_containment": q_containment,
        "q_change_rate": q_change_rate,
        "q_edit_verify": q_edit_verify,
        "q_dsir_resample": q_dsir_resample,
        "q_crawl_reference": q_crawl_reference,
        "q_image_features": q_image_features,
        "q_jpeg_features": q_jpeg_features,
        "q_jpeg_quality": q_jpeg_quality,
        "q_colorfulness": q_colorfulness,
        "q_ssim_verify": q_ssim_verify,
        "q_charset": q_charset,
        "q_audio_features": q_audio_features,
        "q_video_features": q_video_features,
        "q_video_frames": q_video_frames,
        "q_phash_near_dup": q_phash_near_dup,
        "q_curate_images": q_curate_images,
        "q_clip_filter": q_clip_filter,
        "q_ar_batches": q_ar_batches,
        "q_cluster_sample": q_cluster_sample,
        "q_dup_spans": q_dup_spans,
        "q_kmeans": q_kmeans,
        "q_pq_encode": q_pq_encode,
        "q_inverted_index": q_inverted_index,
        "q_zorder": q_zorder,
        "q_merge_upsert": q_merge_upsert,
        "q_profile_table": q_profile_table,
        "q_tile_stats": q_tile_stats,
        "q_recrawl_due": q_recrawl_due,
        "q_freshness_alloc": q_freshness_alloc,
        "q_revalidation": q_revalidation,
        "q_cache_ttl": q_cache_ttl,
        "q_robots_sitemaps": q_robots_sitemaps,
        "q_rand_proj": q_rand_proj,
        "q_ssjoin": q_ssjoin,
        "q_bm25_search": q_bm25_search,
        "q_normalize_images": q_normalize_images,
    }


# --------------------------------------------------------------------------
def _sql_md5_60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::bigint)"


def _sql_norm(expr: str) -> str:
    return f"lower(trim(regexp_replace({expr}, '\\s+', ' ', 'g')))"


def _sql_token_count(expr: str) -> str:
    return (
        f"case when length(trim({expr})) = 0 then 0 "
        f"else len(string_split_regex(trim({expr}), '\\s+')) end"
    )


def _sql_lang_id() -> str:
    pad = f"(' ' || {_sql_norm('text')} || ' ')"

    def score(lang):
        terms = [
            f"((length({pad}) - length(replace({pad}, '{m}', ''))) / {len(m)})::int"
            for m in LANG_MARKERS[lang]
        ]
        return "(" + " + ".join(terms) + ")"

    scores = {lang: score(lang) for lang in LANG_MARKERS}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    # build reversed so the first-listed language wins ties
    expr = "'und'"
    for lang in reversed(list(LANG_MARKERS)):
        expr = (
            f"case when {scores[lang]} = {best} and {best} > 0 "
            f"then '{lang}' else {expr} end"
        )
    return expr


def _sql_shingles(k: int = 3) -> str:
    toks = f"string_split({_sql_norm('text')}, ' ')"
    return (
        f"case when len({toks}) < {k} then []::varchar[] else "
        f"[array_to_string({toks}[i:i+{k - 1}], ' ') for i in range(1, len({toks}) - {k - 2})] end"
    )


def _sql_repetition_stats() -> str:
    """DuckDB twin of q_repetition_stats: dup-2-gram fraction via the
    shared shingle construction; top-word fraction via unnest+groupBy
    (a different formulation than Spark's shuffle-free fold — equal
    results are exactly what the oracle certifies)."""
    toks = f"string_split({_sql_norm('text')}, ' ')"
    frac = "case when len(sh) <= 0 then 0.0 else 1.0 - len(list_distinct(sh))::double / len(sh) end"
    return f"""
        with d as (select doc_id, {_sql_shingles(2)} as sh, {toks} as toks from documents),
        topw as (
            select doc_id, max(cnt)::double / sum(cnt) as twf
            from (
                select doc_id, w, count(*) as cnt
                from (select doc_id, unnest(toks) as w from d)
                group by doc_id, w
            )
            group by doc_id
        )
        select d.doc_id,
               round({frac}, 6) as dup_2gram_frac,
               round(coalesce(topw.twf, 0.0), 6) as top_word_frac,
               (({frac}) > 0.55)::int as repetitive
        from d left join topw using (doc_id)
    """


def _sql_chunk_dedup() -> str:
    """DuckDB twin of q_chunk_dedup: same normalize/chunk/md5-60
    construction; first-occurrence selection via a row_number window
    (a different formulation than Spark's skew-safe min-struct agg —
    equal results are what the oracle certifies)."""
    chunk = "array_to_string(t[(i*20+1):(i*20+20)], ' ')"
    return f"""
        with norm as (select doc_id, {_sql_norm("text")} as s from documents),
        toks as (select doc_id, string_split(s, ' ') as t from norm where s <> ''),
        chunks as (
            select doc_id, i as idx, {_sql_md5_60(chunk)} as fp
            from toks, unnest(range(0, cast(ceil(len(t)/20.0) as int))) as u(i)
        ),
        marked as (
            select doc_id, idx,
                   row_number() over (partition by fp order by doc_id, idx) as rn
            from chunks
        ),
        stats as (
            select doc_id, count(*) as n_chunks,
                   (sum(case when rn = 1 then 1 else 0 end))::bigint as n_kept
            from marked group by doc_id
        )
        select d.doc_id,
               coalesce(s.n_chunks, 0) as n_chunks,
               coalesce(s.n_kept, 0) as n_kept,
               round(case when coalesce(s.n_chunks, 0) = 0 then 0.0
                          else 1.0 - s.n_kept::double / s.n_chunks end,
                     6) as dup_chunk_frac
        from documents d left join stats s using (doc_id)
    """


def _sql_pii_scrub() -> str:
    """DuckDB twin of q_pii_scrub: the same deterministic PII
    augmentation built in SQL, the same patterns applied in the same
    order (regexp_replace with the 'g' flag = Spark's replace-all)."""
    from olx_spark.functions.text import PII_PATTERNS

    aug = (
        "text"
        " || (case when doc_id % 7 = 0 then ' contact user' || doc_id::varchar || '@example.com now' else '' end)"
        " || (case when doc_id % 11 = 0 then ' call +1 555-01' || doc_id::varchar || ' or ping 10.0.' else '' end)"
        " || (case when doc_id % 13 = 0 then ' host 192.168.1.' || (doc_id % 250)::varchar || ' up' else '' end)"
    )
    counts = ", ".join(
        f"len(regexp_extract_all(aug, '{pat}'))::int as n_{kind}"
        for kind, pat, _ in PII_PATTERNS
    )
    scrubbed = "aug"
    for _, pat, repl in PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{repl}', 'g')"
    return f"""
        with d as (select doc_id, {aug} as aug from documents where doc_id < 400)
        select doc_id, {counts}, md5({scrubbed}) as scrubbed_md5
        from d
    """


def _sql_gopher_rules() -> str:
    """DuckDB twin of q_gopher_rules: the same deterministic
    augmentation, then every Gopher signal recomputed with DuckDB
    list lambdas (a different engine-side formulation than Spark's
    let_-bound HOF expressions — equality is what the oracle
    certifies). Flags are computed from the UNROUNDED signals, like
    the Spark side; only the emitted signal columns are rounded."""
    bullets = " || ".join(f"chr(10) || '- item {k}'" for k in range(10))
    ell_tail = (
        "chr(10) || 'to be continued...' || chr(10) || 'more soon…'"
        " || chr(10) || 'see part two...'"
    )
    aug = (
        "text"
        f" || (case when doc_id % 7 = 0 then {ell_tail} else '' end)"
        " || (case when doc_id % 11 = 0 then ' # ## ### #### … ...' else '' end)"
        f" || (case when doc_id % 13 = 0 then repeat(' 12345', 10) else '' end)"
        f" || (case when doc_id % 17 = 0 then {bullets} else '' end)"
    )
    stopw = "[" + ", ".join(f"'{w}'" for w in [
        "the", "a", "and", "of", "to", "that", "with", "have",
    ]) + "]"
    occ = lambda needle, n: (
        f"((length(nrm) - length(replace(nrm, '{needle}', ''))) / {n})::int"
    )
    flags = {
        "r_words": "n_words >= 20 and n_words <= 100000",
        "r_mean_len": "mean_word_len >= 3.0 and mean_word_len <= 10.0",
        "r_alpha": "alpha_frac >= 0.8",
        "r_stop": "stop_distinct >= 2",
        "r_symbol": "symbol_ratio <= 0.1",
        "r_bullet": "bullet_frac <= 0.9",
        "r_ellipsis": "ellipsis_frac <= 0.3",
    }
    flag_cols = ",\n               ".join(
        f"({e})::int as {k}" for k, e in flags.items()
    )
    keep = " and ".join(f"({e})" for e in flags.values())
    return f"""
        with d as (
            select doc_id, {aug} as aug from documents
        ), s as (
            select doc_id, aug, {_sql_norm('aug')} as nrm from d
        ), t as (
            select doc_id, nrm,
                   list_filter(string_split(nrm, ' '), x -> length(x) > 0) as toks,
                   list_filter(list_transform(string_split(aug, chr(10)), l -> trim(l)),
                               l -> length(l) > 0) as ne
            from s
        ), sig as (
            select doc_id,
                   len(toks)::int as n_words,
                   case when len(toks) = 0 then 0.0
                        else length(replace(nrm, ' ', ''))::double / len(toks) end as mean_word_len,
                   case when len(toks) = 0 then 0.0
                        else len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::double / len(toks) end as alpha_frac,
                   len(list_filter(list_distinct(toks), x -> list_contains({stopw}, x)))::int as stop_distinct,
                   case when len(toks) = 0 then 0.0
                        else ({occ('#', 1)} + {occ('...', 3)} + {occ('…', 1)})::double / len(toks) end as symbol_ratio,
                   case when len(ne) = 0 then 0.0
                        else len(list_filter(ne, l -> substr(l, 1, 1) in ('-', '*', '•')))::double / len(ne) end as bullet_frac,
                   case when len(ne) = 0 then 0.0
                        else len(list_filter(ne, l -> ends_with(l, '...') or ends_with(l, '…')))::double / len(ne) end as ellipsis_frac
            from t
        )
        select doc_id, n_words,
               round(mean_word_len, 6) as mean_word_len,
               round(alpha_frac, 6) as alpha_frac,
               stop_distinct,
               round(symbol_ratio, 6) as symbol_ratio,
               round(bullet_frac, 6) as bullet_frac,
               round(ellipsis_frac, 6) as ellipsis_frac,
               {flag_cols},
               ({keep})::int as keep
        from sig
    """


def _sql_dup_components() -> str:
    """DuckDB twin of _dup_comps: n-gram-Jaccard near-dup pairs over
    doc_id < 300, transitive closure via recursive CTE, component =
    min doc_id of the group. Shared by q_dup_components and
    q_leakage_split."""
    return f"""
            with recursive d as (
                select doc_id, list_distinct({_sql_shingles(3)}) as sh
                from documents where doc_id < 300
            ), dd as (
                select doc_id, sh from d where len(sh) > 0
            ), ex as (
                select doc_id, unnest(sh) as s from dd
            ), pairs as (
                select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as inter
                from ex a join ex b using (s)
                where a.doc_id < b.doc_id
                group by 1, 2
            ), edges0 as (
                select doc_a as a, doc_b as b from pairs
                join (select doc_id, len(sh) as n from dd) na on na.doc_id = doc_a
                join (select doc_id, len(sh) as n from dd) nb on nb.doc_id = doc_b
                where inter / (na.n + nb.n - inter) >= 0.2
            ), edges as (
                select a, b from edges0 union select b, a from edges0
            ), r(id, root) as (
                select doc_id, doc_id from d
                union
                select e.b, r.root from edges e join r on e.a = r.id
            )
            select id as doc_id, min(root) as component from r group by id
    """


def _sql_minhash_lsh(n_perm: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    """DuckDB twin of minhash_near_dups (same md5-60 hashes, same
    banding, same exact-Jaccard verification)."""
    rpb = n_perm // bands
    sig = "[" + ", ".join(
        f"list_min([(('0x' || substr(md5('{j}:' || s), 1, 15))::bigint) for s in sh])"
        for j in range(n_perm)
    ) + "]"
    band_selects = "\n            union all\n".join(
        f"""            select doc_id, {b} as band_id,
                   ('0x' || substr(md5(array_to_string(sig[{b * rpb + 1}:{(b + 1) * rpb}], ',')), 1, 15))::bigint as band_hash
            from sigs"""
        for b in range(bands)
    )
    return f"""
        with d as (
            select doc_id, {_sql_shingles(3)} as sh
            from documents where doc_id < 300
        ), dd as (
            select doc_id, sh from d where len(sh) > 0
        ), sigs as (
            select doc_id, sh, {sig} as sig from dd
        ), ex as (
{band_selects}
        ), pairs as (
            select a.doc_id as doc_a, b.doc_id as doc_b
            from ex a join ex b using (band_id, band_hash)
            where a.doc_id < b.doc_id
            group by 1, 2
        ), verified as (
            select doc_a, doc_b,
                   len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::double
                   / len(list_distinct(sa.sh || sb.sh)) as j
            from pairs
            join dd sa on sa.doc_id = doc_a
            join dd sb on sb.doc_id = doc_b
        )
        select doc_a, doc_b, round(j, 6) as jaccard
        from verified where j >= {threshold}
    """


def _sql_minhash_delta(
    n_perm: int = 16, bands: int = 4, threshold: float = 0.5,
    max_bucket: int = 1000,
) -> str:
    """DuckDB twin of q_minhash_delta: same md5-60 signatures/bands on
    both sides, corpus-bucket size cap, delta x corpus join only,
    exact-Jaccard verify. Multiply-referenced CTEs AS MATERIALIZED."""
    rpb = n_perm // bands
    sig = "[" + ", ".join(
        f"list_min([(('0x' || substr(md5('{j}:' || s), 1, 15))::bigint) for s in sh])"
        for j in range(n_perm)
    ) + "]"

    def band_sel(src: str) -> str:
        return "\n            union all\n".join(
            f"""            select doc_id, {b} as band_id,
                   ('0x' || substr(md5(array_to_string(sig[{b * rpb + 1}:{(b + 1) * rpb}], ',')), 1, 15))::bigint as band_hash
            from {src} where len(sh) > 0"""
            for b in range(bands)
        )

    return f"""
        with d as materialized (
            select doc_id, {_sql_shingles(3)} as sh from documents
        ), sc as materialized (
            select doc_id, sh, {sig} as sig from d where doc_id % 10 != 0
        ), sd as materialized (
            select doc_id, sh, {sig} as sig from d where doc_id % 10 = 0
        ), exc as materialized (
{band_sel('sc')}
        ), exd as (
{band_sel('sd')}
        ), kept as (
            select exc.* from exc
            join (
                select band_id, band_hash from exc
                group by 1, 2 having count(*) <= {max_bucket}
            ) ok using (band_id, band_hash)
        ), cands as (
            select distinct dl.doc_id as new_id, c.doc_id as dup_of
            from exd dl join kept c using (band_id, band_hash)
            where dl.doc_id != c.doc_id
        ), verified as (
            select new_id, dup_of,
                   len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::double
                   / len(list_distinct(sa.sh || sb.sh)) as j
            from cands
            join sd sa on sa.doc_id = new_id
            join sc sb on sb.doc_id = dup_of
        )
        select new_id, dup_of, round(j, 6) as jaccard
        from verified where j >= {threshold}
    """


def _sql_dedup_decisions() -> str:
    """DuckDB twin of q_dedup_decisions: the q_dup_components
    transitive closure + the same rounded-quality argmax (score desc,
    id asc) and keep/drop labeling."""
    quality = f"""round(
                0.4 * least(1.0, ({_sql_token_count('text')}) / 100.0)
              + 0.3 * (1.0 - case when length(text) = 0 then 0.0
                    else (length(text) - length(translate(text, '.,!?;:', ''))) / length(text) end)
              + 0.3 * least(1.0, case when ({_sql_token_count('text')}) = 0 then 0.0
                    else length(trim(text)) / ({_sql_token_count('text')}) end / 8.0)
            , 6)"""
    return f"""
        with recursive d as (
            select doc_id, list_distinct({_sql_shingles(3)}) as sh
            from documents where doc_id < 300
        ), dd as (
            select doc_id, sh from d where len(sh) > 0
        ), ex as (
            select doc_id, unnest(sh) as s from dd
        ), pairs as (
            select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as inter
            from ex a join ex b using (s)
            where a.doc_id < b.doc_id
            group by 1, 2
        ), edges0 as (
            select doc_a as a, doc_b as b from pairs
            join (select doc_id, len(sh) as n from dd) na on na.doc_id = doc_a
            join (select doc_id, len(sh) as n from dd) nb on nb.doc_id = doc_b
            where inter / (na.n + nb.n - inter) >= 0.2
        ), edges as (
            select a, b from edges0 union select b, a from edges0
        ), r(id, root) as (
            select doc_id, doc_id from d
            union
            select e.b, r.root from edges e join r on e.a = r.id
        ), comp as (
            select id as doc_id, min(root) as component from r group by id
        ), q as (
            select doc_id, {quality} as score
            from documents where doc_id < 300
        ), w as (
            select component, doc_id as kept_id from (
                select c.component, c.doc_id,
                       row_number() over (
                           partition by c.component
                           order by q.score desc, c.doc_id asc
                       ) as rn
                from comp c join q using (doc_id)
            ) where rn = 1
        )
        select c.doc_id, c.component, w.kept_id,
               case when c.doc_id = w.kept_id then 'keep' else 'drop' end as action
        from comp c join w using (component)
    """


def _sql_simhash_near_dups(nbits: int = 60, max_dist: int = 10, id_max: int = 500) -> str:
    """DuckDB twin of simhash_near_dups(portable md5-60, banding derived
    from max_dist): complete candidate recall makes the banded result
    equal the brute-force pair set, which is what this computes."""
    bit = lambda i: (
        f"(case when list_sum([case when (h >> {i}) & 1 = 1 then 1 else -1 end "
        f"for h in hs]) >= 0 then (1::bigint << {i}) else 0::bigint end)"
    )
    sh = "(" + " + ".join(bit(i) for i in range(nbits)) + ")::bigint"
    toks = f"string_split({_sql_norm('text')}, ' ')"
    return f"""
        with d as (
            select doc_id, [{_sql_md5_60('t')} for t in {toks}] as hs
            from documents where doc_id < {id_max}
        ), sim as (
            select doc_id, {sh} as sh from d
        )
        select a.doc_id as doc_a, b.doc_id as doc_b,
               bit_count(xor(a.sh, b.sh))::int as dist
        from sim a join sim b on a.doc_id < b.doc_id
        where bit_count(xor(a.sh, b.sh)) <= {max_dist}
    """


def _sql_ann_lsh(n_planes: int = 4, dim: int = 64, k: int = 5, seed: int = 42) -> str:
    """DuckDB twin of lsh_topk: the hyperplanes are SEEDED CONSTANTS
    (numpy PCG64), so the oracle re-applies the exact same sign-bucket
    assignment, multiprobe expansion, and (cos desc, cand_id) ranking —
    the whole approximate pipeline is deterministic and checkable."""
    from olx_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    dot = lambda vec, lit: (
        f"list_sum([{vec}[i] * ({lit})[i] for i in range(1, {dim + 1})])"
    )
    bucket_terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        bucket_terms.append(
            f"(case when {dot('v', lit)} >= 0 then {1 << i} else 0 end)"
        )
    bucket = "(" + " + ".join(bucket_terms) + ")"
    probe_list = "[b0" + "".join(f", xor(b0, {1 << i})" for i in range(n_planes)) + "]"
    return f"""
        with c as (
            select vec_id, [x::double for x in embedding] as v from embeddings
        ), b as (
            select vec_id, v, {bucket} as bucket from c
        ), q as (
            select vec_id as query_id, v as qv, bucket as b0 from b where vec_id < 10
        ), probes as (
            select query_id, qv, unnest({probe_list}) as bucket from q
        ), cand as (
            select distinct query_id, qv, cb.vec_id as cand_id, cb.v
            from probes join b cb using (bucket)
            where cb.vec_id != query_id
        ), scored as (
            select query_id, cand_id,
                   list_sum([qv[i] * v[i] for i in range(1, {dim + 1})]) /
                   (sqrt(list_sum([x * x for x in qv])) *
                    sqrt(list_sum([x * x for x in v]))) as cs
            from cand
        )
        select query_id, cand_id, rank, round(cs, 6) as cos_sim from (
            select query_id, cand_id, cs,
                   row_number() over (partition by query_id
                       order by cs desc, cand_id) as rank
            from scored
        ) where rank <= {k}
    """


def _sql_ivf_ann(n_centroids: int = 16, dim: int = 64, k: int = 5, nprobe: int = 4, seed: int = 7) -> str:
    """DuckDB twin of ivf_topk: same seeded-constant centroids, same
    argmax cell assignment (ties -> larger centroid id, matching
    Spark's struct max), same nprobe expansion and rescoring."""
    from olx_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_centroids, seed)
    rows = ", ".join(
        f"({ci}, [" + ", ".join(repr(float(x)) for x in cv) + "])"
        for ci, cv in enumerate(cents)
    )
    return f"""
        with c as (
            select vec_id, [x::double for x in embedding] as v from embeddings
        ), cents(cid, cv) as (values {rows}),
        dots as (
            select vec_id, cid,
                   list_sum([v[i] * cv[i] for i in range(1, {dim + 1})]) as d
            from c cross join cents
        ), cells as (  -- argmax with ties to the LARGER cid (struct-max twin)
            select vec_id, cid as cell from (
                select vec_id, cid,
                       row_number() over (partition by vec_id
                           order by d desc, cid desc) as rn
                from dots
            ) where rn = 1
        ), qprobe as (
            select vec_id as query_id, cid as cell from (
                select vec_id, cid,
                       row_number() over (partition by vec_id
                           order by d desc, cid desc) as rn
                from dots where vec_id < 10
            ) where rn <= {nprobe}
        ), cand as (
            select distinct q.query_id, cc.vec_id as cand_id
            from qprobe q
            join cells cc using (cell)
            where cc.vec_id != q.query_id
        ), scored as (
            select query_id, cand_id,
                   list_sum([qv.v[i] * cv.v[i] for i in range(1, {dim + 1})]) /
                   (sqrt(list_sum([x * x for x in qv.v])) *
                    sqrt(list_sum([x * x for x in cv.v]))) as cs
            from cand
            join c qv on qv.vec_id = query_id
            join c cv on cv.vec_id = cand_id
        )
        select query_id, cand_id, rank, round(cs, 6) as cos_sim from (
            select query_id, cand_id, cs,
                   row_number() over (partition by query_id
                       order by cs desc, cand_id) as rank
            from scored
        ) where rank <= {k}
    """


def _sql_semdedup(
    n_clusters: int = 16, dim: int = 64, threshold: float = 0.35, seed: int = 7
) -> str:
    """DuckDB twin of semantic_dedup: same seeded-constant centroids and
    argmax cell assignment as _sql_ivf_ann, then the paper's
    upper-triangular prune replayed exactly — removed iff some
    same-cell doc with a SMALLER id has cosine >= threshold, dup_of =
    the minimum such id. Threshold comparisons are raw doubles in both
    engines (the fixture's nearest within-cell cosine sits >= 2.8e-5
    from 0.35 at both test sfs — far outside fold-order disagreement)."""
    from olx_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_clusters, seed)
    rows = ", ".join(
        f"({ci}, [" + ", ".join(repr(float(x)) for x in cv) + "])"
        for ci, cv in enumerate(cents)
    )
    return f"""
        with c as (
            select vec_id, [x::double for x in embedding] as v from embeddings
        ), cents(cid, cv) as (values {rows}),
        dots as (
            select vec_id, cid,
                   list_sum([v[i] * cv[i] for i in range(1, {dim + 1})]) as d
            from c cross join cents
        ), cells as (  -- argmax with ties to the LARGER cid (struct-max twin)
            select vec_id, cid as cell from (
                select vec_id, cid,
                       row_number() over (partition by vec_id
                           order by d desc, cid desc) as rn
                from dots
            ) where rn = 1
        ), removed as (
            select cb.vec_id as doc_id, min(ca.vec_id) as dup_of
            from cells ca
            join cells cb on ca.cell = cb.cell and ca.vec_id < cb.vec_id
            join c a on a.vec_id = ca.vec_id
            join c b on b.vec_id = cb.vec_id
            where list_sum([a.v[i] * b.v[i] for i in range(1, {dim + 1})]) /
                  (sqrt(list_sum([x * x for x in a.v])) *
                   sqrt(list_sum([x * x for x in b.v]))) >= {threshold!r}
            group by cb.vec_id
        )
        select cells.vec_id as doc_id, cells.cell,
               case when r.dup_of is null then 1 else 0 end as kept,
               r.dup_of
        from cells left join removed r on r.doc_id = cells.vec_id
    """


def _sql_zorder(
    cols: tuple[str, str] = ("l_orderkey", "l_partkey"),
    table: str = "lineitem",
    bits: int = 8,
    n_buckets: int = 16,
) -> str:
    """DuckDB twin of zorder_bucket_profile: identical min-max
    normalization (floor((x-mn)*top/(mx-mn)+0.5) — every intermediate
    exact or IEEE-identical, see operators/layout.py), identical bit
    interleave (generated shift/mask/add terms, column j at lane j) and
    top-bits bucketing."""
    import math

    top = float((1 << bits) - 1)
    n = len(cols)
    lb = int(math.log2(n_buckets))
    width = bits * n
    st = ", ".join(
        f"min({c}) as mn{j}, max({c}) as mx{j}" for j, c in enumerate(cols)
    )
    norm = ", ".join(
        f"case when mx{j} = mn{j} then 0 else "
        f"floor((({c}::double - mn{j}) * {top}) / (mx{j} - mn{j})::double + 0.5)::bigint "
        f"end as x{j}"
        for j, c in enumerate(cols)
    )
    terms = " + ".join(
        f"(((x{j} >> {b}) & 1) << {b * n + j})"
        for j in range(n)
        for b in range(bits)
    )
    mins = ", ".join(
        f"min({c}) as min_{c}, max({c}) as max_{c}" for c in cols
    )
    return f"""
        with st as (select {st} from {table}),
        n as (
            select {", ".join(cols)}, {norm}
            from {table} cross join st
        ), z as (
            select {", ".join(cols)}, ({terms}) as zval from n
        )
        select (zval >> {width - lb})::int as file_bucket,
               count(*) as n_rows, {mins}
        from z group by 1
    """


def _sql_profile_table() -> str:
    """DuckDB twin of q_profile_table: one UNION ALL branch per
    profiled column replaying count / null count / exact NDV / min /
    max (aggregated on the native type, cast to varchar after)."""
    branch = """
        select '{c}' as column_name, count(*) as n_rows,
               count(*) - count({c}) as n_nulls,
               count(distinct {c}) as n_distinct,
               min({c})::varchar as min_val, max({c})::varchar as max_val
        from d"""
    cols = ["doc_id", "lang", "source", "n_chars", "lang_opt"]
    return (
        "with d as (select *, nullif(lang, 'en') as lang_opt from documents)\n"
        + " union all ".join(branch.format(c=c) for c in cols)
    )


def _sql_bm25_search(k: int = 25) -> str:
    """DuckDB twin of q_bm25_search: same tokenization/stats chain as
    the q_bm25_top_terms twin, query filter on the literal term set,
    per-doc sum rounded to 6, rank on the rounded score + doc_id."""
    return f"""
        with toks as (
            select doc_id, unnest(string_split({_sql_norm('text')}, ' ')) as term
            from documents
        ), t as (
            select doc_id, term from toks where term <> ''
        ), tf as (
            select doc_id, term, count(*)::double as tf from t group by 1, 2
        ), dlen as (
            select doc_id, sum(tf) as dlen from tf group by 1
        ), stats as (
            select count(*)::double as n_docs, avg(dlen) as avg_dlen from dlen
        ), qtf as (
            select * from tf where term in ('hash', 'join', 'filter', 'spill')
        ), dfreq as (
            select term, count(*)::double as df from qtf group by 1
        ), scored as (
            select qtf.doc_id,
                   round(sum(
                       ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                       * qtf.tf * 2.2
                       / (qtf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dlen / stats.avg_dlen))
                   ), 6) as score,
                   count(*) as n_terms_hit
            from qtf
            join dlen using (doc_id)
            join dfreq using (term)
            cross join stats
            group by qtf.doc_id
        )
        select doc_id, score, n_terms_hit, rank_in_limit from (
            select doc_id, score, n_terms_hit,
                   row_number() over (order by score desc, doc_id asc) - 1
                       as rank_in_limit
            from scored
        ) where rank_in_limit < {k}
    """


def _sql_ssjoin(t: float = 0.6, mod: int = 5) -> str:
    """DuckDB twin of q_ssjoin: the identical prefix-filter pipeline —
    same tokenization, same (freq asc, token asc) global order, same
    prefix cut |d| - ceil(t*|d|) + 1, same length filter in the join,
    same exact verification. Every float op (ceil/compare/divide) is
    the same IEEE expression on the same exact integers."""
    return f"""
        with toks as materialized (
            select distinct doc_id as doc, tok as token from (
                select doc_id,
                       unnest([x for x in string_split_regex(lower(text), '[^a-z]+')
                               if x <> '']) as tok
                from documents where doc_id % {mod} = 0)
        ), freq as (
            select token, count(*) as f from toks group by token
        ), sizes as (
            select doc, count(*) as size from toks group by doc
        ), ranked as (
            select t.doc, t.token, s.size,
                   row_number() over (
                       partition by t.doc order by f.f asc, t.token asc
                   ) - 1 as pos
            from toks t join freq f using (token) join sizes s using (doc)
        ), prefix as (
            select doc, token, size from ranked
            where pos < size - ceil({t} * size) + 1
        ), cand as (
            select distinct a.doc as doc_a, b.doc as doc_b
            from prefix a join prefix b
              on a.token = b.token and a.doc < b.doc
             and a.size * {t} <= b.size and b.size * {t} <= a.size
        ), inter as (
            select c.doc_a, c.doc_b, count(*) as inter
            from cand c
            join toks ta on ta.doc = c.doc_a
            join toks tb on tb.doc = c.doc_b and tb.token = ta.token
            group by 1, 2
        )
        select i.doc_a, i.doc_b, sa.size as size_a, sb.size as size_b,
               i.inter,
               i.inter / (sa.size + sb.size - i.inter)::double as jaccard
        from inter i
        join sizes sa on sa.doc = i.doc_a
        join sizes sb on sb.doc = i.doc_b
        where i.inter / (sa.size + sb.size - i.inter)::double >= {t}
    """


def _sql_rand_proj(in_dim: int = 64, out_dim: int = 16, scale: int = 1_000_000) -> str:
    """DuckDB twin of q_rand_proj — a FULL logic twin: the sign matrix
    is re-derived from the same md5-60 parity in SQL, the quantization
    is the same floor(x*scale + 0.5) on identically-widened doubles,
    and each output component is the exact-integer sum over the
    joined signs."""
    sign = f"1 - 2 * ({_sql_md5_60(chr(39) + 'rp-v1:' + chr(39) + ' || i || ' + chr(39) + ':' + chr(39) + ' || j')} % 2)"
    return f"""
        with signs as (
            select i, j, {sign} as s
            from (select unnest(range(0, {in_dim})) as i)
                 cross join (select unnest(range(0, {out_dim})) as j)
        ), comps as (
            select vec_id,
                   generate_subscripts(embedding, 1) - 1 as i,
                   floor(unnest(embedding)::double * {scale} + 0.5)::bigint as q
            from embeddings
        )
        select c.vec_id, s.j::int as dim_j, sum(c.q * s.s)::bigint as component
        from comps c join signs s using (i)
        group by c.vec_id, s.j
    """


def _sql_recrawl_due() -> str:
    """DuckDB twin of q_recrawl_due: same state derivation, the exact
    shiftleft backoff, the due filter against the literal now, and the
    per-host budget window (row_number over priority desc, due_s,
    url_fp)."""
    return """
        with state as (
            select event_id as url_fp, user_id % 50 as host,
                   ts as last_fetch_ts, (event_id % 5)::int as fail_count,
                   event_id % 97 as priority
            from events
        ), due as (
            select url_fp, host, priority,
                   floor(epoch(last_fetch_ts))::bigint
                     + 86400 * (1::bigint << least(fail_count, 3)) as due_s
            from state
            where floor(epoch(last_fetch_ts))::bigint
                    + 86400 * (1::bigint << least(fail_count, 3))
                  <= floor(epoch(timestamp '2024-01-20 00:00:00'))::bigint
        )
        select url_fp, host, due_s, priority, rank_in_limit from (
            select *, row_number() over (
                partition by host
                order by priority desc, due_s asc, url_fp asc
            ) - 1 as rank_in_limit
            from due
        ) where rank_in_limit < 16
    """


def _sql_merge_upsert() -> str:
    """DuckDB twin of q_merge_upsert: replays the delta derivation
    (same %7/%13/%11 expressions), the last-writer-wins compaction
    (row_number over seq desc, op desc) and the anti-join/union merge.
    A logic twin — both engines run the full MERGE semantics."""
    return """
        with t as (
            select o_orderkey, o_custkey, o_orderstatus, o_totalprice
            from orders
        ), d as (
            select o_orderkey, o_custkey, 'X' as o_orderstatus,
                   o_totalprice + 500.0 as o_totalprice, 'U' as op, 1 as seq
            from t where o_orderkey % 7 = 0
            union all
            select o_orderkey, o_custkey, 'U', o_totalprice + 1000.0, 'U', 2
            from t where o_orderkey % 7 = 0
            union all
            select o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'D', 3
            from t where o_orderkey % 13 = 0
            union all
            select o_orderkey + 1000000, o_custkey, 'N', o_totalprice, 'U', 1
            from t where o_orderkey % 11 = 0
        ), last as (
            select * from (
                select d.*, row_number() over (
                    partition by o_orderkey order by seq desc, op desc
                ) as rn
                from d
            ) where rn = 1
        )
        select o_orderkey, o_custkey, o_orderstatus, o_totalprice
        from t anti join last using (o_orderkey)
        union all
        select o_orderkey, o_custkey, o_orderstatus, o_totalprice
        from last where op <> 'D'
    """


def _sql_inverted_index(max_postings: int = 256, min_df: int = 1) -> str:
    """DuckDB twin of inverted_index: same tokenization convention as
    the BPE/train-corpus oracles (lowercase, split on [^a-z]+, empties
    dropped BEFORE position assignment), the same (doc_id, pos) cut at
    max_postings, and the gap encoding replayed via lag + ordered
    string_agg — byte-identical input to the md5-60."""
    return f"""
        with toks as materialized (
            select doc_id, unnest(l) as term, generate_subscripts(l, 1) - 1 as pos
            from (select doc_id,
                         [x for x in string_split_regex(lower(text), '[^a-z]+') if x <> ''] as l
                  from documents)
        ), stats as (
            select term, count(*) as n_postings, count(distinct doc_id) as df
            from toks group by term
        ), bounded as (
            select term, doc_id, pos from (
                select term, doc_id, pos,
                       row_number() over (partition by term order by doc_id, pos) as rn
                from toks
            ) where rn <= {max_postings}
        ), enc as (
            select term, string_agg((doc_id - prev)::varchar || '.' || pos::varchar,
                                    ',' order by doc_id, pos) as s
            from (select term, doc_id, pos,
                         lag(doc_id, 1, 0) over (partition by term order by doc_id, pos) as prev
                  from bounded)
            group by term
        )
        select e.term, s.df, s.n_postings,
               (s.n_postings > {max_postings})::int as truncated,
               {_sql_md5_60("e.s")} as postings_fp
        from enc e join stats s using (term)
        where s.df >= {min_df}
    """


def _sql_kmeans(k: int = 8, iters: int = 3, dim: int = 64, scale: int = 1_000_000) -> str:
    """DuckDB twin of kmeans_cluster_stats: the identical Lloyd rounds
    unrolled as materialized CTEs. Bit-exact by construction — every
    value in the chain (quantized components, squared distances,
    floor-div centroid updates) is an integer exactly representable in
    float64, so Spark's numpy matmuls, this SQL's list_sum folds and
    the floor of an IEEE division agree everywhere (see
    operators/clustering.py module docstring). Ties: dist asc, cid asc
    (numpy argmin = first minimum). Empty cells carry the previous
    centroid (the coalesce)."""
    d1 = dim + 1
    ctes = [f"""q as materialized (
            select vec_id, [floor(x::double * {scale}.0 + 0.5)::bigint for x in embedding] as qv
            from embeddings
        ), c0 as materialized (
            select (row_number() over (order by vec_id)) - 1 as cid, qv as cv
            from (select * from q order by vec_id limit {k})
        )"""]
    prev = "c0"
    for t in range(1, iters + 1):
        ctes.append(f"""a{t} as materialized (
            select vec_id, cid as cell from (
                select vec_id, cid, row_number() over (partition by vec_id
                    order by dist asc, cid asc) as rn
                from (
                    select q.vec_id, c.cid,
                        list_sum([(q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]) for i in range(1, {d1})]) as dist
                    from q cross join {prev} c)
            ) where rn = 1
        ), c{t} as materialized (
            select c.cid, coalesce(s.cv, c.cv) as cv
            from {prev} c left join (
                select cell as cid, list(val order by dim) as cv from (
                    select cell, dim, floor(sum(v)::double / count(*))::bigint as val
                    from (
                        select a.cell, unnest(q.qv) as v, generate_subscripts(q.qv, 1) as dim
                        from a{t} a join q using (vec_id)
                    ) group by cell, dim
                ) group by cell
            ) s using (cid)
        )""")
        prev = f"c{t}"
    return f"""
        with {", ".join(ctes)},
        scored as (
            select q.vec_id, c.cid,
                list_sum([(q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]) for i in range(1, {d1})]) as dist
            from q cross join {prev} c
        ), af as (
            select vec_id, cid as cell, dist from (
                select vec_id, cid, dist,
                    row_number() over (partition by vec_id order by dist asc, cid asc) as rn
                from scored
            ) where rn = 1
        )
        select af.vec_id, af.cell, af.dist, sz.cell_size
        from af join (select cell, count(*) as cell_size from af group by cell) sz using (cell)
    """


def _sql_label_prop(iters: int = 3) -> str:
    """DuckDB twin of q_label_prop: the identical synchronous LPA
    rounds unrolled as materialized CTEs (join -> neighbor-label
    count -> argmax by count desc, label asc -> coalesce for
    isolated nodes)."""
    ctes = ["""e as materialized (
            select l_orderkey * 2 as src, l_partkey * 2 + 1 as dst from lineitem
            union
            select l_partkey * 2 + 1, l_orderkey * 2 from lineitem
        ), l0 as materialized (
            select distinct src as id, src as label from e
        )"""]
    for t in range(1, iters + 1):
        ctes.append(f"""c{t} as materialized (
            select e.dst as id, l.label, count(*) as c
            from e join l{t - 1} l on e.src = l.id
            group by 1, 2
        ), b{t} as materialized (
            select id, label as new_label from (
                select id, label,
                       row_number() over (partition by id order by c desc, label asc) as rn
                from c{t}
            ) where rn = 1
        ), l{t} as materialized (
            select p.id, coalesce(b.new_label, p.label) as label
            from l{t - 1} p left join b{t} b using (id)
        )""")
    return f"""
        with {", ".join(ctes)}
        select id, label from l{iters}
    """


def _sql_pq(m: int = 4, k: int = 8, dim: int = 64, scale: int = 1_000_000, query_id: int = 7) -> str:
    """DuckDB twin of q_pq_encode: quantize, seed the m sub-codebooks
    from the k smallest ids, ONE joint Lloyd round, final codes, and
    the ADC distance to ``query_id``'s vector. The subspace index is
    DATA (a cross-joined range), so nothing unrolls per subspace;
    exact-integer arithmetic makes every step bit-equal to the Spark
    side (see operators/pq.py + clustering.py docstrings)."""
    sub = dim // m
    s1 = sub + 1
    dist = f"list_sum([(s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]) for i in range(1, {s1})])"
    return f"""
        with q as materialized (
            select vec_id, [floor(x::double * {scale}.0 + 0.5)::bigint for x in embedding] as qv
            from embeddings
        ), subv as materialized (
            select vec_id, j, qv[j * {sub} + 1 : (j + 1) * {sub}] as sv
            from q cross join (select unnest(range({m})) as j)
        ), c0 as materialized (
            select s.j, sd.cid, s.sv as cv
            from (
                select vec_id, (row_number() over (order by vec_id)) - 1 as cid
                from (select vec_id from q order by vec_id limit {k})
            ) sd join subv s using (vec_id)
        ), a1 as materialized (
            select vec_id, j, cid as cell from (
                select s.vec_id, s.j, c.cid,
                       row_number() over (partition by s.vec_id, s.j
                                          order by {dist} asc, c.cid asc) as rn
                from subv s join c0 c using (j)
            ) where rn = 1
        ), c1 as materialized (
            select c.j, c.cid, coalesce(u.cv, c.cv) as cv
            from c0 c left join (
                select j, cell as cid, list(val order by within) as cv from (
                    select a.j, a.cell, x.within,
                           floor(sum(x.v)::double / count(*))::bigint as val
                    from a1 a join (
                        select vec_id, j, unnest(sv) as v,
                               generate_subscripts(sv, 1) as within
                        from subv
                    ) x on a.vec_id = x.vec_id and a.j = x.j
                    group by a.j, a.cell, x.within
                ) group by j, cid
            ) u on c.j = u.j and c.cid = u.cid
        ), codes as materialized (
            select vec_id, j, cid as cell from (
                select s.vec_id, s.j, c.cid,
                       row_number() over (partition by s.vec_id, s.j
                                          order by {dist} asc, c.cid asc) as rn
                from subv s join c1 c using (j)
            ) where rn = 1
        ), dt as (
            select s.j, c.cid, {dist} as d
            from (select j, sv from subv where vec_id = {query_id}) s
            join c1 c using (j)
        ), adc as (
            select cd.vec_id, sum(dt.d)::bigint as adc_dist
            from codes cd join dt on cd.j = dt.j and cd.cell = dt.cid
            group by cd.vec_id
        ), enc as (
            select vec_id, array_to_string(list(cell order by j), ',') as codes
            from codes group by vec_id
        )
        select enc.vec_id, enc.codes, adc.adc_dist
        from enc join adc using (vec_id)
    """


def _sql_bpe_fold(src_list: str, a: str = "m.a", b: str = "m.b") -> str:
    """The greedy BPE merge apply as a DuckDB ``list_reduce`` fold with
    the IDENTICAL semantics as the Spark-side ``aggregate`` fold (merge
    when the accumulated string's last space-delimited symbol equals
    `a` and the next is `b` — symbols never contain spaces, so
    ``ends_with(acc, ' '||a)`` is an exact last-symbol test)."""
    return (
        f"list_reduce({src_list}, (acc, x) -> "
        f"case when (acc = {a} or ends_with(acc, ' ' || {a})) and x = {b} "
        f"then left(acc, len(acc) - len({a})) || {a} || {b} "
        f"else acc || ' ' || x end)"
    )


def _sql_bpe_train_ctes(n_merges: int, lim: int) -> tuple[str, list[str]]:
    """The BPE training chain (shared by _sql_bpe_merges and
    _sql_bpe_encode): words/v0 + per-step pair-count (p{k}), argmax
    (b{k} — ties: count desc, then pair lexicographic) and greedy
    rewrite (v{k}) CTEs, unrolled. Returns (cte_text, merge_row_sqls).
    CTEs are MATERIALIZED: each step references its predecessor twice
    (pair scan + rewrite), so plain inlined CTEs would expand the
    chain exponentially."""
    steps, outs = [], []
    prev = "v0"
    for k in range(1, n_merges + 1):
        steps.append(f"""
        p{k} as materialized (
            select (u).a as a, (u).b as b, sum(cnt) as c from (
                select unnest([{{'a': l[i], 'b': l[i+1]}} for i in range(1, len(l))]) as u, cnt
                from (select string_split(s, ' ') as l, cnt from {prev})
            ) group by 1, 2
        ), b{k} as materialized (
            select a, b, c from p{k} order by c desc, a, b limit 1
        ), v{k} as materialized (
            select {_sql_bpe_fold("string_split(s, ' ')")} as s, cnt
            from {prev} cross join b{k} m
        )""")
        outs.append(
            f"select {k} as merge_rank, a as left_sym, b as right_sym, "
            f"a || b as merged, c as pair_count from b{k}"
        )
        prev = f"v{k}"
    ctes = f"""words as materialized (
            select w, count(*) as cnt from (
                select unnest([x for x in string_split_regex(lower(text), '[^a-z]+') if x <> '']) as w
                from documents where doc_id < {lim}
            ) group by w
        ), v0 as materialized (
            select array_to_string(list_append([w[i] for i in range(1, len(w)+1)], '</w>'), ' ') as s, cnt
            from words
        ),{','.join(steps)}"""
    return ctes, outs


def _sql_bpe_merges(n_merges: int = 12, lim: int = 120) -> str:
    """DuckDB twin of bpe_train: the same merge steps unrolled as a
    chained CTE (see _sql_bpe_train_ctes / _sql_bpe_fold)."""
    ctes, outs = _sql_bpe_train_ctes(n_merges, lim)
    return f"""
        with {ctes}
        {' union all '.join(outs)}
    """


def _sql_bpe_encode(n_merges: int = 12, lim: int = 120) -> str:
    """DuckDB twin of q_bpe_encode: re-train the merge chain (same
    CTEs as _sql_bpe_merges), then encode the FULL corpus vocabulary
    through the same greedy fold chained once per merge (ev{k} CTEs),
    and reassemble per document: word stream in document order joined
    against the encoded vocab, md5-60 fingerprint of the space-joined
    token stream, zero-word docs kept with the empty-string
    fingerprint."""
    ctes, _outs = _sql_bpe_train_ctes(n_merges, lim)
    enc_steps = []
    prev = "ev0"
    for k in range(1, n_merges + 1):
        enc_steps.append(f"""
        ev{k} as materialized (
            select w, {_sql_bpe_fold("string_split(s, ' ')")} as s
            from {prev} cross join b{k} m
        )""")
        prev = f"ev{k}"
    return f"""
        with {ctes},
        docw as materialized (
            select doc_id, u.i as pos, u.w from (
                select doc_id,
                       unnest([{{'i': i, 'w': l[i]}} for i in range(1, len(l) + 1)]) as u
                from (select doc_id,
                             string_split_regex(lower(text), '[^a-z]+') as l
                      from documents)
            ) where u.w <> ''
        ), ev0 as materialized (
            select w,
                   array_to_string(list_append([w[i] for i in range(1, len(w)+1)], '</w>'), ' ') as s
            from (select distinct w from docw)
        ),{','.join(enc_steps)},
        wmap as materialized (
            select w, s as toks_str, len(string_split(s, ' '))::bigint as n_toks
            from {prev}
        ), per_doc as (
            select d.doc_id, count(*)::bigint as n_words,
                   sum(m.n_toks)::bigint as n_tokens,
                   {_sql_md5_60("string_agg(m.toks_str, ' ' order by d.pos)")} as tokens_fp
            from docw d join wmap m on m.w = d.w
            group by 1
        )
        select x.doc_id,
               coalesce(p.n_words, 0)::bigint as n_words,
               coalesce(p.n_tokens, 0)::bigint as n_tokens,
               coalesce(p.tokens_fp, {_sql_md5_60("''")})::bigint as tokens_fp
        from (select doc_id from documents) x left join per_doc p using (doc_id)
    """


def _sql_escape(s: str) -> str:
    return s.replace("'", "''")


@functools.lru_cache(maxsize=None)  # pure function of constants; the
# graph build + SQL assembly is ~0.5 s of driver Python per call
def _sql_decontaminate(n: int = 3, min_overlap: float = 0.1, min_hits: int = 1) -> str:
    """DuckDB twin of q_decontaminate: the same fate-hash bench/corpus
    split, distinct word n-gram md5-60 hashes on both sides, left-join
    overlap count, rounded fraction, flag."""
    bsel = f"{_sql_md5_60(chr(39) + 'bench-v1:' + chr(39) + ' || doc_id::varchar')} % 37 = 0"
    return f"""
        with bench as (
            select text from documents where {bsel}
        ), corpus as (
            select doc_id, text from documents where not ({bsel})
        ), bsh as (
            select distinct {_sql_md5_60('ng')} as ngram_h
            from (select unnest({_sql_shingles(n)}) as ng from bench)
        ), dsh as (
            select distinct doc_id, {_sql_md5_60('ng')} as ngram_h
            from (select doc_id, unnest({_sql_shingles(n)}) as ng from corpus)
        ), agg as (
            select d.doc_id, count(*)::bigint as n_ngrams,
                   sum(case when b.ngram_h is not null then 1 else 0 end)::bigint as n_hits
            from dsh d left join bsh b using (ngram_h)
            group by 1
        )
        select c.doc_id,
               coalesce(a.n_ngrams, 0)::bigint as n_ngrams,
               coalesce(a.n_hits, 0)::bigint as n_hits,
               case when coalesce(a.n_ngrams, 0) = 0 then 0.0::double
                    else round(a.n_hits::double / a.n_ngrams, 6) end as overlap_frac,
               (case when coalesce(a.n_ngrams, 0) > 0
                      and coalesce(a.n_hits, 0) >= {min_hits}
                      and (case when coalesce(a.n_ngrams, 0) = 0 then 0.0::double
                           else round(a.n_hits::double / a.n_ngrams, 6) end)
                          >= {min_overlap}::double
                then 1 else 0 end)::int as contaminated
        from corpus c left join agg a using (doc_id)
    """


def _sql_perplexity_filter(train_pct: int = 30, alpha: float = 0.4) -> str:
    """DuckDB twin of q_perplexity_filter: same sentinel-prefixed token
    streams, fate-hash train slice, unigram/bigram counts, stupid
    backoff per transition, rounded per-doc mean log10 + ppl, tercile
    cut via quantile_cont (== Spark percentile, verified by
    q_quantiles)."""
    stream = (
        f"case when length(trim(text)) = 0 then ['<s>'] "
        f"else list_prepend('<s>', string_split({_sql_norm('text')}, ' ')) end"
    )
    tsel = f"{_sql_md5_60(chr(39) + 'lm-train-v1:' + chr(39) + ' || doc_id::varchar')} % 100 < {train_pct}"
    return f"""
        with toks as (
            select doc_id, {stream} as stream from documents
        ), train as (
            select stream from toks where {tsel}
        ), uni as (
            select w, count(*)::bigint as c_w
            from (select unnest(stream) as w from train) group by 1
        ), tot as (
            select sum(c_w)::bigint as n_total from uni
        ), bij as (
            select b.w_prev, b.w, b.c_bi, u.c_w as c_prev
            from (
                select w_prev, w, count(*)::bigint as c_bi
                from (
                    select stream[i] as w_prev, stream[i + 1] as w
                    from (select stream, unnest(range(1, len(stream))) as i from train)
                ) group by 1, 2
            ) b join uni u on u.w = b.w_prev
        ), pairs as (
            select doc_id, stream[i] as w_prev, stream[i + 1] as w
            from (select doc_id, stream, unnest(range(1, len(stream))) as i from toks)
        ), lp as (
            select p.doc_id,
                   log10(case when b.c_bi is not null then b.c_bi::double / b.c_prev
                              when u.c_w is not null then {alpha}::double * u.c_w / t.n_total
                              else {alpha}::double / t.n_total end) as lp
            from pairs p
            left join bij b on b.w_prev = p.w_prev and b.w = p.w
            left join uni u on u.w = p.w
            cross join tot t
        ), agg as (
            select doc_id, count(*)::bigint as n_tokens,
                   round(sum(lp) / count(*), 6) as logprob
            from lp group by 1
        ), sc as (
            select d.doc_id, coalesce(a.n_tokens, 0)::bigint as n_tokens,
                   a.logprob, round(power(10.0, -a.logprob), 4) as ppl
            from (select doc_id from documents) d left join agg a using (doc_id)
        ), cuts as (
            select quantile_cont(ppl, 1.0/3) as t1, quantile_cont(ppl, 2.0/3) as t2
            from sc where ppl is not null
        )
        select doc_id, n_tokens, logprob, ppl,
               case when ppl is null then 'empty'
                    when ppl <= t1 then 'head'
                    when ppl <= t2 then 'middle'
                    else 'tail' end as bucket
        from sc cross join cuts
    """


def _sql_nb_classify(train_pct: int = 70) -> str:
    """DuckDB twin of q_nb_classify: same fate-hash split, (label, w)
    counts, add-one log-domain score over in-vocab tokens, argmax with
    the (score desc, label asc) total order."""
    toks = (
        f"case when length(trim(text)) = 0 then []::varchar[] "
        f"else string_split({_sql_norm('text')}, ' ') end"
    )
    tsel = (
        f"{_sql_md5_60(chr(39) + 'nb-train-v1:' + chr(39) + ' || doc_id::varchar')}"
        f" % 100 < {train_pct}"
    )
    return f"""
        with base as (
            select doc_id, lang as label_true, {toks} as toks,
                   {tsel} as is_train
            from documents
        ), train as (select * from base where is_train
        ), test as (select * from base where not is_train
        ), cwc as (
            select label_true as label, w, count(*)::bigint as c_wc
            from (select label_true, unnest(toks) as w from train)
            group by 1, 2
        ), tc as (select label, sum(c_wc)::bigint as t_c from cwc group by 1
        ), dc as (
            select label_true as label, count(*)::bigint as n_docs
            from train group by 1
        ), vv as (select count(distinct w)::bigint as v from cwc
        ), nt as (select count(*)::bigint as n_train from train
        ), classes as (
            select tc.label,
                   ln(n_docs::double / n_train) as ln_prior,
                   ln((t_c + v)::double) as ln_denom
            from tc join dc using (label) cross join vv cross join nt
        ), tf as (
            select doc_id, w, count(*)::bigint as tf
            from (select doc_id, unnest(toks) as w from test)
            where w in (select w from cwc)
            group by 1, 2
        ), seen as (
            select doc_id, label, sum(tf * ln((c_wc + 1)::double)) as s_seen
            from tf join cwc using (w) group by 1, 2
        ), nd as (select doc_id, sum(tf)::bigint as n_d from tf group by 1
        ), grid as (
            select t.doc_id, t.label_true, c.label,
                   c.ln_prior + coalesce(s.s_seen, 0.0)
                     - coalesce(n.n_d, 0)::double * c.ln_denom as score
            from test t
            cross join classes c
            left join nd n on n.doc_id = t.doc_id
            left join seen s on s.doc_id = t.doc_id and s.label = c.label
        ), ranked as (
            select *, row_number() over (
                partition by doc_id order by score desc, label asc
            ) as rn from grid
        )
        select doc_id, label_true, label as label_pred,
               round(score, 6) as nb_logscore,
               (label = label_true)::int as correct
        from ranked where rn = 1
    """


def _sql_pmi_collocations(min_count: int = 5) -> str:
    """DuckDB twin of q_pmi_collocations: same tokenization, unigram/
    adjacent-pair counts, support filter, and the identical
    single-fraction double expression inside ln."""
    toks = (
        f"case when length(trim(text)) = 0 then []::varchar[] "
        f"else string_split({_sql_norm('text')}, ' ') end"
    )
    return f"""
        with t as (select {toks} as toks from documents
        ), uni as (
            select w, count(*)::bigint as c_w
            from (select unnest(toks) as w from t) group by 1
        ), tot as (select sum(c_w)::bigint as n_tok from uni
        ), pairs as (
            select w1, w2, count(*)::bigint as c_pair
            from (
                select toks[i] as w1, toks[i + 1] as w2
                from (select toks, unnest(range(1, len(toks))) as i from t)
            ) group by 1, 2
        ), bt as (select sum(c_pair)::bigint as n_pair from pairs)
        select p.w1, p.w2, p.c_pair,
               round(ln(
                   (p.c_pair::double * n_tok * n_tok)
                   / (n_pair::double * u1.c_w * u2.c_w)
               ), 6) as pmi
        from pairs p
        join uni u1 on u1.w = p.w1
        join uni u2 on u2.w = p.w2
        cross join tot cross join bt
        where p.c_pair >= {min_count}
    """


def _sql_char_entropy() -> str:
    """DuckDB twin of q_char_entropy: same normalized-symbol counts
    and the identical ln(n) - sum(c ln c)/n expression shape."""
    ent = "ln(sum(c)::double) - sum(c * ln(c::double)) / sum(c)"
    return f"""
        with base as (
            select doc_id, {_sql_norm('text')} as t
            from documents where length(trim(text)) > 0
        ), che as (
            select doc_id, {ent} as h, sum(c)::bigint as n
            from (
                select doc_id, sym, count(*)::bigint as c
                from (select doc_id, unnest(string_split(t, '')) as sym from base)
                group by 1, 2
            ) group by 1
        ), wde as (
            select doc_id, {ent} as h, sum(c)::bigint as n
            from (
                select doc_id, sym, count(*)::bigint as c
                from (select doc_id, unnest(string_split(t, ' ')) as sym from base)
                group by 1, 2
            ) group by 1
        )
        select d.doc_id,
               round(coalesce(che.h, 0.0), 6) as char_entropy,
               round(coalesce(wde.h, 0.0), 6) as word_entropy,
               coalesce(che.n, 0)::bigint as n_chars_norm,
               coalesce(wde.n, 0)::bigint as n_words
        from documents d
        left join che on che.doc_id = d.doc_id
        left join wde on wde.doc_id = d.doc_id
    """


def _sql_winsorize(p_lo: float = 0.01, p_hi: float = 0.99) -> str:
    """DuckDB twin of q_winsorize: quantile_cont == Spark percentile
    (pinned by q_quantiles), same clip and strict-inequality flags."""
    return f"""
        with b as (
            select event_type,
                   quantile_cont(value, {p_lo}) as lo,
                   quantile_cont(value, {p_hi}) as hi
            from events group by 1
        )
        select e.event_id, e.event_type, e.value,
               round(case when e.value is null then e.value
                          else greatest(least(e.value, b.hi), b.lo) end,
                     6) as value_w,
               case when e.value is null then 0
                    when e.value < b.lo then -1
                    when e.value > b.hi then 1
                    else 0 end as clipped
        from events e join b using (event_type)
    """


def _sql_neg_pairs(n_batches: int = 16, k: int = 3) -> str:
    """DuckDB twin of q_neg_pairs: same fate-hash batch + (hash, id)
    order, cyclic next-k stepping, self-join on (batch, target_rk)."""
    h = _sql_md5_60(chr(39) + "negbatch-v1:" + chr(39) + " || doc_id::varchar")
    return f"""
        with base as (
            select doc_id as anchor_id, h % {n_batches} as batch, h
            from (select doc_id, {h} as h from documents)
        ), ranked as (
            select anchor_id, batch,
                   row_number() over (
                       partition by batch order by h, anchor_id
                   ) as rk,
                   count(*) over (partition by batch) as bn
            from base
        ), slots as (
            select anchor_id, batch, rk, bn,
                   unnest(range(1, least({k}, bn - 1) + 1)) as slot
            from ranked
        )
        select s.anchor_id, v.anchor_id as neg_id, s.slot, s.batch
        from (
            select *, (rk - 1 + slot) % bn + 1 as target_rk from slots
        ) s
        join ranked v on v.batch = s.batch and v.rk = s.target_rk
    """


def _sql_dsir_resample(
    n_buckets: int = 256, smoothing: float = 1.0, k: int = 200
) -> str:
    """DuckDB twin of q_dsir_resample: same fate-hash target/raw
    split, unigram+bigram md5-60 bucket hashing, Laplace-smoothed
    bucket log-ratios over a dense range() spine, per-doc summed
    score, deterministic Gumbel draw, top-k cut with the
    (gkey desc, doc_id) total order."""
    tsel = f"{_sql_md5_60(chr(39) + 'dsir-target-v1:' + chr(39) + ' || doc_id::varchar')} % 11 = 0"
    feats = (
        f"case when length(trim(text)) = 0 then []::varchar[] "
        f"else list_concat({_sql_shingles(1)}, {_sql_shingles(2)}) end"
    )
    s, sb = float(smoothing), float(smoothing) * n_buckets
    m = 1 << 20  # GUMBEL_M (operators/dsir.py)
    return f"""
        with tgt as (
            select text from documents where {tsel}
        ), raw as (
            select doc_id, text from documents where not ({tsel})
        ), ft as (
            select {_sql_md5_60('g')} % {n_buckets} as bucket
            from (select unnest({feats}) as g from tgt)
        ), fr as (
            select doc_id, {_sql_md5_60('g')} % {n_buckets} as bucket
            from (select doc_id, unnest({feats}) as g from raw)
        ), cp as (
            select bucket, count(*)::bigint as c_p from ft group by 1
        ), cq as (
            select bucket, count(*)::bigint as c_q from fr group by 1
        ), tp as (select coalesce(sum(c_p), 0)::bigint as t_p from cp),
        tq as (select coalesce(sum(c_q), 0)::bigint as t_q from cq),
        lam as (
            select r.range::int as bucket,
                   ln((coalesce(c.c_p, 0) + {s}) / (t.t_p + {sb}))
                 - ln((coalesce(q.c_q, 0) + {s}) / (u.t_q + {sb})) as lam
            from range({n_buckets}) r
            left join cp c on c.bucket = r.range
            left join cq q on q.bucket = r.range
            cross join tp t cross join tq u
        ), sc as (
            select f.doc_id, count(*)::bigint as n_feats,
                   round(sum(l.lam), 6) as log_weight
            from fr f join lam l using (bucket)
            group by 1
        ), g as (
            select r.doc_id,
                   coalesce(s.n_feats, 0)::bigint as n_feats,
                   coalesce(s.log_weight, 0.0)::double as log_weight,
                   round(coalesce(s.log_weight, 0.0)
                         + -ln(-ln((({_sql_md5_60(chr(39) + 'dsir-gumbel-v1:' + chr(39) + ' || doc_id::varchar')} % {m}) + 0.5) / {float(m)})), 6)
                       as gkey
            from raw r left join sc s using (doc_id)
        )
        select doc_id, n_feats, log_weight, gkey,
               (row_number() over (order by gkey desc, doc_id) - 1)::int
                   as rank_in_limit
        from g
        order by gkey desc, doc_id
        limit {k}
    """


def _sql_crawl_reference() -> str:
    """DuckDB twin of the reference-exact crawl engine: the RAW fixture
    graph (seed listing pages with hrefs in page order incl.
    duplicates; ad pages with raw brief items) is inlined as VALUES,
    and the reference's semantics are re-derived in SQL —
    path-graft canonicalization keeping the base query
    (``DownloadLinks.scala:47-48``), per-page first-occurrence dedup
    (``:49``), the count-based unfold re-fetching the SAME page each
    round with ``left -= n_distinct`` termination (``:17-34``), exact
    stream truncation at ``count`` (``DownloadAds.scala:26-27``), and
    the brief split-colon micro-semantics with last-wins keys at
    first-occurrence position (``:49-54``, ``H2.scala:60``). Closed
    form: the page content is constant per seed, so round r schedules
    pos 0..min(n, count - r*n)-1 with seq = r*n + pos for
    r in 0..ceil(count/n)-1."""
    from olx_spark.fixtures import make_crawl_graph

    g = make_crawl_graph(hot_host_factor=2)  # same graph as q_crawl_reference
    page_vals, ad_vals = [], []
    for s in g.seeds:
        page = g.store.get_listing(s["url"])
        for i, href in enumerate(page["ad_hrefs"]):
            page_vals.append(
                f"('{_sql_escape(s['name'])}', {int(s['count'])}, "
                f"'{_sql_escape(s['url'])}', {i}, '{_sql_escape(href)}')"
            )
    for a in g.ad_pages:
        items = ", ".join(f"'{_sql_escape(it)}'" for it in a["brief_items"])
        ad_vals.append(
            f"('{_sql_escape(a['host'])}', '{_sql_escape(a['path'])}', "
            f"'{_sql_escape(a['title'])}', '{_sql_escape(a['price'])}', [{items}])"
        )
    return f"""
        with pages(name, cnt, base_url, pos_raw, href) as (values {", ".join(page_vals)}),
        ads(host, path, title, price, brief_items) as (values {", ".join(ad_vals)}),
        canon as (  -- reference graft: scheme://authority + href + base query
            select name, cnt, pos_raw, href as path,
                   regexp_extract(base_url, '^https?://([^/?#]+)', 1) as host,
                   regexp_extract(base_url, '^(https?://[^/?#]+)', 1) || href ||
                     case when contains(base_url, '?')
                          then '?' || regexp_extract(base_url, '\\?([^#]*)', 1)
                          else '' end as url
            from pages
        ),
        distinct_ads as (  -- per-page first-occurrence dedup -> pos
            select name, cnt, host, path, url,
                   row_number() over (partition by name order by pos_raw) - 1 as pos
            from (select *, row_number() over (partition by name, url
                                               order by pos_raw) as rn
                  from canon)
            where rn = 1
        ),
        counts as (
            select name, any_value(cnt) as cnt, count(*) as n
            from distinct_ads group by name
        ),
        rounds as (  -- unfold: ceil(count/n) refetches of the same page
            select name, u.i::int as rnd
            from counts cross join lateral
                 (select unnest(range(0, (cnt + n - 1) // n)) as i) u
        ),
        flat as (  -- truncate the flattened stream exactly at count
            select d.name, r.rnd as round, d.pos, d.url, d.host, d.path,
                   r.rnd * c.n + d.pos as seq
            from rounds r
            join counts c using (name)
            join distinct_ads d using (name)
            where d.pos < least(c.n, c.cnt - r.rnd * c.n)
        ),
        brief_kv as (  -- scala split(':') with trailing empties dropped
            select host, path, i,
                   string_split(rtrim(item, ':'), ':')[1] as k,
                   case when len(string_split(rtrim(item, ':'), ':')) >= 2
                        then string_split(rtrim(item, ':'), ':')[2]
                        else 'true' end as v
            from (select host, path,
                         unnest(brief_items) as item,
                         unnest(range(1, len(brief_items) + 1)) as i
                  from ads)
        ),
        brief as (  -- duplicate keys last-wins at first-occurrence position
            select host, path,
                   string_agg(k || ' -> ' || v, '; ' order by first_pos) as brief_flat
            from (select host, path, k, arg_max(v, i) as v, min(i) as first_pos
                  from brief_kv where k != '' and v != ''
                  group by host, path, k)
            group by host, path
        )
        select f.name, f.seq::bigint as seq, f.round::int as round,
               f.pos::int as pos, f.url as href, a.title, a.price,
               coalesce(b.brief_flat, '') as brief_flat
        from flat f
        join ads a on a.host = f.host and a.path = f.path
        left join brief b on b.host = f.host and b.path = f.path
    """


@functools.lru_cache(maxsize=None)  # pure; encodes/decodes 64 images
def _sql_image_features() -> str:
    """DuckDB twin of q_image_features: the expected features are
    computed INDEPENDENTLY of Spark (driver-side numpy over the same
    deterministic corpus — encode, decode, channel means, gray stddev,
    phash of the DECODED pixels) and inlined as VALUES; floats are
    emitted via repr() so they round-trip to the identical double. The
    oracle therefore checks the Spark-side plumbing (mapInPandas Arrow
    batches, schema, value transport) end to end."""
    import numpy as np

    from olx_spark.fixtures.images import (
        decode_image,
        encode_image,
        original_pixels,
        phash64,
    )

    vals = []
    for i in range(64):
        w, h, fmt, arr = original_pixels(i, seed=7)
        dec = decode_image(encode_image(arr, fmt), fmt)
        gray = dec.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        vals.append(
            f"('img-{i % 4:03d}-{i:05d}', {dec.shape[1]}, {dec.shape[0]}, "
            f"'{fmt}', {float(dec[..., 0].mean())!r}::double, "
            f"{float(gray.std())!r}::double, {phash64(dec)}, 1)"
        )
    return f"""
        select image_id, w::int as w, h::int as h, fmt,
               round(mean_r, 4) as mean_r, round(std_gray, 4) as std_gray,
               phash::bigint as phash, decode_ok::int as decode_ok
        from (values {", ".join(vals)})
             t(image_id, w, h, fmt, mean_r, std_gray, phash, decode_ok)
    """


def _sql_domain_quality() -> str:
    """DuckDB twin of q_domain_quality: same rounded per-doc quality,
    per-source and corpus means re-rounded to 6, same >= flag."""
    quality = f"""round(
                0.4 * least(1.0, ({_sql_token_count('text')}) / 100.0)
              + 0.3 * (1.0 - case when length(text) = 0 then 0.0
                    else (length(text) - length(translate(text, '.,!?;:', ''))) / length(text) end)
              + 0.3 * least(1.0, case when ({_sql_token_count('text')}) = 0 then 0.0
                    else length(trim(text)) / ({_sql_token_count('text')}) end / 8.0)
            , 6)"""
    return f"""
        with s as (
            select doc_id, source, {quality} as score from documents
        ), h as (
            select source, count(*)::bigint as host_n,
                   round(avg(score), 6) as host_quality
            from s group by 1
        ), g as (select round(avg(score), 6) as gq from s)
        select s.doc_id, s.source, h.host_n, h.host_quality,
               (h.host_quality >= g.gq)::int as domain_ok
        from s join h using (source) cross join g
    """


def _sql_url_templates() -> str:
    """DuckDB twin of q_url_templates: identical url synthesis from
    events, the same hex-then-digit regexp_replace chain ('g' flag =
    Spark's replace-all), the same two-phase distinct/hits agg and
    >100 trap threshold."""
    return """
        with u as (
            select 'h' || (event_id % 8)::varchar as host,
                   case when event_id % 3 = 0 then
                       'https://h' || (event_id % 8)::varchar
                       || '.example/cal/' || event_id::varchar || '/view'
                   when event_id % 3 = 1 then
                       'https://h' || (event_id % 8)::varchar
                       || '.example/item/'
                       || substring(md5(event_id::varchar), 1, 16) || '/p'
                   else
                       'https://h' || (event_id % 8)::varchar
                       || '.example/page/' || (event_id % 30)::varchar
                   end as url
            from events
        ), t as (
            select host, url,
                   regexp_replace(
                       regexp_replace(url, '[0-9a-f]{8,}', '{h}', 'g'),
                       '[0-9]+', '{d}', 'g') as template
            from u
        ), per_url as (
            select host, template, url, count(*)::bigint as hits
            from t group by 1, 2, 3
        )
        select host, template, count(*)::bigint as n_urls,
               sum(hits)::bigint as n_hits, min(url) as sample_url,
               (count(*) > 100)::int as is_trap
        from per_url group by 1, 2
    """


def _sql_seed_distance() -> str:
    """DuckDB twin of q_seed_distance: true recursive-CTE BFS — UNION
    (not UNION ALL) prunes repeated (id, dist) rows so the recursion
    terminates; min(dist) per node is the BFS distance; the dist < 6
    guard is the same depth cap as the Spark loop's max_hops."""
    return """
        with recursive e as (
            select distinct event_id % 2000 as src,
                   (user_id * 13 + event_id * 7 + 1) % 2000 as dst
            from events
        ), r(id, dist) as (
            select * from (values (0::bigint, 0), (1::bigint, 0),
                                  (2::bigint, 0)) s(id, dist)
            union
            select e.dst, r.dist + 1
            from r join e on e.src = r.id
            where r.dist < 6
        )
        select id, min(dist)::int as dist from r group by 1
    """


def _sql_sniff_types() -> str:
    """DuckDB twin of q_sniff_types: the payload is exactly 12 bytes,
    so hex(substring(bytes,1,12)) == the constructed hex string — the
    oracle applies the same ordered prefix-case directly to it."""
    return """
        with p as (
            select event_id as id,
                   event_id % 8 as k,
                   upper(md5(event_id::varchar)) as filler
            from events
        ), h as (
            select id, k,
                   case k
                     when 0 then 'FFD8FF' || substring(filler, 1, 18)
                     when 1 then '89504E470D0A1A0A' || substring(filler, 1, 8)
                     when 2 then '47494638' || substring(filler, 1, 16)
                     when 3 then '424D' || substring(filler, 1, 20)
                     when 4 then '52494646' || substring(filler, 1, 8) || '57415645'
                     when 5 then '1F8B' || substring(filler, 1, 20)
                     when 6 then '255044462D' || substring(filler, 1, 14)
                     else '3C68746D6C3E' || substring(filler, 1, 12)
                   end as hx,
                   (['jpeg','png','gif','bmp','wav','gzip','pdf','html'])[
                       ((k + case when id % 13 = 0 then 1 else 0 end) % 8)::int + 1
                   ] as declared
            from p
        )
        select id, declared,
               case
                 when substring(hx, 1, 16) = '89504E470D0A1A0A' then 'png'
                 when substring(hx, 1, 8) = '47494638' then 'gif'
                 when substring(hx, 1, 6) = 'FFD8FF' then 'jpeg'
                 when substring(hx, 1, 10) = '255044462D' then 'pdf'
                 when substring(hx, 1, 4) = '1F8B' then 'gzip'
                 when substring(hx, 1, 4) = '424D' then 'bmp'
                 when substring(hx, 1, 8) = '52494646' then
                   case when substring(hx, 17, 8) = '57415645'
                        then 'wav' else 'riff' end
                 when substring(hx, 1, 2) = '3C' then 'html'
                 else 'unknown'
               end as sniffed,
               (declared != (case
                 when substring(hx, 1, 16) = '89504E470D0A1A0A' then 'png'
                 when substring(hx, 1, 8) = '47494638' then 'gif'
                 when substring(hx, 1, 6) = 'FFD8FF' then 'jpeg'
                 when substring(hx, 1, 10) = '255044462D' then 'pdf'
                 when substring(hx, 1, 4) = '1F8B' then 'gzip'
                 when substring(hx, 1, 4) = '424D' then 'bmp'
                 when substring(hx, 1, 8) = '52494646' then
                   case when substring(hx, 17, 8) = '57415645'
                        then 'wav' else 'riff' end
                 when substring(hx, 1, 2) = '3C' then 'html'
                 else 'unknown'
               end))::int as mismatch
        from h
    """


def _sql_boilerplate(frac_ppm: int = 500_000, min_df: int = 2) -> str:
    """DuckDB twin of q_boilerplate: same line construction (footer +
    even-doc nav + 5-word chunks), same per-(source, line) distinct-doc
    frequency, same exact integer-ppm cut, same per-doc rollup."""
    return f"""
        with base as (
            select doc_id, source, string_split(text, ' ') as ws
            from documents
        ), lines as (
            select doc_id, source,
                   '(c) ' || source || ' all rights reserved' as line
            from base
            union all
            select doc_id, source, 'home | about | ' || source
            from base where doc_id % 2 = 0
            union all
            select b.doc_id, b.source,
                   array_to_string(b.ws[t.i*5+1 : t.i*5+5], ' ') as line
            from base b,
                 unnest(range(cast(ceil(len(b.ws)/5.0) as bigint))) as t(i)
        ), ldf as (
            select source, line, count(distinct doc_id) as df_docs
            from lines group by 1, 2
        ), totals as (
            select source, count(distinct doc_id) as n_docs
            from lines group by 1
        ), boiler as (
            select l.source, l.line
            from ldf l join totals t using (source)
            where l.df_docs >= {min_df}
              and l.df_docs * 1000000 >= {frac_ppm} * t.n_docs
        ), flagged as (
            select ln.doc_id, ln.source, ln.line,
                   case when b.line is not null then 1 else 0 end as is_b
            from lines ln
            left join boiler b
              on ln.source = b.source and ln.line = b.line
        )
        select doc_id, source,
               count(*)::bigint as n_lines,
               sum(is_b)::bigint as n_boiler,
               sum(case when is_b = 0 then length(line) else 0 end)::bigint
                   as kept_chars,
               round(sum(is_b)::double / count(*), 6) as boiler_frac
        from flagged group by 1, 2
    """


def _sql_rate_limit_audit(window_s: int = 3600, cap: int = 5) -> str:
    """DuckDB twin of q_rate_limit_audit: identical RANGE frame."""
    return f"""
        with log as (
            select event_id,
                   'h' || (user_id % 20)::varchar as host,
                   floor(date_part('epoch', ts))::bigint as ts_s
            from events
        )
        select event_id, host, ts_s,
               count(*) over (partition by host order by ts_s
                              range between {window_s} preceding
                                        and current row)::bigint
                   as n_in_window,
               (count(*) over (partition by host order by ts_s
                               range between {window_s} preceding
                                         and current row) > {cap})::int
                   as violation
        from log
    """


def _sql_budget_alloc(total: int = 1000) -> str:
    """DuckDB twin of q_budget_alloc: same integer weights, same
    (w*T)/S double quota, floor base, (frac desc, host asc) remainder
    ranking."""
    return f"""
        with h as (
            select 'h' || (user_id % 50)::varchar as host,
                   count(*)::bigint as weight
            from events group by 1
        ), q as (
            select host, weight,
                   weight::double * {total}.0
                       / (select sum(weight)::double from h) as quota
            from h where weight > 0
        ), b as (
            select host, weight, floor(quota)::bigint as base,
                   quota - floor(quota) as frac
            from q
        ), r as (
            select host,
                   row_number() over (order by frac desc, host asc) as rn
            from b
        ), k as (
            select {total} - sum(base) as kk from b
        )
        select b.host, b.weight, b.base,
               (r.rn <= (select kk from k))::int as extra,
               (b.base + (r.rn <= (select kk from k))::int)::bigint as alloc
        from b join r using (host)
    """


def _sql_redirect_resolve() -> str:
    """DuckDB twin of q_redirect_resolve: a TRUE recursive-CTE walk of
    the functional redirect map — terminal rows found by NOT EXISTS
    anti-join, sources with no terminal row within the hop cap (chains
    are <= 4; cycles walk the cap out) are cycles."""
    return """
        with recursive e0 as (
            select 'u' || event_id::varchar as src,
                   'u' || (event_id - 1)::varchar as dst
            from events where event_id % 5 <> 0
            union all
            select 'u' || event_id::varchar,
                   'u' || (event_id + 4)::varchar
            from events
            where event_id % 5 = 0 and (event_id // 5) % 10 = 0
        ), fmap as (
            select src, min(dst) as dst from e0
            where src <> dst group by 1
        ), walk(src, cur, hops) as (
            select src, dst, 1::bigint from fmap
            union all
            select w.src, f.dst, w.hops + 1
            from walk w join fmap f on f.src = w.cur
            where w.hops <= 8
        ), term as (
            select w.src, w.cur, w.hops from walk w
            where not exists (select 1 from fmap f where f.src = w.cur)
        )
        select f.src,
               t.cur as final_url,
               t.hops,
               (t.src is null)::int as is_cycle
        from fmap f left join term t on t.src = f.src
    """


def _sql_host_mirrors(min_containment: float = 0.3, min_shared: int = 2) -> str:
    """DuckDB twin of q_host_mirrors: identical fp/host synthesis,
    distinct (fp, host) pairing, containment + jaccard math."""
    return f"""
        with km as (
            select distinct
                   'f' || (case when doc_id % 3 = 0
                                then doc_id % 101 + 1000
                                else doc_id % 23 end)::varchar as k,
                   'h' || (doc_id % 7)::varchar as m
            from documents
        ), hot as (
            select k from km group by k having count(*) > 64
        ), cold as (
            select * from km where k not in (select k from hot)
        ), pairs as (
            select a.m as host_a, b.m as host_b, count(*)::bigint as shared
            from cold a join cold b on a.k = b.k and a.m < b.m
            group by 1, 2
        ), sizes as (
            select m, count(*)::bigint as n from km group by 1
        )
        select p.host_a, p.host_b, p.shared, sa.n as n_a, sb.n as n_b,
               p.shared / least(sa.n, sb.n)::double as containment,
               p.shared / (sa.n + sb.n - p.shared)::double as jaccard
        from pairs p
        join sizes sa on sa.m = p.host_a
        join sizes sb on sb.m = p.host_b
        where p.shared >= {int(min_shared)}
          and p.shared / least(sa.n, sb.n)::double >= {float(min_containment)}
    """


def _sql_containment(
    n: int = 4, min_containment: float = 0.6, min_shingles: int = 5
) -> str:
    """DuckDB twin of q_containment: same corpus + planted prefix
    quotes; word n-grams built as a list comprehension over
    generate_series (inclusive list slices), then the same
    guard/pair/containment pipeline."""
    return f"""
        with d as (
            select doc_id, text from documents where doc_id % 5 = 0
            union all
            select doc_id + 100000, substring(text, 1, 150)
            from documents where doc_id % 10 = 0
        ), tok as (
            select doc_id,
                   list_filter(string_split_regex(lower(text),
                                                  '[^a-z0-9]+'),
                               x -> x <> '') as toks
            from d
        ), sharr as (
            select doc_id,
                   list_distinct(
                       [array_to_string(toks[i:i + {n - 1}], ' ')
                        for i in generate_series(
                            1, greatest(len(toks) - {n - 1}, 0))]) as sha
            from tok
        ), sh as (
            select distinct doc_id, unnest(sha) as g from sharr
        ), sizes as (
            select doc_id, count(*)::bigint as n from sh group by 1
        ), elig as (
            select * from sizes where n >= {int(min_shingles)}
        ), shd as (
            select sh.* from sh join elig using (doc_id)
        ), hot as (
            select g from shd group by g having count(*) > 64
        ), cold as (
            select * from shd where g not in (select g from hot)
        ), pairs as (
            select a.doc_id as da, b.doc_id as db, count(*)::bigint as shared
            from cold a join cold b on a.g = b.g and a.doc_id < b.doc_id
            group by 1, 2
        ), directed as (
            select da as doc_id, db as in_doc_id, shared from pairs
            union all
            select db, da, shared from pairs
        )
        select d.doc_id, d.in_doc_id, d.shared, e.n as n_shingles,
               d.shared / e.n::double as containment
        from directed d join elig e on e.doc_id = d.doc_id
        where d.shared / e.n::double >= {float(min_containment)}
    """


def _sql_change_rate() -> str:
    """DuckDB twin of q_change_rate: the same bias-reduced Poisson
    estimator, structurally identical double math (ln/div order), and
    the same r_hat <= 0 clamp instead of a divide-by-zero."""
    return """
        with o as (
            select user_id as url_fp,
                   case when event_id % 3 = 0 then 1 else 0 end as changed,
                   (600 + (event_id % 7) * 300)::double as interval_s
            from events
        ), a as (
            select url_fp, count(*)::bigint as n_obs,
                   sum(changed)::bigint as n_changed,
                   sum(interval_s) as sum_int
            from o group by 1 having count(*) >= 2
        ), m as (
            select url_fp, n_obs, n_changed,
                   sum_int / n_obs as avg_int,
                   -ln((n_obs - n_changed + 0.5) / (n_obs + 0.5)) as r_hat
            from a
        )
        select url_fp, n_obs, n_changed,
               avg_int as avg_interval_s,
               (r_hat / avg_int) * 86400.0 as lambda_per_day,
               case when r_hat <= 0 then avg_int * 8
                    else least(greatest(1.0 / (r_hat / avg_int),
                                        avg_int / 8),
                               avg_int * 8) end as next_interval_s
        from m
    """


def _sql_edit_verify(min_ratio: float = 0.6, max_len: int = 400) -> str:
    """DuckDB twin of q_edit_verify: full (unthresholded) levenshtein
    on the same truncated texts — equivalent to Spark's banded form
    w.r.t. the ratio filter, since any short-circuited distance is
    provably below threshold."""
    return f"""
        with d as (
            select doc_id, substring(text, 1, {int(max_len)}) as t
            from documents
            union all
            select doc_id + 200000,
                   substring('x' || substring(text, 2), 1, {int(max_len)})
            from documents where doc_id % 6 = 0
        ), p as (
            select doc_id as doc_a, doc_id + 1 as doc_b
            from documents where doc_id % 4 = 0
            union all
            select doc_id, doc_id + 200000
            from documents where doc_id % 6 = 0
        ), s as (
            select p.doc_a, p.doc_b,
                   levenshtein(a.t, b.t)::bigint as lev,
                   length(a.t)::bigint as len_a,
                   length(b.t)::bigint as len_b
            from p
            join d a on a.doc_id = p.doc_a
            join d b on b.doc_id = p.doc_b
        )
        select doc_a, doc_b, lev, len_a, len_b,
               1.0 - lev / greatest(len_a, len_b, 1)::double as ratio
        from s
        where 1.0 - lev / greatest(len_a, len_b, 1)::double
              >= {float(min_ratio)}
    """


def _sql_sitemap_entries() -> str:
    """DuckDB twin of q_sitemap_entries: the expected typed rows
    synthesized DIRECTLY from events — no XML, no parsing — so the
    Spark side's build→parse round trip is independently checked."""
    return """
        with u as (
            select 'h' || (event_id % 8)::varchar || '.example' as host,
                   'url' as entry_type,
                   'https://h' || (event_id % 8)::varchar
                       || '.example/p/' || event_id::varchar as loc,
                   case when event_id % 3 = 0 then
                       ('2024-01-'
                        || lpad(((event_id % 28) + 1)::varchar, 2, '0')
                       )::timestamp
                   end as lastmod,
                   case when event_id % 5 = 0
                        then 0.8::double else 0.5::double end as priority,
                   case when event_id % 7 = 0 then 'daily' else '' end
                       as changefreq
            from events
        ), idx as (
            select distinct 'hub.example' as host, 'sitemap' as entry_type,
                   'https://h' || (event_id % 8)::varchar
                       || '.example/sitemap.xml' as loc,
                   cast(null as timestamp) as lastmod,
                   0.5::double as priority, '' as changefreq
            from events
        )
        select * from u union all select * from idx
    """


def _sql_vocab_coverage(top_k: int = 200) -> str:
    """DuckDB twin of q_vocab_coverage: same bigram synthesis, global
    window rank + running coverage (the single-partition spelling the
    Spark side deliberately avoids)."""
    return f"""
        with base as (
            select string_split(text, ' ') as ws from documents
        ), terms as (
            select b.ws[t.i] || ' ' || b.ws[t.i+1] as term
            from base b, unnest(range(1, len(b.ws))) as t(i)
        ), c as (
            select term, count(*) as cnt from terms group by 1
        ), r as (
            select term, cnt,
                   row_number() over w as rank,
                   sum(cnt) over (order by cnt desc, term asc
                                  rows unbounded preceding) as cum
            from c
            window w as (order by cnt desc, term asc)
        )
        select term, cnt::bigint as cnt, rank::bigint as rank,
               round(cum / (select sum(cnt)::double from c), 6) as cum_frac,
               (rank <= {top_k})::int as in_vocab
        from r
    """


def _sql_anchor_profile() -> str:
    """DuckDB twin of q_anchor_profile: same link synthesis, same
    histogram, row_number replay of the (cnt desc, anchor asc)
    argmax, same distinct-src counts."""
    return """
        with links as (
            select event_id % 500 as src_fp,
                   (event_id * 7 + user_id) % 200 as dst_fp,
                   case user_id % 5
                        when 0 then 'click here' when 1 then 'home'
                        when 2 then 'buy now' when 3 then 'details'
                        else 'next page' end as anchor
            from events
        ), hist as (
            select dst_fp, anchor, count(*) as cnt
            from links group by 1, 2
        ), top as (
            select dst_fp, anchor as top_anchor, cnt as top_anchor_n,
                   row_number() over (partition by dst_fp
                                      order by cnt desc, anchor asc) as rn
            from hist
        ), agg as (
            select dst_fp, sum(cnt)::bigint as n_links,
                   count(*)::bigint as n_unique_anchors
            from hist group by 1
        ), srcs as (
            select dst_fp, count(distinct src_fp)::bigint as n_unique_srcs
            from links group by 1
        )
        select a.dst_fp, a.n_links, s.n_unique_srcs, a.n_unique_anchors,
               t.top_anchor, t.top_anchor_n::bigint as top_anchor_n
        from agg a
        join srcs s using (dst_fp)
        join top t using (dst_fp)
        where t.rn = 1
    """


def _sql_scd2_history() -> str:
    """DuckDB twin of q_scd2_history: same (ts, obs_id) ordering, same
    lag change-points, running-sum version ids, per-version rollup,
    lead valid_to and is_current flag."""
    return """
        with o as (
            select event_id % 300 as url_fp, ts as fetch_ts,
                   event_id as obs_id,
                   substring(md5((event_id % 300)::varchar || '#'
                                 || (user_id % 4)::varchar), 1, 12)
                       as content_hash
            from events
        ), c as (
            select *,
                   case when lag(content_hash) over w is null
                          or content_hash != lag(content_hash) over w
                        then 1 else 0 end as chg
            from o
            window w as (partition by url_fp order by fetch_ts, obs_id)
        ), r as (
            select *, sum(chg) over (partition by url_fp
                                     order by fetch_ts, obs_id
                                     rows unbounded preceding) as version
            from c
        ), per as (
            select url_fp, version, min(content_hash) as content_hash,
                   min(fetch_ts) as valid_from, count(*)::bigint as n_obs
            from r group by 1, 2
        )
        select url_fp, version::int as version, content_hash, valid_from,
               lead(valid_from) over wv as valid_to, n_obs,
               case when lead(valid_from) over wv is null then 1 else 0 end
                   as is_current
        from per
        window wv as (partition by url_fp order by version)
    """


def _sql_blur_scores(blur_threshold: float = 100.0) -> str:
    """DuckDB twin of q_blur_scores: exact Laplacian sums computed
    INDEPENDENTLY driver-side (numpy over the same corpus) inlined as
    VALUES; variance/flag derived by the same double expression."""
    import numpy as np

    from olx_spark.fixtures.images import decode_image, encode_image, original_pixels

    vals = []
    for i in range(64):
        w, h, fmt, arr = original_pixels(i, seed=7)
        dec = decode_image(encode_image(arr, fmt), fmt)
        n = s = s2 = 0
        if dec.shape[0] >= 3 and dec.shape[1] >= 3:
            g = dec.astype(np.int64).sum(axis=2)
            lap = (
                g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2]
                + g[1:-1, 2:] - 4 * g[1:-1, 1:-1]
            )
            n, s, s2 = int(lap.size), int(lap.sum()), int((lap * lap).sum())
        vals.append(f"('img-{i % 4:03d}-{i:05d}', {n}, {s}, {s2}, 1)")
    return f"""
        with t as (
            select * from (values {", ".join(vals)})
                 v(image_id, n_lap, sum_lap, sum_lap2, decode_ok)
        ), d as (
            select *, case when n_lap > 0 then
                (sum_lap2::double - sum_lap::double * sum_lap / n_lap) / n_lap
                else 0.0 end as var_raw
            from t
        )
        select image_id, n_lap::bigint as n_lap, sum_lap::bigint as sum_lap,
               sum_lap2::bigint as sum_lap2, decode_ok::int as decode_ok,
               round(var_raw, 6) as var_lap,
               (round(var_raw, 6) < {blur_threshold})::int as is_blurry
        from d
    """


def _sql_image_borders() -> str:
    """DuckDB twin of q_image_borders: exact border runs computed
    INDEPENDENTLY driver-side (numpy edge-run scans over the same
    planted corpus, decoding through the same lossless codecs) inlined
    as VALUES; content_frac/is_boxed derived by the same expression."""
    import numpy as np

    from olx_spark.fixtures.images import (
        decode_image,
        encode_image,
        letterbox_pixels,
    )

    def run(mask, from_end=False):
        m = mask[::-1] if from_end else mask
        return int(m.size) if m.all() else int(np.argmin(m))

    vals = []
    for i in range(64):
        if i % 8 == 5:
            vals.append(f"('box-{i:05d}', 0, 0, 0, 0, 0, 0, 0)")
            continue
        _, _, fmt, arr = letterbox_pixels(i, seed=9)
        dec = decode_image(encode_image(arr, fmt), fmt)
        h, w = int(dec.shape[0]), int(dec.shape[1])
        tl, brc = dec[0, 0], dec[h - 1, w - 1]
        bt = run((dec == tl).all(axis=(1, 2)))
        bb = run((dec == brc).all(axis=(1, 2)), True)
        bl = run((dec == tl).all(axis=(0, 2)))
        br = run((dec == brc).all(axis=(0, 2)), True)
        vals.append(
            f"('box-{i:05d}', {w}, {h}, {bt}, {bb}, {bl}, {br}, 1)"
        )
    return f"""
        with t as (
            select * from (values {", ".join(vals)})
                 v(image_id, w, h, border_top, border_bottom,
                   border_left, border_right, decode_ok)
        )
        select image_id, w::int as w, h::int as h,
               border_top::int as border_top,
               border_bottom::int as border_bottom,
               border_left::int as border_left,
               border_right::int as border_right,
               decode_ok::int as decode_ok,
               case when w > 0 and h > 0 then
                   round(greatest(h - border_top - border_bottom, 0)
                         * greatest(w - border_left - border_right, 0)
                         / (w::double * h), 6)
                   else 0.0 end as content_frac,
               ((4 * (border_top + border_bottom) >= h
                 or 4 * (border_left + border_right) >= w)
                and decode_ok = 1 and h > 0)::int as is_boxed
        from t
    """


def _sql_tile_stats(grid: int = 4) -> str:
    """DuckDB twin of q_tile_stats: expected tiles computed
    INDEPENDENTLY of Spark (driver-side numpy decode + the same
    floor(k*dim/g) boundary math over the same deterministic corpus)
    and inlined as VALUES — every value an exact integer, so this is
    a full-hash plumbing oracle for the distributed decode + tiling."""
    import numpy as np

    from olx_spark.fixtures.images import (
        decode_image,
        encode_image,
        original_pixels,
    )

    vals = []
    for i in range(64):
        w, h, fmt, arr = original_pixels(i, seed=7)
        dec = decode_image(encode_image(arr, fmt), fmt).astype(np.int64)
        hh, ww = dec.shape[:2]
        g = min(grid, hh, ww)
        rb = (np.arange(g, dtype=np.int64) * hh) // g
        cb = (np.arange(g, dtype=np.int64) * ww) // g
        t = np.add.reduceat(np.add.reduceat(dec, rb, axis=0), cb, axis=1)
        hs = np.diff(np.append(rb, hh))
        ws = np.diff(np.append(cb, ww))
        for tr in range(g):
            for tc in range(g):
                vals.append(
                    f"('img-{i % 4:03d}-{i:05d}', {tr}, {tc}, "
                    f"{int(hs[tr] * ws[tc])}, {int(t[tr, tc, 0])}, "
                    f"{int(t[tr, tc, 1])}, {int(t[tr, tc, 2])})"
                )
    return f"""
        select image_id, tile_r::int as tile_r, tile_c::int as tile_c,
               n_px::bigint as n_px, sum_r::bigint as sum_r,
               sum_g::bigint as sum_g, sum_b::bigint as sum_b
        from (values {", ".join(vals)})
             t(image_id, tile_r, tile_c, n_px, sum_r, sum_g, sum_b)
    """


def _sql_normalize_images() -> str:
    """DuckDB twin of q_normalize_images: expected features computed
    INDEPENDENTLY of Spark — driver numpy decode, the identical exact-
    integer contrast stretch, then the same feature math over the
    stretched pixels — inlined as VALUES (floats via repr for exact
    double round-trip)."""
    import numpy as np

    from olx_spark.fixtures.images import (
        decode_image,
        encode_image,
        original_pixels,
        phash64,
    )

    vals = []
    for i in range(64):
        w, h, fmt, arr = original_pixels(i, seed=7)
        dec = decode_image(encode_image(arr, fmt), fmt).astype(np.int64)
        mn, mx = int(dec.min()), int(dec.max())
        span = mx - mn
        out = (
            np.zeros_like(dec)
            if span == 0
            else ((dec - mn) * 510 + span) // (2 * span)
        ).astype(np.uint8)
        # round-trip through the png encoder exactly like the operator
        out = decode_image(encode_image(out, "png"), "png")
        gray = out.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        vals.append(
            f"('img-{i % 4:03d}-{i:05d}', {out.shape[1]}, {out.shape[0]}, "
            f"'png', {float(out[..., 0].mean())!r}::double, "
            f"{float(gray.std())!r}::double, {phash64(out)}, 1)"
        )
    return f"""
        select image_id, w::int as w, h::int as h, fmt,
               round(mean_r, 4) as mean_r, round(std_gray, 4) as std_gray,
               phash::bigint as phash, decode_ok::int as decode_ok
        from (values {", ".join(vals)})
             t(image_id, w, h, fmt, mean_r, std_gray, phash, decode_ok)
    """


def _sql_curate_images() -> str:
    """DuckDB twin of q_curate_images: embeds the corpus METADATA as
    VALUES and replays the rule LOGIC itself (thresholds, precedence,
    survivor-only phash dedup window) — a logic twin, not an inlined
    expected-output table, so a semantics drift in either engine's
    rule chain fails the hash."""
    vals = []
    for image_id, w, h, caption, phash in _curation_corpus_rows():
        cap = "NULL" if caption is None else f"'{_sql_escape(caption)}'"
        vals.append(f"('{image_id}', {w}, {h}, {cap}, {phash})")
    return f"""
        with src as (
            select * from (values {", ".join(vals)})
                 t(image_id, w, h, caption, phash)
        ), meta as (
            select image_id, phash,
                case when trim(coalesce(caption, '')) = '' then 0
                     else len(string_split_regex(trim(caption), '\\s+')) end as n_words,
                case when len(coalesce(caption, '')) = 0 then 0.0
                     else len(regexp_replace(coalesce(caption, ''), '[^a-zA-Z ]', '', 'g'))::double
                          / len(caption) end as alpha_frac
            from src
        ), staged as (
            select meta.image_id, meta.phash, n_words,
                case when least(m.w, m.h) < 48 then 'resolution'
                     when greatest(m.w, m.h)::double / least(m.w, m.h) > 2.5 then 'aspect'
                     when n_words < 2 then 'caption_short'
                     when n_words > 64 then 'caption_long'
                     when alpha_frac < 0.5 then 'caption_quality'
                     else '' end as meta_reason
            from meta join src m using (image_id)
        ), ranked as (
            select *, row_number() over (
                partition by phash, (meta_reason = '') order by image_id
            ) as rn
            from staged
        )
        select image_id, n_words::int as n_words,
               case when meta_reason <> '' then meta_reason
                    when rn > 1 then 'dup_phash' else '' end as drop_reason,
               (case when meta_reason <> '' then meta_reason
                     when rn > 1 then 'dup_phash' else '' end = '')::int as kept
        from ranked
    """


def _sql_clip_filter() -> str:
    """DuckDB twin of q_clip_filter: embeds the corpus (image_id,
    caption) as VALUES, re-derives the SAME md5_60 pseudo-embeddings,
    and expresses the filter by its SEMANTICS — row_number over
    (cosine desc, image_id) <= ceil(0.25 * n) — not by replaying the
    histogram/boundary scale machinery, so a selection drift in that
    machinery fails the hash."""
    vals = []
    for image_id, _w, _h, caption, _phash in _curation_corpus_rows():
        cap = "NULL" if caption is None else f"'{_sql_escape(caption)}'"
        vals.append(f"('{image_id}', {cap})")
    h60 = "(('0x' || substr(md5({e}), 1, 15))::bigint)"
    iv = h60.format(e="'img:' || image_id || ':' || j::varchar")
    tv = h60.format(e="'txt:' || coalesce(caption, '') || ':' || j::varchar")
    return f"""
        with src as (
            select * from (values {", ".join(vals)}) t(image_id, caption)
        ), vecs as (
            select image_id,
                [(({iv} % 2001) - 1000) / 1000.0 for j in range(0, {_CLIP_D})] as a,
                [(({tv} % 2001) - 1000) / 1000.0 for j in range(0, {_CLIP_D})] as b
            from src
        ), scored as (
            select image_id,
                list_sum([a[i] * b[i] for i in range(1, len(a) + 1)]) /
                (sqrt(list_sum([x * x for x in a])) *
                 sqrt(list_sum([x * x for x in b]))) as cs
            from vecs
        ), ranked as (
            select image_id, cs,
                row_number() over (order by cs desc, image_id) as rn,
                count(*) over () as n
            from scored
        )
        select image_id, round(cs, 6) as clip_score,
               (rn <= ceil(0.25 * n))::int as kept
        from ranked
    """


def _sql_ar_batches(batch_size: int = 4, n_sub: int = 4) -> str:
    """DuckDB twin of q_ar_batches: embeds the corpus metadata AND the
    same bucket ladder as VALUES and replays the logic — exact
    integer cross-ratio argmin (ties to the smaller bucket id), salted
    (h % n_sub, h, id) order within a bucket, full-batch cut — so a
    drift in ladder generation, assignment or the two-phase prefix
    machinery fails the hash. The cross-ratio is one IEEE division of
    exact integer products in both engines: bit-identical, no ln()."""
    from olx_spark.operators.packing import ar_bucket_ladder

    src = ", ".join(
        f"('{image_id}', {w}, {h})"
        for image_id, w, h, _cap, _ph in _curation_corpus_rows()
    )
    ladder = ", ".join(
        f"({bid}, {bw}, {bh})" for bid, (bw, bh) in enumerate(ar_bucket_ladder())
    )
    return f"""
        with src as (
            select * from (values {src}) t(image_id, w, h)
        ), ladder as (
            select * from (values {ladder}) t(bid, bw, bh)
        ), asg as (
            select image_id, bid, bw, bh from (
                select s.image_id, l.bid, l.bw, l.bh,
                    row_number() over (partition by s.image_id order by
                        greatest(s.w::bigint * l.bh, s.h::bigint * l.bw)::double
                        / least(s.w::bigint * l.bh, s.h::bigint * l.bw),
                        l.bid) as rn
                from src s cross join ladder l
                where s.w > 0 and s.h > 0
            ) where rn = 1
        ), hh as (
            select image_id, bid, bw, bh,
                   {_sql_md5_60("'arb-v1:' || image_id")} as h
            from asg
        ), idx as (
            select image_id, bid as bucket_id, bw as bucket_w, bh as bucket_h,
                row_number() over (partition by bid
                    order by h % {n_sub}, h, image_id) - 1 as sample_idx,
                count(*) over (partition by bid) as total
            from hh
        )
        select image_id, bucket_id, bucket_w, bucket_h, sample_idx,
               (sample_idx // {batch_size}) as batch_id,
               sample_idx % {batch_size} as slot
        from idx
        where sample_idx < (total // {batch_size}) * {batch_size}
    """


def _sql_cluster_sample(
    n_clusters: int = 16, dim: int = 64, cap: int = 4, seed: int = 7
) -> str:
    """DuckDB twin of q_cluster_sample: same seeded-constant centroids
    and argmax cell assignment as _sql_ivf_ann (ties to the larger
    cid), then the stratified per-cell salted rank (md5-60 of
    'cluster-v1:' || vec_id) capped at ``cap``."""
    from olx_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_clusters, seed)
    rows = ", ".join(
        f"({ci}, [" + ", ".join(repr(float(x)) for x in cv) + "])"
        for ci, cv in enumerate(cents)
    )
    return f"""
        with c as (
            select vec_id, [x::double for x in embedding] as v from embeddings
        ), cents(cid, cv) as (values {rows}),
        dots as (
            select vec_id, cid,
                   list_sum([v[i] * cv[i] for i in range(1, {dim + 1})]) as d
            from c cross join cents
        ), cells as (
            select vec_id, cid as cell from (
                select vec_id, cid,
                       row_number() over (partition by vec_id
                           order by d desc, cid desc) as rn
                from dots
            ) where rn = 1
        ), r as (
            select vec_id, cell,
                   row_number() over (partition by cell order by
                       {_sql_md5_60("'cluster-v1:' || vec_id::varchar")}, vec_id
                   ) - 1 as rank_in_limit
            from cells
        )
        select vec_id, cell, rank_in_limit
        from r where rank_in_limit < {cap}
    """


@functools.lru_cache(maxsize=None)  # pure; decodes 48 jpeg images
def _sql_jpeg_features(n: int = 48, seed: int = 13) -> str:
    """DuckDB twin of q_jpeg_features: expected features computed by
    decoding the SAME jpeg bytes with the same pure-numpy codec on the
    driver, inlined as VALUES (repr() floats round-trip exactly). The
    corpus tuples are shared with the query via _image_corpus_rows, so
    both sides see byte-identical input."""
    import numpy as np

    from olx_spark.fixtures.images import decode_image, phash64

    vals = []
    for image_id, data, fmt in _image_corpus_rows("jpeg", n, seed):
        dec = decode_image(data, fmt)
        gray = dec.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        vals.append(
            f"('{image_id}', {dec.shape[1]}, {dec.shape[0]}, '{fmt}', "
            f"{float(dec[..., 0].mean())!r}::double, "
            f"{float(gray.std())!r}::double, {phash64(dec)}, 1)"
        )
    return f"""
        select image_id, w::int as w, h::int as h, fmt,
               round(mean_r, 4) as mean_r, round(std_gray, 4) as std_gray,
               phash::bigint as phash, decode_ok::int as decode_ok
        from (values {", ".join(vals)})
             t(image_id, w, h, fmt, mean_r, std_gray, phash, decode_ok)
    """


def _sql_consistent_shard() -> str:
    """DuckDB twin of q_consistent_shard: the identical ring (same
    md5-60 vnode positions, inlined as VALUES) resolved per key with
    a filtered arg_min + wraparound fallback."""
    from olx_spark.functions.urls import consistent_ring

    ring = consistent_ring([f"w{i}" for i in range(8)], 16)
    vals = ", ".join(f"({p}, '{w}')" for p, w in ring)
    wrap = ring[0][1]
    return f"""
        with ring(p, w) as (values {vals}),
        d as (
            select o_orderkey as key,
                   {_sql_md5_60("'https://s.example/p/' || o_orderkey::varchar")} as h
            from orders
        )
        select d.key,
               coalesce(arg_min(ring.w, ring.p) filter (where ring.p >= d.h),
                        '{wrap}') as worker
        from d cross join ring
        group by d.key, d.h
    """


def _sql_colorfulness(n: int = 64, seed: int = 9, cut: float = 12.0) -> str:
    """DuckDB twin of q_colorfulness: expected rows from the same
    decode + metric on the driver (VALUES plumbing oracle, the
    q_jpeg_features pattern)."""
    from olx_spark.fixtures.images import decode_image
    from olx_spark.operators.multimodal import colorfulness_metric

    vals = []
    for image_id, data, fmt in _image_corpus_rows("boxed", n, seed):
        try:
            arr = decode_image(bytes(data), fmt)
            m, br = colorfulness_metric(arr)
            vals.append(
                f"('{image_id}', {round(m, 6)!r}::double, "
                f"{round(br, 6)!r}::double, {int(m < cut)}, 1)"
            )
        except Exception:
            vals.append(f"('{image_id}', NULL, NULL, NULL, 0)")
    return f"""
        select image_id, colorfulness, brightness,
               is_low_color::int as is_low_color, decode_ok::int as decode_ok
        from (values {", ".join(vals)})
             t(image_id, colorfulness, brightness, is_low_color, decode_ok)
    """


def _sql_charset(n: int = 42, seed: int = 23) -> str:
    """DuckDB twin of q_charset: expected rows from the same detector
    on the driver over the shared corpus bytes, inlined as VALUES
    (plumbing-oracle pattern; the detector's branch semantics are
    ground-truthed in tests/test_charset.py)."""
    from olx_spark.operators.charset import detect_and_transcode

    vals = []
    for text_id, data in _image_corpus_rows("charset", n, seed):
        r = detect_and_transcode(bytes(data))
        vals.append(
            f"('{text_id}', '{r['charset']}', {r['bom']}, {r['n_high']}, "
            f"'{r['text_md5']}', {r['parse_ok']})"
        )
    return f"""
        select text_id, charset, bom::int as bom, n_high::bigint as n_high,
               text_md5, parse_ok::int as parse_ok
        from (values {", ".join(vals)})
             t(text_id, charset, bom, n_high, text_md5, parse_ok)
    """


def _sql_jpeg_quality(n: int = 36, seed: int = 17) -> str:
    """DuckDB twin of q_jpeg_quality: expected rows computed by the
    same header scan + inversion on the driver over the shared corpus
    bytes, inlined as VALUES (the q_jpeg_features plumbing-oracle
    pattern); the estimator is ground-truthed against the encoder in
    tests/test_multimodal.py."""
    from olx_spark.operators.multimodal import (
        _scan_dqt,
        estimate_jpeg_quality,
    )

    vals = []
    for image_id, data, _fmt in _image_corpus_rows("jpegq", n, seed):
        try:
            luma, nt = _scan_dqt(bytes(data))
            if luma is None:
                raise ValueError("no luma table")
            vals.append(
                f"('{image_id}', {estimate_jpeg_quality(luma)}, "
                f"{int(sum(luma))}, {nt}, 1)"
            )
        except ValueError:
            vals.append(f"('{image_id}', NULL, NULL, 0, 0)")
    return f"""
        select image_id, q_est::int as q_est, luma_sum::bigint as luma_sum,
               n_tables::int as n_tables, parse_ok::int as parse_ok
        from (values {", ".join(vals)})
             t(image_id, q_est, luma_sum, n_tables, parse_ok)
    """


@functools.lru_cache(maxsize=None)  # pure; decodes 34 wav clips
def _sql_audio_features(n: int = 34, seed: int = 29) -> str:
    """DuckDB twin of q_audio_features: expected features computed by
    an independent driver-side decode (fixtures/audio.wav_decode +
    audio_feature_row) of the SAME bytes, inlined as VALUES (repr()
    floats round-trip exactly; ::double pins the literal type).
    Garbage rows appear with NULL features and decode_ok=0."""
    from olx_spark.fixtures.audio import audio_feature_row, wav_decode

    vals = []
    for audio_id, data, _fmt in _audio_corpus_rows(n, seed):
        try:
            samples, sr = wav_decode(data)
            f = audio_feature_row(samples, sr)
            vals.append(
                f"('{audio_id}', {f['sr']}, {f['channels']}, {f['n_samples']}, "
                f"{f['duration_s']!r}::double, {f['rms']!r}::double, "
                f"{f['zcr']!r}::double, {f['spectral_centroid']!r}::double, 1)"
            )
        except Exception:
            vals.append(
                f"('{audio_id}', NULL, NULL, NULL, NULL::double, NULL::double, "
                "NULL::double, NULL::double, 0)"
            )
    return f"""
        select audio_id, sr::int as sr, channels::int as channels,
               n_samples::bigint as n_samples,
               round(duration_s, 6) as duration_s, round(rms, 6) as rms,
               round(zcr, 6) as zcr,
               round(spectral_centroid, 4) as spectral_centroid,
               decode_ok::int as decode_ok
        from (values {", ".join(vals)})
             t(audio_id, sr, channels, n_samples, duration_s, rms, zcr,
               spectral_centroid, decode_ok)
    """


@functools.lru_cache(maxsize=None)  # pure; decodes 24 tiny avi clips
def _sql_video_features(n: int = 26, seed: int = 17) -> str:
    """DuckDB twin of q_video_features: expected per-clip features from
    an independent driver-side decode (fixtures/video.avi_decode) of
    the SAME bytes, inlined as VALUES. Garbage rows appear with NULL
    features and decode_ok=0."""
    import numpy as np

    from olx_spark.fixtures.video import avi_decode

    vals = []
    for video_id, data, _fmt in _video_corpus_rows(n, seed):
        try:
            frames, fps = avi_decode(data)
            grays = [
                float((f.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).mean())
                for f in frames
            ]
            h, w, _ = frames[0].shape
            vals.append(
                f"('{video_id}', {fps}, {len(frames)}, {w}, {h}, "
                f"{float(len(frames) / fps)!r}::double, "
                f"{float(np.mean(grays))!r}::double, 1)"
            )
        except Exception:
            vals.append(
                f"('{video_id}', NULL, NULL, NULL, NULL, NULL::double, "
                "NULL::double, 0)"
            )
    return f"""
        select video_id, fps::int as fps, n_frames::int as n_frames,
               w::int as w, h::int as h,
               round(duration_s, 6) as duration_s,
               round(mean_gray, 4) as mean_gray,
               decode_ok::int as decode_ok
        from (values {", ".join(vals)})
             t(video_id, fps, n_frames, w, h, duration_s, mean_gray, decode_ok)
    """


@functools.lru_cache(maxsize=None)  # pure; decodes 24 tiny avi clips
def _sql_video_frames(every_n: int = 2, n: int = 26, seed: int = 17) -> str:
    """DuckDB twin of q_video_frames: every-``every_n``-th frame's
    timestamp, channel means and phash computed by an independent
    driver-side decode; garbage clips contribute zero rows."""
    from olx_spark.fixtures.images import phash64
    from olx_spark.fixtures.video import avi_decode

    vals = []
    for video_id, data, _fmt in _video_corpus_rows(n, seed):
        try:
            frames, fps = avi_decode(data)
        except Exception:
            continue
        for j, frame in enumerate(frames[::every_n]):
            idx = j * every_n
            vals.append(
                f"('{video_id}', {idx}, {float(idx / fps)!r}::double, "
                f"{float(frame[..., 0].mean())!r}::double, "
                f"{float(frame[..., 1].mean())!r}::double, "
                f"{float(frame[..., 2].mean())!r}::double, {phash64(frame)})"
            )
    return f"""
        select video_id, frame_idx::int as frame_idx,
               round(t_s, 6) as t_s,
               round(mean_r, 4) as mean_r, round(mean_g, 4) as mean_g,
               round(mean_b, 4) as mean_b, phash::bigint as phash
        from (values {", ".join(vals)})
             t(video_id, frame_idx, t_s, mean_r, mean_g, mean_b, phash)
    """


@functools.lru_cache(maxsize=None)  # pure; encodes/decodes 96 images
def _sql_phash_near_dup(max_dist: int = 6, n: int = 96, seed: int = 11) -> str:
    """DuckDB twin of q_phash_near_dup: expected phashes computed
    independently of Spark (driver-side numpy decode+phash over the
    same deterministic corpus) inlined as VALUES; the SQL does the
    brute-force Hamming pairing, which the banded Spark pipeline
    provably equals (bands = max_dist+1 -> complete recall)."""
    from olx_spark.fixtures.images import decode_image, encode_image, near_dup_pixels, phash64

    vals = []
    for i in range(n):
        fmt, arr = near_dup_pixels(i, seed)
        dec = decode_image(encode_image(arr, fmt), fmt)
        vals.append(f"('nd-{i:05d}', {phash64(dec)}::bigint)")
    return f"""
        with h(image_id, ph) as (values {", ".join(vals)})
        select a.image_id as id_a, b.image_id as id_b,
               bit_count(xor(a.ph, b.ph))::int as dist
        from h a join h b on a.image_id < b.image_id
        where bit_count(xor(a.ph, b.ph)) <= {max_dist}
    """


def _sql_ssim_verify(max_dist: int = 6, cut: float = 0.85, n: int = 96, seed: int = 11) -> str:
    """DuckDB twin of q_ssim_verify: candidate pairs by brute-force
    Hamming over driver-computed phashes (== the banded pipeline, as
    q_phash_near_dup proves), each scored with the same numpy
    ssim_global, inlined as VALUES."""
    from olx_spark.fixtures.images import (
        decode_image,
        encode_image,
        near_dup_pixels,
        phash64,
    )
    from olx_spark.operators.multimodal import ssim_global

    imgs = []
    for i in range(n):
        fmt, arr = near_dup_pixels(i, seed)
        dec = decode_image(encode_image(arr, fmt), fmt)
        imgs.append((f"nd-{i:05d}", phash64(dec), dec))
    vals = []
    for i in range(len(imgs)):
        for j in range(i + 1, len(imgs)):
            ida, pa, a = imgs[i]
            idb, pb, b = imgs[j]
            d = bin((pa ^ pb) & ((1 << 64) - 1)).count("1")
            if d <= max_dist:
                s = ssim_global(a, b) if a.shape == b.shape else 0.0
                vals.append(
                    f"('{ida}', '{idb}', {d}, {round(s, 6)!r}::double, "
                    f"{int(s >= cut)})"
                )
    return f"""
        select id_a, id_b, dist::int as dist, ssim,
               same_image::int as same_image
        from (values {", ".join(vals)})
             t(id_a, id_b, dist, ssim, same_image)
    """


def _sql_simhash16() -> str:
    toks = f"string_split({_sql_norm('text')}, ' ')"
    hashes = f"[{_sql_md5_60('t')} for t in {toks}]"
    bits = []
    for i in range(16):
        vote = (
            f"list_sum([case when (h >> {i}) & 1 = 1 then 1 else -1 end "
            f"for h in {hashes}])"
        )
        bits.append(f"(case when {vote} >= 0 then {1 << i} else 0 end)")
    return "(" + " + ".join(bits) + ")::bigint"



def _sql_hll_distinct(p: int = 8) -> str:
    # replays operators/sketches exactly: md5-60 hash, top-p register
    # index, zero-run rank via the padded-bin strpos (no float log2),
    # exact-integer harmonic sum, identical alpha/threshold double
    # literals (imported from the operator so they can never drift)
    from olx_spark.operators.sketches import _alpha

    m = 1 << p
    w = 60 - p
    k1 = w + 1
    num = _alpha(m) * m * m * float(1 << k1)  # alpha * m^2 * 2^(W+1)
    return f"""
        with h as (
            select event_type,
                   {_sql_md5_60("user_id::varchar")} as hh
            from events
        ), b as (
            select event_type, (hh >> {w})::int as idx,
                   case when (hh & ((1::bigint << {w}) - 1)) = 0 then {k1}
                        else strpos(lpad(bin(hh & ((1::bigint << {w}) - 1)),
                                         {w}, '0'), '1')
                   end as rho
            from h
        ), r as (
            select event_type, idx, max(rho) as rho from b group by 1, 2
        ), s as (
            select event_type, count(*) as nz,
                   sum((1::bigint << ({k1} - rho))::bigint)::bigint as sc
            from r group by 1
        ), est as (
            select event_type,
                   {num!r}::double
                       / (sc + ({m} - nz) * (1::bigint << {k1})) as raw,
                   {m} - nz as zeros
            from s
        ), fin as (
            select event_type,
                   case when raw <= {2.5 * m!r}::double and zeros > 0
                        then {float(m)!r}::double
                             * ln({float(m)!r}::double / zeros)
                        else raw end as e
            from est
        )
        select x.event_type,
               x.n_users_exact,
               round(fin.e, 6) as n_users_est
        from (
            select event_type, count(distinct user_id) as n_users_exact
            from events group by 1
        ) x join fin using (event_type)
    """


def _sql_pagerank(iters: int = 6, damping: float = 0.85) -> str:
    """Unrolled power iteration: one chained CTE per step — aggregates
    are not allowed in a recursive CTE member, and unrolling keeps the
    oracle a deterministic twin of the fixed-iteration operator."""
    base = """
        with e as (
            select * from (
                select distinct l_orderkey * 2 as src, l_partkey * 2 + 1 as dst
                from lineitem
                union all
                select distinct l_partkey * 2 + 1 as src, l_orderkey * 2 as dst
                from lineitem
            )
        ), nodes as (
            select distinct id from (
                select src as id from e union select dst from e
            )
        ), nn as (select count(*)::double as n from nodes
        ), deg as (
            select src, count(*)::double as deg from e group by src
        ), pr0 as (
            select id, 1.0 / nn.n as rank from nodes, nn
        )"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""", pr{k} as (
            select nodes.id,
                   (1.0 - {damping}) / nn.n
                   + {damping} * coalesce(s.in_sum, 0.0) as rank
            from nodes cross join nn
            left join (
                select e.dst as id, sum(p.rank / deg.deg) as in_sum
                from e
                join pr{k - 1} p on p.id = e.src
                join deg on deg.src = e.src
                group by e.dst
            ) s on s.id = nodes.id
        )""")
    return (
        base + "".join(steps)
        + f" select id, round(rank, 9) as rank from pr{iters}"
    )


def _sql_hits(iters: int = 6) -> str:
    """Unrolled HITS twin: same directed edge set, authorities-then-
    hubs per iteration, UNnormalized through the recurrence (each
    per-step L1 divide is a global scalar through a linear map, so it
    cancels — mirrored in operators/graph.hits), one L1 normalization
    per side at the end with a zero-guard."""
    # every multiply-referenced CTE is AS MATERIALIZED: inlining would
    # re-expand each half-step's raw frame twice per iteration — a
    # 4^iters plan blow-up that exhausts file handles on the base
    # parquet scan before it exhausts patience
    base = """
        with e as materialized (
            select distinct l_orderkey * 2 as src, l_partkey * 2 + 1 as dst
            from lineitem
        ), nodes as materialized (
            select distinct id from (
                select src as id from e union select dst from e
            )
        ), h0 as (select id, 1.0 as hub from nodes)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""", a{k} as materialized (
            select nodes.id, coalesce(q.s, 0.0) as auth
            from nodes left join (
                select e.dst as id, sum(h.hub) as s
                from e join h{k - 1} h on h.id = e.src group by e.dst
            ) q on q.id = nodes.id
        ), h{k} as materialized (
            select nodes.id, coalesce(q.s, 0.0) as hub
            from nodes left join (
                select e.src as id, sum(a.auth) as s
                from e join a{k} a on a.id = e.dst group by e.src
            ) q on q.id = nodes.id
        )""")
    return (
        base + "".join(steps)
        + f""", ta as (select sum(auth) as t from a{iters}
        ), th as (select sum(hub) as t from h{iters})
        select a.id,
               round(case when ta.t > 0 then a.auth / ta.t else 0.0 end,
                     8) as auth,
               round(case when th.t > 0 then h.hub / th.t else 0.0 end,
                     8) as hub
        from a{iters} a join h{iters} h on h.id = a.id
        cross join ta cross join th"""
    )


def _sql_registrable_domain() -> str:
    """DuckDB twin of q_registrable_domain: the full publicsuffix.org
    algorithm replayed in SQL — same host synthesis, same candidate
    label-suffix explosion, normal/wildcard/exception rule joins,
    exception-then-most-labels prevailing pick (struct max), implicit
    '*' default, and the host-IS-a-suffix NULL case."""
    tlds = ", ".join(f"'{t}'" for t in _PSL_TLDS)
    rules = []
    for r in _PSL_RULES:
        if r.startswith("!"):
            key = r[1:]
            rules.append(("exc", key, len(key.split(".")) - 1))
        elif r.startswith("*."):
            key = r[2:]
            rules.append(("wild", key, len(key.split(".")) + 1))
        else:
            rules.append(("norm", r, len(r.split("."))))
    rule_vals = ", ".join(f"('{k}', '{key}', {m})" for k, key, m in rules)
    return f"""
        with c as (
            select c_custkey as custkey,
                   case (c_custkey % 3)
                     when 0 then 'shop' || (c_custkey % 97) || '.' || tld
                     when 1 then 'www.shop' || (c_custkey % 97) || '.' || tld
                     else tld end as host
            from (select c_custkey,
                         list_value({tlds})[(c_custkey % 9) + 1] as tld
                  from customer)
        ), hosts as (select distinct host from c
        ), lab as (
            select host, string_split(host, '.') as ls,
                   len(string_split(host, '.')) as n
            from hosts
        ), cand as (
            select host, ls, n, unnest(range(0, n)) as i from lab
        ), cs as (
            select host,
                   array_to_string(list_slice(ls, i + 1, n), '.') as s,
                   array_to_string(list_slice(ls, i + 2, n), '.') as t
            from cand
        ), rules(kind, key, ps_labels) as (values {rule_vals}
        ), best as (
            select host,
                   max(struct_pack(
                       is_exc := (kind = 'exc')::int, ml := ps_labels
                   )) as b
            from (
                select cs.host, r.kind, r.ps_labels
                from cs join rules r on r.kind <> 'wild' and r.key = cs.s
                union all
                select cs.host, r.kind, r.ps_labels
                from cs join rules r on r.kind = 'wild' and r.key = cs.t
            ) group by host
        ), fin as (
            select lab.host,
                   array_to_string(
                       list_slice(ls, n - mm + 1, n), '.') as public_suffix,
                   case when n > mm then
                       array_to_string(list_slice(ls, n - mm, n), '.')
                   end as registrable_domain
            from (
                select lab.host, lab.ls, lab.n,
                       coalesce(best.b.ml, 1) as mm
                from lab left join best using (host)
            ) lab
        )
        select c.custkey, c.host, f.public_suffix, f.registrable_domain
        from c join fin f using (host)
    """


def oracle_sql() -> dict[str, str]:
    return {
        "q_scan_filter": """
            select c_custkey, c_name, round(c_acctbal, 4) as acctbal
            from customer
            where c_mktsegment = 'BUILDING' and c_acctbal > 1000
        """,
        "q_filter_conj": """
            select event_id, user_id, round(value, 4) as value
            from events where event_type = 'error' and value > 100
        """,
        "q_canonicalize": """
            select doc_id,
                   'https://host' || (doc_id % 10) || '.example'
                   || '/d/ad/' || source || '-' || doc_id || '/'
                   || '?page=' || (doc_id % 5) || '&currency=UAH'
                   as canon_url
            from documents
        """,
        "q_canonicalize_modern": """
            select doc_id,
                   'https://host' || (doc_id % 10) || '.example'
                   || '/d/ad/' || source || '-' || doc_id || '/'
                   as canon_url
            from documents
        """,
        "q_explode_links": """
            select vec_id, u.i::int - 1 as pos,
                   round(embedding[u.i]::double, 6) as val
            from embeddings cross join lateral
                 (select unnest(range(1, len(embedding) + 1)) as i) u
        """,
        "q_string_fns": """
            select doc_id,
                   array_to_string(string_split(text, ' ')[1:3], '-') as slug,
                   coalesce(regexp_extract(source, '(\\d+)', 1), '') as src_num
            from documents
        """,
        "q_ordered_limit": """
            select row_number() over (order by o_totalprice desc, o_orderkey) as rk,
                   o_orderkey, round(o_totalprice, 4) as total
            from orders
            order by o_totalprice desc, o_orderkey limit 10
        """,
        "q_fetch_batch": """
            select l_orderkey, l_linenumber,
                   round(l_extendedprice * (1.0 - l_discount), 4) as net_price
            from lineitem
        """,
        "q_parse_project": """
            select event_id, regexp_extract(props, '"k": (\\d+)', 1)::int as k
            from events
        """,
        "q_map_brief": """
            select event_id,
                   'k -> ' || coalesce(regexp_extract(props, '"k": (\\d+)', 1), '') as brief_flat
            from events
        """,
        "q_fk_stamp_join": """
            select o_orderkey, c_name, round(o_totalprice, 4) as total
            from orders join customer on o_custkey = c_custkey
            where c_mktsegment = 'AUTOMOBILE'
        """,
        "q_politeness_budget": """
            select user_id, event_id, rk, gap_s from (
                select user_id, event_id,
                       row_number() over (partition by user_id order by ts, event_id) as rk,
                       floor(epoch(ts))::bigint - lag(floor(epoch(ts))::bigint) over
                           (partition by user_id order by ts, event_id) as gap_s
                from events
            ) where rk <= 5
        """,
        "q_dedup_first_seen": """
            select user_id, event_id, first_type from (
                select user_id, event_id, event_type as first_type,
                       row_number() over (partition by user_id order by ts, event_id) as rn
                from events
            ) where rn = 1
        """,
        "q_unfold_rounds": """
            with hi as (select max(l_orderkey) as h from lineitem),
                 step as (select (h // 8) + 1 as s from hi)
            select r.i::int as round,
                   coalesce(round(sum(l.l_quantity), 4), 0.0) as qty,
                   count(l.l_orderkey) as n
            from range(0, 8) r(i)
            left join lineitem l
              on l.l_orderkey >= r.i * (select s from step)
             and l.l_orderkey < (r.i + 1) * (select s from step)
            group by r.i
        """,
        "q_duration_parse": """
            with d as (
                select event_id, ts,
                       case when event_id % 3 = 0
                            then (event_id % 23 + 1) || ' ' ||
                                 (['secs','mins','hours','days'])[(event_id % 4 + 1)::int]
                                 || ' ' || (event_id % 59 + 1) || ' mins ago'
                            else (event_id % 23 + 1) || ' ' ||
                                 (['secs','mins','hours','days'])[(event_id % 4 + 1)::int]
                                 || ' ago'
                       end as dur_str
                from events
            )
            select event_id, dur_str,
                   coalesce(list_sum([
                       (string_split(m, ' ')[1])::bigint *
                       (case string_split(m, ' ')[2]
                            when 'sec' then 1 when 'secs' then 1
                            when 'second' then 1 when 'seconds' then 1
                            when 'min' then 60 when 'mins' then 60
                            when 'minute' then 60 when 'minutes' then 60
                            when 'hour' then 3600 when 'hours' then 3600
                            when 'day' then 86400 when 'days' then 86400
                            else 0 end)
                       for m in regexp_extract_all(replace(dur_str, 'ago', ''), '(\\d+ \\S+)', 1)
                   ]), 0)::bigint as ago_s,
                   floor((floor(epoch(ts))::bigint - floor(epoch(timestamp '2024-01-01 00:00:00'))::bigint) / 3600)::bigint as hours_since
            from d
        """,
        "q_metrics_agg": """
            select l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) as sum_qty,
                   round(sum(l_extendedprice), 4) as sum_price,
                   round(avg(l_discount), 6) as avg_disc,
                   count(*) as n
            from lineitem group by l_returnflag, l_linestatus
        """,
        "q_window_rank": """
            select o_custkey, rk, o_orderkey, total from (
                select o_custkey, o_orderkey, round(o_totalprice, 4) as total,
                       row_number() over (partition by o_custkey
                           order by o_totalprice desc, o_orderkey) as rk
                from orders
            ) where rk <= 3
        """,
        "q_rollup_metrics": """
            select l_returnflag, l_linestatus, count(*) as n,
                   round(sum(l_quantity), 4) as qty
            from lineitem group by rollup(l_returnflag, l_linestatus)
        """,
        "q_asof_join": """
            select c.user_id, c.event_id as click_id,
                   coalesce(v.event_id, -1) as view_id,
                   coalesce(round(v.value, 4), -1.0) as view_value,
                   coalesce((floor(epoch(c.ts)) - floor(epoch(v.ts)))::bigint, -1) as lag_s
            from (select * from events where event_type = 'click') c
            asof left join (select * from events where event_type = 'view') v
              on c.user_id = v.user_id and v.ts <= c.ts
        """,
        "q_range_join": """
            select c.user_id, e.event_id as error_id, c.event_id as click_id,
                   (floor(epoch(c.ts)) - floor(epoch(e.ts)))::bigint as delta_s
            from (select * from events where event_type = 'error') e
            join (select * from events where event_type = 'click') c
              on c.user_id = e.user_id
             and c.ts >= e.ts and c.ts <= e.ts + interval 21600 seconds
        """,
        "q_sessionize": """
            with g as (
                select user_id, event_id, ts,
                       case when lag(ts) over w is null
                                 or floor(epoch(ts)) - floor(epoch(lag(ts) over w)) > 21600
                            then 1 else 0 end as brk
                from events
                window w as (partition by user_id order by ts, event_id)
            ), s as (
                select user_id, ts,
                       (sum(brk) over (partition by user_id order by ts, event_id
                                       rows unbounded preceding))::bigint as session_seq
                from g
            )
            select user_id, session_seq, count(*) as n_events,
                   min(floor(epoch(ts)))::bigint as start_s,
                   max(floor(epoch(ts)))::bigint as end_s,
                   (max(floor(epoch(ts))) - min(floor(epoch(ts))))::bigint as duration_s
            from s group by user_id, session_seq
        """,
        "q_funnel": """
            with c0 as (
                select user_id, event_id, event_type, ts,
                       min(case when event_type = 'view' then ts end) over (
                           partition by user_id order by ts, event_id
                           rows between unbounded preceding and current row
                       ) as r0
                from events
            ), c1 as (
                select *,
                       min(case when event_type = 'click' and ts > r0
                                then ts end) over (
                           partition by user_id order by ts, event_id
                           rows between unbounded preceding and current row
                       ) as r1
                from c0
            ), agg as (
                select user_id,
                       epoch_us(min(case when event_type = 'view'
                                         then ts end)) as t_view_us,
                       sum(case when event_type = 'view'
                                then 1 else 0 end)::bigint as n_view,
                       epoch_us(min(case when event_type = 'click'
                                          and ts > r0
                                         then ts end)) as t_click_us,
                       sum(case when event_type = 'click'
                                then 1 else 0 end)::bigint as n_click,
                       epoch_us(min(case when event_type = 'purchase'
                                          and ts > r1
                                         then ts end)) as t_purchase_us,
                       sum(case when event_type = 'purchase'
                                then 1 else 0 end)::bigint as n_purchase
                from c1 group by user_id
            )
            select user_id, t_view_us, n_view, t_click_us, n_click,
                   t_purchase_us, n_purchase,
                   cast(case when t_view_us is null then 0
                             when t_click_us is null then 1
                             when t_purchase_us is null then 2
                             else 3 end as int) as stage_reached,
                   case when t_purchase_us is not null
                        then t_purchase_us - t_view_us end as conv_us
            from agg
        """,
        "q_json_props": """
            select event_type,
                   count(*) as n,
                   count(k) as n_k,
                   sum(k)::bigint as sum_k,
                   min(k) as min_k,
                   max(k) as max_k,
                   count(distinct k) as n_distinct_k
            from (
                select event_type,
                       cast(json_extract_string(props, '$.k') as bigint) as k
                from events
            )
            group by event_type
        """,
        "q_bm25_top_terms": f"""
            with toks as (
                select doc_id, unnest(string_split({_sql_norm('text')}, ' ')) as term
                from documents
            ), t as (
                select doc_id, term from toks where term <> ''
            ), tf as (
                select doc_id, term, count(*)::double as tf from t group by 1, 2
            ), dlen as (
                select doc_id, count(*)::double as dlen from t group by 1
            ), stats as (
                select count(*)::double as n_docs, avg(dlen) as avg_dlen from dlen
            ), scored as (
                select tf.doc_id, tf.term,
                       round(
                           ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                           * tf.tf * 2.2
                           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dlen / stats.avg_dlen)),
                           6) as score
                from tf
                join dlen using (doc_id)
                join (select term, count(*)::double as df from tf group by 1) df using (term)
                cross join stats
            )
            select doc_id, rk, term, score from (
                select doc_id, term, score,
                       row_number() over (partition by doc_id
                           order by score desc, term asc) as rk
                from scored
            ) where rk <= 5
        """,
        "q_quantiles": """
            select event_type, count(*) as n,
                   round(quantile_cont(value, 0.5), 6) as p50,
                   round(quantile_cont(value, 0.9), 6) as p90,
                   round(quantile_cont(value, 0.99), 6) as p99
            from events group by event_type
        """,
        "q_split_assign": f"""
            with b as (
                select doc_id,
                       {_sql_md5_60("'split-v1:' || doc_id::varchar")} % 100 as bucket
                from documents
            )
            select doc_id, bucket,
                   case when bucket < 90 then 'train'
                        when bucket < 95 then 'val'
                        else 'test' end as split
            from b
        """,
        "q_stratified_sample": f"""
            with h as (
                select doc_id, lang, source,
                       {_sql_md5_60("'sample-v1:' || doc_id::varchar")} as hh
                from documents
            ), r as (
                select doc_id, lang, source,
                       row_number() over (
                           partition by lang, source order by hh, doc_id
                       ) - 1 as rank_in_limit
                from h
            )
            select doc_id, lang, source, rank_in_limit
            from r where rank_in_limit < 12
        """,
        "q_pack_shards": f"""
            with t as (
                select doc_id,
                       ({_sql_token_count('text')})::bigint as n_tokens,
                       {_sql_md5_60("'pack-v1:' || doc_id::varchar")} as hh
                from documents
            ), o as (
                select doc_id, n_tokens,
                       coalesce(sum(n_tokens) over (
                           order by hh % 32, hh, doc_id
                           rows between unbounded preceding and 1 preceding
                       ), 0)::bigint as start_offset
                from t
            )
            select doc_id, n_tokens, start_offset,
                   (start_offset // 2000)::bigint as shard_id
            from o
        """,
        "q_corpus_mix": f"""
            select doc_id, lang, source
            from documents
            where ({_sql_md5_60("'mix-v1:' || doc_id::varchar")}) % 1000000
                  < case lang when 'en' then 1000000
                              when 'de' then 500000
                              when 'fr' then 500000
                              else 200000 end
        """,
        "q_hll_distinct": _sql_hll_distinct(),
        "q_cms_hot_keys": f"""
            with grid as (
                select r.j,
                       ({_sql_md5_60("'cms' || r.j::varchar || ':' || user_id::varchar")})
                           % 256 as b,
                       count(*)::bigint as cnt
                from events cross join range(4) r(j)
                group by 1, 2
            ), top as (
                select user_id, count(*)::bigint as n_exact
                from events group by 1
                order by n_exact desc, user_id limit 20
            ), probe as (
                select t.user_id, t.n_exact, r.j,
                       ({_sql_md5_60("'cms' || r.j::varchar || ':' || t.user_id::varchar")})
                           % 256 as b
                from top t cross join range(4) r(j)
            )
            select p.user_id, p.n_exact,
                   min(coalesce(g.cnt, 0))::bigint as n_est
            from probe p left join grid g on p.j = g.j and p.b = g.b
            group by 1, 2
        """,
        "q_pagerank": _sql_pagerank(),
        "q_label_prop": _sql_label_prop(),
        "q_export_csv": "select * from region",
        "q_snapshot_history": """
            select 'asof:0' as win, count(*) as n_rows, round(sum(o_totalprice), 4) as total
            from orders where o_orderkey % 3 <= 0
            union all
            select 'asof:1', count(*), round(sum(o_totalprice), 4)
            from orders where o_orderkey % 3 <= 1
            union all
            select 'asof:2', count(*), round(sum(o_totalprice), 4) from orders
            union all
            select 'since:0', count(*), round(sum(o_totalprice), 4)
            from orders where o_orderkey % 3 > 0
            union all
            select 'since:1', count(*), round(sum(o_totalprice), 4)
            from orders where o_orderkey % 3 > 1
            union all
            select 'win:0-2', count(*), round(sum(o_totalprice), 4)
            from orders where o_orderkey % 3 > 0
        """,
        "q_main_content": r"""
            with d as (
                select doc_id, concat_ws(chr(10),
                    '<html><head><title>Doc ' || doc_id::varchar || '</title></head><body>',
                    '<nav><a href="/">home</a> <a href="/about">about</a> <a href="/contact">contact</a></nav>',
                    '<div class="main"><p>' || text || '</p></div>',
                    case when doc_id % 3 = 0 then '<div class="ad"><a href="/buy">click here to buy the best value deal now</a></div>' end,
                    '<footer><a href="/tos">terms of service</a> <a href="/privacy">privacy policy</a></footer>',
                    '</body></html>') as html
                from documents
            ), st as (
                select doc_id,
                       list_transform(string_split(html, chr(10)), l -> {
                           'text': trim(regexp_replace(regexp_replace(l, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')),
                           'n_tags': length(l) - length(replace(l, '<', '')),
                           'link_len': coalesce(list_sum(list_transform(
                               regexp_extract_all(l, '<a[^>]*>([^<]*)</a>', 1),
                               a -> length(trim(a)))), 0)
                       }) as stats
                from d
            ), fl as (
                select doc_id, list_filter(stats, s -> length(s.text) > 0) as nonblank
                from st
            ), kp as (
                select doc_id, nonblank,
                       list_filter(nonblank, s -> length(s.text) >= 20
                           and (s.n_tags = 0 or length(s.text) / s.n_tags >= 10.0)
                           and s.link_len <= 0.5 * length(s.text)) as kept
                from fl
            )
            select doc_id, len(nonblank)::int as n_lines, len(kept)::int as n_kept,
                   array_to_string(list_transform(kept, s -> s.text), ' ') as main_text
            from kp
        """,
        "q_consistent_shard": _sql_consistent_shard(),
        "q_registrable_domain": _sql_registrable_domain(),
        "q_exif_features": _sql_exif_features(),
        "q_oriented_phash": _sql_oriented_phash(),
        "q_crop_dups": _sql_crop_dups(),
        "q_aimd_delay": _SQL_AIMD,
        "q_trustrank": _sql_trustrank(),
        "q_sim_order": _sql_sim_order(),
        "q_decompress": _sql_decompress(),
        "q_spoof_hosts": _sql_spoof_hosts(),
        "q_topk_heavy": _SQL_TOPK_HEAVY,
        "q_edge_density": _sql_edge_density(),
        "q_footer_stats": """
            select (o_orderkey % 8) as b, count(*)::bigint as n_rows,
                   min(o_orderkey) as min_o_orderkey,
                   max(o_orderkey) as max_o_orderkey,
                   min(o_totalprice) as min_o_totalprice,
                   max(o_totalprice) as max_o_totalprice
            from orders group by 1
        """,
        "q_mad_outliers": """
            with med as (
                select o_orderpriority as grp,
                       quantile_cont(o_totalprice, 0.5) as med
                from orders group by 1
            ), mad as (
                select o.o_orderpriority as grp,
                       quantile_cont(abs(o.o_totalprice - m.med), 0.5) as mad
                from orders o join med m on o.o_orderpriority = m.grp
                group by 1
            )
            select o.o_orderkey as id, o.o_orderpriority as grp,
                   o.o_totalprice as value,
                   case when d.mad = 0
                        then (case when o.o_totalprice - m.med = 0 then 0.0 end)
                        else round(0.6745 * (o.o_totalprice - m.med) / d.mad, 6)
                   end as robust_z,
                   (case when d.mad = 0 then (o.o_totalprice - m.med != 0)
                         else abs(0.6745 * (o.o_totalprice - m.med) / d.mad) > 3.5
                    end)::int as is_outlier
            from orders o
            join med m on o.o_orderpriority = m.grp
            join mad d on o.o_orderpriority = d.grp
        """,
        "q_recency_scores": """
            with c as (
                select user_id % 40 as grp,
                       case when floor(epoch(timestamp '2024-03-01 00:00:00'))::bigint
                                 - floor(epoch(ts))::bigint < 0
                            then floor(value * 100)::bigint
                            else floor(value * 100)::bigint
                                 >> least(floor((floor(epoch(timestamp '2024-03-01 00:00:00'))::bigint
                                                 - floor(epoch(ts))::bigint) / 259200.0)::int, 40)
                       end as contrib
                from events
            )
            select grp, count(*)::bigint as n_events,
                   sum(contrib)::bigint as score_scaled,
                   sum(contrib)::bigint / 100.0 as score
            from c group by grp
        """,
        "q_weighted_sample": f"""
            with d as (
                select doc_id as id,
                       ({_sql_token_count('text')})::double as weight,
                       -ln(({_sql_md5_60("'ares-v1:' || doc_id::varchar")} + 1)
                           / 1152921504606846976.0)
                           / ({_sql_token_count('text')})::double as key
                from documents
                where ({_sql_token_count('text')}) > 0
            )
            select row_number() over (order by key, id)::int as rank,
                   id, weight, round(key, 9) as key
            from d order by key, id limit 50
        """,
        "q_canonical_dedup": r"""
            with d as (
                select doc_id,
                       'https://ex.org/p/' || doc_id::varchar as url,
                       '<html><head><title>Doc ' || doc_id::varchar || '</title>'
                       || (case when doc_id % 4 != 0 and doc_id % 8 != 1
                           then '<link rel="canonical" href="https://ex.org/p/'
                                || (doc_id - (doc_id % 4))::varchar || '">'
                           else '' end)
                       || (case when doc_id % 2 = 0
                           then '<meta property="og:title" content="OG ' || doc_id::varchar || '">'
                           else '' end)
                       || (case when doc_id % 3 = 0
                           then '<meta property="og:image" content="https://img.ex/' || doc_id::varchar || '.jpg">'
                           else '' end)
                       || '</head><body>x</body></html>' as page
                from documents
            ), ex as (
                select doc_id, url,
                       nullif(regexp_extract(page, '<title>([^<]*)</title>', 1), '') as title,
                       nullif(regexp_extract(page, '<meta[^>]*property="og:title"[^>]*content="([^"]*)"', 1), '') as og_title,
                       nullif(regexp_extract(page, '<meta[^>]*property="og:image"[^>]*content="([^"]*)"', 1), '') as og_image,
                       coalesce(nullif(regexp_extract(page, '<link[^>]*rel="canonical"[^>]*href="([^"]*)"', 1), ''), url) as canon_target
                from d
            ), c as (
                select canon_target, count(*) as n_variants from ex group by 1
            )
            select ex.doc_id, ex.title, ex.og_title, ex.og_image,
                   ex.canon_target,
                   (ex.url = ex.canon_target)::int as is_canonical,
                   c.n_variants
            from ex join c using (canon_target)
        """,
        "q_link_directives": r"""
            with d as (
                select doc_id,
                       '<html><head>'
                       || (case when doc_id % 10 = 0 then '<meta name="robots" content="noindex, nofollow">'
                                when doc_id % 15 = 0 then '<meta name="robots" content="none">'
                                when doc_id % 7 = 3 then '<meta name="robots" content="noindex">'
                                else '' end)
                       || '</head><body>'
                       || '<a href="/doc/' || doc_id::varchar || '-0"'
                          || (case when (doc_id + 0) % 3 = 0 then ' rel="nofollow"' else '' end) || '>t0</a>'
                       || '<a href="/doc/' || doc_id::varchar || '-1"'
                          || (case when (doc_id + 1) % 3 = 0 then ' rel="nofollow"' else '' end) || '>t1</a>'
                       || '<a href="/doc/' || doc_id::varchar || '-2"'
                          || (case when (doc_id + 2) % 3 = 0 then ' rel="nofollow"'
                                   when doc_id % 5 = 0 then ' rel="ugc nofollow"' else '' end) || '>t2</a>'
                       || '<a href="/doc/' || doc_id::varchar || '-3"'
                          || (case when (doc_id + 3) % 3 = 0 then ' rel="nofollow"'
                                   when doc_id % 4 = 0 then ' rel="sponsored"' else '' end) || '>t3</a>'
                       || '</body></html>' as page
                from documents
            ), m as (
                select doc_id, page,
                       regexp_extract(lower(page), '<meta[^>]*name="robots"[^>]*content="([^"]*)"', 1) as content,
                       list_transform(
                           list_filter(
                               list_transform(regexp_extract_all(page, '<a\s[^>]*>'),
                                   t -> {'href': regexp_extract(t, 'href="([^"]*)"', 1),
                                         'rel': lower(regexp_extract(t, 'rel="([^"]*)"', 1))}),
                               s -> length(s.href) > 0 and not contains(s.rel, 'nofollow')),
                           s -> s.href) as fl,
                       len(regexp_extract_all(page, '<a\s[^>]*>')) as n_anchors
                from d
            )
            select doc_id,
                   (contains(content, 'none') or contains(content, 'noindex'))::int as noindex,
                   (contains(content, 'none') or contains(content, 'nofollow'))::int as nofollow,
                   n_anchors::int as n_anchors,
                   len(fl)::int as n_followable,
                   case when contains(content, 'none') or contains(content, 'nofollow')
                        then '' else array_to_string(fl, ',') end as follow_list
            from m
        """,
        "q_cdx_index": r"""
            with d as (
                select doc_id, doc_id % 25 as archive_id,
                       'https://www.host' || (doc_id % 7)::varchar
                           || '.example.org/doc/' || doc_id::varchar
                           || (case when doc_id % 2 = 0 then '?v=2' else '' end) as uri,
                       '2026-02-' || lpad(((doc_id % 28) + 1)::varchar, 2, '0')
                           || 'T00:00:00Z' as dt,
                       text
                from documents
            ), r as (
                select *,
                       octet_length(encode(
                           'WARC/1.0' || chr(13) || chr(10)
                           || 'WARC-Type: response' || chr(13) || chr(10)
                           || 'WARC-Target-URI: ' || uri || chr(13) || chr(10)
                           || 'WARC-Date: ' || dt || chr(13) || chr(10)
                           || 'WARC-Record-ID: <urn:md5:' || md5(text) || '>' || chr(13) || chr(10)
                           || 'Content-Type: application/octet-stream' || chr(13) || chr(10)
                           || 'Content-Length: ' || octet_length(encode(text))::varchar || chr(13) || chr(10)
                           || chr(13) || chr(10) || text
                           || chr(13) || chr(10) || chr(13) || chr(10)
                       ))::bigint as rec_len
                from d
            ), o as (
                select *,
                       coalesce(sum(rec_len) over (
                           partition by archive_id order by uri
                           rows between unbounded preceding and 1 preceding
                       ), 0)::bigint as "offset"
                from r
            )
            select array_to_string(list_reverse(string_split(
                       regexp_replace(lower(regexp_extract(uri, '^[a-z]+://([^/?#]+)', 1)), '^www\.', ''),
                       '.')), ',')
                   || ')' || regexp_extract(uri, '^[a-z]+://[^/?#]+([^?#]*)', 1)
                   || (case when contains(uri, '?')
                       then '?' || regexp_extract(uri, '\?(.*)$', 1) else '' end) as surt_key,
                   archive_id, "offset", rec_len,
                   octet_length(encode(text))::bigint as length,
                   md5(text) as digest
            from o
        """,
        "q_warc_roundtrip": """
            select doc_id % 25 as archive_id,
                   (row_number() over (
                        partition by doc_id % 25
                        order by 'https://archive.example/doc/' || doc_id::varchar
                    ) - 1)::int as rec_idx,
                   'response' as warc_type,
                   'https://archive.example/doc/' || doc_id::varchar as target_uri,
                   '2026-01-' || lpad(((doc_id % 28) + 1)::varchar, 2, '0')
                       || 'T00:00:00Z' as warc_date,
                   octet_length(encode(text)) as content_length,
                   md5(text) as payload_md5,
                   1 as parse_ok
            from documents
        """,
        "q_repetition_stats": _sql_repetition_stats(),
        "q_gopher_rules": _sql_gopher_rules(),
        "q_mojibake": """
            with d as (
                select doc_id, text
                       || (case when doc_id % 9 = 0 then ' cafÃ© naÃ¯ve rÃ©sumÃ©' else '' end)
                       || (case when doc_id % 11 = 0 then ' bad � char � here' else '' end)
                       || (case when doc_id % 13 = 0 then ' â€œquotedâ€ text Â dash' else '' end) as aug
                from documents
            ), m as (
                select doc_id, aug,
                       ((length(aug) - length(replace(aug, '�', ''))))::int as n_repl,
                       ((length(aug) - length(replace(aug, 'Ã', '')))
                        + (length(aug) - length(replace(aug, 'Â', '')))
                        + ((length(aug) - length(replace(aug, 'â€', ''))) / 2)::int)::int as n_double
                from d
            )
            select doc_id, n_repl, n_double,
                   round(case when length(aug) = 0 then 0.0
                         else (n_repl + n_double) / length(aug)::double end, 6) as mojibake_frac,
                   ((n_repl + n_double) > 0)::int as is_mojibake
            from m
        """,
        "q_c4_clean": r"""
            with d as (
                select doc_id, concat_ws(chr(10),
                    text || '.',
                    'Short one.',
                    'this line has no terminal punctuation at all',
                    case when doc_id % 5 = 0 then 'Enable javascript to view this page.' end,
                    case when doc_id % 7 = 0 then 'It was a dark night. The rain fell hard. Nothing moved.' end,
                    case when doc_id % 9 = 0 then 'function f() { return 1; }' end,
                    case when doc_id % 13 = 0 then 'Lorem ipsum dolor sit amet.' end) as aug
                from documents
            ), st as (
                select doc_id, aug,
                       list_filter(list_transform(string_split(aug, chr(10)), l -> trim(l)),
                                   l -> length(l) > 0) as ne
                from d
            ), kp as (
                select doc_id, aug, ne,
                       list_filter(ne, l -> list_contains(['.', '!', '?', '"'], right(l, 1))
                           and len(string_split_regex(l, '\s+')) >= 3
                           and not contains(lower(l), 'javascript')) as kept
                from st
            ), cl as (
                select doc_id, aug, ne, kept,
                       array_to_string(kept, ' ') as clean_text
                from kp
            )
            select doc_id,
                   len(ne)::int as n_lines,
                   len(kept)::int as n_kept,
                   ((length(clean_text) - length(replace(clean_text, '.', '')))
                    + (length(clean_text) - length(replace(clean_text, '!', '')))
                    + (length(clean_text) - length(replace(clean_text, '?', ''))))::int as n_sentences,
                   contains(aug, '{')::int as has_brace,
                   clean_text,
                   (not contains(aug, '{')
                    and not contains(lower(aug), 'lorem ipsum')
                    and n_sentences >= 3)::int as keep_doc
            from cl
        """,
        "q_chunk_dedup": _sql_chunk_dedup(),
        "q_cdc_chunks": r"""
            with recursive c as (
                select doc_id, text as t, length(text) as n,
                       case when length(text) >= 8 then
                         [p for p in range(8, length(text)::bigint + 1)
                          if ('0x' || substr(md5(substr(text, (p - 7)::int, 8)), 1, 15))::bigint % 64 = 0]
                       else []::bigint[] end as cands
                from documents
            ), r(doc_id, cuts) as (
                select doc_id, []::bigint[] from c
                union all
                select r.doc_id, list_append(r.cuts, x.nxt)
                from r join c using (doc_id),
                lateral (select list_min([p for p in c.cands
                          if p >= coalesce(list_last(r.cuts), 0) + 16]) as nxt) x
                where x.nxt is not null
            ), best as (
                select doc_id, arg_max(cuts, len(cuts)) as cuts
                from r group by doc_id
            ), full_cuts as (
                select c.doc_id, c.t, b.cuts,
                       [0] || b.cuts
                           || (case when len(b.cuts) = 0 or list_last(b.cuts) < c.n
                               then [c.n::bigint] else []::bigint[] end) as cc
                from c join best b using (doc_id)
            )
            select doc_id,
                   len(cuts)::int as n_cuts,
                   len([i for i in range(1, len(cc)) if cc[i + 1] > cc[i]])::int as n_chunks,
                   array_to_string(
                       [(('0x' || substr(md5(substr(t, (cc[i] + 1)::int, (cc[i + 1] - cc[i])::int)), 1, 15))::bigint)::varchar
                        for i in range(1, len(cc)) if cc[i + 1] > cc[i]],
                       ',') as fps
            from full_cuts
        """,
        "q_pii_scrub": _sql_pii_scrub(),
        "q_token_count": f"""
            select doc_id, ({_sql_token_count('text')})::int as n_tokens
            from documents
        """,
        "q_quality_score": f"""
            select doc_id, round(
                0.4 * least(1.0, ({_sql_token_count('text')}) / 100.0)
              + 0.3 * (1.0 - case when length(text) = 0 then 0.0
                    else (length(text) - length(translate(text, '.,!?;:', ''))) / length(text) end)
              + 0.3 * least(1.0, case when ({_sql_token_count('text')}) = 0 then 0.0
                    else length(trim(text)) / ({_sql_token_count('text')}) end / 8.0)
            , 6) as quality
            from documents
        """,
        "q_lang_id": f"select doc_id, {_sql_lang_id()} as lang_pred from documents",
        "q_doc_fingerprint": f"""
            select doc_id, {_sql_md5_60(_sql_norm('text'))} as fp from documents
        """,
        "q_dedup_exact": f"""
            select fp, keep_id from (
                select {_sql_md5_60(_sql_norm('text'))} as fp, doc_id as keep_id,
                       row_number() over (partition by {_sql_md5_60(_sql_norm('text'))}
                                          order by doc_id) as rn
                from documents
            ) where rn = 1
        """,
        "q_simhash16": f"select doc_id, {_sql_simhash16()} as sh16 from documents",
        "q_simhash_near_dups": _sql_simhash_near_dups(),
        "q_ann_lsh": _sql_ann_lsh(),
        "q_ivf_ann": _sql_ivf_ann(),
        "q_semdedup": _sql_semdedup(),
        "q_kmeans": _sql_kmeans(),
        "q_pq_encode": _sql_pq(),
        "q_inverted_index": _sql_inverted_index(),
        "q_zorder": _sql_zorder(),
        "q_merge_upsert": _sql_merge_upsert(),
        "q_profile_table": _sql_profile_table(),
        "q_tile_stats": _sql_tile_stats(),
        "q_recrawl_due": _sql_recrawl_due(),
        "q_cache_ttl": r"""
            with d as (
                select event_id,
                       case when event_id % 7 = 0 then 'max-age=' || (60 * (event_id % 24))::varchar || ', public'
                            when event_id % 7 = 1 then 'no-store'
                            when event_id % 7 = 2 then 's-maxage=' || (30 * (event_id % 10))::varchar || ', max-age=999'
                            when event_id % 7 = 3 then ''
                            when event_id % 7 = 4 then 'no-cache="set-cookie", max-age=60'
                            when event_id % 7 = 5 then 'private, max-age=30'
                            else 'immutable, max-age=' || (event_id % 500)::varchar end as cc
                from events
            ), m as (
                select event_id, cc, lower(cc) as low,
                       (regexp_matches(lower(cc), '(?:^|[,\s])no-store(?:$|[,\s])')
                        or regexp_matches(lower(cc), '(?:^|[,\s])no-cache(?:$|[,\s=])')
                        or regexp_matches(lower(cc), '(?:^|[,\s])private(?:$|[,\s=])')) as blocked,
                       nullif(regexp_extract(lower(cc), '(?:^|[,\s])s-maxage\s*=\s*(\d+)', 1), '')::bigint as smax,
                       nullif(regexp_extract(lower(cc), '(?:^|[,\s])max-age\s*=\s*(\d+)', 1), '')::bigint as mage
                from d
            )
            select event_id, cc,
                   (not blocked)::int as cacheable,
                   (case when blocked then 0 else coalesce(smax, mage) end)::bigint as ttl_s
            from m
        """,
        "q_robots_sitemaps": r"""
            with d as (
                select 'h' || s_suppkey::varchar as host,
                       'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10)
                       || (case when s_suppkey % 4 >= 1
                           then 'Sitemap: https://h' || s_suppkey::varchar || '.ex/a.xml' || chr(10) else '' end)
                       || (case when s_suppkey % 4 >= 2
                           then 'sitemap:https://h' || s_suppkey::varchar || '.ex/b.xml # alt' || chr(10) else '' end)
                       || (case when s_suppkey % 4 >= 3
                           then 'SITEMAP: https://cdn.ex/h' || s_suppkey::varchar || '.xml.gz' || chr(10) else '' end)
                       || 'Crawl-delay: 2' || chr(10) as body
                from supplier
            ), sm as (
                select host,
                       list_filter(
                           list_transform(string_split(body, chr(10)),
                               l -> case when starts_with(lower(trim(l)), 'sitemap:')
                                    then trim(regexp_replace(substr(trim(l), strpos(trim(l), ':') + 1), '#.*$', ''))
                                    end),
                           v -> v is not null and length(v) > 0) as urls
                from d
            )
            select host, u.pos::int as pos, u.sitemap_url
            from (
                select host,
                       unnest([{'pos': i - 1, 'sitemap_url': urls[i]}
                               for i in range(1, len(urls) + 1)]) as u
                from sm
            )
        """,
        "q_revalidation": f"""
            with cache as (
                select o_orderkey as url_fp,
                       'e' || (o_orderkey % 10)::varchar as cached_etag,
                       {_sql_md5_60("'v1:' || o_orderkey::varchar")} as cached_fp,
                       ((o_orderkey % 1000) + 100)::bigint as cached_bytes
                from orders where o_orderkey % 3 != 0
            ), server as (
                select o_orderkey as url_fp,
                       case when o_orderkey % 4 = 1
                            then 'e' || ((o_orderkey % 10) + 1)::varchar
                            else 'e' || (o_orderkey % 10)::varchar end as srv_etag,
                       case when o_orderkey % 4 = 1
                            then {_sql_md5_60("'v2:' || o_orderkey::varchar")}
                            else {_sql_md5_60("'v1:' || o_orderkey::varchar")} end as srv_fp,
                       ((o_orderkey % 1000) + 120)::bigint as srv_bytes
                from orders where o_orderkey % 17 != 5
            ), plan as (
                select o.o_orderkey as url_fp, c.cached_etag, c.cached_fp,
                       c.cached_bytes,
                       case when c.cached_etag is not null
                            then 'conditional' else 'full' end as mode
                from orders o left join cache c on o.o_orderkey = c.url_fp
            ), j as (
                select p.*, s.srv_etag, s.srv_fp, s.srv_bytes,
                       case when s.srv_etag is null then 404
                            when p.mode = 'conditional' and s.srv_etag = p.cached_etag then 304
                            else 200 end as status
                from plan p left join server s on p.url_fp = s.url_fp
            )
            select url_fp, mode, status::int as status,
                   case when status = 304 then cached_fp
                        when status = 200 then srv_fp end as payload_fp,
                   (case when status = 304 then cached_bytes else 0 end)::bigint as bytes_saved,
                   (case when status = 200 then coalesce(srv_bytes, 0) else 0 end)::bigint as bytes_fetched
            from j
        """,
        "q_freshness_alloc": """
            with d as (
                select o_custkey % 50 as host, o_orderkey as id,
                       o_totalprice / 100000.0 as lam
                from orders
            ), r as (
                select *,
                       row_number() over (partition by host order by lam, id) as rn,
                       sum(lam) over (partition by host order by lam, id
                           rows between unbounded preceding and current row) as s_k,
                       sum(sqrt(lam)) over (partition by host order by lam, id
                           rows between unbounded preceding and current row) as q_k
                from d
            ), t as (
                select *, (10.0 + s_k) / q_k as t_k,
                       ((10.0 + s_k) / q_k) * sqrt(lam) > lam as valid
                from r
            ), b as (
                select host,
                       max(case when valid then rn end) as k_star,
                       arg_max(t_k, case when valid then rn end) as t_star
                from t group by host
            )
            select t.host, t.id, t.lam,
                   case when t.rn <= b.k_star
                        then b.t_star * sqrt(t.lam) - t.lam else 0.0 end as freq,
                   case when t.rn <= b.k_star
                        then (b.t_star * sqrt(t.lam) - t.lam)
                             / ((b.t_star * sqrt(t.lam) - t.lam) + t.lam)
                        else 0.0 end as freshness,
                   (t.rn <= b.k_star)::int as active
            from t join b using (host)
        """,
        "q_rand_proj": _sql_rand_proj(),
        "q_ssjoin": _sql_ssjoin(),
        "q_bm25_search": _sql_bm25_search(),
        "q_normalize_images": _sql_normalize_images(),
        "q_bpe_merges": _sql_bpe_merges(),
        "q_bpe_encode": _sql_bpe_encode(),
        "q_decontaminate": _sql_decontaminate(),
        "q_perplexity_filter": _sql_perplexity_filter(),
        "q_nb_classify": _sql_nb_classify(),
        "q_pmi_collocations": _sql_pmi_collocations(),
        "q_hits": _sql_hits(),
        "q_char_entropy": _sql_char_entropy(),
        "q_winsorize": _sql_winsorize(),
        "q_neg_pairs": _sql_neg_pairs(),
        "q_minhash_delta": _sql_minhash_delta(),
        "q_dedup_decisions": _sql_dedup_decisions(),
        "q_blur_scores": _sql_blur_scores(),
        "q_domain_quality": _sql_domain_quality(),
        "q_url_templates": _sql_url_templates(),
        "q_path_tree": """
            with d as (
                select 'h' || (event_id % 8)::varchar as host,
                       '/cat' || (user_id % 5)::varchar
                       || (case when event_id % 2 = 0
                           then '/sub' || (event_id % 3)::varchar || '/item' || event_id::varchar
                           else '/page' || (event_id % 7)::varchar end) as path
                from events
            ), parts as (
                select host, list_filter(string_split(path, '/'), x -> length(x) > 0) as ps
                from d
            ), p as (
                select host,
                       unnest(['/' || array_to_string(ps[1:i], '/')
                               for i in range(1, least(len(ps), 3) + 1)]) as prefix,
                       unnest(range(1, least(len(ps), 3) + 1)) as depth
                from parts
            ), ph as (
                select prefix, depth, host, count(*) as n
                from p group by 1, 2, 3
            )
            select prefix, depth::int as depth,
                   sum(n)::bigint as n_pages, count(*)::bigint as n_hosts
            from ph group by 1, 2
        """,
        "q_seed_distance": _sql_seed_distance(),
        "q_sniff_types": _sql_sniff_types(),
        "q_scd2_history": _sql_scd2_history(),
        "q_boilerplate": _sql_boilerplate(),
        "q_anchor_profile": _sql_anchor_profile(),
        "q_image_borders": _sql_image_borders(),
        "q_vocab_coverage": _sql_vocab_coverage(),
        "q_sitemap_entries": _sql_sitemap_entries(),
        "q_rate_limit_audit": _sql_rate_limit_audit(),
        "q_budget_alloc": _sql_budget_alloc(),
        "q_redirect_resolve": _sql_redirect_resolve(),
        "q_host_mirrors": _sql_host_mirrors(),
        "q_containment": _sql_containment(),
        "q_change_rate": _sql_change_rate(),
        "q_edit_verify": _sql_edit_verify(),
        "q_dsir_resample": _sql_dsir_resample(),
        "q_minhash_lsh": _sql_minhash_lsh(),
        "q_crawl_reference": _sql_crawl_reference(),
        "q_image_features": _sql_image_features(),
        "q_jpeg_features": _sql_jpeg_features(),
        "q_jpeg_quality": _sql_jpeg_quality(),
        "q_charset": _sql_charset(),
        "q_colorfulness": _sql_colorfulness(),
        "q_ssim_verify": _sql_ssim_verify(),
        "q_audio_features": _sql_audio_features(),
        "q_video_features": _sql_video_features(),
        "q_video_frames": _sql_video_frames(),
        "q_phash_near_dup": _sql_phash_near_dup(),
        "q_curate_images": _sql_curate_images(),
        "q_clip_filter": _sql_clip_filter(),
        "q_ar_batches": _sql_ar_batches(),
        "q_cluster_sample": _sql_cluster_sample(),
        "q_dup_spans": f"""
            with t as (
                select doc_id, string_split_regex(trim(text), '\\s+') as w
                from documents where length(trim(text)) > 0
            ), p as (
                select doc_id, w,
                       unnest(range(0, greatest(len(w) - 7, 0)))::int as pos
                from t
            ), g as (
                select doc_id, pos,
                       {_sql_md5_60("array_to_string(w[pos+1 : pos+8], ' ')")} as gram
                from p
            ), c as (
                select gram from g group by gram having count(*) >= 2
            ), d as (
                select doc_id, pos from g join c using (gram)
            ), grp as (
                select doc_id, pos,
                       pos - row_number() over (
                           partition by doc_id order by pos) as gg
                from d
            )
            select doc_id, min(pos) as span_start, max(pos) + 7 as span_end,
                   count(*) as n_dup_grams
            from grp group by doc_id, gg
        """,
        "q_ngram_jaccard": f"""
            with d as (
                select doc_id, list_distinct({_sql_shingles(3)}) as sh
                from documents where doc_id < 300
            ), dd as (
                select doc_id, sh from d where len(sh) > 0
            ), ex as (
                select doc_id, unnest(sh) as s from dd
            ), pairs as (
                select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as inter
                from ex a join ex b using (s)
                where a.doc_id < b.doc_id
                group by 1, 2
            )
            select doc_a, doc_b,
                   round(inter / (na.n + nb.n - inter), 6) as jaccard
            from pairs
            join (select doc_id, len(sh) as n from dd) na on na.doc_id = doc_a
            join (select doc_id, len(sh) as n from dd) nb on nb.doc_id = doc_b
            where inter / (na.n + nb.n - inter) >= 0.2
        """,
        "q_dup_components": _sql_dup_components(),
        "q_leakage_split": f"""
            with comp as (
                {_sql_dup_components()}
            ), b as (
                select doc_id, component,
                       (('0x' || substr(md5('split-v1:' || component::varchar), 1, 15))::bigint) % 100 as bucket
                from comp
            )
            select doc_id, component, bucket,
                   case when bucket < 90 then 'train'
                        when bucket < 95 then 'val'
                        else 'test' end as split
            from b
        """,
        "q_join_agg_topk": """
            with j as (
                select l_orderkey,
                       round(sum(l_extendedprice * (1.0 - l_discount)), 4) as revenue,
                       count(*) as n_lines,
                       sum(l_extendedprice * (1.0 - l_discount)) as rev_raw
                from lineitem
                join orders on l_orderkey = o_orderkey
                join customer on o_custkey = c_custkey
                where c_mktsegment = 'BUILDING'
                  and o_orderdate < timestamp '2024-06-01 00:00:00'
                group by l_orderkey
            )
            select row_number() over (order by rev_raw desc, l_orderkey) as rk,
                   l_orderkey, revenue, n_lines
            from j
            order by rev_raw desc, l_orderkey
            limit 20
        """,
        "q_embed_near_dup": """
            with c as (
                select vec_id, [x::double for x in embedding] as v
                from embeddings where vec_id < 300
            ), pairs as (
                select a.vec_id as id_a, b.vec_id as id_b,
                       list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)]) /
                       (sqrt(list_sum([x * x for x in a.v])) *
                        sqrt(list_sum([x * x for x in b.v]))) as cs
                from c a cross join c b
                where a.vec_id < b.vec_id
            )
            select id_a, id_b, round(cs, 6) as cos_sim
            from pairs where cs >= 0.3
        """,
        "q_file_plan": """
            with d as (
                select doc_id,
                       (length(text) * 50
                        + case when doc_id % 5 = 0 then 400000 else 0 end)::bigint as nbytes
                from documents
            )
            select doc_id, nbytes,
                   floor((sum(nbytes) over (order by doc_id
                            rows between unbounded preceding and current row)
                          - nbytes) / 1000000.0)::int as file_id
            from d
        """,
        "q_equi_depth": """
            with c as (
                select l_extendedprice as v, count(*) as cnt
                from lineitem group by 1
            ), r as (
                select v, cnt,
                       sum(cnt) over (order by v
                           rows between unbounded preceding and current row) as cum_end,
                       (select sum(cnt) from c) as total
                from c
            ), a as (
                select v, cnt,
                       floor((cum_end * 8 + total - 1) / total)::int as bucket
                from r
            )
            select bucket, min(v)::double as lo, max(v)::double as hi,
                   sum(cnt)::bigint as n_rows, count(*)::bigint as n_distinct
            from a group by bucket
        """,
        "q_bloom_join": """
            select l.l_orderkey as orderkey, l.l_linenumber as linenumber,
                   l.l_extendedprice as extprice,
                   o.o_totalprice as totalprice, o.o_orderpriority as priority
            from lineitem l
            join orders o on l.l_orderkey = o.o_orderkey
            where o.o_totalprice > 490000
        """,
        "q_multi_join": """
            select n_name,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4) as revenue,
                   count(*) as n_lines
            from customer
            join orders   on c_custkey = o_custkey
            join lineitem on o_orderkey = l_orderkey
            join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
            join nation   on s_nationkey = n_nationkey
            join region   on n_regionkey = r_regionkey
            where r_name = 'ASIA'
            group by n_name
        """,
        "q_winnow_fingerprint": f"""
            with sh as (
                select doc_id, {_sql_shingles(3)} as s from documents
            ), hs as (
                select doc_id, [{_sql_md5_60('g')} for g in s] as h from sh
            ), fps as (
                select doc_id,
                       case when len(h) = 0 then []::bigint[]
                            when len(h) < 4 then [list_min(h)]
                            else list_sort(list_distinct(
                                [list_min(h[i:i+3]) for i in range(1, len(h) - 2)]
                            )) end as f
                from hs
            )
            select doc_id, u.i::int - 1 as pos, f[u.i] as fp
            from fps cross join lateral
                 (select unnest(range(1, len(f) + 1)) as i) u
        """,
        "q_embed_cosine_topk": """
            with c as (select vec_id, [x::double for x in embedding] as v from embeddings),
                 q as (select vec_id as query_id, v as qv from c where vec_id < 10),
                 scored as (
                    select q.query_id, c.vec_id as cand_id,
                           list_sum([qv[i] * v[i] for i in range(1, len(v) + 1)]) /
                           (sqrt(list_sum([x * x for x in qv])) *
                            sqrt(list_sum([x * x for x in v]))) as cs
                    from c cross join q
                    where c.vec_id != q.query_id
                 )
            select query_id, cand_id, rank, round(cs, 6) as cos_sim from (
                select query_id, cand_id, cs,
                       row_number() over (partition by query_id
                           order by cs desc, cand_id) as rank
                from scored
            ) where rank <= 5
        """,
    }
