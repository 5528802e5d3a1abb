"""Unit tests for the ranking + politeness operators in isolation."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from olx_spark.functions.urls import host_salt
from olx_spark.operators.politeness import per_host_budget, robots_filter
from olx_spark.operators.ranking import frontier_rank, ordered_limit

FRONTIER = "url string, host string, priority int, discovery_round int, discovery_pos long"


def _frontier(spark):
    rows = [
        (f"https://h{h}.example/a/{i}/", f"h{h}.example", p, r, i)
        for h in range(2)
        for i, (p, r) in enumerate([(5, 0), (1, 0), (5, 1), (9, 2), (1, 1)])
    ]
    return spark.createDataFrame(rows, FRONTIER)


def test_frontier_rank_priority_queue(spark):
    df = frontier_rank(_frontier(spark))
    top = {
        r["host"]: r["url"] for r in df.filter(F.col("host_rank") == 0).collect()
    }
    # highest priority wins regardless of discovery order
    for h in range(2):
        assert top[f"h{h}.example"].endswith("/3/")


def test_ordered_limit_deterministic(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], "v long, g int")
    got = ordered_limit(df, 4, [F.col("v").desc()])
    assert [r["v"] for r in got.orderBy("rank_in_limit").collect()] == [29, 28, 27, 26]
    per_g = ordered_limit(df, 2, [F.col("v").desc()], ["g"])
    assert per_g.count() == 6


def test_per_host_budget_and_delay(spark):
    f = _frontier(spark).withColumn(
        "crawl_delay_ms", F.when(F.col("host") == "h0.example", 200).otherwise(0)
    )
    out = per_host_budget(f, round_budget_ms=600, default_per_round=2)
    by_host = {}
    for r in out.collect():
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["h0.example"]) == 3  # 600/200
    assert len(by_host["h1.example"]) == 2  # default
    # not_before spacing honors the delay
    nb = sorted(r["not_before_ms"] for r in by_host["h0.example"])
    assert nb == [0, 200, 400]


def test_per_host_budget_ties_deterministic(spark):
    """Two listing pages of ONE host fetched in the SAME round produce
    ads with identical (priority, discovery_round, discovery_pos) — the
    default order must still be total (parent_fp, url_fp tie-breaks),
    so the budget cut is identical at any parallelism."""
    rows = [
        # (url, host, priority, round, pos, parent_fp)
        (f"https://h.example/ad/{p}/{i}/", "h.example", 1, 0, i, p)
        for p in (111, 222)  # two parent pages, colliding (prio, rnd, pos)
        for i in range(6)
    ]
    schema = (
        "url string, host string, priority int, discovery_round int, "
        "discovery_pos long, parent_fp long"
    )
    picks = []
    for nparts in (1, 7, 32):
        f = (
            spark.createDataFrame(rows, schema)
            .repartition(nparts)
            .withColumn("url_fp", F.xxhash64("url"))
            .withColumn("crawl_delay_ms", F.lit(0))
        )
        out = per_host_budget(f, default_per_round=5)
        picks.append(sorted((r["host_rank"], r["url"]) for r in out.collect()))
        assert len(picks[-1]) == 5
    assert picks[0] == picks[1] == picks[2]
    # order is pos-major (pagination-first convention holds across
    # parents), parent_fp-minor: 111/0, 222/0, 111/1, 222/1, 111/2
    want = [
        (0, "https://h.example/ad/111/0/"),
        (1, "https://h.example/ad/222/0/"),
        (2, "https://h.example/ad/111/1/"),
        (3, "https://h.example/ad/222/1/"),
        (4, "https://h.example/ad/111/2/"),
    ]
    assert picks[0] == want


def test_pagination_sentinel_outranks_ads_across_parents(spark):
    """discovery_pos=-1 (a next-page link) must beat every same-round ad
    of its host under the default budget order, whatever its parent —
    the frontier tie-breaks may not bury pagination behind a parent
    with a smaller fingerprint."""
    rows = [
        ("https://h.example/list/?page=1", "h.example", 1, 0, -1, 999),
    ] + [
        (f"https://h.example/ad/{i}/", "h.example", 1, 0, i, 1)
        for i in range(10)
    ]
    schema = (
        "url string, host string, priority int, discovery_round int, "
        "discovery_pos long, parent_fp long"
    )
    f = (
        spark.createDataFrame(rows, schema)
        .withColumn("url_fp", F.xxhash64("url"))
        .withColumn("crawl_delay_ms", F.lit(0))
    )
    out = per_host_budget(f, default_per_round=1).collect()
    assert len(out) == 1 and out[0]["url"].endswith("page=1")


def test_two_phase_budget_equals_single_phase_on_hot_host(spark):
    """One host holding ~100x the frontier of the rest: the two-phase
    salted cut must be row-for-row identical to the single-phase
    per-host window (host_rank AND not_before_ms included), while
    spreading the hot host's pre-rank over salt_buckets tasks."""
    rows = [
        (f"https://hot.example/ad/{i}/", "hot.example", i % 7, i % 3, i, i % 13)
        for i in range(1000)
    ] + [
        (f"https://h{h}.example/ad/{i}/", f"h{h}.example", i % 5, 0, i, 1)
        for h in range(3)
        for i in range(10)
    ]
    schema = (
        "url string, host string, priority int, discovery_round int, "
        "discovery_pos long, parent_fp long"
    )
    f = (
        spark.createDataFrame(rows, schema)
        .withColumn("url_fp", F.xxhash64("url"))
        .withColumn(
            "crawl_delay_ms",
            F.when(F.col("host") == "hot.example", 50).otherwise(0),
        )
    )
    kw = dict(round_budget_ms=600, default_per_round=4)  # hot budget = 12
    two_phase = per_host_budget(f, salt_buckets=8, **kw)
    single = per_host_budget(f, salt_buckets=1, **kw)
    key = lambda r: (r["host"], r["host_rank"], r["url"], r["not_before_ms"])
    got, want = sorted(map(key, two_phase.collect())), sorted(map(key, single.collect()))
    assert got == want and len(got) == 12 + 3 * 4


def test_frontier_rank_top_n_two_phase_equals_full_rank(spark):
    """frontier_rank(top_n): salted two-phase cut == head of the full
    single-phase rank, per host, on a skewed frontier."""
    rows = [
        (f"https://hot.example/a/{i}/", "hot.example", i % 9, i % 2, i)
        for i in range(500)
    ] + [(f"https://cold.example/a/{i}/", "cold.example", 1, 0, i) for i in range(5)]
    f = spark.createDataFrame(rows, FRONTIER).withColumn(
        "url_fp", F.xxhash64("url")
    )
    top = frontier_rank(f, top_n=7, salt_buckets=8)
    full = frontier_rank(f).filter(F.col("host_rank") < 7)
    key = lambda r: (r["host"], r["host_rank"], r["url"])
    assert sorted(map(key, top.collect())) == sorted(map(key, full.collect()))


def test_ordered_limit_per_group_two_phase_equals_single_phase(spark):
    """ordered_limit's per-group path now routes through salted_precut
    (the same shape per_host_budget/frontier_rank use): on a skewed
    group the two-phase result must be row-identical — rank_in_limit
    included — to the single-phase window. The frame has no url/url_fp
    column, exercising the generic all-columns salt source."""
    rows = [("hot", i % 11, i) for i in range(2000)] + [
        (f"g{g}", i, i + 100) for g in range(4) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "grp string, score long, id long")
    order = [F.col("score").desc(), F.col("id")]
    two = ordered_limit(df, 5, order, ["grp"], salt_buckets=8)
    one = ordered_limit(df, 5, order, ["grp"], salt_buckets=1)
    key = lambda r: (r["grp"], r["rank_in_limit"], r["score"], r["id"])
    got, want = sorted(map(key, two.collect())), sorted(map(key, one.collect()))
    assert got == want and len(got) == 5 * 5


def test_salted_precut_property_vs_single_phase(spark):
    """Property test (VERDICT r3 #6): ~100 seeded-random configs —
    random hosts/priorities with heavily duplicated (priority, round,
    pos) order prefixes x budget in {1, 3, unbounded} x salt_buckets in
    {1, 4, 8} — the salted pre-cut + final window must be row-identical
    to the single-phase per-group window. Configs share one DataFrame
    per salt_buckets value (grouped by a cfg column) so the whole sweep
    is three Spark comparisons, not one job per seed."""
    import random

    from olx_spark.operators.ranking import salted_precut

    order = [
        F.col("priority").desc(), F.col("discovery_round"),
        F.col("discovery_pos"), F.col("parent_fp"), F.col("url_fp"),
    ]
    schema = (
        "cfg int, host string, priority int, discovery_round int, "
        "discovery_pos long, parent_fp long, url_fp long, budget long"
    )
    n_cfg_per_bucket = 34  # 3 bucket values x 34 = 102 configs
    for salt_buckets in (1, 4, 8):
        rows = []
        for cfg in range(n_cfg_per_bucket):
            rng = random.Random(1000 * salt_buckets + cfg)
            budget = rng.choice([1, 3, 1 << 40])
            for i in range(rng.randrange(5, 40)):
                rows.append(
                    (
                        cfg,
                        f"h{rng.randrange(1, 4)}",
                        rng.randrange(0, 3),       # few distinct -> many ties
                        rng.randrange(0, 2),
                        rng.randrange(0, 4),
                        rng.randrange(0, 5),
                        # unique url_fp keeps the order total (engine
                        # invariant); collisions across cfgs are fine
                        cfg * 10_000 + i * 7 + rng.randrange(0, 3) * 100_000,
                        budget,
                    )
                )
        df = spark.createDataFrame(rows, schema)
        groups = ["cfg", "host"]
        w = Window.partitionBy(*groups).orderBy(*order)
        single = (
            df.withColumn("rk", F.row_number().over(w) - 1)
            .filter(F.col("rk") < F.col("budget"))
        )
        pre = salted_precut(
            df, order, F.col("budget"), salt_buckets, partition_cols=groups
        )
        two = (
            pre.withColumn("rk", F.row_number().over(w) - 1)
            .filter(F.col("rk") < F.col("budget"))
        )
        key = lambda r: (r["cfg"], r["host"], r["rk"], r["url_fp"])
        got = sorted(map(key, two.collect()))
        want = sorted(map(key, single.collect()))
        assert got == want, f"salt_buckets={salt_buckets}: mismatch"
        assert len(got) > 0


def test_robots_flag_splits_one_scan(spark):
    """robots_flag returns a disallowed column so allowed/excluded are
    two filters of one scan — no exceptAll set-difference in the plan."""
    from olx_spark.operators.politeness import robots_flag

    f = _frontier(spark)
    hosts = spark.createDataFrame(
        [("h0.example", 0, ["/a/1"]), ("h1.example", 0, [])],
        "host string, crawl_delay_ms int, robots_disallow array<string>",
    )
    flagged = robots_flag(f, hosts)
    allowed = flagged.filter(~F.col("disallowed"))
    excluded = flagged.filter(F.col("disallowed"))
    assert excluded.count() == 1
    assert allowed.count() == 9
    plan = excluded._jdf.queryExecution().executedPlan().toString()
    assert "Except" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_robots_filter_prefix(spark):
    f = _frontier(spark)
    hosts = spark.createDataFrame(
        [("h0.example", 0, ["/a/1", "/a/3"]), ("h1.example", 0, [])],
        "host string, crawl_delay_ms int, robots_disallow array<string>",
    )
    out = robots_filter(f, hosts).collect()
    kept = {(r["host"], r["url"]) for r in out}
    assert ("h0.example", "https://h0.example/a/1/") not in kept
    assert ("h0.example", "https://h0.example/a/3/") not in kept
    assert ("h0.example", "https://h0.example/a/0/") in kept
    assert sum(1 for h, _ in kept if h == "h1.example") == 5


def test_host_salt_spreads_but_keeps_host(spark):
    df = spark.createDataFrame(
        [(f"https://hot.example/x/{i}/", "hot.example") for i in range(200)],
        "url string, host string",
    ).withColumn("salted", host_salt(F.col("host"), F.col("url"), buckets=8))
    salts = {r["salted"] for r in df.collect()}
    assert len(salts) == 8
    assert all(s.startswith("hot.example#") for s in salts)


def test_robots_txt_parse_rfc_grouping(spark):
    """robots_disallow_prefixes: RFC 9309 grouping — consecutive UA
    lines share a group; a rule line closes the UA run; empty Disallow
    skipped; comments/case/blank lines handled; non-star groups
    ignored. Pure JVM plan (no Python)."""
    from olx_spark.operators.politeness import robots_disallow_prefixes

    bodies = {
        "basic": ("User-agent: *\nDisallow: /private/\nDisallow: /tmp/", ["/private/", "/tmp/"]),
        "other_ua_only": ("User-agent: googlebot\nDisallow: /g/", []),
        "grouped_ua": ("User-agent: googlebot\nUser-agent: *\nDisallow: /x/", ["/x/"]),
        "rule_closes_group": (
            "User-agent: googlebot\nDisallow: /g/\nUser-agent: *\nDisallow: /y/",
            ["/y/"],
        ),
        "star_then_specific": (
            "User-agent: *\nDisallow: /a/\n\nUser-agent: bot\nDisallow: /b/",
            ["/a/"],
        ),
        "empty_disallow_allows": ("User-agent: *\nDisallow:", []),
        "comments_and_case": (
            "# robots\nUSER-AGENT: *  # us\nDISALLOW: /c/  # hidden",
            ["/c/"],
        ),
        "crawl_delay_closes": (
            "User-agent: *\nCrawl-delay: 10\nUser-agent: bot\nDisallow: /z/",
            [],
        ),
        "path_with_colon": ("User-agent: *\nDisallow: /a:b/", ["/a:b/"]),
        "empty_body": ("", []),
    }
    rows = [(k, v[0]) for k, v in bodies.items()]
    df = spark.createDataFrame(rows, "k string, body string").select(
        "k", robots_disallow_prefixes("body").alias("p")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    got = {r["k"]: list(r["p"]) for r in df.collect()}
    for k, (_, want) in bodies.items():
        assert got[k] == want, f"{k}: {got[k]} != {want}"


def test_robots_allow_precedence_rfc9309(spark):
    """RFC 9309 §2.2.2: most specific (longest) matching rule wins,
    Allow wins exact ties, no match -> allowed."""
    from olx_spark.operators.politeness import hosts_from_robots, robots_flag

    hosts = hosts_from_robots(
        spark,
        [
            ("h.example", 0, "User-agent: *\nAllow: /public/\nDisallow: /"),
            # exact tie: Allow and Disallow on the same prefix -> allowed
            ("t.example", 0, "User-agent: *\nAllow: /p/\nDisallow: /p/"),
            # longer Disallow beats shorter Allow
            ("d.example", 0, "User-agent: *\nAllow: /a/\nDisallow: /a/secret/"),
        ],
    )
    f = spark.createDataFrame(
        [
            ("https://h.example/public/x/", "h.example"),
            ("https://h.example/private/x/", "h.example"),
            ("https://t.example/p/x/", "t.example"),
            ("https://d.example/a/ok/", "d.example"),
            ("https://d.example/a/secret/x/", "d.example"),
        ],
        "url string, host string",
    )
    got = {r["url"]: r["disallowed"] for r in robots_flag(f, hosts).collect()}
    assert got == {
        "https://h.example/public/x/": False,
        "https://h.example/private/x/": True,
        "https://t.example/p/x/": False,
        "https://d.example/a/ok/": False,
        "https://d.example/a/secret/x/": True,
    }


def _py_robots_rules(body: str) -> tuple[list[str], list[str]]:
    """Independent reference parser (RFC 9309 grouping + the engine's
    conservative wildcard degradation) the JVM-expression parser is
    property-tested against: Disallow cut at the first '*' / trailing
    '$' stripped (empty result -> '/'), wildcard Allow dropped."""
    allow: list[str] = []
    disallow: list[str] = []
    star, closed = False, True
    for raw in body.replace("\r\n", "\n").split("\n"):
        ln = raw.split("#", 1)[0].strip()
        if not ln:
            continue
        low = ln.lower()
        if low.startswith("user-agent:"):
            ua = ln.split(":", 1)[1].strip().lower()
            star = (ua == "*") if closed else (star or ua == "*")
            closed = False
        elif low.startswith("disallow:") or low.startswith("allow:"):
            v = ln.split(":", 1)[1].strip()
            closed = True
            if star and v:
                if low.startswith("disallow:"):
                    t = v.split("*", 1)[0]
                    if t.endswith("$"):
                        t = t[:-1]
                    disallow.append(t or "/")
                elif "*" not in v:
                    allow.append(v)
        else:
            closed = True
    return allow, disallow


def test_robots_parser_property_vs_reference(spark):
    """Property test: 250 seeded-random adversarial robots bodies
    (UA/rule/comment/blank interleavings, case noise, colons in paths,
    leading rules before any UA, UA runs split by comments) parsed by
    the JVM expression must equal the independent Python parser."""
    import random

    from olx_spark.operators.politeness import robots_rules

    ua_vals = ["*", "googlebot", "Bot-X", "*", "other-bot"]
    paths = [
        "/a/", "/b:c/", "", "/p/q", "/a/", "/x", "/public/", "/a/secret/",
        # RFC wildcard/anchor forms -> conservative degradation
        "/*.php", "/a/*/b", "*", "/priv$", "$", "/pub*", "/exact$",
    ]
    bodies = []
    for seed in range(250):
        rng = random.Random(seed)
        lines = []
        for _ in range(rng.randrange(0, 16)):
            kind = rng.randrange(8)
            if kind in (0, 1):
                lines.append(f"User-agent: {rng.choice(ua_vals)}")
            elif kind in (2, 3):
                lines.append(f"Disallow: {rng.choice(paths)}")
            elif kind == 4:
                lines.append(f"Allow: {rng.choice(paths)}")
            elif kind == 5:
                lines.append(rng.choice(["", "# a comment", "   "]))
            elif kind == 6:
                lines.append(
                    rng.choice(["Crawl-delay: 10", "Sitemap: https://x/m.xml"])
                )
            else:  # case noise + trailing comments
                lines.append(
                    rng.choice(
                        [
                            "DISALLOW: /c/  # hidden",
                            "user-AGENT: *",
                            "ALLOW: /ok/",
                            "diSallow: /Mix/",
                        ]
                    )
                )
            if rng.random() < 0.15:
                lines[-1] += "  # trailing"
        bodies.append((seed, "\n".join(lines)))

    df = spark.createDataFrame(bodies, "seed int, body string").select(
        "seed", robots_rules("body").alias("r")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # parser stays a pure JVM expression
    got = {r["seed"]: (list(r["r"]["allow"]), list(r["r"]["disallow"])) for r in df.collect()}
    for seed, body in bodies:
        want = _py_robots_rules(body)
        assert got[seed] == want, f"seed {seed}: {got[seed]} != {want}\n{body}"


def test_robots_wildcard_conservative_fallback(spark):
    """ADVICE r3: '*' / '$' patterns must degrade in the SAFE direction
    (over-block for Disallow, under-allow for Allow) instead of being
    matched as literal characters, which under-blocked (/*.php matched
    nothing and disallowed URLs were fetched)."""
    from olx_spark.operators.politeness import hosts_from_robots, robots_flag, robots_rules

    cases = {
        "glob_ext": ("User-agent: *\nDisallow: /*.php", [], ["/"]),
        "mid_glob": ("User-agent: *\nDisallow: /a/*/b", [], ["/a/"]),
        "bare_star": ("User-agent: *\nDisallow: *", [], ["/"]),
        "anchor": ("User-agent: *\nDisallow: /priv$", [], ["/priv"]),
        "bare_anchor": ("User-agent: *\nDisallow: $", [], ["/"]),
        "allow_glob_dropped": ("User-agent: *\nAllow: /pub*\nDisallow: /", [], ["/"]),
        "allow_anchor_literal": ("User-agent: *\nAllow: /exact$", ["/exact$"], []),
    }
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "k string, body string"
    ).select("k", robots_rules("body").alias("r"))
    got = {r["k"]: (list(r["r"]["allow"]), list(r["r"]["disallow"])) for r in df.collect()}
    for k, (_, alw, dis) in cases.items():
        assert got[k] == (alw, dis), f"{k}: {got[k]}"

    # end-to-end: the wildcarded Disallow actually blocks its subtree
    hosts = hosts_from_robots(
        spark, [("h.example", 0, "User-agent: *\nAllow: /ok/\nDisallow: /a/*/b")]
    )
    f = spark.createDataFrame(
        [
            ("https://h.example/a/x/b/", "h.example"),   # over-blocked (safe)
            ("https://h.example/a/anything/", "h.example"),  # over-blocked (safe)
            ("https://h.example/ok/page/", "h.example"),  # Allow still wins
            ("https://h.example/c/", "h.example"),
        ],
        "url string, host string",
    )
    got = {r["url"]: r["disallowed"] for r in robots_flag(f, hosts).collect()}
    assert got == {
        "https://h.example/a/x/b/": True,
        "https://h.example/a/anything/": True,
        "https://h.example/ok/page/": False,
        "https://h.example/c/": False,
    }


def test_hosts_from_robots_feeds_robots_filter(spark):
    """Raw robots bodies -> hosts dim -> robots_filter end-to-end."""
    from olx_spark.operators.politeness import hosts_from_robots

    hosts = hosts_from_robots(
        spark,
        [
            ("h0.example", 0, "User-agent: *\nDisallow: /a/1"),
            ("h1.example", 100, "User-agent: other\nDisallow: /"),
        ],
    )
    f = _frontier(spark)
    kept = {(r["host"], r["url"]) for r in robots_filter(f, hosts).collect()}
    assert ("h0.example", "https://h0.example/a/1/") not in kept
    assert ("h0.example", "https://h0.example/a/0/") in kept
    assert sum(1 for h, _ in kept if h == "h1.example") == 5


# ---------------------------------------------- rate-limit audit ----

def test_rate_limit_audit_hand_computed(spark):
    from olx_spark.operators.politeness import rate_limit_audit

    rows = [
        # host a: ts 0,10,20,30,31 with W=30, cap=3
        ("a", 0), ("a", 10), ("a", 20), ("a", 30), ("a", 31),
        # host b: two simultaneous fetches count each other
        ("b", 100), ("b", 100),
    ]
    df = spark.createDataFrame(rows, "host string, ts_s long")
    out = rate_limit_audit(df, window_s=30, max_in_window=3).collect()
    got = sorted((r.host, r.ts_s, r.n_in_window, r.violation) for r in out)
    assert got == [
        ("a", 0, 1, 0),
        ("a", 10, 2, 0),
        ("a", 20, 3, 0),
        ("a", 30, 4, 1),   # [0,30] holds all four
        ("a", 31, 4, 1),   # [1,31] holds 10,20,30,31
        ("b", 100, 2, 0),
        ("b", 100, 2, 0),  # RANGE frame: both peers visible
    ]
    with pytest.raises(ValueError):
        rate_limit_audit(df, window_s=-1)


def test_rate_limit_audit_one_shuffle_no_python(spark):
    from olx_spark.operators.politeness import rate_limit_audit

    df = spark.createDataFrame(
        [(f"h{i % 5}", i) for i in range(100)], "host string, ts_s long"
    )
    plan = (
        rate_limit_audit(df)._jdf.queryExecution().executedPlan().toString()
    )
    final = plan.split("Initial Plan")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------- budget allocation ----

def test_budget_alloc_sums_exactly_and_is_fair(spark):
    from olx_spark.operators.ranking import allocate_budget

    hosts = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2), ("z", 0)],
        "host string, weight long",
    )
    out = {r.host: r for r in allocate_budget(hosts, 10).collect()}
    assert "z" not in out  # zero weight dropped
    assert (out["a"].alloc, out["b"].alloc, out["c"].alloc) == (5, 3, 2)
    assert all(r.alloc == r.base + r.extra for r in out.values())

    # total not divisible: largest fractional remainders win; exact sum
    out7 = {r.host: r for r in allocate_budget(hosts, 7).collect()}
    # quotas: a 3.5, b 2.1, c 1.4 -> bases 3,2,1 (sum 6), k=1 -> a wins
    assert (out7["a"].alloc, out7["b"].alloc, out7["c"].alloc) == (4, 2, 1)
    assert sum(r.alloc for r in out7.values()) == 7


def test_budget_alloc_tie_breaks_on_host_and_edge_cases(spark):
    from olx_spark.operators.ranking import allocate_budget

    tied = spark.createDataFrame(
        [("x", 1), ("y", 1), ("w", 2)], "host string, weight long"
    )
    # total=2: quotas 0.5, 0.5, 1.0 -> bases 0,0,1, k=1, frac tie
    # between x and y -> host asc picks x
    out = {r.host: r for r in allocate_budget(tied, 2).collect()}
    assert (out["x"].alloc, out["y"].alloc, out["w"].alloc) == (1, 0, 1)

    assert allocate_budget(tied, 0).agg({"alloc": "sum"}).collect()[0][0] == 0
    empty = spark.createDataFrame([], "host string, weight long")
    assert allocate_budget(empty, 5).count() == 0
    with pytest.raises(ValueError):
        allocate_budget(tied, -1)


def test_robots_sitemap_urls(spark):
    from pyspark.sql import functions as F

    from olx_spark.operators.politeness import robots_sitemap_urls

    robots = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: https://ex.org/sitemap.xml\n"
        "sitemap:https://ex.org/sm2.xml  # alt index\n"
        "SITEMAP: https://cdn.ex.org/a.xml.gz\n"
        "  Sitemap: https://ex.org/indented.xml\n"
        "NotSitemap: https://ex.org/no.xml\n"
        "Crawl-delay: 2\n"
    )
    df = spark.createDataFrame([(robots,), ("User-agent: *\n",), ("",)], "r string")
    got = [list(r[0]) for r in df.select(robots_sitemap_urls("r")).collect()]
    assert got[0] == [
        "https://ex.org/sitemap.xml",
        "https://ex.org/sm2.xml",
        "https://cdn.ex.org/a.xml.gz",
        "https://ex.org/indented.xml",
    ]
    assert got[1] == [] and got[2] == []


def test_cache_control_ttl(spark):
    from olx_spark.functions.durations import cache_control_ttl

    cases = [
        ("max-age=600, public", 1, 600),
        ("no-store", 0, 0),
        ("s-maxage=120, max-age=600", 1, 120),   # shared-cache precedence
        ("", 1, None),                            # heuristic freshness
        ('no-cache="set-cookie", max-age=60', 0, 0),
        ("private, max-age=30", 0, 0),
        ("immutable", 1, None),
        ("MAX-AGE=5", 1, 5),                      # case-insensitive
        ("xmax-age=7", 1, None),                  # token-anchored: no match
    ]
    df = spark.createDataFrame([(c,) for c, _, _ in cases], "h string")
    got = [r["m"].asDict() for r in df.select(cache_control_ttl("h").alias("m")).collect()]
    for (hdr, cacheable, ttl), g in zip(cases, got):
        assert g == {"cacheable": cacheable, "ttl_s": ttl}, hdr
