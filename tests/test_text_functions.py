"""Text-analysis column functions on the driver testdata documents."""

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from olx_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    md5_60,
    minhash_signature,
    quality_score,
    simhash16,
    token_count,
    word_shingles,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_md5_60_known_value(spark):
    # md5('abc') = 900150983cd24fb0... -> 0x900150983cd24fb
    row = spark.range(1).select(md5_60(F.lit("abc")).alias("h")).first()
    assert row["h"] == 648541476951500027


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",)], "text string"
    )
    got = [r[0] for r in df.select(token_count("text")).collect()]
    assert got == [3, 0, 0, 1]


def test_doc_fingerprint_dedups_whitespace_variants(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), (" hello\tworld ",), ("other",)],
        "text string",
    )
    fps = [r[0] for r in df.select(doc_fingerprint("text")).collect()]
    assert fps[0] == fps[1] == fps[2] != fps[3]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of it",),
            ("el gato la casa los perros",),
            ("der Hund und die Katze",),
            ("zzz qqq",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(lang_id("text")).collect()]
    assert got == ["en", "es", "de", "und"]


def test_quality_score_bounds(docs):
    rows = docs.select(quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = [r[0] for r in df.select(word_shingles("text", 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []


def test_minhash_signature_shape_and_determinism(docs):
    sel = docs.filter(F.col("doc_id") < 20).orderBy("doc_id")
    sigs = sel.select(
        "doc_id", minhash_signature(word_shingles("text", 3), 16).alias("sig")
    ).collect()
    for r in sigs:
        assert len(r["sig"]) == 16
    again = sel.select(
        "doc_id", minhash_signature(word_shingles("text", 3), 16).alias("sig")
    ).collect()
    assert [r["sig"] for r in sigs] == [r["sig"] for r in again]


def test_simhash16_range_and_similarity(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words here entirely unrelated"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r["h"] for r in df.select("id", simhash16("text").alias("h")).collect()}
    assert all(0 <= h < (1 << 16) for h in rows.values())
    d12 = bin(rows[1] ^ rows[2]).count("1")
    d13 = bin(rows[1] ^ rows[3]).count("1")
    assert d12 < d13


def test_duration_ago_seconds_reference_semantics(spark):
    """FreeProxy.scala:59-70: strip 'ago', find all (\\d+ \\S+)
    components, unit-multiplier each, fold by addition."""
    from olx_spark.functions.durations import duration_ago_seconds

    cases = [
        ("30 secs ago", 30),
        ("5 mins ago", 300),
        ("1 hour ago", 3600),
        ("2 days ago", 2 * 86400),
        ("1 hour 5 mins ago", 3900),       # multi-component fold
        ("1 min 30 secs ago", 90),
        ("7 parsecs ago", 0),              # unknown unit -> 0, row kept
        ("no digits here", 0),
        ("", 0),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = [r["v"] for r in df.select(duration_ago_seconds("s").alias("v")).collect()]
    assert got == [want for _, want in cases]


def test_winnowing_shared_passage_guarantee(spark):
    """Winnowing guarantee (SIGMOD'03): two docs sharing a run of at
    least w+k-1 tokens share at least one selected fingerprint; and
    selection keeps ~2/(w+1) of the hashes."""
    from olx_spark.functions.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens >= w+k-1=6
    rows = [
        (1, f"alpha beta gamma {shared} delta epsilon"),
        (2, f"one two three four five {shared} six seven"),
        (3, "completely unrelated content with different words entirely here now"),
        (4, "xy"),  # < k tokens -> empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", winnow_fingerprints("text", k=3, w=4).alias("fps")
        ).collect()
    }
    assert got[1] & got[2], "shared passage produced no shared fingerprint"
    assert not (got[1] & got[3])
    assert got[4] == set()
    # sparsity: far fewer fingerprints than shingles
    n_shingles_1 = len(rows[0][1].split()) - 2
    assert 0 < len(got[1]) < n_shingles_1


def test_repetition_signals_flag_planted_boilerplate(spark):
    """Gopher-style repetition: a 'spam spam spam' doc maxes both
    signals, unique text reads near zero, short docs degrade to 0."""
    from olx_spark.functions.text import dup_ngram_frac, top_word_frac

    rows = [
        (1, "spam " * 50),                       # one word repeated
        (2, "buy now " * 25),                    # one bigram repeated
        (3, "each word here appears exactly once in this document body"),
        (4, "solo"),                             # < 2 tokens -> no bigrams
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["d"], r["t"])
        for r in df.select(
            "doc_id",
            dup_ngram_frac("text", 2).alias("d"),
            top_word_frac("text").alias("t"),
        ).collect()
    }
    assert got[1][0] > 0.97 and got[1][1] == 1.0
    assert got[2][0] > 0.95 and abs(got[2][1] - 0.5) < 1e-9
    assert got[3][0] == 0.0
    assert abs(got[3][1] - 1 / 10) < 1e-9
    assert got[4] == (0.0, 1.0)  # single token: no bigrams, 1 word of 1
    assert got[5][0] == 0.0


def test_pii_scrub_redacts_and_counts(spark):
    """PII pass: emails/IPv4s/phones redact to typed tokens with
    per-kind counts; clean text and near-misses pass through."""
    from olx_spark.functions.text import pii_counts, pii_scrub

    rows = [
        (1, "mail a.user+tag@sub.example.org or b@x.io today"),
        (2, "server 10.1.2.3 and 192.168.255.1 up"),
        (3, "call +1 555-123-4567 now"),
        (4, "clean text with no identifiers at all"),
        (5, "version 1.2 costs 12.50 at 3pm"),  # near-misses must not match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *pii_counts("text"), pii_scrub("text").alias("s")
        ).collect()
    }
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 0, 0)
    assert out[1]["s"] == "mail <EMAIL> or <EMAIL> today"
    assert out[2]["n_ipv4"] == 2 and out[2]["s"] == "server <IP> and <IP> up"
    assert out[3]["n_phone"] == 1 and out[3]["s"] == "call <PHONE> now"
    assert out[4]["s"] == rows[3][1] and out[4]["n_email"] == 0
    assert out[5]["s"] == rows[4][1]
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_phone"]) == (0, 0, 0)


def test_let_binding_preserves_semantics_and_nulls(spark):
    """let_ (bind-once-per-row) must be a pure refactor: identical
    results to inlining the bound expression, including NULL input and
    empty strings. The binding exists because Catalyst re-evaluates a
    captured outer expression tree at EVERY element of a higher-order
    function lambda (measured: q_repetition_stats 33s -> <1s at sf0.1)."""
    from pyspark.sql import functions as F

    from olx_spark.functions.text import let_

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, ""), (3, None)], "id int, text string"
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            let_(F.split("text", " "), lambda t: F.size(t) + F.size(t)).alias(
                "bound"
            ),
            (F.size(F.split("text", " ")) * 2).alias("inlined"),
        ).collect()
    }
    for i in (1, 2, 3):
        assert out[i]["bound"] == out[i]["inlined"]
    assert out[1]["bound"] == 8


def test_let_bound_hof_functions_match_unbound_forms(spark):
    """The four let_-rewritten functions keep byte-identical outputs on
    a corpus with empty / single-token / repetitive / long documents
    (values pinned the day of the rewrite, pre-rewrite == post-rewrite)."""
    from olx_spark.functions.text import (
        dup_ngram_frac,
        minhash_signature,
        top_word_frac,
        winnow_fingerprints,
        word_shingles,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, ""),
            (4, "one two"),
            (5, "x " * 200),
        ],
        "id int, text string",
    )
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            word_shingles("text", 3).alias("sh"),
            F.round(dup_ngram_frac("text", 2), 6).alias("dup"),
            F.round(top_word_frac("text"), 6).alias("twf"),
            winnow_fingerprints("text", 3, 4).alias("fps"),
            minhash_signature(word_shingles("text", 3), 4).alias("sig"),
        ).collect()
    }
    assert got[1]["sh"][:3] == ["a b c", "b c a", "c a b"]
    assert (got[1]["dup"], got[1]["twf"]) == (0.625, 0.333333)
    assert got[1]["fps"] == [31251835280889960]
    assert got[1]["sig"][0] == 160412878328189494
    assert got[2]["fps"][:2] == [176602673785286095, 365586147241278684]
    assert (got[3]["sh"], got[3]["fps"]) == ([], [])
    assert got[4]["sh"] == [] and got[4]["dup"] == 0.0
    assert got[5]["dup"] == 0.994975 and got[5]["twf"] == 1.0


def test_let_plan_gate_no_tree_duplication(spark):
    """Plan gate for the let_ binding: the normalize+split regex must
    appear exactly ONCE in each optimized plan. Before the binding the
    captured tree was duplicated at every lambda reference site and
    re-evaluated per array element at runtime (q_repetition_stats 33s
    at sf0.1); a regression re-introducing a capture shows up here as
    a count > 1. Input must be non-foldable or constant folding
    erases the regex entirely."""
    from pyspark.sql import functions as F

    from olx_spark.functions.text import (
        dup_ngram_frac,
        minhash_signature,
        winnow_fingerprints,
        word_shingles,
    )

    df = spark.range(3).select(
        F.concat(F.lit("a b c d e "), F.col("id").cast("string")).alias("text")
    )
    from olx_spark.functions.text import lang_id

    cases = {
        "shingles": (word_shingles("text", 3), 1),
        "winnow": (winnow_fingerprints("text", 3, 4), 1),  # +1 md5/shingle
        "dup_frac": (dup_ngram_frac("text", 2), 1),
        "minhash": (minhash_signature(word_shingles("text", 3), 4), 1),
        "lang_id": (lang_id("text"), 1),  # was ~24 evaluations/row
    }
    for name, (col, expect) in cases.items():
        plan = (
            df.select(col.alias("x"))
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        got = plan.count("regexp_replace")
        assert got == expect, f"{name}: regexp_replace x{got}, want x{expect}"


class TestGopherRules:
    """Hand-computed Gopher rule battery on crafted documents."""

    DOCS = [
        # 0: clean 26-word prose — every rule passes
        (0, "the quick brown fox jumps over a lazy dog and runs with "
            "great speed to the nearby forest where many animals have "
            "found shelter from storms"),
        # 1: too short
        (1, "too short"),
        # 2: empty — every zero-guard exercised
        (2, ""),
        # 3: symbol-heavy (also fails alpha)
        (3, "# # # tag tag tag ... more … stuff here now the a and of "
            "to that have good words line"),
        # 4: pure bullet list (10/10 lines)
        (4, "\n".join(f"- the bullet item number {k} of a list with "
                      "enough words" for k in range(10))),
        # 5: ellipsis-ended lines 2/4
        (5, "the first line is a normal one with plenty of words\n"
            "to be continued...\n"
            "and another of the normal lines that have words\n"
            "more soon…"),
    ]

    @pytest.fixture(scope="class")
    def rows(self, spark):
        from olx_spark.functions.text import gopher_rules

        df = spark.createDataFrame(self.DOCS, "doc_id int, text string")
        out = df.select("doc_id", *gopher_rules("text")).collect()
        return {r["doc_id"]: r.asDict() for r in out}

    def test_clean_prose_keeps(self, rows):
        r = rows[0]
        assert r["n_words"] == 26
        assert r["stop_distinct"] == 6  # the a and with to have
        assert r["symbol_ratio"] == 0.0
        assert r["alpha_frac"] == 1.0
        assert all(r[f] == 1 for f in (
            "r_words", "r_mean_len", "r_alpha", "r_stop", "r_symbol",
            "r_bullet", "r_ellipsis", "keep"))

    def test_short_doc_dropped_on_words_only(self, rows):
        r = rows[1]
        assert r["n_words"] == 2 and r["r_words"] == 0 and r["keep"] == 0
        assert r["r_alpha"] == 1  # other signals healthy

    def test_empty_doc_zero_guards(self, rows):
        r = rows[2]
        assert r["n_words"] == 0
        for f in ("mean_word_len", "alpha_frac", "symbol_ratio",
                  "bullet_frac", "ellipsis_frac"):
            assert r[f] == 0.0
        assert r["keep"] == 0

    def test_symbol_ratio_rule(self, rows):
        r = rows[3]
        # '#'x3 + '...'x1 + '…'x1 = 5 symbols over 22 words
        assert r["n_words"] == 22
        assert r["symbol_ratio"] == round(5 / 22, 6)
        assert r["r_symbol"] == 0
        # 5 letterless tokens -> 17/22 alpha < 0.8
        assert r["alpha_frac"] == round(17 / 22, 6)
        assert r["r_alpha"] == 0
        assert r["keep"] == 0

    def test_bullet_rule(self, rows):
        r = rows[4]
        assert r["bullet_frac"] == 1.0
        assert r["r_bullet"] == 0 and r["keep"] == 0
        assert r["r_stop"] == 1  # the, a, of, with

    def test_ellipsis_rule(self, rows):
        r = rows[5]
        assert r["ellipsis_frac"] == 0.5
        assert r["r_ellipsis"] == 0 and r["keep"] == 0

    def test_single_pass_plan(self, spark):
        # the whole battery stays one whole-stage-codegen projection:
        # no explode, no Exchange, and the normalize regex is
        # let_-bound (2 evaluations: token stats + char count share
        # one; plus the raw-line split which does not renormalize)
        from olx_spark.functions.text import gopher_rules

        df = spark.createDataFrame(self.DOCS, "doc_id int, text string")
        plan = (
            df.select("doc_id", *gopher_rules("text"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "Generate" not in plan  # no explode


class TestC4Clean:
    """Hand-computed C4 rules on crafted documents."""

    DOCS = [
        # 0: three proper sentences on one line + noise lines
        (0, "The cat sat on the mat. The dog barked loudly. All was well.\n"
            "Short one.\n"
            "no terminal punctuation on this line here"),
        # 1: javascript line dropped, sentences insufficient
        (1, "Please enable JavaScript to continue reading.\n"
            "The page loaded fine after that.\n"),
        # 2: code doc — brace kills it despite enough sentences
        (2, "One fine day it rained. Then it stopped. Then sun came out.\n"
            "if (x) { return y; }"),
        # 3: lorem ipsum kills the doc
        (3, "Lorem ipsum dolor sit amet. Consectetur adipiscing elit "
            "sed do. Eiusmod tempor incididunt ut labore."),
        # 4: empty
        (4, ""),
    ]

    @pytest.fixture(scope="class")
    def rows(self, spark):
        from olx_spark.functions.text import c4_clean

        df = spark.createDataFrame(self.DOCS, "doc_id int, text string")
        out = df.select("doc_id", *c4_clean("text")).collect()
        return {r["doc_id"]: r.asDict() for r in out}

    def test_clean_doc_kept(self, rows):
        r = rows[0]
        assert r["n_lines"] == 3
        assert r["n_kept"] == 1  # only the sentence line survives
        assert r["n_sentences"] == 3
        assert r["keep_doc"] == 1
        assert r["clean_text"].startswith("The cat sat")

    def test_javascript_line_dropped(self, rows):
        r = rows[1]
        assert r["n_kept"] == 1  # only 'The page loaded fine after that.'
        assert r["clean_text"] == "The page loaded fine after that."
        assert r["n_sentences"] == 1 and r["keep_doc"] == 0

    def test_brace_doc_dropped(self, rows):
        r = rows[2]
        assert r["n_sentences"] == 3  # sentence line survives line rules
        assert r["has_brace"] == 1 and r["keep_doc"] == 0

    def test_lorem_ipsum_doc_dropped(self, rows):
        r = rows[3]
        assert r["n_kept"] == 1 and r["n_sentences"] == 3
        assert r["keep_doc"] == 0

    def test_empty_doc(self, rows):
        r = rows[4]
        assert r["n_lines"] == 0 and r["n_kept"] == 0
        assert r["clean_text"] == "" and r["keep_doc"] == 0

    def test_single_pass_plan(self, spark):
        from olx_spark.functions.text import c4_clean

        df = spark.createDataFrame(self.DOCS, "doc_id int, text string")
        plan = (
            df.select("doc_id", *c4_clean("text"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Generate" not in plan


class TestCdcChunks:
    BASE = ("the quick brown fox jumps over the lazy dog while rain "
            "falls on the old tin roof and the cat sleeps near the warm "
            "stove dreaming of fish and long summer afternoons") * 2

    @pytest.fixture(scope="class")
    def chunked(self, spark):
        from olx_spark.functions.text import cdc_boundaries, cdc_chunk_fps

        rows = [
            (0, self.BASE),
            (1, "INSERTED SHIFTY PREFIX :: " + self.BASE),
            (2, ""),
            (3, "short"),
        ]
        df = spark.createDataFrame(rows, "i int, t string")
        out = df.select(
            "i",
            cdc_boundaries("t").alias("cuts"),
            cdc_chunk_fps("t").alias("fps"),
        ).collect()
        return {r["i"]: (list(r["cuts"]), list(r["fps"])) for r in out}

    def test_min_size_gate(self, chunked):
        cuts, _ = chunked[0]
        assert len(cuts) >= 2
        assert all(b - a >= 16 for a, b in zip([0] + cuts, cuts))

    def test_shift_resilience(self, chunked):
        # THE property fixed-window chunking lacks: after a prefix
        # insertion, interior chunk fingerprints re-align
        _, base_fps = chunked[0]
        _, shift_fps = chunked[1]
        shared = set(base_fps) & set(shift_fps)
        assert len(shared) >= len(set(base_fps)) - 2  # only head/tail differ
        assert len(shared) >= 1

    def test_fixed_chunking_would_not_share(self, chunked):
        # control: 20-char fixed windows share nothing after the shift
        fixed = lambda s: {s[i:i + 20] for i in range(0, len(s), 20)}
        assert not (fixed(self.BASE) & fixed("INSERTED SHIFTY PREFIX :: " + self.BASE) - {self.BASE[-(len(self.BASE) % 20):]})

    def test_degenerate_inputs(self, chunked):
        assert chunked[2] == ([], [])
        cuts, fps = chunked[3]
        assert cuts == [] and len(fps) == 1  # one whole-text chunk

    def test_chunks_tile_text(self, spark):
        from olx_spark.functions.text import cdc_boundaries, md5_60
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(self.BASE,)], "t string")
        cuts = list(df.select(cdc_boundaries("t")).first()[0])
        cc = [0] + cuts + ([len(self.BASE)] if cuts[-1] < len(self.BASE) else [])
        pieces = [self.BASE[a:b] for a, b in zip(cc, cc[1:])]
        assert "".join(pieces) == self.BASE
        # fps match md5-60 of the exact substrings
        got = list(df.select(
            __import__("olx_spark.functions.text", fromlist=["cdc_chunk_fps"]).cdc_chunk_fps("t")
        ).first()[0])
        want = [df.sparkSession.range(1).select(md5_60(F.lit(p))).first()[0] for p in pieces]
        assert got == want


def test_mojibake_score(spark):
    from olx_spark.functions.text import mojibake_score

    rows = [
        (0, "perfectly clean ascii text here"),
        (1, "decoder gave up \ufffd twice \ufffd"),
        (2, "caf\u00c3\u00a9 double encoded"),
        (3, "\u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d t"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    got = {r["i"]: r.asDict() for r in df.select("i", *mojibake_score("t")).collect()}
    assert got[0]["is_mojibake"] == 0 and got[0]["mojibake_frac"] == 0.0
    assert got[1]["n_repl"] == 2 and got[1]["is_mojibake"] == 1
    assert got[2]["n_double"] >= 1 and got[2]["is_mojibake"] == 1
    assert got[3]["n_double"] >= 2 and got[3]["is_mojibake"] == 1
    assert got[4] == {"i": 4, "n_repl": 0, "n_double": 0,
                      "mojibake_frac": 0.0, "is_mojibake": 0}
