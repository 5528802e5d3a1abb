"""HTML main-content extraction (functions/html.py)."""

import pytest
from pyspark.sql import functions as F

from olx_spark.functions.html import extract_main_content, strip_tags

PROSE = "this is the long main article text that should clearly survive"


@pytest.fixture(scope="module")
def page_rows(spark):
    docs = [
        # each rule exercised on its own line
        (0, "\n".join([
            "<html><head><title>T</title></head><body>",
            '<nav><a href="/">home</a> <a href="/x">about</a></nav>',
            f'<div class="main"><p>{PROSE}</p></div>',
            '<footer><a href="/tos">terms of service</a> '
            '<a href="/p">privacy policy notes</a></footer>',
            "</body></html>",
        ])),
        # density rule: long-enough text drowned in markup
        (1, "<i>a</i><b>b</b><i>c</i><b>d</b><i>e</i><b>f</b>"
            "<i>g</i><b>h</b><i>i</i><b>j</b><i>k</b> tail words"),
        # plain text, no tags at all
        (2, PROSE),
        # blank + tag-only lines don't count as lines
        (3, "\n\n<div></div>\n" + PROSE + "\n<br/>\n"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, html string")
    out = df.select("doc_id", *extract_main_content("html")).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_nav_footer_dropped_main_kept(page_rows):
    r = page_rows[0]
    assert r["n_lines"] == 4  # closing line strips to blank
    assert r["n_kept"] == 1
    assert r["main_text"] == PROSE


def test_density_rule_drops_markup_soup(page_rows):
    r = page_rows[1]
    # text 'a b c ... k tail words' is >= 20 chars and link-free, but
    # 22 tags against ~32 chars of text fails the density threshold
    assert r["n_lines"] == 1 and r["n_kept"] == 0
    assert r["main_text"] == ""


def test_plain_text_kept_whole(page_rows):
    r = page_rows[2]
    assert r["n_lines"] == 1 and r["n_kept"] == 1
    assert r["main_text"] == PROSE


def test_blank_and_tag_only_lines_uncounted(page_rows):
    r = page_rows[3]
    assert r["n_lines"] == 1 and r["n_kept"] == 1
    assert r["main_text"] == PROSE


def test_strip_tags_keeps_word_boundaries(spark):
    row = spark.range(1).select(
        strip_tags(F.lit("one</p><p>two<br/>three")).alias("t")
    ).first()
    assert row["t"] == "one two three"


def test_link_fraction_rule(spark):
    # long anchor text dominating an otherwise-keepable line
    line = '<p><a href="/buy">click here right now for the deal</a> ok</p>'
    r = (
        spark.createDataFrame([(line,)], "html string")
        .select(*extract_main_content("html"))
        .first()
    )
    assert r["n_lines"] == 1 and r["n_kept"] == 0


def test_single_pass_plan(spark):
    df = spark.createDataFrame([("x",)], "html string")
    plan = (
        df.select(*extract_main_content("html"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestCrawlDirectives:
    def _row(self, spark, page):
        from olx_spark.functions.html import followable_links, robots_meta

        df = spark.createDataFrame([(page,)], "page string")
        m = robots_meta("page")
        return df.select(
            m.getField("noindex").alias("noindex"),
            m.getField("nofollow").alias("nofollow"),
            followable_links("page").alias("fl"),
        ).first()

    def test_meta_variants(self, spark):
        cases = [
            ('<meta name="robots" content="noindex, nofollow">', 1, 1),
            ('<meta name="robots" content="none">', 1, 1),
            ('<meta name="robots" content="noindex">', 1, 0),
            ('<meta name="robots" content="NOFOLLOW">', 0, 1),  # case-insens
            ("", 0, 0),
        ]
        for meta, ni, nf in cases:
            r = self._row(spark, f"<html><head>{meta}</head><body></body></html>")
            assert (r["noindex"], r["nofollow"]) == (ni, nf), meta

    def test_rel_nofollow_variants(self, spark):
        page = (
            '<a href="/a">plain</a>'
            '<a href="/b" rel="nofollow">blocked</a>'
            '<a href="/c" rel="ugc nofollow">blocked too</a>'
            '<a href="/d" rel="sponsored">followable</a>'
            '<a href="/e" rel="NOFOLLOW">blocked caseless</a>'
            '<a rel="author">no href at all</a>'
        )
        r = self._row(spark, page)
        assert list(r["fl"]) == ["/a", "/d"]

    def test_zero_shuffle_plan(self, spark):
        from olx_spark.functions.html import followable_links

        df = spark.createDataFrame([("x",)], "page string")
        plan = (
            df.select(followable_links("page"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Generate" not in plan


class TestHeadMetadata:
    def test_extraction_and_nulls(self, spark):
        from olx_spark.functions.html import head_metadata

        page = (
            "<html><head><title>The Title</title>"
            '<link rel="canonical" href="https://ex.org/canon">'
            '<meta property="og:title" content="OG Title">'
            "</head><body></body></html>"
        )
        df = spark.createDataFrame([(page,), ("<html>no head</html>",)], "page string")
        rows = [r["m"].asDict() for r in df.select(head_metadata("page").alias("m")).collect()]
        assert rows[0] == {
            "title": "The Title",
            "canonical": "https://ex.org/canon",
            "og_title": "OG Title",
            "og_image": None,
        }
        assert rows[1] == {"title": None, "canonical": None,
                           "og_title": None, "og_image": None}

    def test_canonical_dedup_semantics(self, spark):
        from olx_spark.functions.html import head_metadata
        from pyspark.sql import functions as F

        # three variants point at one canonical; the canonical page
        # itself has no tag
        rows = [
            ("https://ex.org/a", ""),
            ("https://ex.org/a?utm=1", '<link rel="canonical" href="https://ex.org/a">'),
            ("https://ex.org/a?ref=x", '<link rel="canonical" href="https://ex.org/a">'),
            ("https://ex.org/b", ""),
        ]
        df = spark.createDataFrame(rows, "url string, page string")
        m = head_metadata("page")
        ex = df.select(
            "url", F.coalesce(m.getField("canonical"), F.col("url")).alias("t")
        )
        got = {r["url"]: r["t"] for r in ex.collect()}
        assert got["https://ex.org/a?utm=1"] == "https://ex.org/a"
        assert got["https://ex.org/b"] == "https://ex.org/b"
        n = ex.groupBy("t").count().collect()
        assert {r["t"]: r["count"] for r in n} == {
            "https://ex.org/a": 3, "https://ex.org/b": 1}
