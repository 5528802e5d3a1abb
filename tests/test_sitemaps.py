"""Sitemap parsing: field extraction + defaults, sitemap-index
routing, the whole-doc-fragment guard, malformed entries, and the
zero-shuffle plan."""

from datetime import datetime

from olx_spark.operators.sitemaps import parse_sitemaps

URLSET = (
    '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://a.example/p/1</loc>"
    "<lastmod>2024-03-05</lastmod><priority>0.9</priority>"
    "<changefreq>daily</changefreq></url>"
    "<url><loc> https://a.example/p/2 </loc></url>"
    "<url><lastmod>2024-01-01</lastmod></url>"  # no loc: dropped
    "</urlset>"
)
INDEX = (
    '<?xml version="1.0"?><sitemapindex>'
    "<sitemap><loc>https://a.example/s1.xml</loc>"
    "<lastmod>2024-02-02</lastmod></sitemap>"
    "<sitemap><loc>https://a.example/s2.xml</loc></sitemap>"
    "</sitemapindex>"
)


def _rows(spark):
    df = spark.createDataFrame(
        [("a.example", URLSET), ("a.example", INDEX)], "host string, xml string"
    )
    return parse_sitemaps(df)


def test_urlset_fields_and_defaults(spark):
    out = {r.loc: r for r in _rows(spark).filter("entry_type = 'url'").collect()}
    assert len(out) == 2  # loc-less entry dropped
    full = out["https://a.example/p/1"]
    assert full.lastmod == datetime(2024, 3, 5)
    assert full.priority == 0.9 and full.changefreq == "daily"
    bare = out["https://a.example/p/2"]  # whitespace-trimmed loc
    assert bare.lastmod is None
    assert bare.priority == 0.5 and bare.changefreq == ""


def test_index_entries_routed_not_duplicated(spark):
    out = _rows(spark).collect()
    idx = [r for r in out if r.entry_type == "sitemap"]
    assert sorted(r.loc for r in idx) == [
        "https://a.example/s1.xml", "https://a.example/s2.xml",
    ]
    # the guard: the index doc must NOT also surface as a spurious
    # 'url' row (its whole text is one <url>-less fragment with <loc>)
    assert len(out) == 4


def test_zero_shuffle_no_python_plan(spark):
    plan = _rows(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
