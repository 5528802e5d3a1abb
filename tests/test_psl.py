"""Public-suffix / registrable-domain (eTLD+1) extraction tests.

Vectors follow the publicsuffix.org algorithm's published checks:
normal longest-match, wildcard rules, exception rules, hosts that ARE
a public suffix, unlisted TLDs under the implicit ``*`` default rule,
case folding and trailing dots.
"""

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.psl import psl_rules, registrable_domains

RULES = [
    "// comment line",
    "",
    "com",
    "uk",
    "co.uk",
    "jp",
    "ac.jp",
    "*.kawasaki.jp",
    "!city.kawasaki.jp",
    "*.ck",
    "!www.ck",
    "us",
    "k12.ma.us",
]

# (host, public_suffix, registrable_domain)
VECTORS = [
    ("example.com", "com", "example.com"),
    ("www.example.com", "com", "example.com"),
    ("a.b.example.com", "com", "example.com"),
    ("com", "com", None),
    ("example.co.uk", "co.uk", "example.co.uk"),
    ("www.example.co.uk", "co.uk", "example.co.uk"),
    ("co.uk", "co.uk", None),
    ("uk", "uk", None),
    # wildcard *.kawasaki.jp
    ("foo.kawasaki.jp", "foo.kawasaki.jp", None),
    ("shop.foo.kawasaki.jp", "foo.kawasaki.jp", "shop.foo.kawasaki.jp"),
    ("kawasaki.jp", "jp", "kawasaki.jp"),
    # exception beats the wildcard
    ("city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
    ("shop.city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
    ("ac.jp", "ac.jp", None),
    ("keio.ac.jp", "ac.jp", "keio.ac.jp"),
    # *.ck / !www.ck
    ("ck", "ck", None),
    ("foo.ck", "foo.ck", None),
    ("bar.foo.ck", "foo.ck", "bar.foo.ck"),
    ("www.ck", "ck", "www.ck"),
    ("a.www.ck", "ck", "www.ck"),
    # deeper listed suffix wins over the shorter one
    ("cherry.k12.ma.us", "k12.ma.us", "cherry.k12.ma.us"),
    ("k12.ma.us", "k12.ma.us", None),
    ("ma.us", "us", "ma.us"),
    # unlisted TLD -> implicit default rule "*"
    ("example.zz", "zz", "example.zz"),
    ("a.b.example.zz", "zz", "example.zz"),
    ("zz", "zz", None),
    # case folding + trailing dot normalization
    ("WwW.Example.COM.", "com", "example.com"),
]


@pytest.fixture(scope="module")
def resolved(spark):
    rules = psl_rules(spark, RULES)
    df = spark.createDataFrame([(h,) for h, _, _ in VECTORS], "host string")
    out = registrable_domains(df, rules, host_col="host")
    return {
        r["host"]: (r["public_suffix"], r["registrable_domain"])
        for r in out.collect()
    }


@pytest.mark.parametrize("host,ps,rd", VECTORS)
def test_vectors(resolved, host, ps, rd):
    assert resolved[host] == (ps, rd), host


def test_null_and_empty_host(spark):
    rules = psl_rules(spark, RULES)
    df = spark.createDataFrame([(None,), ("",), ("example.com",)], "host string")
    rows = {
        r["host"]: (r["public_suffix"], r["registrable_domain"])
        for r in registrable_domains(df, rules).collect()
    }
    assert rows[None] == (None, None)
    assert rows[""] == (None, None)
    assert rows["example.com"] == ("com", "example.com")


def test_deep_host_beyond_max_labels(spark):
    # 30 labels: the rule still matches because candidates are capped
    # from the RIGHT (shortest suffixes kept), not the left
    rules = psl_rules(spark, RULES)
    host = ".".join(f"l{i}" for i in range(28)) + ".example.co.uk"
    df = spark.createDataFrame([(host,)], "host string")
    r = registrable_domains(df, rules).collect()[0]
    assert r["public_suffix"] == "co.uk"
    assert r["registrable_domain"] == "example.co.uk"


def test_exception_rule_needs_two_labels(spark):
    with pytest.raises(ValueError):
        psl_rules(spark, ["!ck"])


def test_extra_columns_survive_and_rowcount_stable(spark):
    rules = psl_rules(spark, RULES)
    df = spark.createDataFrame(
        [(i, VECTORS[i % len(VECTORS)][0]) for i in range(100)],
        "id int, host string",
    )
    out = registrable_domains(df, rules)
    assert out.count() == 100
    assert set(out.columns) == {"id", "host", "public_suffix", "registrable_domain"}


def test_broadcast_plan_no_host_shuffle_on_probe(spark):
    # the URL-scale side must join the resolved host map via
    # BroadcastHashJoin — the only shuffle is over distinct hosts
    rules = psl_rules(spark, RULES)
    df = spark.range(1000).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"), F.lit(".example.com")).alias("host")
    )
    plan = registrable_domains(df, rules)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
