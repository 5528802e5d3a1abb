"""Homoglyph host-spoof detection tests: Cyrillic/Greek/accented
lookalikes and zero-width tricks fold onto the trusted skeleton; the
legitimate host itself never self-flags."""

from pyspark.sql import functions as F

from olx_spark.functions.urls import confusable_skeleton, spoof_candidates

ATTACKS = [
    ("аpple.com", "apple.com"),          # Cyrillic а
    ("gооgle.com", "google.com"),   # Cyrillic о twice
    ("αmazon.com", "amazon.com"),        # Greek α
    ("micrоsоft.com", "microsoft.com"),
    ("goo​gle.com", "google.com"),       # zero-width space
    ("еbay.com", "ebay.com"),            # Cyrillic е
    ("Examplе.ORG", "example.org"),      # case + Cyrillic е
    ("päypal.com", "paypal.com"),        # ä
]
TRUSTED = ["apple.com", "google.com", "amazon.com", "microsoft.com",
           "ebay.com", "example.org", "paypal.com"]


def test_skeleton_folds_attacks(spark):
    df = spark.createDataFrame([(a,) for a, _ in ATTACKS], "host string")
    got = [r[0] for r in df.select(confusable_skeleton("host")).collect()]
    assert got == [t for _, t in ATTACKS]


def test_spoof_candidates_flags_attacks_not_legit(spark):
    hosts = spark.createDataFrame(
        [(a,) for a, _ in ATTACKS]
        + [(t,) for t in TRUSTED]
        + [("unrelated.net",), ("shop.example.org",)],
        "host string",
    )
    trusted = spark.createDataFrame([(t,) for t in TRUSTED], "host string")
    got = {(r["host"], r["matches_trusted"])
           for r in spoof_candidates(hosts, trusted).collect()}
    assert got == {(a, t) for a, t in ATTACKS}


def test_plan_broadcast_no_shuffle_of_hosts(spark):
    hosts = spark.range(100).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".com")).alias("host")
    )
    trusted = spark.createDataFrame([("h1.com",)], "host string")
    plan = spoof_candidates(hosts, trusted)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
