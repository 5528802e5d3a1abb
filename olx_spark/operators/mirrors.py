"""Mirror-host detection and document containment — the two
asymmetric-overlap questions a dedup pipeline still has after
resemblance (Jaccard) is answered.

1. **Host mirrors** (:func:`host_mirrors`): which host PAIRS serve
   near-identical content sets (www vs apex, CDN aliases, scraped
   re-hosts)? CommonCrawl-class frontiers de-prioritize a mirror
   instead of re-fetching it URL by URL. Signal: overlap of exact
   content fingerprints between the hosts' document sets, scored by
   CONTAINMENT ``|A ∩ B| / min(|A|, |B|)`` — a small complete mirror
   of a big host scores 1.0 where Jaccard would dilute it.

2. **Document containment** (:func:`containment_pairs`): which doc
   PAIRS have ``|shingles(A) ∩ shingles(B)| / |shingles(A)| >= t``
   (Broder's containment, the asymmetric cousin of resemblance)?
   This is the quote/aggregator detector: a scraper page CONTAINING a
   short original scores ~1.0 on the original's side while plain
   Jaccard stays low because the aggregator adds bulk.

Scale shape (both): distinct (key, member) pairs -> self-join on the
shared key -> per-pair counts. The quadratic hazard is the same as
LSH banding — a key shared by k members emits k^2 pair rows — so both
apply the count-first HOT-KEY GUARD the similarity module uses:
fingerprints/shingles held by more than ``max_key_members`` members
(global boilerplate: empty-page hashes, cookie-banner shingles) are
counted, DROPPED FROM PAIRING, and logged — never silently, and the
denominators still count them, so scores are conservative
(boilerplate can only lower an overlap score, never fabricate one).
Everything is exact integers + one final division, hence fully
oracle-able; the oracle twin applies the identical guard in SQL.

The reference has no cross-host analysis at all (one job = one
listing crawl, ``OlxServer.scala:56``).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def _guarded_pairs(
    members: DataFrame,
    key: str,
    member: str,
    max_key_members: int,
    what: str,
) -> DataFrame:
    """Distinct (key, member) -> (member_a < member_b, shared) pair
    counts, with keys held by > max_key_members members dropped from
    pairing (counted + logged; see module doc)."""
    if max_key_members < 2:
        raise ValueError(
            f"max_key_members must be >= 2, got {max_key_members}"
        )
    km = members.select(
        F.col(key).alias("__k"), F.col(member).alias("__m")
    ).distinct()
    hot = (
        km.groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_key_members)
    )
    n_hot = hot.count()
    if n_hot:
        logger.warning(
            "%s: dropping %d hot keys (> %d members) from pairing — "
            "overlap scores are conservative for members sharing them",
            what,
            n_hot,
            max_key_members,
        )
    cold = km.join(F.broadcast(hot.select("__k")), "__k", "left_anti")
    a = cold.select(F.col("__k"), F.col("__m").alias("__ma"))
    b = cold.select(F.col("__k"), F.col("__m").alias("__mb"))
    return (
        a.join(b, "__k")
        .filter(F.col("__ma") < F.col("__mb"))
        .groupBy("__ma", "__mb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )


def host_mirrors(
    docs: DataFrame,
    host_col: str = "host",
    fp_col: str = "fp",
    min_containment: float = 0.5,
    min_shared: int = 2,
    max_fp_hosts: int = 64,
) -> DataFrame:
    """Host pairs ``(host_a < host_b, shared, n_a, n_b, containment,
    jaccard)`` whose distinct content-fingerprint sets overlap with
    ``containment = shared / min(n_a, n_b) >= min_containment`` and
    ``shared >= min_shared`` (one co-hashed page is noise, not a
    mirror). Denominators ``n_a/n_b`` count ALL of a host's distinct
    fingerprints, including guarded-out hot ones."""
    if not (0.0 < min_containment <= 1.0):
        raise ValueError(f"min_containment must be in (0, 1], got {min_containment}")
    pairs = _guarded_pairs(docs, fp_col, host_col, max_fp_hosts, "host_mirrors")
    sizes = (
        docs.select(F.col(host_col).alias("h"), F.col(fp_col).alias("f"))
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # the host-size table is tiny relative to the corpus: broadcast
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("h").alias("__ma"), F.col("n").alias("n_a"))),
            "__ma",
        )
        .join(
            F.broadcast(sizes.select(F.col("h").alias("__mb"), F.col("n").alias("n_b"))),
            "__mb",
        )
        .withColumn(
            "containment",
            F.col("shared") / F.least("n_a", "n_b").cast("double"),
        )
        .withColumn(
            "jaccard",
            F.col("shared")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double"),
        )
        .filter(
            (F.col("shared") >= min_shared)
            & (F.col("containment") >= min_containment)
        )
        .select(
            F.col("__ma").alias("host_a"),
            F.col("__mb").alias("host_b"),
            F.col("shared").cast("long").alias("shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "containment",
            "jaccard",
        )
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_containment: float = 0.8,
    min_shingles: int = 3,
    max_shingle_docs: int = 64,
) -> DataFrame:
    """Directed doc pairs ``(doc_id, in_doc_id, shared, n_shingles,
    containment)`` where at least ``min_containment`` of ``doc_id``'s
    distinct word ``n``-gram shingles also appear in ``in_doc_id``
    (Broder containment — ``doc_id`` is the contained/quoted side).
    Docs with fewer than ``min_shingles`` distinct shingles are
    skipped (a 1-shingle doc is "contained" by anything sharing one
    phrase). Both directions of a qualifying unordered pair are
    emitted independently — containment is asymmetric."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not (0.0 < min_containment <= 1.0):
        raise ValueError(f"min_containment must be in (0, 1], got {min_containment}")
    toks = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    toks = F.filter(toks, lambda t: t != "")
    # distinct word n-gram shingle array per doc — a single per-row
    # JVM expression, so the doc-size cut below costs no shuffle
    # guard short docs: sequence(0, negative) DESCENDS in Spark, so an
    # unguarded size-n < 0 would fabricate a bogus shingle
    sh = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        )
    )
    base = docs.select(
        F.col(id_col).alias("__m"), sh.alias("__sh")
    ).withColumn("n_shingles", F.size("__sh").cast("long"))
    eligible = base.filter(F.col("n_shingles") >= min_shingles)
    shingled = eligible.select("__m", F.explode("__sh").alias("__k"))
    pairs = _guarded_pairs(
        shingled, "__k", "__m", max_shingle_docs, "containment_pairs"
    )
    # containment is asymmetric: score each unordered pair in both
    # directions against the CONTAINED side's shingle count
    directed = pairs.select(
        F.col("__ma").alias("__m"), F.col("__mb").alias("in_doc"), "shared"
    ).unionByName(
        pairs.select(
            F.col("__mb").alias("__m"), F.col("__ma").alias("in_doc"), "shared"
        )
    )
    return (
        directed.join(eligible.select("__m", "n_shingles"), "__m")
        .withColumn(
            "containment",
            F.col("shared") / F.col("n_shingles").cast("double"),
        )
        .filter(F.col("containment") >= min_containment)
        .select(
            F.col("__m").alias(id_col),
            F.col("in_doc").alias("in_doc_id"),
            F.col("shared").cast("long").alias("shared"),
            "n_shingles",
            "containment",
        )
    )
