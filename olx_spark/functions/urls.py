"""URL canonicalization + fingerprinting (SURVEY.md §2.1 rows 5-6).

Two canonicalization modes:

- ``reference``: the reference's exact quirk — each scraped href is
  treated as a *path* and grafted onto the base URL's scheme+authority,
  RETAINING the base's query string and fragment (http4s ``withPath``
  semantics at ``/root/reference/src/main/scala/org/olx/parser/
  DownloadLinks.scala:47-48``). Absolute hrefs would be mangled the
  same way the reference mangles them (treated as a path).
- ``modern``: a proper crawler normalization (north_star): RFC urljoin,
  strip tracking params (utm_*, fbclid, gclid, ref), sort remaining
  query params, drop fragments, lowercase scheme/host, strip default
  ports and trailing ``index.html``.

Both are vectorized pandas UDFs: the per-base prefix/suffix is computed
once per distinct base (a crawl has few distinct bases per batch) and
applied with pandas vectorized string concat — no per-row Python UDF.

Fingerprints are Spark-native ``xxhash64`` (JVM, whole-stage codegen) —
never computed in Python.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

TRACKING_PARAMS = {"fbclid", "gclid", "ref", "msclkid", "mc_eid", "igshid"}


def graft_prefix_suffix(base_url: str) -> tuple[str, str]:
    """Decompose a base URL into (scheme://authority, ?query#fragment)."""
    u = urlsplit(base_url)
    prefix = f"{u.scheme}://{u.netloc}"
    suffix = ""
    if u.query:
        suffix += f"?{u.query}"
    if u.fragment:
        suffix += f"#{u.fragment}"
    return prefix, suffix


def canonicalize_reference_py(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    """Vectorized reference-exact graft: prefix + href + suffix."""
    codes, uniques = pd.factorize(bases, use_na_sentinel=False)
    pre = pd.Series([graft_prefix_suffix(b)[0] for b in uniques], dtype="object")
    suf = pd.Series([graft_prefix_suffix(b)[1] for b in uniques], dtype="object")
    return pre.iloc[codes].reset_index(drop=True) + hrefs.reset_index(
        drop=True
    ) + suf.iloc[codes].reset_index(drop=True)


def _canonicalize_modern_one(href: str, base: str) -> str:
    u = urlsplit(urljoin(base, href))
    scheme = u.scheme.lower()
    netloc = u.netloc.lower()
    if (scheme, ":" in netloc) == ("http", True) and netloc.endswith(":80"):
        netloc = netloc[:-3]
    if (scheme, ":" in netloc) == ("https", True) and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = u.path or "/"
    if path.endswith("/index.html"):
        path = path[: -len("index.html")]
    q = [
        (k, v)
        for k, v in parse_qsl(u.query, keep_blank_values=True)
        if not (k in TRACKING_PARAMS or k.startswith("utm_"))
    ]
    q.sort()
    return urlunsplit((scheme, netloc, path, urlencode(q), ""))


def canonicalize_modern_py(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    return pd.Series(
        [_canonicalize_modern_one(h, b) for h, b in zip(hrefs, bases)],
        dtype="object",
    )


@pandas_udf(StringType())
def canonicalize_reference(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    return canonicalize_reference_py(hrefs, bases)


@pandas_udf(StringType())
def canonicalize_modern(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    return canonicalize_modern_py(hrefs, bases)


def url_fingerprint(col):
    """64-bit URL fingerprint — Spark-native xxhash64 (seed 42), stays
    inside whole-stage codegen; the frontier/seen tables key on this."""
    return F.xxhash64(col)


def host_of(col):
    """Extract the authority from a URL, JVM-side."""
    return F.parse_url(col, F.lit("HOST"))


def host_salt(host_col, url_col, buckets: int = 8):
    """Salted host key for hot-host skew: ``host#s`` with s derived from
    the URL fingerprint (SURVEY.md §4.2 item 4). Politeness accounting
    always uses the unsalted host; salting only fans out fetch work."""
    return F.concat_ws(
        "#", host_col, F.pmod(F.xxhash64(url_col), F.lit(buckets)).cast("string")
    )


def surt(col):
    """SURT (Sort-friendly URI Reordering Transform) key of a URL —
    the canonical ordering of the web-archive ecosystem (Heritrix
    crawl scoping, CDX/CDXJ index keys for WARC random access):
    lowercase the authority, drop a leading ``www.``, REVERSE the
    host labels comma-joined, then ``)`` + path?query. Example:

        https://www.Sub.Example.org/a/b?q=1 -> org,example,sub)/a/b?q=1

    All URLs of one registrable domain become one contiguous key
    range, so a sorted CDX index answers host/domain prefix scans
    with a range read — the property a flat URL sort lacks. Pure JVM
    expression (parse_url + split/reverse/join), whole-stage
    codegen."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(F.parse_url(c, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit(""))
    query = F.parse_url(c, F.lit("QUERY"))
    pq = F.when(
        query.isNotNull(), F.concat(path, F.lit("?"), query)
    ).otherwise(path)
    return F.concat(rev, F.lit(")"), pq)


def consistent_ring(workers: list[str], vnodes: int = 16) -> list[tuple[int, str]]:
    """The hash ring: ``vnodes`` positions per worker at
    md5-60("worker#v"), sorted. Pure config (computed driver-side
    with hashlib — bit-identical to the SQL ``md5`` the oracle uses);
    ships into the plan as a literal array."""
    import hashlib

    ring = []
    for w in workers:
        for v in range(vnodes):
            h = int(hashlib.md5(f"{w}#{v}".encode()).hexdigest()[:15], 16)
            ring.append((h, w))
    ring.sort()
    return ring


def consistent_shard(col, workers: list[str], vnodes: int = 16):
    """Consistent-hash worker assignment for a key column (Karger et
    al. ring hashing, the fetch-fleet router): key k goes to the
    worker owning the first ring position >= md5_60(k), wrapping to
    the ring minimum. THE property ``pmod(hash, n)`` lacks: adding or
    removing one worker remaps only ~1/n of the keys (tested), so a
    fleet resize never reshuffles the politeness state of every host.
    Zero shuffle; ONE Arrow-vectorized batch pass: the ring is
    plan-time config, so the lookup is hashlib-md5 (bit-identical to
    the SQL/JVM ``md5`` — same oracle) + ``bisect`` over the sorted
    positions, shipped as closure constants. This replaced the
    original all-JVM form (filter + ``array_min`` over a 128-element
    literal struct array per row inside an interpreted HOF binding),
    which was measured ~2x slower — per-row interpreted HOF
    evaluation of a deep literal tree costs more than the Arrow
    boundary for this shape (optimization guide §4.2); a balanced
    codegen ``when`` tree fared no better because the bound hash
    can only be referenced through the same HOF machinery. On equal
    ring positions (astronomically unlikely) ``bisect_left`` picks
    the first-sorted = min-worker entry, exactly like the old
    ``array_min`` over (p, w) structs."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if not workers:
        raise ValueError("workers must be non-empty")
    ring = consistent_ring(workers, vnodes)
    positions = [p for p, _ in ring]
    owners = [w for _, w in ring]

    @pandas_udf("string")
    def _shard(keys: pd.Series) -> pd.Series:
        import bisect
        import hashlib

        def pick(k: str) -> str:
            h = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
            i = bisect.bisect_left(positions, h)
            return owners[i] if i < len(positions) else owners[0]

        return keys.map(pick)

    c = F.col(col) if isinstance(col, str) else col
    return _shard(c)


# UTS #39 confusables, curated subset: the Cyrillic/Greek letters and
# common lookalikes that map visually onto Latin a-z — the characters
# actually used in IDN homograph attacks (Unicode TR39 skeleton
# algorithm restricted to single-char mappings, which translate()
# expresses JVM-side; the full data file also has multi-char mappings
# like rn->m, out of scope here and stated so).
CONFUSABLES_FROM = (
    "аеорсхуіѕԁԛ"
    "кмтвн"
    "αονειρυκ"
    "àáâãäåèéêë"
    "ìíîïòóôõö"
    "ùúûüýçñ"
    "ıℓ"
)
CONFUSABLES_TO = (
    "aeopcxyisdq"
    "kmtbh"
    "aoveipyk"
    "aaaaaaeeee"
    "iiiiooooo"
    "uuuuycn"
    "il"
)
_ZERO_WIDTH = "[​‌‍⁠﻿­]"


def confusable_skeleton(col):
    """Visual skeleton of a hostname (UTS #39 lite): lowercase, strip
    zero-width/soft-hyphen characters, then fold the curated
    confusable set onto Latin. Two hosts with EQUAL skeletons but
    UNEQUAL raw forms are a homograph pair — the IDN spoof signal.
    Pure JVM (lower/regexp_replace/translate), whole-stage codegen;
    the oracle replays the identical translate table in SQL."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), _ZERO_WIDTH, "")
    return F.translate(cleaned, CONFUSABLES_FROM, CONFUSABLES_TO)


def spoof_candidates(hosts, trusted, host_col: str = "host",
                     trusted_col: str = "host"):
    """Hosts whose skeleton collides with a TRUSTED host's skeleton
    while the raw (lowercased) strings differ — the phishing /
    crawl-poisoning review queue. Returns (host, matches_trusted,
    skeleton). The trusted list is broadcast (it is curated-scale);
    per-host cost is one translate + one broadcast probe, no
    shuffle."""
    t = trusted.select(
        F.lower(F.col(trusted_col)).alias("__t_raw"),
        confusable_skeleton(trusted_col).alias("__sk"),
    ).distinct()
    h = hosts.select(
        F.col(host_col),
        F.lower(F.col(host_col)).alias("__h_raw"),
        confusable_skeleton(host_col).alias("__sk"),
    )
    return (
        h.join(F.broadcast(t), "__sk")
        .where(F.col("__h_raw") != F.col("__t_raw"))
        .select(
            F.col(host_col),
            F.col("__t_raw").alias("matches_trusted"),
            F.col("__sk").alias("skeleton"),
        )
    )
