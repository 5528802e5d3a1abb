"""Content-type sniffing from payload magic bytes.

A crawler cannot trust the server's Content-Type header (the
reference trusts jsoup's charset/type detection implicitly —
``DownloadAds.scala:37`` hands the raw response to Jsoup.parse); a
fetch pipeline that routes payloads to decoders (image vs audio vs
archive vs markup, `operators/multimodal`) must sniff the actual
leading bytes, WHATWG-MIME-sniff style. Mis-routed payloads at 100 TB
are not a correctness footnote: a gzip body fed to the JPEG decoder
burns a worker on garbage, and an HTML error page stored as an image
poisons training data.

Everything here is a pure JVM expression chain over
``hex(substring(bytes, 1, 12))`` — the first 12 bytes as an uppercase
hex string, prefix-matched against the magic table in order (most
specific first). No Python, no UDF: the sniff runs map-side inside
whole-stage codegen, and Catalyst prunes the payload column down to
its first bytes at the parquet scan only when the source supports it
(parquet reads the full cell; the projection still drops the payload
right after the substring, so nothing wide crosses a shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (sniffed type, uppercase hex prefix) — ordered, most specific
# first. RIFF containers are disambiguated by the format tag at byte
# offset 9-12 (hex chars 17-24) before the bare-RIFF fallback.
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("png", "89504E470D0A1A0A"),
    ("gif", "47494638"),
    ("jpeg", "FFD8FF"),
    ("pdf", "255044462D"),
    ("gzip", "1F8B"),
    ("bmp", "424D"),
)
RIFF = "52494646"
WAVE_TAG = "57415645"  # 'WAVE' at hex offset 17-24
HTML = "3C"  # '<'


def sniff_content_type(data: Column) -> Column:
    """Sniffed type of a binary payload column: one of png/gif/jpeg/
    pdf/gzip/bmp/wav/riff/html/unknown. Pure JVM expressions."""
    hx = F.hex(F.substring(data, 1, 12))
    out = F.lit("unknown")
    out = F.when(F.substring(hx, 1, 2) == HTML, F.lit("html")).otherwise(out)
    out = F.when(
        F.substring(hx, 1, 8) == RIFF,
        F.when(F.substring(hx, 17, 8) == WAVE_TAG, F.lit("wav")).otherwise(
            F.lit("riff")
        ),
    ).otherwise(out)
    for name, prefix in reversed(MAGIC_PREFIXES):
        out = F.when(
            F.substring(hx, 1, len(prefix)) == prefix, F.lit(name)
        ).otherwise(out)
    return out


def sniff_payloads(
    df: DataFrame,
    bytes_col: str = "bytes",
    declared_col: str = "fmt",
    id_col: str = "image_id",
) -> DataFrame:
    """Per-row sniff verdicts: ``(id, declared, sniffed, mismatch)``.
    ``mismatch=1`` flags rows whose declared type contradicts the
    sniffed magic — the rows a fetch pipeline must re-route (or drop)
    instead of decoding on faith. One narrow projection, zero
    shuffles; the wide payload column never survives the select."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(declared_col).alias("declared"),
        sniff_content_type(F.col(bytes_col)).alias("sniffed"),
    ).withColumn(
        "mismatch", (F.col("declared") != F.col("sniffed")).cast("int")
    )
