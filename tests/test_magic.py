"""Magic-byte sniffing: real file-header prefixes, precedence order,
RIFF disambiguation, short/empty payloads, and the zero-shuffle
pure-JVM plan."""

import pytest
from pyspark.sql import functions as F

from olx_spark.functions.magic import sniff_content_type, sniff_payloads

# real-world file headers (first bytes of actual format specs)
CASES = [
    ("png", bytes.fromhex("89504E470D0A1A0A0000000D49484452")),
    ("jpeg", bytes.fromhex("FFD8FFE000104A46494600")),  # JFIF APP0
    ("jpeg", bytes.fromhex("FFD8FFDB004300")),          # bare SOI+DQT
    ("gif", b"GIF89a" + b"\x40\x00\x40\x00"),
    ("bmp", b"BM" + bytes(10)),
    ("gzip", bytes.fromhex("1F8B0800000000000003")),
    ("pdf", b"%PDF-1.7\n%"),
    ("wav", b"RIFF" + b"\x24\x08\x00\x00" + b"WAVE" + b"fmt "),
    ("riff", b"RIFF" + b"\x24\x08\x00\x00" + b"AVI " + b"LIST"),
    ("html", b"<!DOCTYPE html><html>"),
    ("html", b"<html><body>"),
    ("unknown", b"\x00\x01\x02\x03\x04\x05"),
    ("unknown", b"plain text body here"),
    ("unknown", b""),          # empty payload
    ("unknown", b"\x89PN"),    # truncated PNG magic: not enough bytes
    ("gzip", b"\x1f\x8b"),     # 2-byte magic is complete for gzip
]


def test_sniff_real_headers(spark):
    df = spark.createDataFrame(
        [(i, want, payload) for i, (want, payload) in enumerate(CASES)],
        "i int, want string, bytes binary",
    )
    got = df.select("i", "want", sniff_content_type(F.col("bytes")).alias("s")).collect()
    for r in got:
        assert r["s"] == r["want"], f"case {r['i']}: got {r['s']} want {r['want']}"


def test_mismatch_flag_and_plan(spark):
    df = spark.createDataFrame(
        [("a", "png", bytes.fromhex("FFD8FFE0")),   # declared png, is jpeg
         ("b", "jpeg", bytes.fromhex("FFD8FFE0"))],
        "image_id string, fmt string, bytes binary",
    )
    out = sniff_payloads(df)
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["mismatch"] == 1 and rows["a"]["sniffed"] == "jpeg"
    assert rows["b"]["mismatch"] == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
