"""Compressed-payload decoding tests: three encodings round-trip,
bombs are flagged with bounded memory, corrupt/truncated/empty flag,
headers are sniffed from bytes (not trusted), plan stays Arrow."""

import gzip
import zlib

import pytest
from pyspark.sql import functions as F

from olx_spark.operators.compression import (
    decompress_one,
    decompress_payloads,
)


def _deflate(data: bytes) -> bytes:
    co = zlib.compressobj(wbits=-15)
    return co.compress(data) + co.flush()


def test_three_encodings_roundtrip(spark):
    rows = [
        ("g", bytearray(gzip.compress(b"gzip payload " * 40))),
        ("z", bytearray(zlib.compress(b"zlib payload " * 40))),
        ("d", bytearray(_deflate(b"deflate payload " * 40))),
    ]
    df = spark.createDataFrame(rows, "rid string, body binary")
    got = {r["rid"]: r for r in decompress_payloads(df).collect()}
    assert got["g"]["status"] == "ok" and got["g"]["encoding"] == "gzip"
    assert bytes(got["g"]["payload"]) == b"gzip payload " * 40
    assert got["z"]["encoding"] == "zlib"
    assert bytes(got["z"]["payload"]) == b"zlib payload " * 40
    assert got["d"]["encoding"] == "deflate"
    assert bytes(got["d"]["payload"]) == b"deflate payload " * 40
    assert got["g"]["n_out"] == len(b"gzip payload " * 40)


def test_bomb_flagged_without_materializing(spark):
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)  # ~64 KB -> 64 MB
    assert len(bomb) < 100_000
    df = spark.createDataFrame(
        [("b", bytearray(bomb))], "rid string, body binary"
    )
    r = decompress_payloads(df, max_bytes=1 << 20).collect()[0]
    assert r["status"] == "bomb" and r["payload"] is None
    assert r["n_in"] == len(bomb) and r["n_out"] is None


def test_ratio_cap_catches_small_bombs():
    # 1 KB -> 300 KB: under max_bytes but over a 200x ratio
    small_bomb = zlib.compress(b"\x00" * 300_000, 9)
    assert len(small_bomb) < 1500
    status, payload, _ = decompress_one(
        small_bomb, max_bytes=1 << 20, max_ratio=200.0
    )
    assert status == "bomb" and payload is None


def test_corrupt_truncated_empty_flag(spark):
    whole = gzip.compress(b"truncate me " * 100)
    rows = [
        ("trunc", bytearray(whole[: len(whole) // 2])),
        ("junk", bytearray(b"definitely not compressed")),
        ("empty", bytearray(b"")),
        ("ok", bytearray(gzip.compress(b"fine"))),
    ]
    df = spark.createDataFrame(rows, "rid string, body binary")
    got = {r["rid"]: r["status"] for r in decompress_payloads(df).collect()}
    assert got == {
        "trunc": "corrupt", "junk": "corrupt", "empty": "empty", "ok": "ok"
    }


def test_plan_is_arrow_batched(spark):
    df = spark.createDataFrame(
        [("x", bytearray(gzip.compress(b"p")))], "rid string, body binary"
    )
    plan = decompress_payloads(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
