"""WARC record sink/source (sources/warc.py)."""

import pytest
from pyspark.sql import functions as F

from olx_spark.sources.warc import (
    warc_read_records,
    warc_record_bytes,
    warc_write_records,
)


def _mkdf(spark, rows):
    return spark.createDataFrame(
        rows, "archive_id long, uri string, date string, payload binary"
    )


DATE = "2026-01-01T00:00:00Z"


@pytest.fixture(scope="module")
def roundtrip(spark):
    rows = [
        (i % 3, f"https://ex.org/p/{i:03d}", DATE, f"payload-{i}".encode())
        for i in range(30)
    ]
    blobs = warc_write_records(_mkdf(spark, rows))
    recs = warc_read_records(blobs).collect()
    return rows, blobs.collect(), recs


def test_roundtrip_identity(roundtrip):
    rows, _, recs = roundtrip
    assert len(recs) == 30 and all(r["parse_ok"] == 1 for r in recs)
    got = {(r["target_uri"], bytes(r["payload"]), r["warc_date"]) for r in recs}
    want = {(u, p, d) for _, u, d, p in rows}
    assert got == want
    assert all(r["warc_type"] == "response" for r in recs)
    assert all(r["content_length"] == len(bytes(r["payload"])) for r in recs)


def test_blob_order_and_rec_idx(roundtrip):
    _, blobs, recs = roundtrip
    assert {b["archive_id"]: b["n_records"] for b in blobs} == {0: 10, 1: 10, 2: 10}
    for aid in (0, 1, 2):
        mine = sorted(
            (r for r in recs if r["archive_id"] == aid), key=lambda r: r["rec_idx"]
        )
        assert [r["rec_idx"] for r in mine] == list(range(10))
        # records appear in uri order (the sink's deterministic order)
        uris = [r["target_uri"] for r in mine]
        assert uris == sorted(uris)


def test_payload_containing_warc_header_roundtrips(spark):
    # the classic parser-killer: an archived archive. Length-driven
    # parsing must NOT resynchronize on the embedded magic.
    inner = warc_record_bytes("https://ex.org/inner", DATE, b"abc")
    rows = [
        (0, "https://ex.org/a", DATE, inner + b"WARC/1.0\r\ntrailing"),
        (0, "https://ex.org/b", DATE, b"plain"),
    ]
    recs = warc_read_records(warc_write_records(_mkdf(spark, rows))).collect()
    assert [r["parse_ok"] for r in recs] == [1, 1]
    by_uri = {r["target_uri"]: bytes(r["payload"]) for r in recs}
    assert by_uri["https://ex.org/a"] == inner + b"WARC/1.0\r\ntrailing"
    assert by_uri["https://ex.org/b"] == b"plain"


def test_empty_payload(spark):
    rows = [(0, "https://ex.org/e", DATE, b"")]
    recs = warc_read_records(warc_write_records(_mkdf(spark, rows))).collect()
    assert len(recs) == 1 and recs[0]["parse_ok"] == 1
    assert recs[0]["content_length"] == 0 and bytes(recs[0]["payload"]) == b""


def _blob_df(spark, blob: bytes):
    return spark.createDataFrame(
        [(0, blob)], "archive_id long, blob binary"
    )


def test_truncated_tail_keeps_parsed_prefix(spark):
    good = warc_record_bytes("https://ex.org/1", DATE, b"ok")
    cut = warc_record_bytes("https://ex.org/2", DATE, b"0123456789")[:-8]
    recs = warc_read_records(_blob_df(spark, good + cut)).collect()
    assert len(recs) == 2
    assert recs[0]["parse_ok"] == 1 and recs[0]["target_uri"] == "https://ex.org/1"
    assert recs[1]["parse_ok"] == 0 and recs[1]["payload"] is None
    assert recs[1]["content_length"] == len(cut)  # unconsumed bytes


def test_bad_header_line_flagged(spark):
    blob = b"WARC/1.0\r\nno-colon-here\r\nContent-Length: 2\r\n\r\nab\r\n\r\n"
    recs = warc_read_records(_blob_df(spark, blob)).collect()
    assert len(recs) == 1 and recs[0]["parse_ok"] == 0


def test_missing_record_separator_flagged(spark):
    rec = warc_record_bytes("https://ex.org/1", DATE, b"abcd")
    # overwrite the trailing \r\n\r\n with junk
    blob = rec[:-4] + b"XXXX"
    recs = warc_read_records(_blob_df(spark, blob)).collect()
    assert len(recs) == 1 and recs[0]["parse_ok"] == 0


def test_non_numeric_content_length_flagged(spark):
    blob = b"WARC/1.0\r\nContent-Length: 3x\r\n\r\nabc\r\n\r\n"
    recs = warc_read_records(_blob_df(spark, blob)).collect()
    assert len(recs) == 1 and recs[0]["parse_ok"] == 0


def test_offsets_enable_random_access(spark):
    # the CDX contract: blob[offset : offset+rec_len] must reparse to
    # exactly that record — seek-and-read without touching the rest
    rows = [
        (0, f"https://ex.org/p/{i}", DATE, (f"payload-{i}" * (i + 1)).encode())
        for i in range(8)
    ]
    blobs = {b["archive_id"]: bytes(b["blob"])
             for b in warc_write_records(_mkdf(spark, rows)).collect()}
    recs = warc_read_records(warc_write_records(_mkdf(spark, rows))).collect()
    for r in recs:
        blob = blobs[r["archive_id"]]
        piece = blob[r["offset"] : r["offset"] + r["rec_len"]]
        sub = warc_read_records(_blob_df(spark, piece)).collect()
        assert len(sub) == 1 and sub[0]["parse_ok"] == 1
        assert sub[0]["target_uri"] == r["target_uri"]
        assert bytes(sub[0]["payload"]) == bytes(r["payload"])
    # offsets tile the blob exactly
    ordered = sorted(recs, key=lambda r: r["rec_idx"])
    assert ordered[0]["offset"] == 0
    assert sum(r["rec_len"] for r in ordered) == len(blobs[0])


def test_surt_keys(spark):
    from olx_spark.functions.urls import surt

    cases = [
        ("https://www.Sub.Example.org/a/b?q=1", "org,example,sub)/a/b?q=1"),
        ("https://example.org/", "org,example)/"),
        ("http://a.b.c.d.net/x", "net,d,c,b,a)/x"),
        ("https://www.example.org", "org,example)"),  # empty path
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(surt("url")).collect()]
    assert got == [w for _, w in cases]
    # domain-prefix property: every example.org page sorts contiguously
    urls = ["https://www.example.org/z", "https://sub.example.org/a",
            "https://example.org/m", "https://other.net/x"]
    keys = [r[0] for r in spark.createDataFrame(
        [(u,) for u in urls], "url string").select(surt("url")).collect()]
    in_domain = sorted(k for k in keys if k.startswith("org,example"))
    all_sorted = sorted(keys)
    i = all_sorted.index(in_domain[0])
    assert all_sorted[i : i + len(in_domain)] == in_domain


class TestConsistentShard:
    def _assign(self, spark, workers):
        from pyspark.sql import functions as F

        from olx_spark.functions.urls import consistent_shard

        df = spark.range(4000).select(
            F.concat(F.lit("https://ex/p/"), F.col("id").cast("string")).alias("u"),
            "id",
        )
        rows = df.select("id", consistent_shard("u", workers, 16).alias("w")).collect()
        return {r["id"]: r["w"] for r in rows}

    def test_balanced_and_deterministic(self, spark):
        workers = [f"w{i}" for i in range(8)]
        a = self._assign(spark, workers)
        b = self._assign(spark, workers)
        assert a == b
        counts = {}
        for w in a.values():
            counts[w] = counts.get(w, 0) + 1
        assert set(counts) == set(workers)
        # vnode-smoothed balance: no worker beyond ~2.5x fair share
        assert max(counts.values()) < 2.5 * 4000 / 8

    def test_resize_moves_about_one_nth(self, spark):
        base = self._assign(spark, [f"w{i}" for i in range(8)])
        grown = self._assign(spark, [f"w{i}" for i in range(9)])
        moved = sum(1 for k in base if base[k] != grown[k])
        frac = moved / len(base)
        # theory: 1/9 ≈ 0.111 of keys move to the new worker; pmod
        # rehashing would move ~8/9. Loose band around 1/9.
        assert 0.04 < frac < 0.25, frac
        # and every moved key went TO the new worker
        assert all(grown[k] == "w8" for k in base if base[k] != grown[k])

    def test_empty_workers_refused(self):
        import pytest as _pytest

        from olx_spark.functions.urls import consistent_shard

        with _pytest.raises(ValueError):
            consistent_shard("u", [], 16)
