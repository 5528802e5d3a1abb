"""WARC (Web ARChive, ISO 28500) record source/sink.

WARC is the interchange format of the crawl ecosystem — Common Crawl,
Heritrix, and every archive-derived training corpus ship as WARC files
— so an engine whose brief is "crawl at 100 TB" must read and write
it. The reference crawler persists rows to Postgres only
(``Db.scala:34-43``); WARC I/O is engine-added capability for the
training-data brief, same rationale as the parquet snapshot store.

Format written (one record, WARC/1.0):

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: <uri>\\r\\n
    WARC-Date: <iso8601>\\r\\n
    WARC-Record-ID: <urn:md5:...>\\r\\n
    Content-Type: application/octet-stream\\r\\n
    Content-Length: <n>\\r\\n
    \\r\\n
    <n payload bytes>\\r\\n\\r\\n

Records are concatenated into archive blobs (one blob per
``archive_id`` group — the 1 GB-file unit of a real crawl, scaled
down). Parsing is LENGTH-DRIVEN: the reader consumes the header, takes
exactly ``Content-Length`` payload bytes, then requires the
``\\r\\n\\r\\n`` record separator — it never scans for the next
``WARC/1.0`` magic, so a payload that itself CONTAINS a WARC header
(an archived archive, the classic parser-killer) round-trips intact.
A malformed tail (truncated payload, missing separator, bad header)
yields ONE ``parse_ok=0`` row carrying the remaining byte count, and
the records already parsed are kept — a corrupt file costs its tail,
never the batch.

Scale shape: build is ``applyInPandas`` grouped by ``archive_id`` (one
shuffle to co-locate a blob's records — exactly the write pattern of a
real WARC sink, which needs each file's records in one place); parse
is ``mapInPandas`` (zero shuffle — blobs are independent, Arrow-
batched). Both sides are pure-bytes work inside Python with no per-row
UDF calls.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"

BLOB_SCHEMA = StructType(
    [
        StructField("archive_id", LongType()),
        StructField("n_records", IntegerType()),
        StructField("blob", BinaryType()),
    ]
)

RECORD_SCHEMA = StructType(
    [
        StructField("archive_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
        StructField("offset", LongType()),
        StructField("rec_len", LongType()),
        StructField("parse_ok", IntegerType()),
    ]
)


def warc_record_bytes(uri: str, date: str, payload: bytes) -> bytes:
    """One serialized WARC/1.0 response record (deterministic:
    record-id is the payload md5, not a random uuid)."""
    rid = hashlib.md5(payload).hexdigest()
    header = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + uri.encode("utf-8") + _CRLF
        + b"WARC-Date: " + date.encode("ascii") + _CRLF
        + b"WARC-Record-ID: <urn:md5:" + rid.encode("ascii") + b">" + _CRLF
        + b"Content-Type: application/octet-stream" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
    )
    return header + _CRLF + payload + _SEP


def warc_write_records(
    df: DataFrame,
    archive_col: str = "archive_id",
    uri_col: str = "uri",
    date_col: str = "date",
    payload_col: str = "payload",
    order_col: str | None = None,
) -> DataFrame:
    """(archive_id, n_records, blob): each group's records serialized
    into one WARC blob in ``order_col`` order (default: ``uri_col`` —
    a deterministic blob needs a total order; real sinks use fetch
    order)."""
    order = order_col or uri_col

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        parts = [
            warc_record_bytes(u, d, bytes(p))
            for u, d, p in zip(pdf[uri_col], pdf[date_col], pdf[payload_col])
        ]
        return pd.DataFrame(
            {
                "archive_id": [int(pdf[archive_col].iloc[0])],
                "n_records": [len(parts)],
                "blob": [b"".join(parts)],
            }
        )

    return df.groupBy(archive_col).applyInPandas(_build, schema=BLOB_SCHEMA)


def _parse_blob(archive_id: int, blob: bytes) -> list[dict]:
    rows: list[dict] = []
    pos, idx, n = 0, 0, len(blob)

    def bad() -> dict:
        return {
            "archive_id": archive_id,
            "rec_idx": idx,
            "warc_type": None,
            "target_uri": None,
            "warc_date": None,
            "content_length": n - pos,
            "payload": None,
            "offset": pos,
            "rec_len": n - pos,
            "parse_ok": 0,
        }

    while pos < n:
        end = blob.find(_SEP, pos)
        if end < 0:
            rows.append(bad())
            break
        head = blob[pos:end]
        lines = head.split(_CRLF)
        fields: dict[str, str] = {}
        ok = lines[0].startswith(b"WARC/")
        for ln in lines[1:]:
            k, sep, v = ln.partition(b": ")
            if not sep:
                ok = False
                break
            fields[k.decode("ascii", "replace").lower()] = v.decode(
                "utf-8", "replace"
            )
        clen_s = fields.get("content-length", "")
        if not (ok and clen_s.isdigit()):
            rows.append(bad())
            break
        clen = int(clen_s)
        body_at = end + len(_SEP)
        if body_at + clen + len(_SEP) > n or (
            blob[body_at + clen : body_at + clen + len(_SEP)] != _SEP
        ):
            rows.append(bad())  # truncated payload / missing separator
            break
        rows.append(
            {
                "archive_id": archive_id,
                "rec_idx": idx,
                "warc_type": fields.get("warc-type"),
                "target_uri": fields.get("warc-target-uri"),
                "warc_date": fields.get("warc-date"),
                "content_length": clen,
                "payload": blob[body_at : body_at + clen],
                # CDX-index fields: byte extent of the record within
                # its archive blob — what a random-access reader seeks
                "offset": pos,
                "rec_len": (body_at + clen + len(_SEP)) - pos,
                "parse_ok": 1,
            }
        )
        pos = body_at + clen + len(_SEP)
        idx += 1
    return rows


def warc_read_records(
    blobs: DataFrame,
    archive_col: str = "archive_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Parse WARC blobs back into one row per record (schema
    ``RECORD_SCHEMA``); length-driven, corrupt-tail tolerant (see
    module docstring)."""

    def _run(batches):
        for pdf in batches:
            out: list[dict] = []
            for aid, blob in zip(pdf[archive_col], pdf[blob_col]):
                out.extend(_parse_blob(int(aid), bytes(blob)))
            if out:
                yield pd.DataFrame(out)

    return blobs.mapInPandas(_run, schema=RECORD_SCHEMA)
