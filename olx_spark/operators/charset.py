"""Character-set detection + UTF-8 transcoding — the ingestion step
BEFORE every text operator in the engine: scraped bytes arrive in
whatever encoding the origin served, and the text pipeline (Gopher/C4
rules, dedup fingerprints, language ID) assumes one canonical UTF-8
string. The reference inherits jsoup's charset handling implicitly
(``DownloadAds.scala`` works on parsed DOM text); a from-bytes engine
must do it explicitly.

Detection ladder (deterministic, no statistical guessing):

1. byte-order marks: UTF-8 BOM, UTF-16 LE/BE BOMs (stripped after
   decode — the W3C/WHATWG precedence rule);
2. strict UTF-8 validation — valid and pure-ASCII reports ``ascii``,
   valid with multibyte sequences reports ``utf-8``;
3. fallback ``latin-1`` (total: every byte string decodes), which is
   the HTTP/1.1 historical default and the WHATWG windows-1252
   stand-in this sandbox can express with the stdlib alone.

A BOM that promises UTF-16 but carries an undecodable tail (odd
length, unpaired surrogate) keeps its detected charset with
``parse_ok=0`` and falls back to latin-1 text — the row is flagged,
never dropped, never a crash.

Scale shape: Arrow-batched ``mapInPandas`` over the bytes column,
zero shuffle; the per-row work is one or two ``bytes.decode`` calls
(C speed). Output carries the UTF-8 re-encoding's md5 so downstream
exact-dedup keys are charset-independent.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CHARSET_SCHEMA = StructType(
    [
        StructField("text_id", StringType()),
        StructField("charset", StringType()),
        StructField("bom", IntegerType()),
        StructField("n_high", LongType()),
        StructField("text_md5", StringType()),
        StructField("parse_ok", IntegerType()),
    ]
)


def detect_and_transcode(data: bytes) -> dict:
    """One record of :data:`CHARSET_SCHEMA` (minus text_id) for a raw
    byte payload; see module docstring for the ladder."""
    n_high = sum(1 for b in data if b >= 0x80)
    charset, bom, text, ok = None, 0, None, 1
    if data.startswith(b"\xef\xbb\xbf"):
        charset, bom = "utf-8", 1
        try:
            text = data[3:].decode("utf-8", "strict")
        except UnicodeDecodeError:
            text, ok = data[3:].decode("latin-1"), 0
    elif data.startswith(b"\xff\xfe"):
        charset, bom = "utf-16-le", 1
        try:
            text = data[2:].decode("utf-16-le", "strict")
        except UnicodeDecodeError:
            text, ok = data[2:].decode("latin-1"), 0
    elif data.startswith(b"\xfe\xff"):
        charset, bom = "utf-16-be", 1
        try:
            text = data[2:].decode("utf-16-be", "strict")
        except UnicodeDecodeError:
            text, ok = data[2:].decode("latin-1"), 0
    else:
        try:
            text = data.decode("utf-8", "strict")
            charset = "ascii" if n_high == 0 else "utf-8"
        except UnicodeDecodeError:
            charset, text = "latin-1", data.decode("latin-1")
    return {
        "charset": charset,
        "bom": bom,
        "n_high": n_high,
        "text_md5": hashlib.md5(text.encode("utf-8")).hexdigest(),
        "parse_ok": ok,
    }


def charset_stats(
    df: DataFrame, id_col: str = "text_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Per-payload charset record (schema :data:`CHARSET_SCHEMA`)."""

    def run(batches):
        for pdf in batches:
            out = []
            for tid, data in zip(pdf[id_col], pdf[bytes_col]):
                rec = detect_and_transcode(bytes(data))
                rec["text_id"] = tid
                out.append(rec)
            if out:
                yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=CHARSET_SCHEMA)
