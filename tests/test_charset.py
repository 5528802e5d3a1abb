"""Charset detection + transcoding (operators/charset.py)."""

import hashlib

from olx_spark.operators.charset import charset_stats, detect_and_transcode

ACCENTED = "résumé naïve über ¿qué?"  # latin-1-encodable on purpose


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_ascii():
    r = detect_and_transcode(b"plain ascii")
    assert r["charset"] == "ascii" and r["bom"] == 0 and r["parse_ok"] == 1
    assert r["n_high"] == 0 and r["text_md5"] == _md5("plain ascii")


def test_utf8_multibyte():
    r = detect_and_transcode(ACCENTED.encode("utf-8"))
    assert r["charset"] == "utf-8" and r["bom"] == 0
    assert r["n_high"] > 0 and r["text_md5"] == _md5(ACCENTED)


def test_boms_stripped():
    cases = [
        (b"\xef\xbb\xbf" + ACCENTED.encode("utf-8"), "utf-8"),
        (b"\xff\xfe" + ACCENTED.encode("utf-16-le"), "utf-16-le"),
        (b"\xfe\xff" + ACCENTED.encode("utf-16-be"), "utf-16-be"),
    ]
    for data, cs in cases:
        r = detect_and_transcode(data)
        assert r["charset"] == cs and r["bom"] == 1 and r["parse_ok"] == 1
        assert r["text_md5"] == _md5(ACCENTED)  # identical canonical text


def test_latin1_fallback():
    data = ACCENTED.encode("latin-1")
    r = detect_and_transcode(data)
    assert r["charset"] == "latin-1" and r["parse_ok"] == 1
    assert r["text_md5"] == _md5(data.decode("latin-1"))


def test_broken_utf16_flagged_not_dropped():
    data = b"\xff\xfe" + ACCENTED.encode("utf-16-le")[:-1]
    r = detect_and_transcode(data)
    assert r["charset"] == "utf-16-le" and r["parse_ok"] == 0
    assert r["text_md5"] is not None  # latin-1 salvage


def test_invalid_utf8_continuation():
    r = detect_and_transcode(b"\xc3\x28 broken")
    assert r["charset"] == "latin-1" and r["parse_ok"] == 1


def test_empty():
    r = detect_and_transcode(b"")
    assert r["charset"] == "ascii" and r["text_md5"] == _md5("")


def test_operator_batches(spark):
    rows = [
        ("a", b"plain"),
        ("b", ACCENTED.encode("utf-8")),
        ("c", b"\xff\xfe" + "hi".encode("utf-16-le")),
        ("d", ACCENTED.encode("latin-1")),
    ]
    df = spark.createDataFrame(rows, "text_id string, bytes binary")
    got = {r["text_id"]: r.asDict() for r in charset_stats(df).collect()}
    assert got["a"]["charset"] == "ascii"
    assert got["b"]["charset"] == "utf-8"
    assert got["c"]["charset"] == "utf-16-le" and got["c"]["text_md5"] == _md5("hi")
    assert got["d"]["charset"] == "latin-1"
    # dedup property: same logical text, three encodings, one md5
    assert got["b"]["text_md5"] == got["d"]["text_md5"] == _md5(ACCENTED)
