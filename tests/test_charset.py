"""Charset detection + transcoding contract (operators/charset.py —
round-10 verdict ask #2).

Pins every rung of the detection ladder (BOM > transport declaration >
meta prescan > none) and the decode ladder (declared → UTF-8 rescue →
latin-1 total fallback), the WHATWG label aliases, and the quarantine
flags the catalog's clean-corpus oracle (text_transcode) can't plant.
"""

from __future__ import annotations

from zio_analytics_spark.operators.charset import (
    decode_text,
    sniff_charset,
    transcode,
)


def test_sniff_ladder_order():
    # BOM beats transport declaration
    assert sniff_charset(b"\xef\xbb\xbfhi", "text/html; charset=shift_jis") == "utf-8-sig"
    assert sniff_charset(b"\xff\xfea\x00", None) == "utf-16-le"
    assert sniff_charset(b"\xfe\xff\x00a", None) == "utf-16-be"
    # transport declaration beats meta
    head = b'<meta charset="gbk">x'
    assert sniff_charset(head, "text/html; charset=Shift_JIS") == "shift_jis"
    # meta charset form and http-equiv form
    assert sniff_charset(head, "text/html") == "gbk"
    heq = b'<meta http-equiv="Content-Type" content="text/html; charset=EUC-JP">'
    assert sniff_charset(heq, None) == "euc_jp"
    # meta outside the 1024-byte prescan window is invisible
    far = b" " * 1100 + b'<meta charset="gbk">'
    assert sniff_charset(far, None) is None
    assert sniff_charset(b"plain", None) is None


def test_whatwg_aliases():
    for label, codec in [
        ("ISO-8859-1", "cp1252"), ("latin1", "cp1252"), ("ascii", "cp1252"),
        ("US-ASCII", "cp1252"), ("Windows-1252", "cp1252"),
        ("Shift_JIS", "shift_jis"), ("x-sjis", "shift_jis"),
        ("GB2312", "gbk"), ("gbk", "gbk"), ("utf8", "utf-8"),
        ("EUC-KR", "euc_kr"), ("Big5", "big5"),
    ]:
        assert sniff_charset(b"", f"text/html; charset={label}") == codec
    # quoted parameter value
    assert sniff_charset(b"", 'text/html; charset="Shift_JIS"') == "shift_jis"
    # unknown label falls through to undeclared, not a crash
    assert sniff_charset(b"", "text/html; charset=klingon-8") is None


def test_decode_ladder_clean_lanes():
    for text, cs, label in [
        ("héllo ☃", "utf-8", "utf-8"),
        ("café — naïve", "cp1252", "ISO-8859-1"),
        ("日本語テスト", "shift_jis", "Shift_JIS"),
        ("中文测试", "gbk", "GB2312"),
    ]:
        got, used, err = decode_text(text.encode(cs), f"text/plain; charset={label}")
        assert (got, used, err) == (text, cs, None)
    # BOM'd utf-8 with a WRONG declaration still decodes via the BOM
    got, used, err = decode_text(
        "﻿bom é".encode("utf-8"), "text/plain; charset=shift_jis"
    )
    assert got == "bom é" and used == "utf-8-sig" and err is None
    # utf-16le BOM
    got, used, err = decode_text("ab é".encode("utf-16"), None)
    assert got == "ab é" and used.startswith("utf-16") and err is None
    # undeclared ASCII/UTF-8 is the common clean case
    assert decode_text(b"plain", None) == ("plain", "utf-8", None)


def test_decode_ladder_recovery_lanes():
    # wrong declaration, valid UTF-8 underneath: rescued but flagged
    text, used, err = decode_text("héé".encode("utf-8"), "text/plain; charset=utf-16")
    assert text == "héé" and used == "utf-8" and "utf-16 failed" in err
    # declared shift_jis but bytes are not: rescued by the next rungs
    text, used, err = decode_text(b"\x85\x85\x85", "text/plain; charset=shift_jis")
    assert used == "latin-1" and "shift_jis failed" in err
    # undeclared binary junk: total latin-1 fallback, flagged
    text, used, err = decode_text(b"\xff over \xfe", None)
    assert used == "latin-1" and "not valid UTF-8" in err
    assert len(text) == len(b"\xff over \xfe")  # total: every byte mapped


def test_transcode_frame(spark):
    rows = [
        (1, bytearray("héllo".encode("utf-8")), "text/plain; charset=utf-8"),
        (2, bytearray("café".encode("cp1252")), "text/plain; charset=latin1"),
        (3, bytearray("かな".encode("shift_jis")), "text/plain; charset=shift_jis"),
        (4, bytearray("wrong".encode("utf-8")), "text/plain; charset=utf-16"),
        (5, bytearray(b"\xff\x00junk\xfe"), None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, content_type string"
    )
    out = {r["doc_id"]: r for r in transcode(df, content_type_col="content_type").collect()}
    assert out[1]["text"] == "héllo" and out[1]["ok"]
    assert out[2]["text"] == "café" and out[2]["charset"] == "cp1252" and out[2]["ok"]
    assert out[3]["text"] == "かな" and out[3]["ok"]
    assert out[4]["text"] == "wrong" and not out[4]["ok"] and "failed" in out[4]["error"]
    assert not out[5]["ok"] and out[5]["charset"] == "latin-1"


def test_transcode_without_content_type_col(spark):
    df = spark.createDataFrame(
        [(1, bytearray('<meta charset="gbk">中文'.encode("gbk")))],
        "doc_id long, payload binary",
    )
    r = transcode(df).collect()[0]
    assert r["charset"] == "gbk" and r["ok"] and r["text"].endswith("中文")
