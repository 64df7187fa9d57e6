"""Magic-byte MIME sniffing contract (operators/mime.py): the signature
table, the two offset signatures (RIFF kind, ISO-BMFF ftyp), the
HTML-head check, the WHATWG binary-byte text/plain boundary, and NULL
propagation — against REAL payloads from the shipped encoders where one
exists.
"""

from __future__ import annotations

import gzip

import numpy as np
from pyspark.sql import functions as F

from zio_analytics_spark.operators.mime import sniff_mime_expr


def _sniff(spark, payloads):
    df = spark.createDataFrame(
        [(k, bytearray(v) if v is not None else None) for k, v in payloads],
        "k string, b binary",
    )
    rows = df.select("k", sniff_mime_expr(F.col("b")).alias("m")).collect()
    return {r["k"]: r["m"] for r in rows}


def test_encoder_payloads_sniff_to_their_lane(spark):
    from zio_analytics_spark.operators.jpeg import encode_jpeg
    from zio_analytics_spark.operators.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
        encode_wav,
    )

    px = lambda x, y: (x * 40 % 256, y * 40 % 256, 128)
    palette = [(i, i, i) for i in range(256)]
    got = _sniff(spark, [
        ("bmp", encode_bmp(4, 4, px)),
        ("png", encode_png(4, 4, px)),
        ("gif", encode_gif(4, 4, lambda x, y: (x + y) % 256, palette)),
        ("jpeg", encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))),
        ("wav", encode_wav(np.zeros(8, dtype=np.int16))),
        ("gz", gzip.compress(b"payload")),
    ])
    assert got == {
        "bmp": "image/bmp", "png": "image/png", "gif": "image/gif",
        "jpeg": "image/jpeg", "wav": "audio/x-wav", "gz": "application/gzip",
    }


def test_offset_signatures_discriminate(spark):
    got = _sniff(spark, [
        ("wav", b"RIFF\x10\x00\x00\x00WAVEfmt "),
        ("avi", b"RIFF\x10\x00\x00\x00AVI LIST"),
        ("webp", b"RIFF\x10\x00\x00\x00WEBPVP8 "),
        ("riff_other", b"RIFF\x10\x00\x00\x00XXXXdata"),
        ("mp4", b"\x00\x00\x00\x18ftypisomiso2"),
        ("y4m", b"YUV4MPEG2 W4 H4\nFRAME\n"),
        ("mkv", b"\x1a\x45\xdf\xa3junk"),
    ])
    assert got["wav"] == "audio/x-wav"
    assert got["avi"] == "video/x-msvideo"
    assert got["webp"] == "image/webp"
    assert got["mp4"] == "video/mp4"
    assert got["y4m"] == "video/x-yuv4mpeg"
    assert got["mkv"] == "video/x-matroska"
    # unknown RIFF kind contains control bytes -> octet-stream
    assert got["riff_other"] == "application/octet-stream"


def test_html_head_and_text_boundary(spark):
    got = _sniff(spark, [
        ("doctype", b"  <!DOCTYPE html><p>x</p>"),
        ("html_ci", b"\t<HTML lang='en'>"),
        ("bom_html", b"\xef\xbb\xbf<html>"),
        ("comment", b"<!-- banner --><html>"),
        ("not_html", b"<xml>nope</xml>"),          # printable -> text/plain
        ("plain", b"ordinary words\nsecond line\r\n"),
        ("esc_ok", b"ansi \x1b[31mred\x1b[0m ok"),  # 0x1B is NOT binary-class
        ("nul", b"text with \x00 inside"),
        ("ctl", b"\x01starts with control"),
        ("null", None),
    ])
    assert got["doctype"] == "text/html"
    assert got["html_ci"] == "text/html"
    assert got["bom_html"] == "text/html"
    assert got["comment"] == "text/html"
    assert got["not_html"] == "text/plain"
    assert got["plain"] == "text/plain"
    assert got["esc_ok"] == "text/plain"
    assert got["nul"] == "application/octet-stream"
    assert got["ctl"] == "application/octet-stream"
    assert got["null"] is None


def test_signature_order_most_specific_first(spark):
    # ID3 header wins over the text heuristic; bare frame sync too
    got = _sniff(spark, [
        ("id3", b"ID3\x04\x00 printable tail"),
        ("sync", b"\xff\xfb\x90\x00frame"),
        ("pdf", b"%PDF-1.7\n%\xe2\xe3\xcf\xd3"),
        ("zip", b"PK\x03\x04rest"),
        ("ogg", b"OggS\x00\x02"),
        ("tiff_le", b"II*\x00helpers"),
        ("tiff_be", b"MM\x00*helpers"),
    ])
    assert got["id3"] == "audio/mpeg" and got["sync"] == "audio/mpeg"
    assert got["pdf"] == "application/pdf" and got["zip"] == "application/zip"
    assert got["ogg"] == "application/ogg"
    assert got["tiff_le"] == "image/tiff" and got["tiff_be"] == "image/tiff"


def test_sniff_is_map_only(spark):
    df = spark.range(8).select(F.encode(F.lit("plain"), "utf-8").alias("b"))
    plan = df.select(sniff_mime_expr(F.col("b")).alias("m"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
