"""[EXT] MIME sniffing — magic-byte content-type detection for binary
columns.

A crawl's ``resource`` records and every multimodal ingest lane start
with the same question: what IS this blob? Transport-declared types lie
(the charset.py lesson at the byte grain), so production routing sniffs
the leading bytes — the WHATWG mime-sniffing idea restated for the
batch-column case. This is the router BETWEEN warc.warc_records /
binaryFile scans and the typed codec lanes (multimodal.py jpeg/png/gif/
tiff/bmp/wav, compression.py gzip, html.py text).

Spec (documented, deterministic; the signature table is
:data:`MAGIC_SIGNATURES`, matched in order — longest/most-specific
first):

1. exact leading-byte signatures (JPEG/PNG/GIF/TIFF/BMP/gzip/zip/PDF/
   ID3-MP3/MP3 frame-sync/Ogg/Matroska), plus the two offset
   signatures: RIFF containers discriminate on bytes 8-11
   (WAVE/AVI/WEBP) and the MP4 family on ``ftyp`` at bytes 4-7;
2. no binary signature → HTML check: optional UTF-8 BOM + whitespace
   then ``<!doctype html`` / ``<html`` / ``<head`` / ``<body`` /
   ``<!--`` (case-insensitive) → ``text/html``;
3. else if the first 512 bytes contain NO binary-class byte
   (0x00-0x08, 0x0B, 0x0E-0x1A, 0x1C-0x1F — the WHATWG binary set) →
   ``text/plain``;
4. else ``application/octet-stream``.

Everything is ONE Column expression over ``hex(substring(bin, 1, 512))``
— whole-stage codegen, map-only, zero UDFs; at 100 TB the sniff fuses
into the scan that already reads the blob (and with parquet it prunes
to the column's first bytes only when the reader supports lazy
materialization). The catalog oracle pins expected types LITERALLY per
synthesized payload class — no hex-regex dialect is mirrored into SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["MAGIC_SIGNATURES", "sniff_mime_expr"]

#: (hex-prefix, mime) — matched in table order against the UPPERCASE hex
#: of the leading bytes. Offset signatures (RIFF / ftyp) are handled
#: structurally in :func:`sniff_mime_expr`, not here.
MAGIC_SIGNATURES: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("FFD8FF", "image/jpeg"),
    ("49492A00", "image/tiff"),
    ("4D4D002A", "image/tiff"),
    ("424D", "image/bmp"),
    ("1F8B", "application/gzip"),
    ("504B0304", "application/zip"),
    ("504B0506", "application/zip"),
    ("504B0708", "application/zip"),
    ("255044462D", "application/pdf"),
    ("494433", "audio/mpeg"),       # ID3v2-tagged MP3
    ("FFFB", "audio/mpeg"),         # bare MPEG-1 layer III frame sync
    ("FFF3", "audio/mpeg"),
    ("FFF2", "audio/mpeg"),
    ("4F676753", "application/ogg"),
    ("1A45DFA3", "video/x-matroska"),
    ("595556344D50454732", "video/x-yuv4mpeg"),  # Y4M (the shipped codec)
]

#: binary-class byte pairs (WHATWG binary data bytes), as a hex-pair
#: alternation; anchored to even positions by the (..)* prefix.
_BINARY_BYTE_RE = r"^(?:[0-9A-F]{2})*(?:0[0-8B]|0[EF]|1[0-9A]|1[C-F])"

_HTML_HEAD_RE = (
    r"(?i)^(?:﻿)?[ \t\n\r\f\x0B]*<(?:!doctype html|html|head|body|!--)"
)


def sniff_mime_expr(bin_col: Column) -> Column:
    """Magic-byte MIME of a binary column (module docstring spec) —
    one fused Column expression, no UDF. NULL in → NULL out."""
    hx = F.hex(F.substring(bin_col, 1, 512))
    expr = F.when(bin_col.isNull(), F.lit(None).cast("string"))
    # offset signatures first: RIFF container kind at bytes 8-11,
    # ISO-BMFF 'ftyp' at bytes 4-7 (most-specific-first ordering)
    riff = hx.startswith("52494646")
    kind = F.substring(hx, 17, 8)
    ftyp = F.substring(hx, 9, 8) == "66747970"
    cases = [
        (riff & (kind == "57415645"), "audio/x-wav"),
        (riff & (kind == "41564920"), "video/x-msvideo"),
        (riff & (kind == "57454250"), "image/webp"),
        (ftyp, "video/mp4"),
    ] + [(hx.startswith(sig), mime) for sig, mime in MAGIC_SIGNATURES]
    for cond, mime in cases:
        expr = expr.when(cond, F.lit(mime))
    text_head = F.substring(bin_col.cast("string"), 1, 512)
    return expr.when(
        text_head.rlike(_HTML_HEAD_RE), F.lit("text/html")
    ).when(
        ~hx.rlike(_BINARY_BYTE_RE), F.lit("text/plain")
    ).otherwise(F.lit("application/octet-stream"))
