"""[EXT] Compressed-payload columns: the web-crawl ingest shape.

Raw crawl corpora (WARC/CDX pipelines) deliver document payloads
gzip/zlib-compressed per record, and columnar lakes increasingly carry
zstd-compressed blobs. These operators decompress/compress a binary column
inside an Arrow-vectorized pandas UDF — the same task-grain seam as the
multimodal decoders: payload bytes never cross an exchange, the UDF is one
batch-at-a-time loop over C codecs, and the output column composes with
every downstream text operator (dedup, quality, tokenization).

Codecs: ``gzip``/``zlib``/``deflate`` from the stdlib (always available);
``zstd``/``lz4``/``snappy``/``brotli`` through ``pyarrow.Codec`` when the
wheel ships them (import-gated — :func:`available_codecs` reports what this
environment supports).

Scale notes: decompression is pure per-row CPU at the task grain — it
scales embarrassingly. Keep the compressed column pruned out of any plan
that doesn't decode (column pruning does this for free when you select
only what you need), and decompress AFTER metadata-only filters so pruned
rows never pay the codec.
"""

from __future__ import annotations

import gzip
import zlib

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["available_codecs", "decompress", "compress"]

_STDLIB = ("gzip", "zlib", "deflate")


def _arrow_codec(name: str):
    import pyarrow as pa

    if not pa.Codec.is_available(name):
        raise ValueError(
            f"codec {name!r} not available in this pyarrow build; "
            f"available: {available_codecs()}"
        )
    return pa.Codec(name)


def available_codecs() -> list[str]:
    """Codecs usable in this environment (stdlib + this pyarrow build)."""
    import pyarrow as pa

    extra = [
        c for c in ("zstd", "lz4", "snappy", "brotli") if pa.Codec.is_available(c)
    ]
    return list(_STDLIB) + extra


def _one_shot(codec: str, decode: bool):
    """Per-payload (de)compression callable for one codec.

    zlib's one-shot functions handle gzip/zlib/raw-deflate via wbits;
    pyarrow codecs need the decompressed size for decompress(), so the
    compressed frame is prefixed with an 8-byte little-endian length —
    the standard framing for size-oblivious codecs (lz4 raw, snappy raw).
    """
    if codec == "gzip":
        return (lambda b: gzip.decompress(b)) if decode else (
            lambda b: gzip.compress(b, mtime=0)  # mtime=0: deterministic bytes
        )
    if codec == "zlib":
        return (lambda b: zlib.decompress(b)) if decode else zlib.compress
    if codec == "deflate":
        return (lambda b: zlib.decompress(b, wbits=-15)) if decode else (
            lambda b: zlib.compress(b)[2:-4]  # strip zlib header/adler
        )
    _arrow_codec(codec)  # fail closed on the DRIVER if unavailable
    # pyarrow.Codec is not picklable — resolve it lazily inside the task
    # (cached per worker process) instead of capturing it in the closure
    if decode:

        def _dec(b, _name=codec):
            import pyarrow as pa

            return pa.Codec(_name).decompress(
                b[8:], int.from_bytes(bytes(b[:8]), "little")
            ).to_pybytes()

        return _dec

    def _enc(b, _name=codec):
        import pyarrow as pa

        return len(b).to_bytes(8, "little") + pa.Codec(_name).compress(b).to_pybytes()

    return _enc


def decompress(col: Column | str, codec: str = "gzip") -> Column:
    """Decompress a binary column → binary (Arrow-vectorized pandas UDF).

    Chain ``F.decode(..., 'utf-8')`` for text payloads. NULL in → NULL out.
    """
    fn = _one_shot(codec, decode=True)

    @F.pandas_udf("binary")
    def _d(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else fn(bytes(b)))

    return _d(F.col(col) if isinstance(col, str) else col)


def compress(col: Column | str, codec: str = "gzip") -> Column:
    """Compress a binary column → binary. Deterministic bytes for the
    stdlib codecs (gzip pinned to mtime=0), so content-hash tests on the
    compressed form are stable across runs and machines."""
    fn = _one_shot(codec, decode=False)

    @F.pandas_udf("binary")
    def _c(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else fn(bytes(b)))

    return _c(F.col(col) if isinstance(col, str) else col)
