"""[EXT] Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (SURVEY.md §2.4 tail).

The container has no image/audio codecs, so the *decode* step is a
deliberately-stubbed seam (``NotImplementedError`` or a deterministic fake) —
but everything Spark-side is real and tested: the schema convention, the
Arrow-batched ``mapInPandas`` plumbing, batch shapes, and partition sizing.

Schema convention for a multimodal asset column::

    asset:  binary                    -- opaque payload
    asset_meta: struct<mime: string, width: int, height: int, ...>

Scale notes: binary payloads dominate row size → keep
``spark.sql.files.maxPartitionBytes`` at default so tasks stay ~128 MB, never
collect payloads, and push metadata-only predicates (mime, size) *before* any
decode stage so pruning happens at the parquet scan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_binary", "binary_meta", "decode_image_stub", "map_decode"]


def attach_binary(df: DataFrame, src_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize a binary payload column (here: utf-8 bytes of a string col;
    in production: the raw bytes read from object storage)."""
    return df.withColumn(out_col, F.encode(F.col(src_col), "utf-8"))


def binary_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque payload — JVM-side, no decode needed."""
    return df.withColumn("n_bytes", F.octet_length(F.col(bin_col)).cast("long")).withColumn(
        "content_sha", F.sha2(F.col(bin_col), 256)
    )


def decode_image_stub(payload: bytes) -> dict:
    """STUB: image decode (no codec libs in this container).

    A real deployment replaces this with PIL/libvips decode returning
    ``{width, height, mode, pixels}``. The deterministic fake below keys off
    the payload bytes so tests are stable.
    """
    if payload is None:
        raise NotImplementedError("image decode requires codec libraries not present here")
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
