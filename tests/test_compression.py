"""Compressed-payload column operators: stdlib + pyarrow codecs in the
Arrow-vectorized UDF seam (the WARC/web-crawl ingest shape)."""

from __future__ import annotations

import gzip
import zlib

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators import compression


def _payloads(spark):
    rows = [(1, b"hello compressed world " * 20), (2, b""), (3, None)]
    return spark.createDataFrame(rows, "doc_id long, raw binary")


@pytest.mark.parametrize("codec", ["gzip", "zlib", "deflate", "zstd", "lz4"])
def test_roundtrip_preserves_bytes_and_nulls(spark, codec):
    df = _payloads(spark)
    out = df.select(
        "doc_id",
        compression.decompress(
            compression.compress(F.col("raw"), codec), codec
        ).alias("back"),
    )
    got = {r.doc_id: (bytes(r.back) if r.back is not None else None) for r in out.collect()}
    assert got[1] == b"hello compressed world " * 20
    assert got[2] == b""
    assert got[3] is None  # NULL in -> NULL out, not a codec error


def test_gzip_bytes_are_deterministic(spark):
    """mtime=0 pins the gzip header: compressed bytes are content-stable,
    so digests of the COMPRESSED form survive re-runs and repartitions."""
    df = _payloads(spark).where("doc_id = 1")
    one = df.select(F.md5(compression.compress(F.col("raw"), "gzip")).alias("h"))
    a = one.first()["h"]
    b = one.first()["h"]
    assert a == b


def test_decompress_interops_with_external_compressors(spark):
    """Payloads compressed OUTSIDE the engine (stdlib, as a crawler would)
    decompress correctly — the operator is not a closed loop."""
    ext = [
        (1, gzip.compress(b"external gzip payload")),
        (2, zlib.compress(b"external zlib payload")),
    ]
    df = spark.createDataFrame(ext, "doc_id long, raw binary")
    gz = df.where("doc_id = 1").select(
        F.decode(compression.decompress(F.col("raw"), "gzip"), "utf-8").alias("t")
    )
    zl = df.where("doc_id = 2").select(
        F.decode(compression.decompress(F.col("raw"), "zlib"), "utf-8").alias("t")
    )
    assert gz.first()["t"] == "external gzip payload"
    assert zl.first()["t"] == "external zlib payload"


def test_unknown_codec_fails_closed():
    with pytest.raises((ValueError, KeyError)):
        compression._one_shot("bz2-nope", decode=True)
