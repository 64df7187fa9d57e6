"""Multimodal column plumbing: binary payloads + Arrow-batched decode stage.
The decode itself is a deterministic stub (no codecs in this container) —
the Spark-side schema/batching is what's under test."""

from __future__ import annotations

import pytest

from zio_analytics_spark.operators import multimodal


def _docs(spark):
    return spark.createDataFrame([(1, "hello"), (2, "world!")], "doc_id long, text string")


def test_attach_binary_and_meta(spark):
    out = multimodal.binary_meta(multimodal.attach_binary(_docs(spark), "text")).collect()
    by_id = {r.doc_id: r for r in out}
    assert bytes(by_id[1].payload) == b"hello"
    assert by_id[2].n_bytes == 6
    assert len(by_id[1].content_sha) == 64  # sha-256 hex


def test_map_decode_stub_batches(spark):
    df = multimodal.attach_binary(_docs(spark), "text")
    out = multimodal.map_decode(df).collect()
    assert {r.doc_id for r in out} == {1, 2}
    r = out[0]
    assert 16 <= r.width < 256 and 16 <= r.height < 256 and r.mode == "RGB"
    # deterministic fake: same payload → same dims on re-run
    again = {x.doc_id: (x.width, x.height) for x in multimodal.map_decode(df).collect()}
    assert again == {x.doc_id: (x.width, x.height) for x in out}


def test_decode_stub_raises_on_missing_payload():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_stub(None)
