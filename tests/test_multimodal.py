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


def test_bmp_roundtrip_padding_and_orientation():
    """Pure-Python BMP write/parse: odd width forces row padding (stride
    5*3=15 -> 16); distinct channels catch BGR<->RGB swaps; a y-dependent
    pixel catches a missed bottom-up flip."""
    import numpy as np

    def px(x, y):
        return ((x * 10) % 256, (y * 20 + 1) % 256, (x + y + 2) % 256)

    payload = multimodal.encode_bmp(5, 3, px)
    m = multimodal.decode_image(payload)
    assert (m["width"], m["height"], m["mode"]) == (5, 3, "RGB")
    want = np.array([[px(x, y) for x in range(5)] for y in range(3)], dtype=np.uint8)
    assert np.array_equal(m["pixels"], want)


def test_ppm_p6_decode_with_comments():
    raster = bytes(range(2 * 2 * 3))
    payload = b"P6\n# a comment\n2 2\n255\n" + raster
    m = multimodal.decode_image(payload)
    assert (m["width"], m["height"]) == (2, 2)
    assert bytes(m["pixels"].reshape(-1)) == raster


def test_decode_image_rejects_unknown_formats():
    import pytest

    with pytest.raises(ValueError, match="unsupported image format"):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError, match="only BI_RGB"):
        # BMP header claiming 8 bpp
        import struct as s
        hdr = s.pack("<2sIHHIIiiHHIIiiII", b"BM", 54, 0, 0, 54, 40, 1, 1, 1, 8, 0, 0, 0, 0, 0, 0)
        multimodal.decode_image(hdr)


def test_decode_pixel_stats_spark(spark):
    """The Arrow decode stage end-to-end on a DataFrame of real BMP bytes."""
    rows = []
    for i in range(4):
        payload = multimodal.encode_bmp(3 + i, 2 + i, lambda x, y, i=i: ((i * 40) % 256,) * 3)
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in multimodal.decode_pixel_stats(df).collect()}
    for i in range(4):
        r = out[i]
        v = (i * 40) % 256
        assert (r.width, r.height, r.n_pixels) == (3 + i, 2 + i, (3 + i) * (2 + i))
        assert r.mean_byte == float(v) and r.min_byte == v and r.max_byte == v and r.first_px == v
