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

    with pytest.raises(ValueError, match="truncated"):
        # JPEG is SUPPORTED now (operators/jpeg.py) — an SOI+APP0 fragment
        # is corrupt/truncated, not unknown
        multimodal.decode_image(b"\xff\xd8\xff\xe0JFIF....")
    with pytest.raises(ValueError, match="truncated TIFF"):
        # TIFF is SUPPORTED now — a magic with a garbage IFD offset is
        # corrupt, not unknown
        multimodal.decode_image(b"II*\x00....")
    with pytest.raises(ValueError, match="unsupported image format"):
        multimodal.decode_image(b"8BPSjunk....")  # Photoshop: codec seam
    with pytest.raises(ValueError, match="IHDR"):
        # PNG is SUPPORTED now — a valid signature with no chunks is corrupt,
        # not unknown
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


def test_wav_roundtrip_exact():
    import numpy as np

    from zio_analytics_spark.operators.multimodal import decode_audio, encode_wav

    amp = np.array([0, 1000, -1000, 32767, -32768, 7], dtype=np.int64)
    payload = encode_wav(amp, sample_rate=16000)
    m = decode_audio(payload)
    assert m["sample_rate"] == 16000 and m["n_channels"] == 1
    assert m["samples"][:, 0].tolist() == amp.tolist()


def test_wav_decode_walks_extra_chunks():
    """A LIST chunk between fmt and data (common in real files) must not
    break the parser — it walks chunks, it doesn't assume byte 44."""
    import struct

    import numpy as np

    from zio_analytics_spark.operators.multimodal import decode_audio, encode_wav

    base = encode_wav(np.array([5, -5], dtype=np.int64), 8000)
    fmt_chunk = base[12:36]  # 'fmt ' header+body (24 bytes)
    data_chunk = base[36:]
    junk = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    doctored = base[:12] + fmt_chunk + junk + data_chunk
    m = decode_audio(doctored)
    assert m["samples"][:, 0].tolist() == [5, -5]


def test_wav_decode_rejects_non_riff():
    import pytest

    from zio_analytics_spark.operators.multimodal import decode_audio

    with pytest.raises(ValueError):
        decode_audio(b"ID3\x03mp3-ish bytes")


def test_decode_audio_stats_stage(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.multimodal import (
        decode_audio_stats,
        encode_wav,
    )

    rows = [(1, encode_wav(np.array([100, -300, 200], dtype=np.int64), 1000)),
            (2, encode_wav(np.array([0, 0, 0, 0], dtype=np.int64), 8000))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_audio_stats(df).collect()}
    assert out[1]["n_samples"] == 3 and out[1]["duration_ms"] == 3.0
    assert out[1]["mean_amp"] == 0.0 and out[1]["max_abs"] == 300
    assert out[1]["first_sample"] == 100
    assert out[2]["duration_ms"] == 0.5


def test_y4m_roundtrip_and_plane_order():
    import numpy as np

    from zio_analytics_spark.operators.multimodal import decode_video, encode_y4m

    fr = np.zeros((2, 2, 3, 3), dtype=np.uint8)
    fr[0, 0, 0] = (10, 20, 30)  # Y/U/V of frame0 top-left
    fr[1, 1, 2] = (99, 98, 97)
    payload = encode_y4m(fr, width=3, height=2)
    m = decode_video(payload)
    assert (m["width"], m["height"], m["n_frames"]) == (3, 2, 2)
    assert m["frames"][0, 0, 0].tolist() == [10, 20, 30]  # planar undone
    assert m["frames"][1, 1, 2].tolist() == [99, 98, 97]


def test_y4m_rejects_compressed_and_wrong_colorspace():
    import pytest

    from zio_analytics_spark.operators.multimodal import decode_video

    with pytest.raises(ValueError):
        decode_video(b"\x00\x00\x00\x18ftypmp42 h264-ish")
    with pytest.raises(ValueError):
        decode_video(b"YUV4MPEG2 W2 H2 F25:1 C420\nFRAME\n" + b"\x00" * 6)


def test_sample_frame_stats_stride(spark):
    import numpy as np

    from zio_analytics_spark.operators.multimodal import encode_y4m, sample_frame_stats

    # 5 frames, luma = frame index; sampling every 2nd keeps frames 0,2,4
    fr = np.zeros((5, 1, 1, 3), dtype=np.uint8)
    for f in range(5):
        fr[f, 0, 0, 0] = f * 10
    df = spark.createDataFrame(
        [(1, encode_y4m(fr, 1, 1))], "doc_id long, payload binary"
    )
    r = sample_frame_stats(df, every_k=2).collect()[0]
    assert r["n_frames"] == 5 and r["n_sampled"] == 3
    assert r["mean_luma"] == (0 + 20 + 40) / 3
    assert r["first_luma"] == 0


def test_png_roundtrip_all_filters_rgb():
    """encode_png cycles scanline filter y%5, so an 11-row image forces the
    decoder through None/Sub/Up/Average/Paeth (twice); any broken unfilter
    corrupts every subsequent row via the Up/Paeth chain."""
    import numpy as np

    w, h = 7, 11

    def pix(x, y):
        return ((x * 3 + y * 7) % 256, (x + y) % 256, (2 * x + 5 * y) % 256)

    m = multimodal.decode_image(multimodal.encode_png(w, h, pix, color_type=2))
    assert (m["width"], m["height"], m["mode"]) == (w, h, "RGB")
    exp = np.array([[pix(x, y) for x in range(w)] for y in range(h)], dtype=np.uint8)
    assert np.array_equal(m["pixels"], exp)


def test_png_roundtrip_rgba_and_gray():
    import numpy as np

    def pix4(x, y):
        return (x % 256, y % 256, (x + y) % 256, (x * y) % 256)

    m4 = multimodal.decode_png(multimodal.encode_png(5, 6, pix4, color_type=6))
    exp4 = np.array([[pix4(x, y) for x in range(5)] for y in range(6)], dtype=np.uint8)
    assert m4["mode"] == "RGBA" and np.array_equal(m4["pixels"], exp4)
    mg = multimodal.decode_png(
        multimodal.encode_png(4, 7, lambda x, y: ((x * 31 + y * 17) % 256,), color_type=0)
    )
    assert mg["mode"] == "L" and mg["pixels"].shape == (7, 4, 1)


def test_png_decoder_only_handbuilt_stream():
    """Decoder-vs-spec check that cannot be cancelled by a shared encoder
    bug: a 2x2 RGB stream hand-filtered with Sub then Paeth, expected raw
    bytes computed by hand from RFC 2083's predictor definitions."""
    import struct
    import zlib

    import numpy as np

    # raw row0 = 10,20,30,110,120,130  -> Sub:   10,20,30,100,100,100
    # raw row1 = 13,24,35,120,130,150  -> Paeth: 3,4,5,10,10,20
    filtered = bytes([1, 10, 20, 30, 100, 100, 100, 4, 3, 4, 5, 10, 10, 20])

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    comp = zlib.compress(filtered)
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
    exp = np.array(
        [[[10, 20, 30], [110, 120, 130]], [[13, 24, 35], [120, 130, 150]]],
        dtype=np.uint8,
    )
    one = sig + ihdr + chunk(b"IDAT", comp) + chunk(b"IEND", b"")
    assert np.array_equal(multimodal.decode_png(one)["pixels"], exp)
    # IDAT may be split arbitrarily — the zlib stream spans chunks
    split = sig + ihdr + chunk(b"IDAT", comp[:5]) + chunk(b"IDAT", comp[5:]) + chunk(b"IEND", b"")
    assert np.array_equal(multimodal.decode_png(split)["pixels"], exp)


def test_png_rejects_unsupported_tiers():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="signature"):
        multimodal.decode_png(b"\x89PNG\r\n\x1a\x00garbage")
    import struct
    import zlib

    import numpy as np

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    # 16-bit depth is SUPPORTED since round 6: an all-zero 2x2 RGB16 stream
    # (2 rows x (1 filter byte + 12 sample bytes)) decodes to uint16 zeros
    ok16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + chunk(b"IEND", b"")
    )
    m = multimodal.decode_png(ok16)
    assert m["depth"] == 16 and m["pixels"].dtype == np.uint16
    assert m["pixels"].shape == (2, 2, 3) and not m["pixels"].any()
    # 4-bit gray is SUPPORTED too (full spec matrix since round 6):
    # 2x2 depth-4 → stride 1, two rows of (filter byte + 1 data byte)
    m4 = multimodal.decode_png(
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes([0, 0x5A, 0, 0xC3])))
        + chunk(b"IEND", b"")
    )
    assert m4["pixels"].reshape(2, 2).tolist() == [[5, 10], [12, 3]]
    # combinations OUTSIDE the spec matrix are rejected (depth 3 never valid)
    bad3 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 4))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="depth/color"):
        multimodal.decode_png(bad3)


def test_g711_reference_values_and_roundtrip():
    """Published G.711 anchor values (μ-law 0x00 → −32124, 0xFF → 0;
    A-law 0x55 → −8, 0x2A → −32256) plus full-container decode — the
    expansion formulas are checked against the spec, not a shared
    implementation."""
    import numpy as np

    from zio_analytics_spark.operators.multimodal import (
        _alaw_to_linear,
        _ulaw_to_linear,
        decode_audio,
        encode_wav_g711,
    )

    assert _ulaw_to_linear(np.array([0xFF], np.uint8))[0] == 0
    assert _ulaw_to_linear(np.array([0x00], np.uint8))[0] == -32124
    assert _ulaw_to_linear(np.array([0x80], np.uint8))[0] == 32124
    assert _alaw_to_linear(np.array([0x55], np.uint8))[0] == -8
    assert _alaw_to_linear(np.array([0xD5], np.uint8))[0] == 8
    assert _alaw_to_linear(np.array([0x2A], np.uint8))[0] == -32256
    assert _alaw_to_linear(np.array([0xAA], np.uint8))[0] == 32256

    enc = bytes((i * 31 + 7) % 256 for i in range(50))
    for law, expand in (("ulaw", _ulaw_to_linear), ("alaw", _alaw_to_linear)):
        m = decode_audio(encode_wav_g711(enc, 8000, law))
        assert m["sample_rate"] == 8000 and m["n_channels"] == 1
        assert np.array_equal(
            m["samples"][:, 0], expand(np.frombuffer(enc, np.uint8))
        )


def test_decode_audio_still_rejects_real_codecs():
    import pytest as _pytest

    from zio_analytics_spark.operators import multimodal as mm

    # fmt code 85 = MP3-in-WAV: a genuine codec-library seam
    import struct

    hdr = b"RIFF" + struct.pack("<I", 36) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 85, 1, 8000, 8000, 1, 0)
    hdr += b"data" + struct.pack("<I", 0)
    with _pytest.raises(ValueError, match="G.711"):
        mm.decode_audio(hdr)


def test_png_palette_property_roundtrip():
    """Hypothesis property: ANY palette (1..256 random RGB triples) and any
    index grid round-trips encode_png(color_type=3) -> decode_png exactly,
    in both interlace modes — including single-entry palettes and dims
    that leave Adam7 passes empty."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 13),
        h=st.integers(1, 12),
        psize=st.integers(1, 256),
        seed=st.integers(0, 2**31 - 1),
        interlace=st.booleans(),
    )
    def check(w, h, psize, seed, interlace):
        rng = np.random.default_rng(seed)
        pal = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(psize)]
        grid = rng.integers(0, psize, (h, w))
        png = multimodal.encode_png(
            w, h, lambda x, y: (int(grid[y, x]),),
            color_type=3, palette=pal, interlace=interlace,
        )
        m = multimodal.decode_png(png)
        assert (m["width"], m["height"], m["mode"]) == (w, h, "RGB")
        assert m["palette_size"] == psize
        exp = np.array(pal, dtype=np.uint8)[grid]
        assert np.array_equal(m["pixels"], exp)

    check()


def test_png_palette_malformed_rejected():
    """PLTE hygiene: missing PLTE, truncated PLTE, and out-of-range indices
    are errors, never silent garbage."""
    import struct
    import zlib

    import pytest as _pytest

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
    idat = chunk(b"IDAT", zlib.compress(bytes([0, 0, 1, 0, 1, 0])))
    with _pytest.raises(ValueError, match="PLTE"):
        multimodal.decode_png(sig + ihdr + idat + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="PLTE"):
        multimodal.decode_png(
            sig + ihdr + chunk(b"PLTE", b"\x01\x02") + idat + chunk(b"IEND", b"")
        )
    # 2-entry palette but stream indexes entry 5
    idx5 = chunk(b"IDAT", zlib.compress(bytes([0, 0, 5, 0, 1, 0])))
    plte2 = chunk(b"PLTE", bytes([10, 20, 30, 40, 50, 60]))
    with _pytest.raises(ValueError, match="index out of range"):
        multimodal.decode_png(sig + ihdr + plte2 + idx5 + chunk(b"IEND", b""))


def test_png_16bit_property_roundtrip():
    """Hypothesis property: random uint16 grids round-trip at depth 16 for
    every color type, both interlace modes — the predictor offset must be
    bpp BYTES (2·ch), not channels, or high/low byte pairing scrambles."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 11),
        h=st.integers(1, 10),
        ct=st.sampled_from([0, 2, 4, 6]),
        seed=st.integers(0, 2**31 - 1),
        interlace=st.booleans(),
    )
    def check(w, h, ct, seed, interlace):
        from zio_analytics_spark.operators.multimodal import _PNG_CHANNELS

        ch = _PNG_CHANNELS[ct]
        rng = np.random.default_rng(seed)
        grid = rng.integers(0, 65536, (h, w, ch))
        png = multimodal.encode_png(
            w, h, lambda x, y: tuple(int(v) for v in grid[y, x]),
            color_type=ct, depth=16, interlace=interlace,
        )
        m = multimodal.decode_png(png)
        assert m["depth"] == 16 and m["pixels"].dtype == np.uint16
        assert np.array_equal(m["pixels"], grid.astype(np.uint16))

    check()


def test_png_subbyte_property_roundtrip():
    """Hypothesis property: random grids at depths 1/2/4 round-trip for
    gray AND palette, both interlace modes — per-row byte padding and the
    1-byte predictor offset are the failure surfaces."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 19),
        h=st.integers(1, 12),
        depth=st.sampled_from([1, 2, 4]),
        pal=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
        interlace=st.booleans(),
    )
    def check(w, h, depth, pal, seed, interlace):
        rng = np.random.default_rng(seed)
        m = 1 << depth
        grid = rng.integers(0, m, (h, w))
        if pal:
            palette = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(m)]
            png = multimodal.encode_png(
                w, h, lambda x, y: (int(grid[y, x]),), color_type=3,
                palette=palette, depth=depth, interlace=interlace,
            )
            out = multimodal.decode_png(png)
            exp = np.array(palette, dtype=np.uint8)[grid]
            assert np.array_equal(out["pixels"], exp)
        else:
            png = multimodal.encode_png(
                w, h, lambda x, y: (int(grid[y, x]),), color_type=0,
                depth=depth, interlace=interlace,
            )
            out = multimodal.decode_png(png)
            assert out["depth"] == depth
            assert np.array_equal(out["pixels"].reshape(h, w), grid.astype(np.uint8))

    check()


def test_adpcm_encode_decode_bit_exact_reconstruction():
    """IMA ADPCM is lossy but its DECODE is losslessly defined: the decoder
    must reproduce the encoder's tracked reconstruction bit-exactly, for
    random signals, block sizes, and multi-block streams."""
    import numpy as np

    from zio_analytics_spark.operators.multimodal import (
        decode_audio,
        encode_wav_adpcm,
    )

    rng = np.random.default_rng(77)
    for trial in range(5):
        n = int(rng.integers(3, 1500))
        spb = int(rng.choice([5, 9, 101, 505]))
        t = np.arange(n)
        sig = (
            12000 * np.sin(t / 17) + rng.normal(0, 3000, n)
        ).clip(-32768, 32767).astype(np.int64)
        payload, recon = encode_wav_adpcm(sig, 8000, samples_per_block=spb)
        m = decode_audio(payload)
        assert m["sample_rate"] == 8000
        assert np.array_equal(m["samples"][:, 0], recon), (trial, n, spb)
        # lossy-but-sane: reconstruction tracks the source
        k = min(n, len(recon))
        assert np.abs(m["samples"][:k, 0] - sig[:k]).mean() < 2000


def test_adpcm_step_anchor_values():
    """Hand-computed anchor transitions from the IMA spec's tables: from
    (pred=0, idx=0, step=7), nibble 7 → diff 0+1+3+7=11, pred 11, idx +8;
    nibble 15 → pred falls by the same magnitude ladder."""
    from zio_analytics_spark.operators.multimodal import _ima_step

    assert _ima_step(0, 0, 7) == (11, 8)
    assert _ima_step(0, 0, 15) == (-11, 8)
    assert _ima_step(0, 0, 0) == (0, 0)       # step//8 = 0, index floor 0
    assert _ima_step(32760, 88, 7) == (32767, 88)  # clamp both ends
    assert _ima_step(-32760, 88, 15) == (-32768, 88)


def test_adpcm_malformed_rejected():
    import struct

    import pytest as _pytest

    from zio_analytics_spark.operators.multimodal import decode_audio

    def wav(body, block_align):
        hdr = b"RIFF" + struct.pack("<I", 40 + len(body)) + b"WAVE"
        hdr += b"fmt " + struct.pack(
            "<IHHIIHHHH", 20, 0x11, 1, 8000, 4000, block_align, 4, 2, 9
        )
        hdr += b"data" + struct.pack("<I", len(body))
        return hdr + body

    # step index 120 > 88
    bad = wav(struct.pack("<hBB", 0, 120, 0) + b"\x00\x00", 6)
    with _pytest.raises(ValueError, match="step index"):
        decode_audio(bad)
    with _pytest.raises(ValueError, match="block_align"):
        decode_audio(wav(b"\x00\x00\x00\x00", 4))


# --- perceptual_ahash (round-7) -------------------------------------------


def test_ahash_hand_computed_grid2(spark):
    from zio_analytics_spark.operators.multimodal import encode_bmp, perceptual_ahash

    # 4x4 BMP, grid=2: left half black, right half white → bits 0110? no:
    # blocks (by,bx): (0,0)=dark (0,1)=bright (1,0)=dark (1,1)=bright
    payload = encode_bmp(4, 4, lambda x, y: (255, 255, 255) if x >= 2 else (0, 0, 0))
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = perceptual_ahash(df, grid=2).collect()[0]
    # 4 bits row-major: 0 1 0 1 → halves of 2 bits: hi=0b01=1, lo=0b01=1
    assert row["width"] == 4 and row["height"] == 4
    assert row["n_bits_set"] == 2
    assert row["ahash"] == "11"


def test_ahash_uniform_image_all_bits_set(spark):
    from zio_analytics_spark.operators.multimodal import encode_bmp, perceptual_ahash

    # constant image: every block sum == mean exactly → ties are 1 (>=)
    payload = encode_bmp(8, 8, lambda x, y: (7, 77, 177))
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = perceptual_ahash(df, grid=8).collect()[0]
    assert row["n_bits_set"] == 64
    assert row["ahash"] == "ffffffff" * 2


def test_ahash_rejects_non_divisible_dims(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    from zio_analytics_spark.operators.multimodal import encode_bmp, perceptual_ahash

    payload = encode_bmp(5, 8, lambda x, y: (1, 2, 3))
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    with pytest.raises(Exception) as ei:
        perceptual_ahash(df, grid=8).collect()
    assert "divisible" in str(ei.value)


def test_ahash_matches_analytic_png_pixels(spark):
    import numpy as np

    from zio_analytics_spark.operators.multimodal import encode_png, perceptual_ahash

    # same formulas as the catalog entry, one image, hand-replicated in numpy
    i = 13
    w, h = 8 * (1 + i % 3), 8 * (1 + i % 2)

    def rgb(x, y):
        return ((i + 3 * x + 7 * y) % 256, (2 * i + 5 * x + y) % 256, (i + x + 11 * y) % 256)

    payload = encode_png(w, h, rgb)
    df = spark.createDataFrame([(i, bytearray(payload))], "doc_id long, payload binary")
    row = perceptual_ahash(df).collect()[0]
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    gray = (
        299 * ((i + 3 * xs + 7 * ys) % 256)
        + 587 * ((2 * i + 5 * xs + ys) % 256)
        + 114 * ((i + xs + 11 * ys) % 256)
    ).astype(np.int64)
    blocks = gray.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
    bits = (blocks * 64 >= gray.sum()).flatten()
    hi = sum(1 << (31 - k) for k in range(32) if bits[k])
    lo = sum(1 << (31 - k) for k in range(32) if bits[32 + k])
    assert row["ahash"] == f"{hi:08x}{lo:08x}"
    assert row["n_bits_set"] == int(bits.sum())


def test_dtmf_detect_margins_and_keys(spark):
    import numpy as np

    from zio_analytics_spark.operators.multimodal import (
        DTMF_COL_HZ,
        DTMF_ROW_HZ,
        _DTMF_KEYPAD,
        dtmf_detect,
        encode_wav,
    )

    k = np.arange(320, dtype=np.int64)
    rows = []
    expected = {}
    for i in range(12):
        f1 = DTMF_ROW_HZ[i % 4]
        f2 = DTMF_COL_HZ[(i // 4) % 3]
        amp = (
            np.floor(3000 * np.sin(2 * np.pi * f1 * k / 8000.0))
            + np.floor(3000 * np.sin(2 * np.pi * f2 * k / 8000.0))
            + ((31 * i + 7 * k) % 201)
            - 100
        ).astype(np.int64)
        rows.append((i, bytearray(encode_wav(amp))))
        expected[i] = (f1, f2, _DTMF_KEYPAD[(i % 4) * 4 + (i // 4) % 3])
        # decision-margin assertion (docstring contract): the true band
        # carries >20x the energy of the runner-up in its group
        w = 2.0 * np.pi * k / 8000.0
        for freqs, true_f in ((DTMF_ROW_HZ, f1), (DTMF_COL_HZ, f2)):
            pw = {
                f: float((amp * np.cos(f * w)).sum()) ** 2
                + float((amp * np.sin(f * w)).sum()) ** 2
                for f in freqs
            }
            others = max(v for f, v in pw.items() if f != true_f)
            assert pw[true_f] > 20 * others, (i, true_f, pw)

    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["row_hz"], r["col_hz"], r["digit"]) for r in dtmf_detect(df).collect()}
    assert got == expected


def test_scene_cuts_one_cut_per_clip(spark):
    import numpy as np

    from zio_analytics_spark.operators.multimodal import encode_y4m, scene_cuts

    rows = []
    for i in range(8):
        s = 3 + i % 4
        fr = np.zeros((8, 4, 6, 3), dtype=np.uint8)
        yy, xx = np.mgrid[0:4, 0:6]
        for f in range(8):
            fr[f, :, :, 0] = (i + 3 * xx + 5 * yy + 2 * f) % 100 + (120 if f >= s else 0)
        rows.append((i, bytearray(encode_y4m(fr, 6, 4))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = scene_cuts(df, threshold=1000).collect()
    assert len(out) == 8 * 7  # one row per transition
    cuts = {r["doc_id"]: r["frame"] for r in out if r["is_cut"]}
    assert cuts == {i: 3 + i % 4 for i in range(8)}  # exactly one cut, at s
    # within-scene transitions carry small but NONZERO sad (texture drift)
    for r in out:
        if not r["is_cut"]:
            assert 0 < r["sad"] < 1000


def test_scene_cuts_short_clip_emits_nothing(spark):
    import numpy as np

    from zio_analytics_spark.operators.multimodal import encode_y4m, scene_cuts

    one = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_y4m(one, 2, 2)))], "doc_id long, payload binary"
    )
    assert scene_cuts(df).count() == 0


def test_image_resize_box_exact_block_average(spark):
    import numpy as np

    from zio_analytics_spark.operators.multimodal import (
        decode_image,
        encode_png,
        image_resize_box,
    )

    w, h = 12, 8
    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, size=(h, w, 3))

    def rgb(x, y):
        return tuple(int(v) for v in src[y, x])

    df = spark.createDataFrame(
        [(1, bytearray(encode_png(w, h, rgb)))], "doc_id long, payload binary"
    )
    row = image_resize_box(df, factor=4).collect()[0]
    assert (row["width"], row["height"]) == (3, 2)
    out = decode_image(bytes(row["payload"]))["pixels"]
    want = src.reshape(2, 4, 3, 4, 3).sum(axis=(1, 3)) // 16
    assert np.array_equal(out.astype(np.int64), want)


def test_image_resize_box_drops_partial_blocks_and_tiny_images(spark):
    from zio_analytics_spark.operators.multimodal import encode_png, image_resize_box

    def rgb(x, y):
        return (x, y, 0)

    rows = [
        (1, bytearray(encode_png(5, 3, rgb))),  # 5x3 at factor 2 -> 2x1
        (2, bytearray(encode_png(1, 1, rgb))),  # smaller than a block: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["width"], r["height"]) for r in image_resize_box(df, factor=2).collect()}
    assert got == {1: (2, 1)}


def test_ahash_rejects_odd_bit_count(spark):
    # grid*grid odd -> the two-halves hex packing would drop the last bit
    # while n_bits_set still counted it; rejected up front.
    from zio_analytics_spark.operators.multimodal import perceptual_ahash

    df = spark.createDataFrame([(1, b"")], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="even"):
        perceptual_ahash(df, grid=3)


# --- GIF codec (round-8) ----------------------------------------------------

def _gif_pal():
    return [(i, (2 * i + 85) % 256, (5 * i + 171) % 256) for i in range(256)]


def test_gif_roundtrip_small():
    import numpy as np

    from zio_analytics_spark.operators.multimodal import decode_gif, encode_gif

    pal = _gif_pal()
    m = decode_gif(encode_gif(7, 5, lambda x, y: (3 + 11 * x + 17 * y) % 256, pal))
    assert (m["width"], m["height"], m["mode"]) == (7, 5, "RGB")
    for y in range(5):
        for x in range(7):
            assert tuple(m["pixels"][y, x]) == pal[(3 + 11 * x + 17 * y) % 256]


def test_gif_lzw_width_growth_and_table_reset():
    # random indices grow the LZW table through every code width to the
    # 12-bit cap and across the clear-code reset; any width-timing bug
    # between encoder and decoder corrupts the stream
    import random

    import numpy as np

    from zio_analytics_spark.operators.multimodal import decode_gif, encode_gif

    pal = _gif_pal()
    rng = random.Random(9)
    w, h = 300, 200
    idx = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    m = decode_gif(encode_gif(w, h, lambda x, y: idx[y][x], pal))
    arr = np.array([[pal[idx[y][x]] for x in range(w)] for y in range(h)], dtype=np.uint8)
    assert (m["pixels"] == arr).all()


def test_gif_long_runs_compress_and_roundtrip():
    from zio_analytics_spark.operators.multimodal import decode_gif, encode_gif

    pal = _gif_pal()
    payload = encode_gif(64, 64, lambda x, y: (x // 16) * 4, pal)
    m = decode_gif(payload)
    assert (m["pixels"][:, :16] == pal[0]).all()
    assert (m["pixels"][:, 48:] == pal[12]).all()
    # long constant runs must actually compress (LZW doing its job)
    assert len(payload) < 64 * 64 + 800


def test_gif_decodes_external_bytes():
    # the canonical 43-byte 1x1 white GIF89a — authored by the wider world,
    # not by our encoder: validates the decoder against the FORMAT
    from zio_analytics_spark.operators.multimodal import decode_image

    one = bytes.fromhex(
        "47494638396101000100800000ffffff00000021f904010000"
        "00002c00000000010001000002024401003b"
    )
    m = decode_image(one)
    assert (m["width"], m["height"]) == (1, 1)
    assert tuple(m["pixels"][0, 0]) == (255, 255, 255)


def test_gif_interlaced_roundtrip_and_garbage():
    """Interlaced GIFs de-shuffle through the spec 4-pass row order
    (round-9 verdict #4): an interlace-encoded image decodes to exactly
    the same pixels as its sequential encoding — across heights that
    exercise every pass boundary (1..10 covers passes that are empty,
    single-row, and multi-row)."""
    import numpy as np

    from zio_analytics_spark.operators.multimodal import decode_gif, encode_gif

    pal = _gif_pal()
    for h in range(1, 11):
        f = lambda x, y: (7 * x + 31 * y) % 256
        seq = decode_gif(encode_gif(5, h, f, pal))
        lace = decode_gif(encode_gif(5, h, f, pal, interlace=True))
        assert np.array_equal(seq["pixels"], lace["pixels"]), h
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")


def test_gif_lzw_truncated_stream_raises_valueerror():
    """A stream cut mid-code is the documented corrupt-payload ValueError,
    not an IndexError out of the bit reader."""
    from zio_analytics_spark.operators.multimodal import (
        _lzw_compress_gif,
        _lzw_decompress_gif,
    )

    data = bytes(range(200)) * 3
    comp = _lzw_compress_gif(data, 8)
    # (cutting only the final byte may still succeed: once n_expected
    # bytes are out the END code is never read — so cut well short)
    for cut in (0, 1, len(comp) // 2):
        with pytest.raises(ValueError, match="truncated LZW"):
            _lzw_decompress_gif(comp[:cut], 8, len(data))


def test_gif_composited_subrect_disposal_transparency():
    """The GIF rendering model (round-9 verdict #4): sub-rectangle frames
    paint onto the logical screen, transparent pixels leave the canvas
    unchanged, disposal 2 restores the rect to background afterwards —
    each composited canvas checked against a numpy reference."""
    import numpy as np

    from zio_analytics_spark.operators.multimodal import (
        decode_gif_composited,
        encode_gif_animation,
    )

    pal = _gif_pal()
    W, H, BG = 6, 4, 17
    frames = [
        # frame 0: full canvas, constant 40
        {"index_of": lambda x, y: 40, "delay_cs": 5},
        # frame 1: 2x2 rect at (3, 1), disposal 2, with index 9 transparent
        # on its right column -> those pixels keep the underlying 40
        {"index_of": lambda x, y: 80 if x == 0 else 9, "delay_cs": 5,
         "left": 3, "top": 1, "width": 2, "height": 2,
         "disposal": 2, "transparent": 9},
        # frame 2: 1x1 rect at (0, 0) after frame 1's rect reset to BG
        {"index_of": lambda x, y: 200, "delay_cs": 5,
         "left": 0, "top": 0, "width": 1, "height": 1},
    ]
    payload = encode_gif_animation(W, H, frames, pal, bg_index=BG)
    fs = decode_gif_composited(payload)
    assert len(fs) == 3
    rgb = lambda i: np.array(pal[i], dtype=np.uint8)
    c0 = np.tile(rgb(40), (H, W, 1))
    assert np.array_equal(fs[0]["pixels"], c0)
    c1 = c0.copy()
    c1[1:3, 3] = rgb(80)  # left column painted; right column transparent
    assert np.array_equal(fs[1]["pixels"], c1)
    c2 = c0.copy()
    c2[1:3, 3:5] = rgb(BG)  # disposal 2 restored the whole rect
    c2[0, 0] = rgb(200)
    assert np.array_equal(fs[2]["pixels"], c2)
    assert (fs[2]["width"], fs[2]["height"]) == (W, H)


def test_gif_composited_disposal3_and_corrupt_rect():
    import numpy as np

    from zio_analytics_spark.operators.multimodal import (
        decode_gif_composited,
        encode_gif_animation,
    )

    pal = _gif_pal()
    # disposal 3 (restore to previous): the painted rect reverts to its
    # PRE-PAINT pixels before the next frame renders
    frames = [
        {"index_of": lambda x, y: 40, "delay_cs": 1},                  # full
        {"index_of": lambda x, y: 90, "delay_cs": 1, "left": 1,
         "top": 1, "width": 2, "height": 2, "disposal": 3},
        {"index_of": lambda x, y: 200, "delay_cs": 1, "left": 0,
         "top": 0, "width": 1, "height": 1},
    ]
    fs = decode_gif_composited(encode_gif_animation(4, 4, frames, pal))
    rgb = lambda i: np.array(pal[i], dtype=np.uint8)
    assert np.array_equal(fs[1]["pixels"][1:3, 1:3], np.tile(rgb(90), (2, 2, 1)))
    want = np.tile(rgb(40), (4, 4, 1))
    want[0, 0] = rgb(200)  # frame 1's rect restored, only frame 2 differs
    assert np.array_equal(fs[2]["pixels"], want)

    # a frame rect past the logical screen is corrupt, not composable
    payload = bytearray(encode_gif_animation(
        4, 4, [{"index_of": lambda x, y: 1, "left": 2, "width": 2}], pal))
    import struct as st
    # widen the frame in-place so left + width > screen width
    pos = 781 + 8
    assert payload[pos] == 0x2C
    st.pack_into("<H", payload, pos + 5, 3)
    with pytest.raises(ValueError):
        decode_gif_composited(bytes(payload))


def test_gif_scene_cuts_composites_subrectangle_frames(spark):
    """gif_scene_cuts on an OPTIMIZED GIF: a small sub-rect change yields
    a small SAD (no cut), a full-frame change a large one (cut) — the
    composited canvases make SAD well-defined where the old positional
    grain had to reject."""
    from zio_analytics_spark.operators.multimodal import (
        encode_gif_animation,
        gif_scene_cuts,
    )

    pal = [(i, i, i) for i in range(256)]  # luma == 1000*i exactly
    frames = [
        {"index_of": lambda x, y: 10, "delay_cs": 5},                  # full 8x4
        {"index_of": lambda x, y: 60, "delay_cs": 5,                   # 1x1 patch
         "left": 2, "top": 1, "width": 1, "height": 1},
        {"index_of": lambda x, y: 200, "delay_cs": 5},                 # full flip
    ]
    payload = encode_gif_animation(8, 4, frames, pal)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    rows = {r["frame"]: r for r in gif_scene_cuts(df, threshold=100_000).collect()}
    # transition 1: one pixel 10 -> 60: SAD = 50 * (299+587+114) = 50_000
    assert rows[1]["sad"] == 50 * 1000 and not rows[1]["is_cut"]
    # transition 2: 31 pixels 10 -> 200 and 1 pixel 60 -> 200
    assert rows[2]["sad"] == (31 * 190 + 140) * 1000 and rows[2]["is_cut"]


def test_gif_animation_frames_roundtrip():
    from zio_analytics_spark.operators.multimodal import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = _gif_pal()
    fns = [
        lambda x, y: (x + 2 * y) % 256,
        lambda x, y: (3 * x + y + 1) % 256,
        lambda x, y: (7 * x + 5 * y + 2) % 256,
    ]
    payload = encode_gif_animation(10, 6, [(f, 10 * (k + 1)) for k, f in enumerate(fns)], pal)
    fr = decode_gif_frames(payload)
    assert [f["delay_cs"] for f in fr] == [10, 20, 30]
    for f, fn in zip(fr, fns):
        for y in range(6):
            for x in range(10):
                assert tuple(f["pixels"][y, x]) == pal[fn(x, y)]
    # decode_gif (single-frame surface) returns the first frame
    m = decode_gif(payload)
    assert (m["pixels"] == fr[0]["pixels"]).all()
    with pytest.raises(ValueError):
        encode_gif_animation(4, 4, [], pal)


def test_gif_scene_cuts(spark):
    from zio_analytics_spark.operators.multimodal import (
        encode_gif_animation,
        gif_scene_cuts,
    )

    pal = _gif_pal()
    # frames 0,1 identical; frame 2 hard-shifted — one cut at transition 2
    frames = [
        (lambda x, y: (x + y) % 256, 5),
        (lambda x, y: (x + y) % 256, 5),
        (lambda x, y: (x + y + 97) % 256, 5),
    ]
    df = spark.createDataFrame(
        [(1, encode_gif_animation(6, 4, frames, pal))], "doc_id long, payload binary"
    )
    rows = {r["frame"]: r for r in gif_scene_cuts(df, threshold=1000).collect()}
    assert rows[1]["sad"] == 0 and not rows[1]["is_cut"]
    assert rows[2]["sad"] > 1000 and rows[2]["is_cut"]
    # single-frame GIF: no transitions
    one = spark.createDataFrame(
        [(2, encode_gif_animation(4, 4, [frames[0]], pal))], "doc_id long, payload binary"
    )
    assert gif_scene_cuts(one).count() == 0


def test_decode_quarantine_isolates_corrupt_rows(spark):
    """One flipped byte quarantines ONE row: good BMP/PNG/GIF rows decode,
    a truncated GIF and an unknown magic become ok=false rows with the
    reason, and genuine non-ValueError bugs are NOT swallowed."""
    from zio_analytics_spark.operators.multimodal import (
        decode_quarantine,
        encode_bmp,
        encode_gif,
        encode_png,
    )

    pal = [(i, i, i) for i in range(256)]
    gif = encode_gif(4, 4, lambda x, y: (x + y) % 256, pal)
    rows = [
        (1, encode_bmp(3, 2, lambda x, y: (10, 20, 30))),
        (2, encode_png(2, 2, lambda x, y: (x * 50, y * 50, 100))),
        (3, gif),
        (4, gif[: len(gif) // 2]),          # truncated mid-LZW
        (5, b"8BPSgarbage!"),               # unknown magic (PSD seam)
        (6, b"\x89PNG\r\n\x1a\n...."),      # PNG signature, corrupt body
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_quarantine(df).collect()}
    assert [out[i]["ok"] for i in range(1, 7)] == [True, True, True, False, False, False]
    assert (out[1]["width"], out[1]["height"]) == (3, 2)
    assert out[1]["mean_byte"] == 20.0
    assert out[4]["error"] and "GIF" in out[4]["error"]
    assert out[5]["error"] and "unsupported" in out[5]["error"]
    assert all(out[i]["error"] is None for i in (1, 2, 3))
    # NULL payload is the documented "empty payload" ValueError → one
    # quarantine row, not a task failure
    bad = spark.createDataFrame([(9, None)], "doc_id long, payload binary")
    r9 = decode_quarantine(bad).collect()[0]
    assert r9["ok"] is False and "empty" in r9["error"]


def test_tiff_roundtrip_matrix():
    """TIFF 6.0 writer/parser: BOTH byte orders × single/multi-strip ×
    RGB/gray — the endianness matrix is the whole point (a SHORT read out
    of a right-justified LONG value field yields 0 on big-endian, the
    classic II-only decoder bug, pinned here by MM passing)."""
    import numpy as np

    def px(x, y):
        return ((x * 10) % 256, (y * 20 + 1) % 256, (x + y + 2) % 256)

    want = np.array([[px(x, y) for x in range(5)] for y in range(7)], dtype=np.uint8)
    for bo in ("II", "MM"):
        for rps in (0, 2, 3):
            m = multimodal.decode_image(
                multimodal.encode_tiff(5, 7, px, byte_order=bo, rows_per_strip=rps)
            )
            assert (m["width"], m["height"], m["mode"]) == (5, 7, "RGB")
            assert np.array_equal(m["pixels"], want), (bo, rps)
        g = multimodal.decode_tiff(
            multimodal.encode_tiff(4, 3, lambda x, y: (x * 30 + y) % 256,
                                   byte_order=bo, gray=True, rows_per_strip=2)
        )
        assert g["mode"] == "L" and int(g["pixels"][1, 2, 0]) == (2 * 30 + 1) % 256


def test_tiff_photometric_zero_inverts():
    """WhiteIsZero grayscale must invert — a spec-assembled payload (the
    encoder only writes photometric 1, so this cannot self-certify)."""
    import struct as st

    base = bytearray(multimodal.encode_tiff(
        2, 2, lambda x, y: 10 * (x + 2 * y), gray=True))
    i = base.find(st.pack("<HHI", 262, 3, 1))  # photometric tag
    assert i > 0
    base[i + 8] = 0  # 1 -> 0 (WhiteIsZero)
    m = multimodal.decode_tiff(bytes(base))
    assert int(m["pixels"][0, 0, 0]) == 255 - 0
    assert int(m["pixels"][1, 1, 0]) == 255 - 30


def test_tiff_rejects_unsupported():
    import struct as st

    payload = bytearray(multimodal.encode_tiff(3, 3, lambda x, y: (1, 2, 3)))
    i = payload.find(st.pack("<HHI", 259, 3, 1))
    p = bytearray(payload)
    st.pack_into("<H", p, i + 8, 5)  # Compression = LZW
    with pytest.raises(ValueError, match="compressed"):
        multimodal.decode_tiff(bytes(p))
    p = bytearray(payload)
    i = p.find(st.pack("<HHI", 284, 3, 1))
    st.pack_into("<H", p, i + 8, 2)  # planar
    with pytest.raises(ValueError, match="planar"):
        multimodal.decode_tiff(bytes(p))
    with pytest.raises(ValueError, match="not a TIFF"):
        multimodal.decode_tiff(b"XXXX")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_tiff(bytes(payload[:20]))


def test_mp3_meta_header_walk():
    """ID3v2 syncsafe skip, all-field extraction, padding-aware frame
    lengths, and hard errors on non-MPEG1-L3 / free-format / VBR /
    lost sync — the header-tier contract."""
    from zio_analytics_spark.operators.multimodal import (
        encode_mp3_frames,
        parse_mp3_meta,
    )

    m = parse_mp3_meta(encode_mp3_frames(9, 0, 5, padding=True, id3_size=200))
    assert m == {"bitrate_kbps": 128, "sample_rate": 44100, "n_frames": 5,
                 "duration_ms": (5 * 1152 * 1000.0) / 44100, "has_id3": True}
    m = parse_mp3_meta(encode_mp3_frames(14, 2, 3))
    assert (m["bitrate_kbps"], m["sample_rate"], m["has_id3"]) == (320, 32000, False)
    with pytest.raises(ValueError, match="MPEG-1 Layer III"):
        parse_mp3_meta(b"\xff\xf3\x90\x00")  # MPEG-2 header
    with pytest.raises(ValueError, match="free-format"):
        parse_mp3_meta(b"\xff\xfb\x00\x00")
    with pytest.raises(ValueError, match="sync"):
        parse_mp3_meta(encode_mp3_frames(9, 0, 1) + b"junkjunk")
    # VBR: two frames with different bitrate indexes
    two = encode_mp3_frames(9, 0, 1) + encode_mp3_frames(10, 0, 1)
    with pytest.raises(ValueError, match="VBR"):
        parse_mp3_meta(two)
    with pytest.raises(ValueError, match="no MP3 frames"):
        parse_mp3_meta(encode_mp3_frames(9, 0, 1, id3_size=5)[:15])


def test_corrupt_guard_converts_byte_walk_escapes_to_valueerror():
    """Round-9 ADVICE (medium): corrupt headers in the byte-walking
    decoders surfaced as struct.error/IndexError and ESCAPED the
    quarantine lane's ValueError catch — a single flipped byte killed the
    stage. The corrupt_guard seam (_codec_guard.py) converts both
    corruption signatures to the documented ValueError. Pinned on the
    three verified escapes: flipped TIFF IFD entry count, out-of-range
    TIFF value offset, truncated JPEG SOF."""
    import struct as st

    import numpy as np
    import pytest

    from zio_analytics_spark.operators.jpeg import decode_jpeg, encode_jpeg

    base = bytearray(
        multimodal.encode_tiff(4, 3, lambda x, y: (x * 30 + y) % 256, gray=True)
    )
    e = "<" if base[:2] == b"II" else ">"
    ifd_off = st.unpack_from(f"{e}I", base, 4)[0]

    flipped = bytearray(base)
    st.pack_into(f"{e}H", flipped, ifd_off, 0xFFFF)  # IFD count -> 65535 tags
    with pytest.raises(ValueError, match="corrupt payload"):
        multimodal.decode_tiff(bytes(flipped))

    wild = bytearray(base)
    off = ifd_off + 2  # first IFD entry
    st.pack_into(f"{e}I", wild, off + 4, 1000)  # count forces out-of-line value
    st.pack_into(f"{e}I", wild, off + 8, 2**31)  # value offset past the buffer
    with pytest.raises(ValueError, match="corrupt payload"):
        multimodal.decode_tiff(bytes(wild))

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_jpeg(img, quant_luma=np.full((8, 8), 8))
    i = good.find(b"\xff\xc0")
    seglen = st.unpack_from(">H", good, i + 2)[0]
    # SOF body shorter than its fixed header, with a CONSISTENT seglen so
    # the generic truncation check passes and the unpack itself trips
    trunc = good[: i + 2] + st.pack(">H", 4) + good[i + 4 : i + 6] + good[i + 2 + seglen :]
    with pytest.raises(ValueError, match="corrupt payload"):
        decode_jpeg(trunc)


def test_decode_quarantine_catches_corrupt_tiff(spark):
    """The quarantine LANE contract end-to-end for the round-9 escape
    class: a flipped-IFD TIFF payload lands in the error column instead
    of failing the task."""
    import struct as st

    from zio_analytics_spark.operators.multimodal import decode_quarantine

    good = multimodal.encode_tiff(4, 3, lambda x, y: (x * 30 + y) % 256, gray=True)
    bad = bytearray(good)
    e = "<" if bad[:2] == b"II" else ">"
    st.pack_into(f"{e}H", bad, st.unpack_from(f"{e}I", bad, 4)[0], 0xFFFF)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bad)], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in decode_quarantine(df).collect()}
    assert out[1]["ok"] and out[1]["width"] == 4
    assert not out[2]["ok"] and "corrupt payload" in out[2]["error"]


def test_corrupt_guard_narrowing_no_bytes_no_reclassify():
    """Round-10 ADVICE (low): corrupt_guard must reclassify IndexError/
    struct.error ONLY for calls that actually carried a bytes-like
    payload — an IndexError from non-payload code (a genuine logic bug)
    propagates loudly instead of being silently quarantined."""
    import pytest

    from zio_analytics_spark.operators._codec_guard import corrupt_guard

    @corrupt_guard
    def logic_bug(xs):
        return xs[99]

    @corrupt_guard
    def payload_walk(b):
        return b[99]

    with pytest.raises(IndexError):
        logic_bug([1, 2, 3])  # list arg: NOT a payload -> raw escape
    with pytest.raises(ValueError, match="corrupt payload"):
        payload_walk(b"\x00\x01")  # bytes arg: the documented signal
