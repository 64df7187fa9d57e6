"""Property-based tests (hypothesis) for the pure-Python codec layer —
no SparkSession needed, so per-example generation is cheap here (unlike
the seeded Spark equivalence tests in test_randomized.py)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from zio_analytics_spark.operators.multimodal import (
    _alaw_to_linear,
    _ulaw_to_linear,
    decode_png,
    encode_png,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    color=st.sampled_from([0, 2, 6]),
    interlace=st.booleans(),
)
def test_png_roundtrip_any_shape(w, h, seed, color, interlace):
    """Every (dims, pixels, color type, interlace mode) round-trips
    exactly — heights < 5 exercise partial filter coverage, 1-px rows the
    no-left-neighbor path, small dims empty Adam7 passes, random bytes all
    predictor magnitudes."""
    rng = np.random.RandomState(seed)
    ch = {0: 1, 2: 3, 6: 4}[color]
    px = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)

    def pixel_of(x, y):
        return tuple(int(v) for v in px[y, x])

    m = decode_png(encode_png(w, h, pixel_of, color_type=color, interlace=interlace))
    assert (m["width"], m["height"]) == (w, h)
    assert np.array_equal(m["pixels"], px)


def test_g711_sign_symmetry_and_range_exhaustive():
    """All 256 codes, both laws: flipping the encoded sign bit negates the
    sample exactly, and magnitudes stay within the published maxima
    (mu-law 32124, A-law 32256)."""
    codes = np.arange(256, dtype=np.uint8)
    mu = _ulaw_to_linear(codes)
    al = _alaw_to_linear(codes)
    assert np.abs(mu).max() == 32124 and np.abs(al).max() == 32256
    assert np.array_equal(_ulaw_to_linear(codes ^ 0x80), -mu)
    assert np.array_equal(_alaw_to_linear(codes ^ 0x80), -al)


def test_g711_decode_monotone_within_positive_half():
    """mu-law positive codes (0x80..0xFF after complement ordering) decode
    monotonically: larger companded magnitude -> larger linear sample."""
    # wire codes 0x80..0xFF complement to u = 0x7F..0x00 (positive half);
    # magnitude is strictly increasing in u, so strictly DECREASING in the
    # wire code — 128 distinct values ending at exactly 0
    pos = np.arange(0x80, 0x100, dtype=np.uint8)
    vals = _ulaw_to_linear(pos)
    assert (np.diff(vals) < 0).all()
    assert vals[0] == 32124 and vals[-1] == 0
    assert len(np.unique(vals)) == 128


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    alphabet=st.sampled_from([2, 7, 256]),
)
def test_gif_roundtrip_any_shape(w, h, seed, alphabet):
    """Arbitrary index images round-trip through the hand-written GIF LZW
    exactly: tiny alphabets exercise long-match compression, full-byte
    alphabets exercise fast table growth, and 1-pixel images the
    degenerate single-code stream."""
    import random

    from zio_analytics_spark.operators.multimodal import decode_gif, encode_gif

    rng = random.Random(seed)
    pal = [(i, (2 * i + 85) % 256, (5 * i + 171) % 256) for i in range(256)]
    idx = [[rng.randrange(alphabet) for _ in range(w)] for _ in range(h)]
    m = decode_gif(encode_gif(w, h, lambda x, y: idx[y][x], pal))
    assert (m["width"], m["height"]) == (w, h)
    for y in range(h):
        for x in range(w):
            assert tuple(m["pixels"][y, x]) == pal[idx[y][x]], (x, y)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(0, 6000),
    seed=st.integers(0, 2**31 - 1),
    alphabet=st.sampled_from([1, 3, 256]),
    mcs=st.sampled_from([2, 5, 8]),
)
def test_gif_lzw_stream_roundtrip(n, seed, alphabet, mcs):
    """The raw LZW layer round-trips ANY byte stream whose symbols fit the
    min-code-size alphabet — including streams long enough to drive the
    code width to 12 bits and through clear-code table resets, and the
    empty stream."""
    import random

    from zio_analytics_spark.operators.multimodal import (
        _lzw_compress_gif,
        _lzw_decompress_gif,
    )

    rng = random.Random(seed)
    k = min(alphabet, 1 << mcs)
    data = bytes(rng.randrange(k) for _ in range(n))
    out = _lzw_decompress_gif(_lzw_compress_gif(data, mcs), mcs, len(data))
    assert out == data


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    byte_order=st.sampled_from(["II", "MM"]),
    rps=st.integers(0, 5),
    gray=st.booleans(),
)
def test_tiff_roundtrip_property(w, h, seed, byte_order, rps, gray):
    """Random dims × pixels × byte order × strip layout × gray/RGB:
    encode_tiff → decode_tiff is exact (uncompressed 8-bit is lossless
    by construction; the property pins IFD/strip/endianness plumbing)."""
    import numpy as np

    from zio_analytics_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    if gray:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        payload = encode_tiff(w, h, lambda x, y: int(img[y, x]),
                              byte_order=byte_order, rows_per_strip=rps,
                              gray=True)
        m = decode_tiff(payload)
        assert m["mode"] == "L"
        assert (m["pixels"][:, :, 0] == img).all()
    else:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        payload = encode_tiff(w, h, lambda x, y: tuple(int(v) for v in img[y, x]),
                              byte_order=byte_order, rows_per_strip=rps)
        m = decode_tiff(payload)
        assert (m["pixels"] == img).all()
    assert (m["width"], m["height"]) == (w, h)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    quality=st.integers(25, 100),
    layout=st.sampled_from(["gray", "4:4:4", "4:2:0"]),
)
def test_jpeg_progressive_equals_baseline_property(w, h, seed, quality, layout):
    """Random images × dims × quality × layout: the progressive scan
    script re-encodes identical quantized coefficients, so decode is
    BIT-IDENTICAL to baseline — every EOBn/ZRL/refinement path some
    random draw exercises must agree."""
    import numpy as np

    from zio_analytics_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    if layout == "gray":
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        kw = {}
    else:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        kw = {"subsampling": layout}
    a = decode_jpeg(encode_jpeg(img, quality=quality, **kw))
    p = decode_jpeg(encode_jpeg(img, quality=quality, progressive=True, **kw))
    assert (a["pixels"] == p["pixels"]).all()


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 6),
    bi=st.integers(1, 14),
    si=st.integers(0, 2),
    pad=st.booleans(),
    id3=st.integers(0, 300),
)
def test_mp3_meta_property(n, bi, si, pad, id3):
    """Random frame counts × all bitrate/rate indexes × padding × ID3
    sizes: the header walk recovers every field exactly."""
    from zio_analytics_spark.operators.multimodal import (
        _MP3_BITRATES,
        _MP3_RATES,
        encode_mp3_frames,
        parse_mp3_meta,
    )

    m = parse_mp3_meta(encode_mp3_frames(bi, si, n, padding=pad, id3_size=id3))
    assert m["bitrate_kbps"] == _MP3_BITRATES[bi]
    assert m["sample_rate"] == _MP3_RATES[si]
    assert m["n_frames"] == n and m["has_id3"] == (id3 > 0)
    assert m["duration_ms"] == (n * 1152 * 1000.0) / _MP3_RATES[si]
