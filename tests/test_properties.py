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
