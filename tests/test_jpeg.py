"""Baseline JPEG codec (operators/jpeg.py): ITU T.81 parity.

Anti-mirror-bug strategy (same as the GIF tier): the decoder is checked
against (a) a SPEC-ASSEMBLED payload built byte-by-byte in this file from
the T.81 marker layout and Annex K tables — not via the encoder's writer —
and (b) a naive quadruple-loop IDCT evaluated straight from the A.3.3
cosine sum, an independent math path from the codec's matrix product.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from zio_analytics_spark.operators.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    _D,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_coefficients,
    quality_tables,
)

Q1 = np.ones((8, 8), dtype=np.int32)
Q8 = np.full((8, 8), 8, dtype=np.int32)


def test_tables_and_basis_sanity():
    # zigzag: the canonical order's first diagonal runs
    assert ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert len(set(ZIGZAG)) == 64
    # Annex K table shapes: 12 DC categories, 162 AC run/size symbols
    assert sum(DC_LUMA_BITS) == len(DC_LUMA_VALS) == 12
    assert sum(AC_LUMA_BITS) == len(AC_LUMA_VALS) == 162
    # DCT basis orthonormal → FDCT/IDCT are exact inverses in float64
    assert np.allclose(_D @ _D.T, np.eye(8), atol=1e-12)
    ql, qc = quality_tables(50)
    assert ql[0, 0] == 16 and qc[0, 0] == 17  # scale 100 = identity
    assert (quality_tables(100)[0] == 1).all()
    with pytest.raises(ValueError):
        quality_tables(0)


def test_gray_block_constant_lossless_with_crop():
    """Block-constant gray + uniform-8 DC quant is LOSSLESS (DC = 8·(v-128)
    quantizes exactly), including non-multiple-of-8 dims (crop path)."""
    rng = np.random.default_rng(9)
    for _ in range(6):
        nby, nbx = int(rng.integers(1, 4)), int(rng.integers(1, 5))
        vals = rng.integers(0, 256, (nby, nbx))
        img = np.kron(vals, np.ones((8, 8), dtype=int)).astype(np.uint8)
        h = nby * 8 - int(rng.integers(0, 6))
        w = nbx * 8 - int(rng.integers(0, 6))
        img = img[:h, :w]
        m = decode_jpeg(encode_jpeg(img, quant_luma=Q8))
        assert (m["width"], m["height"], m["mode"]) == (w, h, "L")
        assert (m["pixels"][:, :, 0] == img).all()
        assert (m["pixels"][:, :, 0] == m["pixels"][:, :, 2]).all()


def test_random_roundtrip_error_bounds():
    """Unit quant isolates the float FDCT→round→IDCT path: error ≤1 gray,
    ≤3 through the lossy YCbCr int conversion."""
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (24, 17)).astype(np.uint8)
    m = decode_jpeg(encode_jpeg(img, quant_luma=Q1))
    assert np.abs(m["pixels"][:, :, 0].astype(int) - img.astype(int)).max() <= 1
    img3 = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    m = decode_jpeg(
        encode_jpeg(img3, subsampling="4:4:4", quant_luma=Q1, quant_chroma=Q1)
    )
    assert np.abs(m["pixels"].astype(int) - img3.astype(int)).max() <= 3


def test_quality_scaled_psnr_on_gradient():
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    img = np.stack([(2 * xx) % 256, (3 * yy) % 256, (xx + yy) % 256], axis=2)
    img = img.astype(np.uint8)
    m = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:2:0"))
    mse = ((m["pixels"].astype(float) - img.astype(float)) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) > 35.0


def _rgb_roundtrip_expected(r, g, b):
    fl = np.floor
    y = fl(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = fl(128 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
    cr = fl(128 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
    clamp = lambda v: min(max(v, 0.0), 255.0)
    return (
        clamp(fl(y + 1.402 * (cr - 128) + 0.5)),
        clamp(fl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)),
        clamp(fl(y + 1.772 * (cb - 128) + 0.5)),
    )


def test_420_mcu_constant_color_exact():
    """MCU-constant color through the FULL 4:2:0 path (subsample, dequant,
    IDCT, box upsample, color convert) reconstructs EXACTLY the analytic
    YCbCr round-trip — the identity the catalog oracle relies on. Odd dims
    exercise pad + crop."""
    rng = np.random.default_rng(11)
    img = np.zeros((21, 29, 3), dtype=np.uint8)
    colors = {}
    for my in range(2):
        for mx in range(2):
            c = tuple(int(v) for v in rng.integers(0, 256, 3))
            colors[my, mx] = c
            img[my * 16 : (my + 1) * 16, mx * 16 : (mx + 1) * 16] = c
    m = decode_jpeg(
        encode_jpeg(img, subsampling="4:2:0", quant_luma=Q8, quant_chroma=Q8)
    )
    for y in range(21):
        for x in range(29):
            exp = _rgb_roundtrip_expected(*map(float, colors[y // 16, x // 16]))
            assert tuple(map(float, m["pixels"][y, x])) == exp


def test_coefficient_injection_matches_naive_idct():
    """encode_jpeg_coefficients writes CHOSEN quantized coefficients; the
    decode must equal the A.3.3 cosine sum evaluated naively (independent
    of the codec's matrix-product IDCT). Two blocks exercise the DC diff
    chain; the (5,3)/(7,7) placements exercise AC runs and ZRL."""
    coef = np.zeros((1, 2, 8, 8), dtype=np.int32)
    coef[0, 0, 0, 0] = 13
    coef[0, 0, 0, 1] = 7
    coef[0, 0, 2, 0] = -5
    coef[0, 0, 5, 3] = 4
    coef[0, 0, 7, 7] = 3
    coef[0, 1, 0, 0] = -21  # DC diff -34 (category 6)
    coef[0, 1, 1, 1] = -9
    m = decode_jpeg(encode_jpeg_coefficients(16, 8, coef, Q1))
    for bx in range(2):
        f = coef[0, bx].astype(float)
        naive = np.zeros((8, 8))
        for yy in range(8):
            for xx in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (cu * cv * f[u, v]
                              * np.cos((2 * yy + 1) * u * np.pi / 16)
                              * np.cos((2 * xx + 1) * v * np.pi / 16))
                naive[yy, xx] = s / 4.0
        exp = np.clip(np.floor(naive + 128 + 0.5), 0, 255)
        assert (m["pixels"][:, 8 * bx : 8 * bx + 8, 0] == exp).all()


def test_restart_interval_roundtrip_and_error():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    with_rst = encode_jpeg(img, quality=85, restart_interval=1)
    without = encode_jpeg(img, quality=85)
    assert len(with_rst) > len(without)  # RST markers actually emitted
    a = decode_jpeg(with_rst)
    b = decode_jpeg(without)
    assert (a["pixels"] == b["pixels"]).all()
    # corrupting an RST marker id is a hard scan error, not silence
    broken = bytearray(with_rst)
    i = broken.find(b"\xff\xd0")
    assert i > 0
    broken[i + 1] = 0xD4
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(bytes(broken))


def test_rejects_unsupported_frames_and_garbage():
    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img, quant_luma=Q8))
    i = payload.find(b"\xff\xc0")
    for sof in (0xC9, 0xC3, 0xC7):  # arithmetic / lossless / differential
        p = bytearray(payload)
        p[i + 1] = sof
        with pytest.raises(ValueError, match="SOF"):
            decode_jpeg(bytes(p))
    # SOF2 is now SUPPORTED — but a baseline scan header mislabeled as
    # progressive is malformed (a DC scan with Se=63) and must still fail
    # loudly, not decode garbage
    p = bytearray(payload)
    p[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(p))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"NOTAJPEG")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(bytes(payload[: len(payload) // 2]))
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload[:20]))  # header only, no SOS


def test_spec_assembled_minimal_jpeg_decodes():
    """A JPEG assembled BYTE-BY-BYTE from the T.81 marker layout in this
    test (not via the encoder's writer): 8×8 gray, uniform quant, Annex K
    luma tables, scan = DC category 0 ('00') + EOB ('1010') padded with
    1-bits → 0b00101011 = 0x2B. Expected: DC pred 0, all coefficients 0 →
    every pixel exactly 128."""

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    payload = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
               + bytes([0x2B]) + b"\xff\xd9")
    m = decode_jpeg(payload)
    assert (m["width"], m["height"], m["mode"]) == (8, 8, "L")
    assert (m["pixels"] == 128).all()


def test_decode_image_dispatches_jpeg():
    from zio_analytics_spark.operators.multimodal import decode_image

    img = np.kron(np.array([[7, 200], [90, 33]]), np.ones((8, 8), dtype=int))
    payload = encode_jpeg(img.astype(np.uint8), quant_luma=Q8)
    m = decode_image(payload)
    assert m["width"] == m["height"] == 16
    assert int(m["pixels"][0, 0, 0]) == 7 and int(m["pixels"][8, 8, 0]) == 33


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="pixels"):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="4:2:2")
    with pytest.raises(ValueError, match="grid"):
        encode_jpeg_coefficients(16, 16, np.zeros((1, 1, 8, 8)), Q1)
    with pytest.raises(ValueError, match="coef_blocks"):
        encode_jpeg_coefficients(8, 8, np.zeros((8, 8)), Q1)


def test_progressive_decodes_bit_identical_to_baseline():
    """The progressive scan script re-encodes the SAME quantized
    coefficients, so decode(progressive) must equal decode(baseline)
    BIT-FOR-BIT across grayscale, both subsamplings, odd dims and a
    quality sweep (each quality shifts which EOBn/ZRL/refinement paths
    fire)."""
    rng = np.random.default_rng(21)
    for dims in [(8, 8), (24, 17), (40, 33)]:
        img = rng.integers(0, 256, dims).astype(np.uint8)
        a = decode_jpeg(encode_jpeg(img, quant_luma=Q1))
        p = decode_jpeg(encode_jpeg(img, quant_luma=Q1, progressive=True))
        assert (a["pixels"] == p["pixels"]).all(), dims
    for sub in ("4:4:4", "4:2:0"):
        for dims in [(16, 16, 3), (21, 29, 3)]:
            img = rng.integers(0, 256, dims).astype(np.uint8)
            a = decode_jpeg(encode_jpeg(img, subsampling=sub, quality=85))
            p = decode_jpeg(
                encode_jpeg(img, subsampling=sub, quality=85, progressive=True)
            )
            assert (a["pixels"] == p["pixels"]).all(), (sub, dims)
    for q in (30, 75, 100):
        img = rng.integers(0, 256, (48, 56, 3)).astype(np.uint8)
        a = decode_jpeg(encode_jpeg(img, quality=q))
        p = decode_jpeg(encode_jpeg(img, quality=q, progressive=True))
        assert (a["pixels"] == p["pixels"]).all(), q


def test_progressive_long_eob_runs_and_structure():
    """A blocky low-frequency image at low quality yields multi-block EOB
    runs (the EOBn path with appended run-length bits); also pin the
    container structure: SOF2 marker, >2 SOS segments, and refusal of
    restart intervals with progressive."""
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    img = np.stack(
        [(xx // 8 * 8) % 256, (yy // 8 * 8) % 256, ((xx + yy) // 16 * 16) % 256],
        axis=2,
    ).astype(np.uint8)
    payload = encode_jpeg(img, quality=40, progressive=True)
    assert b"\xff\xc2" in payload and payload.count(b"\xff\xda") >= 6
    a = decode_jpeg(encode_jpeg(img, quality=40))
    p = decode_jpeg(payload)
    assert (a["pixels"] == p["pixels"]).all()
    with pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg(img, progressive=True, restart_interval=2)


def test_progressive_partial_stream_truncation_raises():
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    payload = encode_jpeg(img, quant_luma=Q1, progressive=True)
    # cut inside the last scan: no EOI -> truncated error, not silence
    with pytest.raises(ValueError, match="truncated|EOI"):
        decode_jpeg(payload[: len(payload) - 4])


def test_parse_jpeg_meta_header_only():
    """Marker-walk metadata without entropy decode: every field, both
    frame types, all samplings, DRI, and hard errors on truncation."""
    from zio_analytics_spark.operators.jpeg import parse_jpeg_meta

    img = np.full((17, 20, 3), 100, dtype=np.uint8)
    m = parse_jpeg_meta(encode_jpeg(img, quality=70, subsampling="4:2:0"))
    assert (m["width"], m["height"], m["n_components"]) == (20, 17, 3)
    assert m["sampling"] == "4:2:0" and not m["progressive"] and m["n_scans"] == 1
    # dqt00 = clamp((16*scale+50)//100) with scale = 200-2*70 = 60 -> 10
    assert m["dqt00"] == 10
    m = parse_jpeg_meta(encode_jpeg(img, quality=70, subsampling="4:4:4",
                                    progressive=True))
    assert m["sampling"] == "4:4:4" and m["progressive"] and m["n_scans"] == 8
    g = np.full((10, 12), 55, dtype=np.uint8)
    m = parse_jpeg_meta(encode_jpeg(g, quality=40, progressive=True))
    assert m["sampling"] == "gray" and m["n_scans"] == 4
    assert m["dqt00"] == (16 * (5000 // 40) + 50) // 100  # q<50 branch
    m = parse_jpeg_meta(encode_jpeg(g, quality=40, restart_interval=2))
    assert m["restart_interval"] == 2
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg_meta(b"NOTAJPEG")
    full = encode_jpeg(g, quality=40)
    with pytest.raises(ValueError):
        parse_jpeg_meta(full[:30])


def test_baseline_requires_eoi_after_scan():
    """Round-9 ADVICE (low): a spec-legal MULTI-scan (non-interleaved)
    baseline JPEG previously decoded silently with zeroed chroma because
    decode returned at the first SOS. Now: anything but EOI after the
    baseline scan raises; fill bytes (B.1.1.2) before EOI stay legal."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    Q8 = np.full((8, 8), 8)
    good = encode_jpeg(img, quant_luma=Q8)
    assert good.endswith(b"\xff\xd9")

    with pytest.raises(ValueError, match="no EOI after scan"):
        decode_jpeg(good[:-2])

    # a DHT segment where EOI should be = the multi-scan shape
    tail = b"\xff\xc4" + struct.pack(">H", 3) + b"\x00" + b"\xff\xd9"
    with pytest.raises(ValueError, match="multi-scan baseline"):
        decode_jpeg(good[:-2] + tail)

    # optional 0xFF fill bytes before the marker are spec-legal
    m = decode_jpeg(good[:-2] + b"\xff\xff\xd9")
    assert (m["width"], m["height"]) == (8, 8)


def test_exif_roundtrip_both_endians():
    """EXIF writer/parser pair (round-9 verdict #3): APP1 body is a TIFF
    IFD — Orientation (SHORT inline), DateTime/Make (ASCII out-of-line),
    both byte orders."""
    from zio_analytics_spark.operators.jpeg import encode_exif_app1, parse_exif

    for bo in ("II", "MM"):
        app1 = encode_exif_app1(
            orientation=6, datetime="2026:08:15 12:00:00",
            make="camcorp", byte_order=bo,
        )
        assert app1[:2] == b"\xff\xe1"
        got = parse_exif(app1[4:])
        assert got == {
            "orientation": 6,
            "datetime": "2026:08:15 12:00:00",
            "make": "camcorp",
        }, bo
    # orientation-only APP1: the optional tags stay None
    got = parse_exif(encode_exif_app1(orientation=2)[4:])
    assert got == {"orientation": 2, "datetime": None, "make": None}
    with pytest.raises(ValueError):
        encode_exif_app1(orientation=9)
    # out-of-range orientation VALUE in the IFD raises
    b = bytearray(encode_exif_app1(orientation=1)[4:])
    # entry value field: preamble 6 + tiff header 8 + count 2 + (tag,typ,cnt) 8
    struct.pack_into("<H", b, 6 + 8 + 2 + 8, 0)
    with pytest.raises(ValueError, match="orientation out of range"):
        parse_exif(bytes(b))


def test_exif_in_meta_walk_default_and_corrupt_ignored():
    """parse_jpeg_meta: APP1 harvested when present, orientation defaults
    to 1 without EXIF, and a CORRUPT EXIF block is ignored (advisory
    metadata — the walk must still deliver dimensions)."""
    from zio_analytics_spark.operators.jpeg import (
        encode_exif_app1,
        insert_app1,
        parse_jpeg_meta,
    )

    img = np.zeros((8, 8), dtype=np.uint8)
    Q8 = np.full((8, 8), 8)
    plain = encode_jpeg(img, quant_luma=Q8)
    m0 = parse_jpeg_meta(plain)
    assert m0["orientation"] == 1
    assert m0["exif_datetime"] is None and m0["exif_make"] is None

    tagged = insert_app1(
        plain, encode_exif_app1(orientation=3, datetime="2026:01:02 03:04:05")
    )
    m1 = parse_jpeg_meta(tagged)
    assert m1["orientation"] == 3
    assert m1["exif_datetime"] == "2026:01:02 03:04:05"
    assert m1["width"] == 8  # the rest of the walk is unaffected
    # decode also tolerates the APP1 segment
    assert decode_jpeg(tagged)["width"] == 8

    bad = bytearray(encode_exif_app1(orientation=6))
    bad[12] = 0x99  # wreck the TIFF magic inside the APP1 body
    m2 = parse_jpeg_meta(insert_app1(plain, bytes(bad)))
    assert m2["orientation"] == 1 and m2["width"] == 8


def test_exif_upright_all_orientations_pixel_identical():
    """The eight EXIF orientation transforms normalize a stored-rotated
    image back to display pixels — constant 8x8 blocks at Q8 decode
    losslessly, so equality is exact."""
    from zio_analytics_spark.operators.jpeg import encode_exif_app1, insert_app1
    from zio_analytics_spark.operators.multimodal import _exif_upright

    Q8 = np.full((8, 8), 8)
    D = np.zeros((16, 16), dtype=np.uint8)
    D[:8, :8], D[:8, 8:], D[8:, :8], D[8:, 8:] = 10, 80, 160, 240
    pay_up = encode_jpeg(D, quant_luma=Q8)
    up = _exif_upright(decode_jpeg(pay_up)["pixels"], pay_up)
    stored_by_o = {
        2: D[:, ::-1], 3: D[::-1, ::-1], 4: D[::-1],
        5: D.T, 6: np.rot90(D, k=1), 7: np.rot90(D, 2).T, 8: np.rot90(D, k=-1),
    }
    for o, stored in stored_by_o.items():
        pay = insert_app1(
            encode_jpeg(np.ascontiguousarray(stored), quant_luma=Q8),
            encode_exif_app1(orientation=o),
        )
        rot = _exif_upright(decode_jpeg(pay)["pixels"], pay)
        assert np.array_equal(up, rot), f"orientation {o}"


def test_rotated_pair_ahash_identical(spark):
    """ROTATED-PAIR CONTRACT (the round-9 verdict's 'done' check): a JPEG
    stored rotated with the matching EXIF Orientation tag produces the
    SAME perceptual aHash as its upright duplicate — and without the tag
    it does NOT (pinning that the normalization is what makes them
    collide)."""
    from zio_analytics_spark.operators.jpeg import encode_exif_app1, insert_app1
    from zio_analytics_spark.operators.multimodal import perceptual_ahash

    Q8 = np.full((8, 8), 8)
    D = np.zeros((16, 16), dtype=np.uint8)
    D[:8, :8], D[:8, 8:], D[8:, :8], D[8:, 8:] = 10, 80, 160, 240
    upright = encode_jpeg(D, quant_luma=Q8)
    stored = encode_jpeg(np.ascontiguousarray(np.rot90(D, k=1)), quant_luma=Q8)
    tagged = insert_app1(stored, encode_exif_app1(orientation=6))
    df = spark.createDataFrame(
        [(1, bytearray(upright)), (2, bytearray(tagged)), (3, bytearray(stored))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in perceptual_ahash(df, grid=8).collect()}
    assert rows[1]["ahash"] == rows[2]["ahash"]
    assert (rows[2]["width"], rows[2]["height"]) == (16, 16)  # display dims
    assert rows[1]["ahash"] != rows[3]["ahash"]  # untagged rotation differs
