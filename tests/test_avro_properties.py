"""Property tests for the pure-Python Avro binary codec (sources/avro.py)
— no Spark needed: encoder → decoder roundtrips over randomized values,
with the extremes that break zigzag/varint implementations (int64 edges,
empty containers, unicode planes, NaN-free doubles)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from zio_analytics_spark.sources.avro import (
    _ByteReader,
    _make_decoder,
    _make_encoder,
    _write_long,
)

LONG_EDGES = [0, 1, -1, 2**63 - 1, -(2**63), 127, 128, -128, 2**31, -(2**31)]


@given(st.one_of(st.integers(-(2**63), 2**63 - 1), st.sampled_from(LONG_EDGES)))
@settings(max_examples=300, deadline=None)
def test_zigzag_long_roundtrip(v):
    buf = bytearray()
    _write_long(buf, v)
    r = _ByteReader(bytes(buf))
    assert r.read_long() == v
    assert r.at_end()


def _codec(schema):
    enc = _make_encoder(schema, {})
    dec = _make_decoder(schema, {})
    def roundtrip(v):
        buf = bytearray()
        enc(buf, v)
        r = _ByteReader(bytes(buf))
        out = dec(r)
        assert r.at_end(), "decoder under/over-consumed"
        return out
    return roundtrip


ROW_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": "double"},
        {"name": "d", "type": {"type": "array", "items": "long"}},
        {"name": "e", "type": {"type": "map", "values": ["null", "long"]}},
        {"name": "f", "type": "boolean"},
        {"name": "g", "type": "bytes"},
    ],
}

row_values = st.tuples(
    st.integers(-(2**63), 2**63 - 1),
    st.one_of(st.none(), st.text(max_size=40)),
    st.floats(allow_nan=False),
    st.lists(st.integers(-(2**40), 2**40), max_size=10),
    st.dictionaries(
        st.text(max_size=8), st.one_of(st.none(), st.integers(-100, 100)),
        max_size=6,
    ),
    st.booleans(),
    st.binary(max_size=32),
)


@given(row_values)
@settings(max_examples=200, deadline=None)
def test_record_roundtrip(v):
    assert _codec(ROW_SCHEMA)(v) == v


@given(st.floats())
@settings(max_examples=100, deadline=None)
def test_double_roundtrip_bitwise(x):
    out = _codec({"type": "record", "name": "r",
                  "fields": [{"name": "x", "type": "double"}]})((x,))[0]
    # bitwise: NaN payloads and signed zeros must survive
    import struct as _s

    assert _s.pack("<d", out) == _s.pack("<d", x)


@given(st.lists(st.text(max_size=20), max_size=8))
@settings(max_examples=100, deadline=None)
def test_string_array_roundtrip(v):
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "xs",
                          "type": {"type": "array", "items": "string"}}]}
    assert _codec(schema)((v,))[0] == v


# ------------------------------------------------------------------ #
# schema resolution (round 14): writer-schema data decoded under a
# reader schema — identity, rename-via-alias, skip, default, promotion

from zio_analytics_spark.sources.avro import _make_resolver  # noqa: E402


def _resolve_roundtrip(writer, reader, v):
    enc = _make_encoder(writer, {})
    dec = _make_resolver(writer, reader, {}, {})
    buf = bytearray()
    enc(buf, v)
    r = _ByteReader(bytes(buf))
    out = dec(r)
    assert r.at_end(), "resolver under/over-consumed"
    return out


@given(row_values)
@settings(max_examples=200, deadline=None)
def test_resolution_identity_equals_plain_decode(v):
    assert _resolve_roundtrip(ROW_SCHEMA, ROW_SCHEMA, v) == v


READER_EVOLVED = {
    "type": "record",
    "name": "row",
    "fields": [
        # renamed: matches the writer's 'a' through aliases
        {"name": "a2", "aliases": ["a"], "type": "long"},
        {"name": "c", "type": "double"},
        # new field, absent from the writer: default applies
        {"name": "z", "type": "string", "default": "zz"},
        # new nullable with null default (union default = first branch)
        {"name": "w", "type": ["null", "long"], "default": None},
    ],
}


@given(row_values)
@settings(max_examples=200, deadline=None)
def test_resolution_rename_skip_default(v):
    # b, d, e, f, g are skipped (decoded + discarded, stream stays exact)
    assert _resolve_roundtrip(ROW_SCHEMA, READER_EVOLVED, v) == (
        v[0],
        v[2],
        "zz",
        None,
    )


WRITER_NARROW = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "a", "type": "int"},
        {"name": "b", "type": "float"},
        {"name": "s", "type": "string"},
        {"name": "x", "type": "bytes"},
        {"name": "u", "type": ["null", "int"]},
    ],
}

READER_WIDE = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "double"},
        {"name": "s", "type": "bytes"},
        {"name": "x", "type": "string"},
        {"name": "u", "type": ["null", "double"]},
    ],
}


@given(
    st.integers(-(2**31), 2**31 - 1),
    st.floats(width=32, allow_nan=False),
    st.text(max_size=40),
    st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
)
@settings(max_examples=200, deadline=None)
def test_resolution_promotions(a, b, s, u):
    x = s.encode("utf-8")  # valid-utf8 bytes so bytes→string resolves
    out = _resolve_roundtrip(WRITER_NARROW, READER_WIDE, (a, b, s, x, u))
    assert out == (a, b, s.encode("utf-8"), s, float(u) if u is not None else None)
    assert isinstance(out[1], float)
