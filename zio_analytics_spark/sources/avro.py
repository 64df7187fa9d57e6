"""[EXT] Pure-Python Avro Object Container File source + sink behind the
Spark 4 Python DataSource V2 seam.

The container ships no ``spark-avro`` jar (dated probe, SURVEY §2.4 round
9), so this closes the one mainstream source-format hole (CSV/JSON/XML/
parquet/ORC covered elsewhere) from the PUBLIC Avro 1.11 specification
alone: the Object Container File layout (magic ``Obj\\x01``, metadata map
with ``avro.schema``/``avro.codec``, 16-byte sync marker, data blocks of
``(row count, byte size, payload, sync)``) and the binary encoding
(zigzag varints, little-endian IEEE floats, length-prefixed bytes/strings,
union index + branch, block-chunked arrays/maps).

Scale design — the part that matters at 100 TB:

* **Reader splits INSIDE files.** Avro's sync marker exists precisely so
  an HDFS-style reader can start mid-file: :class:`AvroDataSource` plans
  byte-range :class:`InputPartition` shards per file
  (``split_target_bytes``, default 32 MiB) and each task resynchronizes by
  scanning for the file's 16-byte sync marker at its range start, then
  reads exactly the blocks that START inside its range — no overlap, no
  gap, identical to Hadoop's split contract. One 10 GB avro file becomes
  ~320 parallel tasks instead of one.
* **Schema once, on the driver.** ``schema()`` parses the FIRST file's
  header only (a few hundred bytes) — never a data pass. Reading honors
  the file's writer schema; there is no inference pass.
* **Writer is two-phase.** :class:`AvroSinkDataSource` stages one
  ``.tmp-*`` container file per partition and publishes winners by rename
  in ``commit()`` (the jsonl_sink discipline in this package): speculative
  or zombie task attempts cannot double-publish.

Codecs: ``null`` and ``deflate`` (raw DEFLATE per the spec — zlib with
``wbits=-15``). Types: null, boolean, int, long, float, double, bytes,
string, record, enum (as string), fixed (as binary), array, map,
``["null", T]`` unions (nullable columns), and the logical types
``timestamp-micros``/``date`` mapped to Spark TIMESTAMP/DATE. Snappy and
decimal are rejected with explicit errors (no snappy lib in container;
decimal needs precision negotiation) — the supported subset covers every
shape the driver's tables use.
"""

from __future__ import annotations

import json
import os
import struct
import zlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

__all__ = [
    "AvroDataSource",
    "AvroSinkDataSource",
    "register_avro_source",
    "register_avro_sink",
    "read_header",
    "avro_schema_to_ddl",
    "spark_schema_to_avro",
]

MAGIC = b"Obj\x01"
SYNC_SIZE = 16


# --------------------------------------------------------------------- #
# binary decoding (Avro spec §"Binary Encoding")

class _ByteReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) < n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        """Zigzag varint — the encoding every int/long/length uses."""
        shift = 0
        acc = 0
        buf = self.buf
        pos = self.pos
        while True:
            try:
                b = buf[pos]
            except IndexError:
                raise EOFError("truncated varint") from None
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _skip_to_named(schema, names: dict):
    """Resolve a named-type reference string against defined names."""
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _make_decoder(schema, names: dict):
    """Compile an Avro schema node into a ``reader -> value`` closure."""
    schema = _skip_to_named(schema, names)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return lambda r: None
        if t == "boolean":
            return lambda r: r.read(1) == b"\x01"
        if t in ("int", "long"):
            return _ByteReader.read_long
        if t == "float":
            return lambda r: struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return lambda r: struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return lambda r: r.read(r.read_long())
        if t == "string":
            return lambda r: r.read(r.read_long()).decode("utf-8")
        raise ValueError(f"unsupported avro type: {t!r}")
    if isinstance(schema, list):  # union
        branches = [_make_decoder(b, names) for b in schema]
        return lambda r: branches[r.read_long()](r)
    t = schema["type"]
    if isinstance(t, str) and t not in ("record", "error", "enum", "fixed", "array", "map"):
        # dict-wrapped primitive (possibly carrying a logicalType — the
        # logical conversion happens post-decode in _logical_converter)
        return _make_decoder(t, names)
    if t in ("record", "error"):
        if "name" in schema:
            names[schema["name"]] = schema
        fields = [_make_decoder(f["type"], names) for f in schema["fields"]]
        return lambda r: tuple(fd(r) for fd in fields)
    if t == "enum":
        symbols = schema["symbols"]
        if "name" in schema:
            names[schema["name"]] = schema
        return lambda r: symbols[r.read_long()]
    if t == "fixed":
        size = schema["size"]
        if "name" in schema:
            names[schema["name"]] = schema
        return lambda r: r.read(size)
    if t == "array":
        item = _make_decoder(schema["items"], names)
        def read_array(r):
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:  # size-prefixed block form
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(item(r))
        return read_array
    if t == "map":
        val = _make_decoder(schema["values"], names)
        def read_map(r):
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    k = r.read(r.read_long()).decode("utf-8")
                    out[k] = val(r)
        return read_map
    if isinstance(t, (dict, list)) or t in names:
        return _make_decoder(t, names)
    # logical types ride on the underlying primitive; conversion to
    # Spark values happens in _post_convert via the schema walk
    raise ValueError(f"unsupported avro schema node: {schema!r}")


def _logical_converter(schema, names: dict):
    """Return a value converter for logical types (timestamp-micros/date)
    applied AFTER binary decode, mirroring the schema tree; None = identity."""
    import datetime as dt

    schema = _skip_to_named(schema, names)
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            epoch = dt.datetime(1970, 1, 1)
            return lambda v: epoch + dt.timedelta(microseconds=v)
        if lt == "timestamp-millis":
            epoch = dt.datetime(1970, 1, 1)
            return lambda v: epoch + dt.timedelta(milliseconds=v)
        if lt == "date":
            epoch_d = dt.date(1970, 1, 1)
            return lambda v: epoch_d + dt.timedelta(days=v)
        if lt == "decimal":
            raise ValueError("avro decimal logicalType is not supported")
        t = schema.get("type")
        if t in ("record", "error"):
            convs = [_logical_converter(f["type"], names) for f in schema["fields"]]
            if any(convs):
                def conv_rec(v, convs=convs):
                    return tuple(
                        c(x) if (c and x is not None) else x
                        for c, x in zip(convs, v)
                    )
                return conv_rec
            return None
        if t == "array":
            c = _logical_converter(schema["items"], names)
            if c:
                return lambda v: [c(x) if x is not None else x for x in v]
            return None
        if t == "map":
            c = _logical_converter(schema["values"], names)
            if c:
                return lambda v: {k: c(x) if x is not None else x for k, x in v.items()}
            return None
        return None
    if isinstance(schema, list):
        convs = [_logical_converter(b, names) for b in schema]
        live = [c for c in convs if c]
        if not live:
            return None
        if len(live) == 1 and len(schema) == 2 and "null" in schema:
            c = live[0]
            return lambda v: c(v) if v is not None else None
        raise ValueError("logical types inside multi-branch unions unsupported")
    return None


# --------------------------------------------------------------------- #
# schema resolution (Avro 1.11 spec §"Schema Resolution"): decode data
# written under one (per-file) WRITER schema into the shape of a single
# READER schema — field matching by name or reader-declared aliases,
# defaults for reader fields the writer lacks, silent skip of writer
# fields the reader dropped, and the spec's promotion lattice
# (int→long/float/double, long→float/double, float→double,
# string↔bytes). This is what lets ONE query read a directory whose
# files span schema generations (VERDICT r13 #5).

#: writer type → reader type promotions; value = post-decode converter
_PROMOTIONS = {
    ("int", "long"): None,
    ("int", "float"): float,
    ("int", "double"): float,
    ("long", "float"): float,
    ("long", "double"): float,
    ("float", "double"): None,
    ("string", "bytes"): lambda v: v.encode("utf-8"),
    ("bytes", "string"): lambda v: v.decode("utf-8"),
}


def _kind(schema):
    """The resolution kind of a schema node: primitive name, named-type
    kind, 'array'/'map', or 'union'."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    t = schema["type"]
    if isinstance(t, (dict, list)):
        return _kind(t)
    return t


def _default_value(schema, default, names: dict):
    """An Avro JSON default → the Python value the decoder would have
    produced (bytes/fixed defaults are ISO-8859-1 strings per the spec;
    a union's default matches its FIRST branch)."""
    schema = _skip_to_named(schema, names)
    k = _kind(schema)
    if k == "union":
        return _default_value(schema[0], default, names)
    if k == "null":
        return None
    if k == "boolean":
        return bool(default)
    if k in ("int", "long"):
        return int(default)
    if k in ("float", "double"):
        return float(default)
    if k == "string" or k == "enum":
        return default
    if k in ("bytes", "fixed"):
        return default.encode("latin-1")
    if k == "array":
        items = schema["items"]
        return [_default_value(items, d, names) for d in default]
    if k == "map":
        vals = schema["values"]
        return {mk: _default_value(vals, d, names) for mk, d in default.items()}
    if k in ("record", "error"):
        out = []
        for f in schema["fields"]:
            if f["name"] in default:
                out.append(_default_value(f["type"], default[f["name"]], names))
            elif "default" in f:
                out.append(_default_value(f["type"], f["default"], names))
            else:
                raise ValueError(
                    f"record default missing field {f['name']!r}"
                )
        return tuple(out)
    raise ValueError(f"unsupported default for schema {schema!r}")


def _make_resolver(writer, reader, wnames: dict, rnames: dict):
    """Compile (writer schema, reader schema) into a ``reader -> value``
    closure producing READER-shaped values. Raises ValueError when the
    schemas cannot resolve."""
    writer = _skip_to_named(writer, wnames)
    reader = _skip_to_named(reader, rnames)
    wk, rk = _kind(writer), _kind(reader)

    if wk == "union":
        # per spec: resolve the branch actually present in the data; a
        # branch that cannot resolve errors only if encountered
        branches = []
        for b in writer:
            try:
                branches.append(_make_resolver(b, reader, wnames, rnames))
            except ValueError as e:
                msg = str(e)

                def raiser(r, _m=msg):
                    raise ValueError(_m)

                branches.append(raiser)
        return lambda r: branches[r.read_long()](r)
    if rk == "union":
        # writer non-union into reader union: first resolvable branch
        for b in reader:
            try:
                return _make_resolver(writer, b, wnames, rnames)
            except ValueError:
                continue
        raise ValueError(
            f"writer {writer!r} matches no branch of reader union {reader!r}"
        )
    if wk == rk and wk not in (
        "record", "error", "enum", "fixed", "array", "map"
    ):
        return _make_decoder(writer, wnames)
    promote = _PROMOTIONS.get((wk, rk), False)
    if promote is not False:
        base = _make_decoder(writer, wnames)
        if promote is None:
            return base
        return lambda r: promote(base(r))
    if wk in ("record", "error") and rk in ("record", "error"):
        if isinstance(writer, dict) and "name" in writer:
            wnames[writer["name"]] = writer
        if isinstance(reader, dict) and "name" in reader:
            rnames[reader["name"]] = reader
        by_name = {}
        for idx, f in enumerate(reader["fields"]):
            by_name[f["name"]] = (idx, f)
            for alias in f.get("aliases", ()):
                by_name.setdefault(alias, (idx, f))
        steps = []  # (reader position | None, decoder)
        matched = set()
        for wf in writer["fields"]:
            hit = by_name.get(wf["name"])
            if hit is None:
                # reader dropped this field: decode and discard
                steps.append((None, _make_decoder(wf["type"], wnames)))
            else:
                idx, rf = hit
                steps.append(
                    (idx, _make_resolver(wf["type"], rf["type"], wnames, rnames))
                )
                matched.add(idx)
        defaults = []
        for idx, rf in enumerate(reader["fields"]):
            if idx in matched:
                continue
            if "default" not in rf:
                raise ValueError(
                    f"reader field {rf['name']!r} is absent from the writer "
                    "schema and declares no default"
                )
            defaults.append(
                (idx, _default_value(rf["type"], rf["default"], rnames))
            )
        width = len(reader["fields"])

        def read_record(r):
            out = [None] * width
            for idx, dec in steps:
                v = dec(r)
                if idx is not None:
                    out[idx] = v
            for idx, dv in defaults:
                out[idx] = dv
            return tuple(out)

        return read_record
    if wk == "enum" and rk == "enum":
        if "name" in reader:
            rnames[reader["name"]] = reader
        if "name" in writer:
            wnames[writer["name"]] = writer
        rsyms = set(reader["symbols"])
        fallback = reader.get("default")
        table = [
            s if s in rsyms else fallback for s in writer["symbols"]
        ]

        def read_enum(r):
            v = table[r.read_long()]
            if v is None:
                raise ValueError("writer enum symbol unknown to the reader")
            return v

        return read_enum
    if wk == "fixed" and rk == "fixed":
        if writer["size"] != reader["size"]:
            raise ValueError("fixed size mismatch between writer and reader")
        return _make_decoder(writer, wnames)
    if wk == "array" and rk == "array":
        item = _make_resolver(
            writer["items"], reader["items"], wnames, rnames
        )

        def read_array(r):
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(item(r))

        return read_array
    if wk == "map" and rk == "map":
        val = _make_resolver(
            writer["values"], reader["values"], wnames, rnames
        )

        def read_map(r):
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    mk = r.read(r.read_long()).decode("utf-8")
                    out[mk] = val(r)

        return read_map
    raise ValueError(f"cannot resolve writer {wk!r} into reader {rk!r}")


# --------------------------------------------------------------------- #
# binary encoding

def _write_long(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    while v & ~0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _make_encoder(schema, names: dict):
    schema = _skip_to_named(schema, names)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return lambda out, v: None
        if t == "boolean":
            return lambda out, v: out.append(1 if v else 0)
        if t in ("int", "long"):
            return _write_long
        if t == "float":
            return lambda out, v: out.extend(struct.pack("<f", v))
        if t == "double":
            return lambda out, v: out.extend(struct.pack("<d", v))
        if t == "bytes":
            def enc_bytes(out, v):
                _write_long(out, len(v))
                out.extend(v)
            return enc_bytes
        if t == "string":
            def enc_str(out, v):
                b = v.encode("utf-8")
                _write_long(out, len(b))
                out.extend(b)
            return enc_str
        raise ValueError(f"unsupported avro type: {t!r}")
    if isinstance(schema, list):  # union — encode by runtime None check
        if len(schema) != 2 or "null" not in schema:
            raise ValueError("writer supports only [null, T] unions")
        null_ix = schema.index("null")
        other_ix = 1 - null_ix
        other = _make_encoder(schema[other_ix], names)
        def enc_union(out, v):
            if v is None:
                _write_long(out, null_ix)
            else:
                _write_long(out, other_ix)
                other(out, v)
        return enc_union
    t = schema["type"]
    lt = schema.get("logicalType")
    if lt in ("timestamp-micros", "local-timestamp-micros"):
        import datetime as dt
        epoch = dt.datetime(1970, 1, 1)
        def enc_ts(out, v):
            td = v - epoch  # exact integer micros (no float total_seconds)
            _write_long(
                out, (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
            )
        return enc_ts
    if lt == "date":
        import datetime as dt
        epoch_d = dt.date(1970, 1, 1)
        return lambda out, v: _write_long(out, (v - epoch_d).days)
    if t == "record":
        if "name" in schema:
            names[schema["name"]] = schema
        fields = [_make_encoder(f["type"], names) for f in schema["fields"]]
        def enc_rec(out, v):
            for fe, x in zip(fields, v):
                fe(out, x)
        return enc_rec
    if t == "array":
        item = _make_encoder(schema["items"], names)
        def enc_arr(out, v):
            if v:
                _write_long(out, len(v))
                for x in v:
                    item(out, x)
            _write_long(out, 0)
        return enc_arr
    if t == "map":
        val = _make_encoder(schema["values"], names)
        def enc_map(out, v):
            if v:
                _write_long(out, len(v))
                for k, x in v.items():
                    kb = k.encode("utf-8")
                    _write_long(out, len(kb))
                    out.extend(kb)
                    val(out, x)
            _write_long(out, 0)
        return enc_map
    if isinstance(t, (dict, list, str)):
        return _make_encoder(t, names)
    raise ValueError(f"unsupported avro schema node: {schema!r}")


# --------------------------------------------------------------------- #
# container file header

def read_header(path: str) -> tuple[dict, str, bytes, int]:
    """Parse an OCF header: returns (schema_json, codec, sync_marker,
    header_end_offset). Reads only the header bytes — driver-safe."""
    with open(path, "rb") as f:
        head = f.read(64 * 1024)
        while True:
            try:
                return _parse_header(head)
            except EOFError:
                more = f.read(1024 * 1024)
                if not more:
                    raise ValueError(f"{path}: truncated avro header") from None
                head += more


def _parse_header(head: bytes) -> tuple[dict, str, bytes, int]:
    if head[:4] != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    r = _ByteReader(head)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read(r.read_long()).decode("utf-8")
            meta[k] = r.read(r.read_long())
    sync = r.read(SYNC_SIZE)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec!r} (null/deflate only)")
    return schema, codec, sync, r.pos


_AVRO_TO_DDL = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _avro_type_to_ddl(t, names: dict) -> str:
    t = _skip_to_named(t, names)
    if isinstance(t, str):
        if t in _AVRO_TO_DDL:
            return _AVRO_TO_DDL[t]
        raise ValueError(f"unsupported avro type for DDL: {t!r}")
    if isinstance(t, list):
        non_null = [b for b in t if b != "null"]
        if len(non_null) != 1:
            raise ValueError("only [null, T] unions map to a Spark column")
        return _avro_type_to_ddl(non_null[0], names)
    lt = t.get("logicalType")
    if lt in ("timestamp-micros", "timestamp-millis"):
        return "timestamp"
    if lt == "local-timestamp-micros":
        return "timestamp_ntz"
    if lt == "date":
        return "date"
    tt = t["type"]
    if tt == "record":
        if "name" in t:
            names[t["name"]] = t
        inner = ", ".join(
            f"{f['name']}: {_avro_type_to_ddl(f['type'], names)}"
            for f in t["fields"]
        )
        return f"struct<{inner}>"
    if tt == "enum":
        return "string"
    if tt == "fixed":
        return "binary"
    if tt == "array":
        return f"array<{_avro_type_to_ddl(t['items'], names)}>"
    if tt == "map":
        return f"map<string, {_avro_type_to_ddl(t['values'], names)}>"
    if isinstance(tt, (dict, list, str)):
        return _avro_type_to_ddl(tt, names)
    raise ValueError(f"unsupported avro schema node for DDL: {t!r}")


def avro_schema_to_ddl(schema: dict) -> str:
    """Top-level record schema → Spark DDL string (``a bigint, b string``)."""
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("top-level avro schema must be a record")
    names: dict = {}
    return ", ".join(
        f"{f['name']} {_avro_type_to_ddl(f['type'], names)}"
        for f in schema["fields"]
    )


# --------------------------------------------------------------------- #
# reader (split-aware)

def _list_avro_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if n.endswith(".avro") and not n.startswith((".", "_"))
        )
    return [path]


class _AvroSplit(InputPartition):
    def __init__(self, path: str, start: int, end: int) -> None:
        self.path = path
        self.start = start
        self.end = end


class _AvroReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_py requires .option('path', ...)")
        self.split_target = int(options.get("split_target_bytes", 32 * 1024 * 1024))
        # quarantine-not-stage-death, opt-in (mirrors Spark's own
        # spark.sql.files.ignoreCorruptFiles default=false): with
        # ignore_corrupt_blocks=true a block that fails decompression or
        # decode is SKIPPED by resyncing on the next sync marker — the
        # container format exists to make exactly this possible — instead
        # of killing the stage. Default stays fail-fast.
        self.ignore_corrupt = str(
            options.get("ignore_corrupt_blocks", "false")
        ).lower() in ("true", "1", "yes")
        # schema resolution: decode every file's (per-file) writer schema
        # into this one reader schema — defaults, aliases, promotions
        self.reader_schema = options.get("reader_schema")

    def partitions(self) -> Sequence[InputPartition]:
        """Byte-range splits per file — the header is read driver-side per
        file (cheap) to find the first block offset; sync-marker resync in
        the task makes mid-file starts exact."""
        files = _list_avro_files(self.path)
        if not files:
            raise ValueError(f"no .avro files under {self.path}")
        splits: list[_AvroSplit] = []
        for p in files:
            size = os.path.getsize(p)
            _, _, _, header_end = read_header(p)
            lo = header_end
            step = max(self.split_target, 1)
            while lo < size:
                splits.append(_AvroSplit(p, lo, min(lo + step, size)))
                lo += step
        return splits or [_AvroSplit(files[0], 0, 0)]

    def read(self, split: _AvroSplit) -> Iterator[tuple]:
        if split.end <= split.start:
            return
        schema, codec, sync, header_end = read_header(split.path)
        names: dict = {}
        if self.reader_schema:
            rschema = json.loads(self.reader_schema)
            rnames: dict = {}
            decode = _make_resolver(schema, rschema, names, rnames)
            convert = _logical_converter(rschema, dict(rnames))
        else:
            decode = _make_decoder(schema, names)
            convert = _logical_converter(schema, dict(names))
        with open(split.path, "rb") as f:
            pos = self._first_block_at(f, split, sync, header_end)
            while pos is not None and pos < split.end:
                f.seek(pos)
                head = f.read(20)  # generous for two varints
                if not head:
                    return
                r = _ByteReader(head)
                try:
                    n_rows = r.read_long()
                    n_bytes = r.read_long()
                except EOFError:
                    # fewer bytes than two varints at a block start =
                    # truncated container. Fail-fast mode must raise (a
                    # clean EOF already returned via `if not head` above);
                    # quarantine mode drops the tail like any corrupt block.
                    if self.ignore_corrupt:
                        return
                    raise ValueError(
                        f"{split.path}: truncated block header at {pos}"
                    ) from None
                payload_at = pos + r.pos
                f.seek(payload_at)
                payload = f.read(n_bytes)
                tail = f.read(SYNC_SIZE)
                try:
                    if tail != sync:
                        raise ValueError(
                            f"{split.path}: sync mismatch after block at {pos}"
                        )
                    if codec == "deflate":
                        payload = zlib.decompress(payload, wbits=-15)
                    br = _ByteReader(payload)
                    rows = [decode(br) for _ in range(n_rows)]
                except (ValueError, EOFError, zlib.error, KeyError, IndexError):
                    if not self.ignore_corrupt:
                        raise
                    nxt = self._resync(f, split, sync, pos)
                    if nxt is None:
                        return
                    pos = nxt
                    continue
                for row in rows:
                    yield convert(row) if convert else row
                pos = payload_at + n_bytes + SYNC_SIZE

    @staticmethod
    def _resync(f, split: _AvroSplit, sync: bytes, after: int):
        """Next block start after a corrupt block: scan forward from just
        past the failure point for the sync marker, bounded by the split
        end (the next split owns anything beyond it)."""
        scan_from = after + 1
        f.seek(scan_from)
        window = f.read((split.end - scan_from) + SYNC_SIZE)
        ix = window.find(sync)
        if ix == -1:
            return None
        p = scan_from + ix + SYNC_SIZE
        return p if p < split.end else None

    @staticmethod
    def _first_block_at(f, split: _AvroSplit, sync: bytes, header_end: int):
        """First block start p with split.start <= p < split.end. Blocks
        start at header_end and after each sync; a split beginning exactly
        at header_end starts there, otherwise scan for the sync marker
        whose END is >= split.start (Hadoop split semantics — the split
        containing a block's first byte owns it)."""
        if split.start <= header_end:
            return header_end
        # scan from start - SYNC_SIZE: a block starting exactly at
        # split.start is preceded by a sync occupying [start-16, start)
        scan_from = max(header_end, split.start - SYNC_SIZE)
        f.seek(scan_from)
        window = f.read((split.end - scan_from) + SYNC_SIZE)
        ix = window.find(sync)
        while ix != -1:
            p = scan_from + ix + SYNC_SIZE
            if p >= split.start:
                return p if p < split.end else None
            ix = window.find(sync, ix + 1)
        return None


class AvroDataSource(DataSource):
    """``spark.read.format("avro_py").option("path", ...)`` — pure-Python,
    split-aware Avro Object Container File reader (null/deflate codecs)."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        reader_schema = self.options.get("reader_schema")
        if reader_schema:
            # the reader schema IS the table schema: per-file writer
            # schemas (possibly spanning generations) resolve into it
            return avro_schema_to_ddl(json.loads(reader_schema))
        path = self.options.get("path")
        if not path:
            raise ValueError("avro_py requires .option('path', ...)")
        files = _list_avro_files(path)
        if not files:
            raise ValueError(f"no .avro files under {path}")
        schema, _, _, _ = read_header(files[0])
        return avro_schema_to_ddl(schema)

    def reader(self, schema) -> DataSourceReader:
        return _AvroReader(self.options)


def register_avro_source(spark) -> None:
    spark.dataSource.register(AvroDataSource)


# --------------------------------------------------------------------- #
# writer (two-phase commit, one container file per partition)

def spark_schema_to_avro(schema, name: str = "row") -> dict:
    """StructType → Avro record schema (all fields nullable unions, the
    Spark column contract)."""
    from pyspark.sql import types as T

    def conv(dt):
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.IntegerType):
            return "int"
        if isinstance(dt, (T.LongType,)):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.TimestampNTZType):
            # spec-true NTZ form — readers map it back to timestamp_ntz
            return {"type": "long", "logicalType": "local-timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.ArrayType):
            item = conv(dt.elementType)
            return {
                "type": "array",
                "items": ["null", item] if dt.containsNull else item,
            }
        if isinstance(dt, T.MapType):
            val = conv(dt.valueType)
            return {
                "type": "map",
                "values": ["null", val] if dt.valueContainsNull else val,
            }
        if isinstance(dt, T.StructType):
            return struct_schema(dt, f"{name}_sub{id(dt) & 0xFFFF:x}")
        raise ValueError(f"unsupported Spark type for avro writer: {dt}")

    def struct_schema(st, rec_name):
        return {
            "type": "record",
            "name": rec_name,
            "fields": [
                {
                    "name": f.name,
                    "type": ["null", conv(f.dataType)] if f.nullable else conv(f.dataType),
                }
                for f in st.fields
            ],
        }

    return struct_schema(schema, name)


class _AvroCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class _AvroWriter(DataSourceWriter):
    """One OCF per partition, blocks of ``rows_per_block`` rows, staged
    under ``.tmp-*`` and published by rename in commit() — the two-phase
    discipline shared with jsonl_sink (only winning attempts publish)."""

    def __init__(self, options, schema, overwrite: bool) -> None:
        import glob

        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro_sink requires .option('path', ...)")
        self.codec = options.get("codec", "deflate")
        if self.codec not in ("null", "deflate"):
            raise ValueError(f"unsupported avro codec: {self.codec!r}")
        self.rows_per_block = int(options.get("rows_per_block", 4096))
        self.avro_schema = spark_schema_to_avro(schema)
        self.n_fields = len(schema.fields)
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for stale in glob.glob(os.path.join(self.path, "part-*.avro")):
                os.remove(stale)
            marker = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(marker):
                os.remove(marker)

    def write(self, iterator) -> "_AvroCommit":
        import uuid

        encode = _make_encoder(self.avro_schema, {})
        sync = uuid.uuid4().bytes  # 16 bytes
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.avro")
        n_total = 0
        with open(tmp, "wb") as f:
            header = bytearray(MAGIC)
            meta = {
                "avro.schema": json.dumps(self.avro_schema).encode("utf-8"),
                "avro.codec": self.codec.encode("utf-8"),
            }
            _write_long(header, len(meta))
            for k, v in meta.items():
                kb = k.encode("utf-8")
                _write_long(header, len(kb))
                header.extend(kb)
                _write_long(header, len(v))
                header.extend(v)
            _write_long(header, 0)
            header.extend(sync)
            f.write(header)

            block = bytearray()
            n_block = 0

            def flush():
                nonlocal block, n_block, n_total
                if not n_block:
                    return
                payload = bytes(block)
                if self.codec == "deflate":
                    c = zlib.compressobj(6, zlib.DEFLATED, -15)
                    payload = c.compress(payload) + c.flush()
                head = bytearray()
                _write_long(head, n_block)
                _write_long(head, len(payload))
                f.write(head)
                f.write(payload)
                f.write(sync)
                n_total += n_block
                block = bytearray()
                n_block = 0

            for row in iterator:
                encode(block, tuple(row))
                n_block += 1
                if n_block >= self.rows_per_block:
                    flush()
            flush()
        return _AvroCommit(tmp, n_total)

    def commit(self, messages) -> None:
        import glob

        winners = set()
        total = 0
        for m in messages:
            final = m.path.replace("/.tmp-", "/part-")
            os.rename(m.path, final)
            winners.add(m.path)
            total += m.n_rows
        for orphan in glob.glob(os.path.join(self.path, ".tmp-*.avro")):
            if orphan not in winners:
                os.remove(orphan)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"files": len(messages), "rows": total}, f)

    def abort(self, messages) -> None:
        import glob

        for orphan in glob.glob(os.path.join(self.path, ".tmp-*.avro")):
            os.remove(orphan)


class AvroSinkDataSource(DataSource):
    """``df.write.format("avro_sink").option("path", dir).save()`` —
    pure-Python Avro OCF writer (deflate default), two-phase commit."""

    @classmethod
    def name(cls) -> str:
        return "avro_sink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _AvroWriter(self.options, schema, overwrite)


def register_avro_sink(spark) -> None:
    spark.dataSource.register(AvroSinkDataSource)
