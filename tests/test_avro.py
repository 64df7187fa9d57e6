"""Pure-Python Avro OCF source + sink (sources/avro.py): binary
encode/decode exactness, split planning + sync-marker resync, codecs,
logical types, and the header-only driver schema path."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.sources.avro import (
    avro_schema_to_ddl,
    read_header,
    register_avro_sink,
    register_avro_source,
    spark_schema_to_avro,
)


def _write(spark, df, path, **opts):
    register_avro_sink(spark)
    w = df.write.format("avro_sink").option("path", path)
    for k, v in opts.items():
        w = w.option(k, str(v))
    w.mode("overwrite").save()


def _read(spark, path, **opts):
    register_avro_source(spark)
    r = spark.read.format("avro_py").option("path", path)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def _sample_df(spark, n=2000):
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") % 3)
        .cast("int")
        .alias("bucket"),
        F.to_timestamp(F.lit("2026-01-15 10:30:00.123456")).alias("ts"),
        F.to_date(F.lit("2026-01-15")).alias("d"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
        (F.col("id") % 2 == 0).alias("flag"),
    )


def test_roundtrip_exact_deflate(spark, tmp_path):
    path = str(tmp_path / "a")
    df = _sample_df(spark).repartition(3)
    _write(spark, df, path, rows_per_block=256)
    back = _read(spark, path)
    assert back.orderBy("id").collect() == df.orderBy("id").collect()


def test_roundtrip_null_codec(spark, tmp_path):
    path = str(tmp_path / "a")
    df = _sample_df(spark, 500)
    _write(spark, df, path, codec="null")
    _, codec, _, _ = read_header(glob.glob(path + "/part-*.avro")[0])
    assert codec == "null"
    assert _read(spark, path).count() == 500


def test_split_resync_no_dup_no_gap(spark, tmp_path):
    """Tiny split_target_bytes forces many intra-file byte-range splits:
    every row must appear exactly once (the Hadoop split contract — a
    block belongs to the split containing its first byte)."""
    path = str(tmp_path / "a")
    df = _sample_df(spark, 5000).repartition(2)
    _write(spark, df, path, rows_per_block=100)
    back = _read(spark, path, split_target_bytes=4096)
    # many splits actually planned
    assert back.rdd.getNumPartitions() > 4
    ids = [r.id for r in back.select("id").collect()]
    assert len(ids) == 5000
    assert len(set(ids)) == 5000


def test_driver_schema_from_header_only(spark, tmp_path):
    path = str(tmp_path / "a")
    _write(spark, _sample_df(spark, 50), path)
    back = _read(spark, path)
    ddl = dict((f.name, f.dataType.simpleString()) for f in back.schema.fields)
    assert ddl["id"] == "bigint"
    assert ddl["name"] == "string"
    assert ddl["score"] == "double"
    assert ddl["bucket"] == "int"
    assert ddl["d"] == "date"
    assert ddl["arr"] == "array<bigint>"
    assert ddl["m"] == "map<string,bigint>"
    assert ddl["flag"] == "boolean"
    assert ddl["ts"] in ("timestamp", "timestamp_ntz")


def test_header_parse_and_ddl_mapping(spark, tmp_path):
    path = str(tmp_path / "a")
    _write(spark, spark.range(10).selectExpr("id", "cast(id as string) s"), path)
    f = glob.glob(path + "/part-*.avro")[0]
    schema, codec, sync, header_end = read_header(f)
    assert schema["type"] == "record"
    assert [x["name"] for x in schema["fields"]] == ["id", "s"]
    assert codec == "deflate"
    assert len(sync) == 16
    assert header_end > 4
    assert avro_schema_to_ddl(schema) == "id bigint, s string"


def test_two_phase_commit_manifest(spark, tmp_path):
    path = str(tmp_path / "a")
    _write(spark, spark.range(100).repartition(4), path)
    assert len(glob.glob(path + "/part-*.avro")) == 4
    assert not glob.glob(path + "/.tmp-*")
    assert json.load(open(path + "/_SUCCESS")) == {"files": 4, "rows": 100}


def test_overwrite_clears_stale_parts(spark, tmp_path):
    path = str(tmp_path / "a")
    _write(spark, spark.range(10).repartition(1), path)
    stale = glob.glob(path + "/part-*.avro")
    _write(spark, spark.range(20).repartition(1), path)
    assert _read(spark, path).count() == 20
    for s in stale:
        assert not os.path.exists(s)


def test_unsupported_codec_rejected(spark, tmp_path):
    register_avro_sink(spark)
    with pytest.raises(Exception, match="codec"):
        spark.range(5).write.format("avro_sink").option(
            "path", str(tmp_path / "x")
        ).option("codec", "snappy").mode("overwrite").save()


def test_spark_schema_to_avro_nullable_unions(spark):
    df = spark.range(1).selectExpr("id", "nullif(cast(id as string), '') s")
    rec = spark_schema_to_avro(df.schema)
    by_name = {f["name"]: f["type"] for f in rec["fields"]}
    assert by_name["id"] == "long"  # range() id is non-nullable: plain type
    assert by_name["s"] == ["null", "string"]  # nullable: [null, T] union


def test_empty_dataframe_roundtrip(spark, tmp_path):
    path = str(tmp_path / "a")
    _write(spark, spark.range(0).selectExpr("id"), path)
    assert _read(spark, path).count() == 0


def test_corrupt_block_quarantine_opt_in(spark, tmp_path):
    """A corrupt middle block: default read fails the stage (Spark's own
    ignoreCorruptFiles discipline); ignore_corrupt_blocks=true skips
    exactly the bad block and keeps every other row."""
    path = str(tmp_path / "a")
    df = spark.range(3000).selectExpr("id", "cast(id as string) s").coalesce(1)
    _write(spark, df, path, rows_per_block=1000, codec="deflate")
    f = glob.glob(path + "/part-*.avro")[0]
    schema, codec, sync, header_end = read_header(f)
    buf = open(f, "rb").read()
    # find the second block: first block starts at header_end; its span is
    # varints + payload + sync — locate via the sync marker occurrences
    first_sync_after_header = buf.find(sync, header_end)
    second_block_at = first_sync_after_header + len(sync)
    # smash bytes inside the second block's payload
    smashed = bytearray(buf)
    for i in range(second_block_at + 4, second_block_at + 24):
        smashed[i] ^= 0xFF
    open(f, "wb").write(bytes(smashed))

    import pytest as _pytest

    with _pytest.raises(Exception):
        _read(spark, path).count()
    back = _read(spark, path, ignore_corrupt_blocks="true")
    n = back.count()
    # exactly one 1000-row block lost
    assert n == 2000
    ids = {r.id for r in back.select("id").collect()}
    assert 0 in ids and 2999 in ids  # first and last blocks survived


def test_truncated_container_fails_fast(spark, tmp_path):
    """A container truncated mid-block-header must RAISE under the
    fail-fast default (round-13 ADVICE: the tail was silently dropped);
    quarantine mode keeps the intact prefix blocks."""
    path = str(tmp_path / "a")
    df = spark.range(3000).selectExpr("id", "cast(id as string) s").coalesce(1)
    _write(spark, df, path, rows_per_block=1000, codec="null")
    f = glob.glob(path + "/part-*.avro")[0]
    _schema, _codec, sync, header_end = read_header(f)
    buf = open(f, "rb").read()
    second_block_at = buf.find(sync, header_end) + len(sync)
    open(f, "wb").write(buf[: second_block_at + 1])  # 1 byte of varint

    with pytest.raises(Exception, match="truncated|EOF"):
        _read(spark, path).count()
    back = _read(spark, path, ignore_corrupt_blocks="true")
    assert back.count() == 1000  # exactly the intact prefix


def test_reader_schema_resolves_generations(spark, tmp_path):
    """One reader schema over a directory whose files span TWO writer
    generations: renamed column (alias), widened types (int→long,
    float→double), and a new column defaulted for old files."""
    import shutil

    gen1 = spark.range(50).selectExpr(
        "cast(id as int) AS k", "cast(id * 1.5 as float) AS price"
    )
    gen2 = spark.range(50, 100).selectExpr(
        "cast(id as long) AS k",
        "cast(id * 1.5 as double) AS cost",
        "concat('p', cast(id % 3 as string)) AS pri",
    )
    d1, d2, combined = (str(tmp_path / n) for n in ("g1", "g2", "all"))
    _write(spark, gen1.coalesce(1), d1)
    _write(spark, gen2.coalesce(1), d2)
    os.makedirs(combined)
    for i, d in enumerate((d1, d2)):
        for n in os.listdir(d):
            if n.endswith(".avro"):
                shutil.copy(os.path.join(d, n), os.path.join(combined, f"g{i}-{n}"))
    reader_schema = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "k", "type": ["null", "long"]},
                {
                    "name": "cost",
                    "aliases": ["price"],
                    "type": ["null", "double"],
                },
                {"name": "pri", "type": ["string", "null"], "default": "NONE"},
            ],
        }
    )
    back = _read(spark, combined, reader_schema=reader_schema)
    assert [f.simpleString() for f in back.schema.fields] == [
        "k:bigint", "cost:double", "pri:string",
    ]
    rows = {r.k: (r.cost, r.pri) for r in back.collect()}
    assert len(rows) == 100
    assert rows[10] == (15.0, "NONE")       # gen1: promoted + defaulted
    assert rows[60] == (90.0, "p0")         # gen2: aliased rename
    # driver-side schema comes from the READER schema, not file headers
    assert "cost" in back.columns and "price" not in back.columns


def test_reader_schema_missing_default_fails(spark, tmp_path):
    path = str(tmp_path / "a")
    _write(spark, spark.range(5).selectExpr("id AS k").coalesce(1), path)
    bad = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "k", "type": ["null", "long"]},
                {"name": "nope", "type": "string"},  # no default
            ],
        }
    )
    with pytest.raises(Exception, match="nope|default"):
        _read(spark, path, reader_schema=bad).collect()
