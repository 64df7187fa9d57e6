"""Custom Python DataSource (Spark 4 DataSource V2 Python API): shard
planning + task-side generation."""

from __future__ import annotations

from zio_analytics_spark.sources.pydatasource import corpus_text, register_synthetic_corpus


def test_synthetic_corpus_shards_and_contents(spark):
    register_synthetic_corpus(spark)
    df = (
        spark.read.format("synthetic_corpus")
        .option("n_docs", 100)
        .option("n_shards", 5)
        .load()
    )
    # the reader's partition plan IS the scan parallelism
    assert df.rdd.getNumPartitions() == 5
    rows = {r.doc_id: (r.text, r.shard) for r in df.collect()}
    assert len(rows) == 100
    for doc_id in (0, 1, 57, 99):
        assert rows[doc_id] == (corpus_text(doc_id), doc_id % 3)


def test_synthetic_corpus_supports_pushless_filters(spark):
    """Filters on a Python source are applied ABOVE the scan (no pushdown
    implemented) — results must still be correct."""
    register_synthetic_corpus(spark)
    df = spark.read.format("synthetic_corpus").option("n_docs", 50).load()
    assert df.where("shard = 1").count() == sum(1 for i in range(50) if i % 3 == 1)


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    import glob
    import json
    import os

    from zio_analytics_spark.sources.pydatasource import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    df = spark.range(100).selectExpr("id", "id * 2 AS v").repartition(4)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()
    files = glob.glob(out + "/part-*.jsonl")
    assert len(files) == 4            # one atomic file per task
    assert not glob.glob(out + "/.tmp-*")  # no torn temp files left
    manifest = json.load(open(out + "/_SUCCESS"))
    assert manifest == {"files": 4, "rows": 100}
    back = spark.read.schema("id long, v long").json(out + "/part-*.jsonl")
    assert back.count() == 100
    assert back.agg({"v": "sum"}).first()[0] == sum(2 * i for i in range(100))
