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
    back = (
        spark.read.schema("id long, v long")
        .option("pathGlobFilter", "part-*.jsonl")
        .json(out)
    )
    assert back.count() == 100
    assert back.agg({"v": "sum"}).first()[0] == sum(2 * i for i in range(100))


def test_jsonl_sink_overwrite_clears_stale_parts(spark, tmp_path):
    """mode('overwrite') must clear prior part files driver-side — a stale
    part surviving an overwrite silently duplicates rows on read-back."""
    import glob
    import json
    import os

    from zio_analytics_spark.sources.pydatasource import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "sink_ow")
    df = spark.range(50).selectExpr("id", "id AS v").repartition(4)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()
    assert len(glob.glob(out + "/part-*.jsonl")) == 4
    spark.range(7).selectExpr("id", "id AS v").coalesce(1).write.format(
        "jsonl_sink"
    ).option("path", out).mode("overwrite").save()
    assert len(glob.glob(out + "/part-*.jsonl")) == 1
    assert json.load(open(out + "/_SUCCESS")) == {"files": 1, "rows": 7}
    back = (
        spark.read.schema("id long, v long")
        .option("pathGlobFilter", "part-*.jsonl")
        .json(out)
    )
    assert back.count() == 7  # no stale rows from the first write


def test_jsonl_sink_publishes_only_committed_attempts(tmp_path):
    """The two-phase contract directly: write() stages under a tmp name and
    publishes NOTHING; commit() renames exactly the winning attempts' files
    and sweeps orphan tmps from losing speculative/zombie attempts."""
    import glob
    import json
    import os

    from zio_analytics_spark.sources.pydatasource import _JsonlWriter

    class _Row:
        def __init__(self, d):
            self._d = d

        def asDict(self):
            return self._d

    out = str(tmp_path / "sink_spec")
    w = _JsonlWriter({"path": out}, overwrite=False)
    winner = w.write(iter([_Row({"id": 1}), _Row({"id": 2})]))
    zombie = w.write(iter([_Row({"id": 1}), _Row({"id": 2})]))  # retried attempt
    # nothing is published until commit
    assert glob.glob(out + "/part-*.jsonl") == []
    assert len(glob.glob(out + "/.tmp-*.jsonl")) == 2
    w.commit([winner])  # only the winning attempt's message reaches commit
    parts = glob.glob(out + "/part-*.jsonl")
    assert len(parts) == 1  # zombie attempt not published…
    assert glob.glob(out + "/.tmp-*.jsonl") == []  # …and its tmp was swept
    assert json.load(open(out + "/_SUCCESS")) == {"files": 1, "rows": 2}
    assert zombie.n_rows == 2  # the zombie did run; only publication is gated
