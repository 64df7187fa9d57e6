from __future__ import annotations

import os
import tempfile

from zio_analytics_spark import sinks


def test_write_parquet_partitioned_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v long"
    )
    out = os.path.join(tempfile.mkdtemp(prefix="sink_"), "t")
    sinks.write_parquet(df, out, partition_by=["k"])
    # partition layout exists → downstream scans can prune on k
    assert sorted(d for d in os.listdir(out) if d.startswith("k=")) == ["k=a", "k=b"]
    back = spark.read.parquet(out)
    assert sorted((r.k, r.v) for r in back.collect()) == [("a", 1), ("a", 2), ("b", 3)]
    # partition filter prunes files (plan-level check)
    plan = back.where(back.k == "a")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_write_stream_parquet_checkpointed(spark):
    base = tempfile.mkdtemp(prefix="sink_stream_")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)
    import glob
    import shutil

    tmp = tempfile.mkdtemp()
    spark.createDataFrame([(1, "x")], "id long, s string").coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/a.parquet")

    stream = spark.readStream.schema("id long, s string").parquet(src)
    q = sinks.write_stream_parquet(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert [tuple(r) for r in spark.read.parquet(out).collect()] == [(1, "x")]
    assert os.path.isdir(ckpt)


def test_write_parquet_sorted_rowgroup_stats(spark):
    """Sorted-within-file writes give tight min/max stats → range predicates
    skip row groups (verified via pyarrow metadata)."""
    import pyarrow.parquet as pq

    df = spark.range(0, 100000).selectExpr("id", "100000 - id AS v")
    out = os.path.join(tempfile.mkdtemp(prefix="sorted_"), "t")
    sinks.write_parquet_sorted(df, out, sort_cols=["v"], num_files=4)
    import glob

    spans = []
    for f in glob.glob(os.path.join(out, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index("v")
        stats = md.row_group(0).column(col_idx).statistics
        assert stats.has_min_max
        spans.append(stats.max - stats.min)
    # each file covers only its own range slice (~100000/4), not the whole range
    assert len(spans) >= 3 and all(s < 50000 for s in spans)


def test_write_stream_foreach_batch(spark):
    base = tempfile.mkdtemp(prefix="feb_")
    src = f"{base}/src"
    os.makedirs(src)
    import glob
    import shutil

    tmp = tempfile.mkdtemp()
    spark.createDataFrame([(1,), (2,)], "id long").coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/a.parquet")

    seen = []

    def fn(batch_df, epoch_id):
        seen.append((epoch_id, sorted(r.id for r in batch_df.collect())))

    stream = spark.readStream.schema("id long").parquet(src)
    q = sinks.write_stream_foreach_batch(stream, fn, f"{base}/ckpt")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen and seen[0][1] == [1, 2]
