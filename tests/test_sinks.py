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
