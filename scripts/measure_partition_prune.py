"""Empirical partition-pruning measurement for the partitioned lake table
(round 14): SCALE.md claims a predicate on a partition column contributes
ZERO scanned bytes for pruned partitions at any table size. This measures
it — same lake table at 1x and 10x rows, 16 hive partitions, one-partition
predicate — reading the FileSourceScan's own metrics (number of files
read, bytes read) from the executed plan, not wall-clock (local timing at
these sizes is noise; the scan metrics are the thing that scales).

Expected shape (asserted): the filtered read touches exactly the files of
ONE partition directory at both scales (1/16 of the files, ~1/16 of the
bytes), while the unfiltered read touches all of them — the 10x table
prunes 10x more absolute bytes, which is the 100 TB story.

Usage: python scripts/measure_partition_prune.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _scan_metrics(df) -> dict:
    """(files read, bytes read) from the plan's FileSourceScan after an
    action has run."""
    df.collect()
    node = df._jdf.queryExecution().executedPlan()

    def find(n):
        name = n.getClass().getSimpleName()
        if "FileSourceScan" in name:
            return n
        # AQE wrappers hide the final tree behind accessors, not children()
        if "AdaptiveSparkPlan" in name:
            return find(n.executedPlan())
        if "QueryStage" in name:
            return find(n.plan())
        for i in range(n.children().size()):
            got = find(n.children().apply(i))
            if got is not None:
                return got
        return None

    scan = find(node)
    out = {}
    it = scan.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return {"files": out.get("numFiles"), "bytes": out.get("filesSize")}


def measure(spark, rows: int) -> dict:
    from zio_analytics_spark.sources import laketable as lake

    t = tempfile.mkdtemp(prefix="zas_ppmeas_")
    shutil.rmtree(t)
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 16).alias("bucket"),
        (F.col("id") * 1.0).alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    lake.create_table(
        df.repartition(4), t, key_cols=["k"], partition_by=["bucket"]
    )
    full = _scan_metrics(lake.read_snapshot(spark, t).agg(F.sum("v")))
    one = _scan_metrics(
        lake.read_snapshot(spark, t).where("bucket = 3").agg(F.sum("v"))
    )
    shutil.rmtree(t)
    return {
        "rows": rows,
        "full_files": full["files"],
        "full_bytes": full["bytes"],
        "pruned_files": one["files"],
        "pruned_bytes": one["bytes"],
        "bytes_fraction": round(one["bytes"] / full["bytes"], 4),
    }


def main() -> None:
    from zio_analytics_spark.session import get_spark

    spark = get_spark()
    for rows in (100_000, 1_000_000):
        r = measure(spark, rows)
        assert r["pruned_files"] * 16 == r["full_files"], r
        print(json.dumps(r))


if __name__ == "__main__":
    main()
