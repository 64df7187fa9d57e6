"""Measure deletion-vector write amplification vs whole-file rewrite
(round-15 verdict #4 'Done' criterion). Builds a single-file lake table,
then times a 1-row DELETE and a narrow MERGE in both modes, counting the
bytes each commit writes (data + sidecar, log excluded).

Run: python scripts/measure_dv.py  (prints one JSON line)
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources import laketable as lake  # noqa: E402

ROWS = 2_000_000


def tree_bytes(root):
    total = 0
    for dp, _d, ns in os.walk(root):
        if "/_log" in dp:
            continue
        for n in ns:
            try:
                total += os.path.getsize(os.path.join(dp, n))
            except OSError:
                pass
    return total


def build(spark, t):
    shutil.rmtree(t, ignore_errors=True)
    df = spark.range(ROWS).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    lake.create_table(df.coalesce(1), t, key_cols=["k"])


def timed(fn):
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main():
    spark = get_spark()
    out = {"rows": ROWS}
    for mode, dv in (("rewrite", False), ("dv", True)):
        t = f"/tmp/zas_dvbench_{mode}"
        build(spark, t)
        out[f"{mode}_file_bytes"] = tree_bytes(t)
        b0 = tree_bytes(t)
        out[f"{mode}_delete_sec"] = round(
            timed(lambda: lake.delete_where(
                spark, t, "k = 123456", deletion_vectors=dv
            )), 3,
        )
        b1 = tree_bytes(t)
        out[f"{mode}_delete_bytes_written"] = b1 - b0
        out[f"{mode}_merge_sec"] = round(
            timed(lambda: lake.merge(
                spark, t,
                spark.range(200).select(
                    (F.col("id") * 9973).alias("k"),
                    F.lit(-1.0).alias("v"),
                    F.lit("upd").alias("pad"),
                ),
                deletion_vectors=dv,
            )), 3,
        )
        b2 = tree_bytes(t)
        out[f"{mode}_merge_bytes_written"] = b2 - b1
        # both modes must land on the same final state
        out[f"{mode}_final_rows"] = lake.read_snapshot(spark, t).count()
        shutil.rmtree(t, ignore_errors=True)
    out["delete_amplification_x"] = round(
        out["rewrite_delete_bytes_written"]
        / max(out["dv_delete_bytes_written"], 1), 1,
    )
    out["merge_amplification_x"] = round(
        out["rewrite_merge_bytes_written"]
        / max(out["dv_merge_bytes_written"], 1), 1,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
