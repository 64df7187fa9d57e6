"""Round-6/7 surface tour: the newer ingest + windowing + splitting
operators in one composite pipeline —

1. native XML round-trip (Spark 4's merged spark-xml source, explicit
   schema: inference is a full extra parse pass you never pay at scale);
2. binaryFile multimodal ingest (a directory of PNGs → (path, content)
   rows → real PNG decode via the Arrow mapInPandas seam);
3. dynamic-gap session windows (per-EVENT gap column: error events hold
   the session open 30 min, everything else 2 h);
4. stratified exact-quota dataset splits (every language hits its
   train/val/test fractions exactly — with a tiebreak column for
   duplicate-text corpora).

    python examples/sources_and_sessions.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from zio_analytics_spark import get_spark
from zio_analytics_spark.operators.multimodal import decode_pixel_stats, encode_png
from zio_analytics_spark.operators.splits import stratified_exact_split
from zio_analytics_spark.sources.parquet import read_table
from zio_analytics_spark.tmpdirs import scratch_dir


def main(sf_dir: str) -> None:
    spark = get_spark("example_sources_and_sessions")

    # --- 1. XML round-trip ----------------------------------------------
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    xml_dir = scratch_dir(prefix="zas_ex_xml_")
    orders.write.mode("overwrite").format("xml").option("rowTag", "order").save(xml_dir)
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema("o_orderkey long, o_orderpriority string, o_totalprice double")
        .load(xml_dir)
    )
    print("== XML round-trip: revenue by priority ==")
    back.groupBy("o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total")
    ).orderBy("o_orderpriority").show()

    # --- 2. binaryFile ingest + PNG decode ------------------------------
    png_dir = scratch_dir(prefix="zas_ex_png_")
    for i in range(8):
        def px(x, y, i=i):
            return ((i + 3 * x + 7 * y) % 256, (2 * i + 5 * x + y) % 256, (i + x + 11 * y) % 256)

        with open(os.path.join(png_dir, f"{i}.png"), "wb") as fh:
            fh.write(encode_png(4 + i % 5, 5 + i % 3, px))
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(png_dir)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.png$", 1).cast("long").alias("img_id"),
            "content",
        )
    )
    print("== binaryFile ingest -> PNG decode (pixel stats) ==")
    decode_pixel_stats(files, bin_col="content", id_col="img_id").orderBy(
        "img_id"
    ).show(8)

    # --- 3. dynamic-gap session windows ---------------------------------
    ev = read_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "error", F.make_interval(mins=F.lit(30))
    ).otherwise(F.make_interval(hours=F.lit(2)))
    sessions = ev.groupBy(
        F.session_window(F.col("ts"), gap).alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    print("== dynamic-gap sessions (error => 30 min, else 2 h) ==")
    sessions.select("user_id", "w.start", "w.end", "n_events").orderBy(
        F.desc("n_events")
    ).show(5)

    # --- 4. stratified exact-quota splits -------------------------------
    docs = read_table(spark, sf_dir, "documents")
    split = stratified_exact_split(
        docs,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        on="text",
        strata=["lang"],
        tiebreak="doc_id",  # duplicate texts get a total order (round-7)
    )
    print("== exact per-language split quotas ==")
    split.groupBy("lang", "split").count().orderBy("lang", "split").show(12)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
