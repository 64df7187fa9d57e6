"""Versioned lake table tour (round-13 surface).

Run: python examples/lake_table_tour.py [sf_dir]

The mutable-corpus lifecycle on the transaction-logged table
(sources/laketable.py — no Delta/Iceberg jar needed; the protocol is
vendored in pure Python over plain parquet):

1. CREATE: an orders slice becomes version 0 — range-partitioned so
   every data file carries tight key-range stats.
2. MERGE: a small changeset upserts against the live snapshot; the
   per-file stats prune the rewrite to the files whose key range the
   changeset touches (watch the survivor count).
3. Time travel + CDF: version 0 is still readable after the merge, and
   table_changes() yields the delete/insert decomposition between the
   two versions.
4. Exactly-once streaming ingest: micro-batches land through
   append_stream_batch (batch id in commitInfo — a replay is detected
   in the log and skipped).
5. COMPACT + VACUUM: small files rewrite into clustered ones (stats
   disjoint again), then retention reclaims everything no retained
   snapshot references.

Also: the Avro leg — the same slice round-trips through the pure-Python
split-aware Avro OCF source/sink (sources/avro.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources import laketable as lake  # noqa: E402
from zio_analytics_spark.sources.avro import (  # noqa: E402
    register_avro_sink,
    register_avro_source,
)
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402
from zio_analytics_spark.tmpdirs import scratch_dir  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lake-table-tour")

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )

    # 1. CREATE — version 0, range-partitioned for tight per-file stats
    table = scratch_dir(prefix="zas_tour_lake_")
    lake.create_table(
        orders.repartitionByRange(8, "o_orderkey"), table, key_cols=["o_orderkey"]
    )
    print(f"v0: {lake.read_snapshot(spark, table).count()} rows, "
          f"{len(lake.snapshot(table).files)} files")

    # 2. MERGE — stats-pruned rewrite
    before = set(lake.snapshot(table).files)
    # a NARROW changeset (one key range) — the point of per-file stats:
    # only the file(s) covering these keys rewrite
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    changes = orders.where(F.col("o_orderkey") <= lo + 100).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000
    )
    lake.merge(spark, table, changes)
    survivors = before & set(lake.snapshot(table).files)
    print(f"v1 MERGE: {len(before) - len(survivors)} files rewritten, "
          f"{len(survivors)} survived by reference")

    # 3. Time travel + change data feed
    v0_total = lake.read_snapshot(spark, table, version=0).agg(
        F.round(F.sum("o_totalprice"), 2)
    ).first()[0]
    v1_total = lake.read_snapshot(spark, table).agg(
        F.round(F.sum("o_totalprice"), 2)
    ).first()[0]
    print(f"time travel: v0 total {v0_total}, v1 total {v1_total}")
    cdf = lake.table_changes(spark, table, from_version=0, to_version=1)
    print("CDF rows by type:",
          {r["_change_type"]: r["n"]
           for r in cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()})

    # 4. Exactly-once streaming ingest (simulated replay)
    batch = spark.createDataFrame(
        [(10_000_001, "5-LOW", 1.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    print("stream batch 42 first delivery -> version",
          lake.append_stream_batch(batch, table, batch_id=42))
    print("stream batch 42 REPLAY ->",
          lake.append_stream_batch(batch, table, batch_id=42), "(skipped)")

    # 4b. Round-16 surface: UPDATE, deletion vectors, rename/drop
    files_before = set(lake.snapshot(table).files)
    lake.update_where(  # DV mode: zero rewrites — vector + one new file
        spark, table, "o_orderpriority = '1-URGENT'",
        {"o_totalprice": "round(o_totalprice * 1.01, 2)"},
        deletion_vectors=True,
    )
    print("DV UPDATE rewrote",
          len(files_before - set(lake.snapshot(table).files)), "files "
          "(deletion vectors: matched rows masked, not rewritten)")
    lake.delete_where(spark, table, "o_orderkey % 97 = 0",
                      deletion_vectors=True)
    print("DV DELETE live rows:", lake.read_snapshot(spark, table).count())
    lake.rename_column(table, "o_totalprice", "price")  # metadata-only
    lake.drop_column(table, "o_orderpriority")          # tombstoned
    print("after rename/drop:", lake.read_snapshot(spark, table).columns,
          "| v0 still:",
          lake.read_snapshot(spark, table, version=0).columns)

    # 5. COMPACT (clustered; layout='zorder' for multi-key tables) +
    #    VACUUM (retention janitor). Compact also MATERIALIZES the
    #    deletion vectors back into clean files.
    lake.compact(spark, table, target_files=4)
    print(f"after compact: {len(lake.snapshot(table).files)} files")
    reclaimed = lake.vacuum(table, keep_versions=1, min_age_seconds=0)
    print(f"vacuum reclaimed {len(reclaimed)} dereferenced files; live rows:",
          lake.read_snapshot(spark, table).count())

    # Avro leg: the same slice through the pure-Python OCF source/sink
    register_avro_source(spark)
    register_avro_sink(spark)
    avro_dir = scratch_dir(prefix="zas_tour_avro_")
    orders.limit(1000).coalesce(1).write.format("avro_sink").option(
        "path", avro_dir
    ).option("rows_per_block", "100").mode("overwrite").save()
    back = (
        spark.read.format("avro_py")
        .option("path", avro_dir)
        .option("split_target_bytes", str(4 * 1024))
        .load()
    )
    print(f"avro roundtrip: {back.count()} rows across "
          f"{back.rdd.getNumPartitions()} byte-range splits")

    spark.stop()


if __name__ == "__main__":
    main()
