"""The oracle-checked streaming catalog entries must be batch-equivalent:
complete output mode on a bounded stream = the same aggregation run in batch.
Guards the streaming runtime path against regressions without needing DuckDB."""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_analytics_spark.catalog import CATALOG
from zio_analytics_spark.sources.parquet import read_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    streamed = CATALOG["streaming_window_counts"].fn(spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("window"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )
    assert _rows(streamed) == _rows(batch)


def test_streaming_sliding_equals_batch(spark, sf_dir):
    streamed = CATALOG["streaming_sliding_counts"].fn(spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("window"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
    assert _rows(streamed) == _rows(batch)


def test_streaming_static_enrich_row_shape(spark, sf_dir):
    out = CATALOG["streaming_static_enrich"].fn(spark, sf_dir)
    rows = out.collect()
    # one row per user that has orders; all enrichment columns non-null
    assert len(rows) > 0
    assert all(r["n_orders"] is not None and r["lifetime_value"] is not None for r in rows)
    assert len({r["user_id"] for r in rows}) == len(rows)
