"""Golden semantics tests ported from the reference's single example:
windowed word count (/root/reference/src/test/scala/zio/analytics/
WordCountSpec.scala:9-17) — rows (12,'quick'), (15,'quick'), (30,'brown'),
(40,'brown'), tumbling 10 ms windows, counts per (word, window).

Expected (window bounds ``[start, start+10)``; the reference's inclusive
upper ``start+9`` is the same bucket — SURVEY.md §2.2):
    quick → [10, 20): 2
    brown → [30, 40): 1
    brown → [40, 50): 1
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_analytics_spark import DataStream, tumbling

ROWS = [(12, "quick"), (15, "quick"), (30, "brown"), (40, "brown")]


def test_wordcount_batch_numeric_buckets(spark):
    ds = DataStream.from_literals(spark, ROWS, schema="ts_ms long, word string")
    out = (
        ds.group_by("word", win=(F.floor(F.col("ts_ms") / 10) * 10).cast("long"))
        .fold(n=F.count("*"))
        .collect()
    )
    got = {(r.word, r.win): r.n for r in out}
    assert got == {("quick", 10): 2, ("brown", 30): 1, ("brown", 40): 1}


def test_wordcount_time_windows(spark):
    """Same fixture through the real fold_window path (ms → timestamps)."""
    ds = (
        DataStream.from_literals(spark, ROWS, schema="ts_ms long, word string")
        .with_column("ts", F.timestamp_millis(F.col("ts_ms")))
        .assign_timestamps("ts")
        .group_by("word")
        .fold_window(tumbling("10 milliseconds"), n=F.count("*"))
    )
    rows = ds.collect()
    got = {(r.word, r.window_start.microsecond // 1000, r.window_end.microsecond // 1000): r.n for r in rows}
    assert got == {("quick", 10, 20): 2, ("brown", 30, 40): 1, ("brown", 40, 50): 1}


def test_sliding_window_no_reference_bug(spark):
    """The reference's sliding assigner misses windows that start before the
    size-aligned boundary (Window.scala:13-14 — SURVEY.md §2.2). With
    size=10ms step=5ms, ts=12 must land in BOTH [5,15) and [10,20)."""
    from zio_analytics_spark import sliding

    ds = (
        DataStream.from_literals(spark, [(12, "x")], schema="ts_ms long, word string")
        .with_column("ts", F.timestamp_millis(F.col("ts_ms")))
        .assign_timestamps("ts")
        .group_by("word")
        .fold_window(sliding("10 milliseconds", "5 milliseconds"), n=F.count("*"))
    )
    starts = sorted(r.window_start.microsecond // 1000 for r in ds.collect())
    assert starts == [5, 10]  # the reference would emit only [10, 20)
