from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators.timeseries import cascade_rollup


def _events(spark):
    rows = [
        ("2024-01-01 00:05:00", "a", 1.0),
        ("2024-01-01 00:45:00", "a", 2.0),
        ("2024-01-01 01:05:00", "a", 4.0),
        ("2024-01-01 03:05:00", "b", 8.0),
        ("2024-01-02 00:05:00", "a", 16.0),
    ]
    return spark.createDataFrame(rows, "ts_s string, k string, v double").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "k", "v"
    )


def test_cascade_levels_match_direct_aggregation(spark):
    ev = _events(spark)
    levels = cascade_rollup(
        ev, "ts", ["k"],
        measures={"n": ("count", "v"), "total": ("sum", "v"), "vmax": ("max", "v")},
        levels=["1 hour", "1 day"],
    )
    hour = {(r.bucket_start.isoformat(), r.k): (r.n, r.total) for r in levels["1 hour"].collect()}
    assert hour[("2024-01-01T00:00:00", "a")] == (2, 3.0)
    assert hour[("2024-01-01T01:00:00", "a")] == (1, 4.0)

    # day level (derived from hour) == direct day aggregation over raw
    direct = {
        (r.d.isoformat(), r.k): (r.n, r.total, r.vmax)
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("d"), "k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("total"), F.max("v").alias("vmax"))
        .collect()
    }
    derived = {
        (r.bucket_start.isoformat(), r.k): (r.n, r.total, r.vmax)
        for r in levels["1 day"].collect()
    }
    assert derived == direct


def test_cascade_rejects_non_reaggregable(spark):
    with pytest.raises(ValueError, match="not re-aggregable"):
        cascade_rollup(_events(spark), "ts", ["k"], {"a": ("avg", "v")}, ["1 hour"])
