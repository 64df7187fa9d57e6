"""Forecasting + survival + table-ops tour (round-7 session-2 surface).

Run: python examples/forecasting_and_ops.py [sf_dir]

1. Holt level+trend smoothing per user, one-step forecasts vs EWMA lag
   (operators/timeseries.py)
2. Kaplan–Meier time-to-purchase curve with censoring + Nelson–Aalen
   hazard (operators/stats.py)
3. Log-rank test across md5 cohort arms — the splitter health check
4. Small-files compaction plan over the documents "files"
   (operators/layout.py)
5. Sorted-neighborhood linkage candidates by account balance
   (operators/linkage.py)
6. Poisson-bootstrap CI for the mean (operators/stats.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.operators.layout import plan_compaction  # noqa: E402
from zio_analytics_spark.operators.linkage import sorted_neighborhood_pairs  # noqa: E402
from zio_analytics_spark.operators.stats import (  # noqa: E402
    bootstrap_mean_ci,
    hash_cohort,
    kaplan_meier,
    logrank_test,
)
from zio_analytics_spark.operators.timeseries import holt  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("forecasting-ops-example")
    events = read_table(spark, sf_dir, "events")

    # 1. Holt smoothing: level + trend per user; forecast = level + trend
    sm = holt(
        events.select("user_id", "event_id", "ts", "value"),
        "value", order_by=["ts", "event_id"], partition_by=["user_id"], n_buckets=16,
    )
    (
        sm.groupBy("user_id")
        .agg(F.max_by("level", "event_id").alias("level"), F.max_by("trend", "event_id").alias("trend"))
        .withColumn("one_step_forecast", F.col("level") + F.col("trend"))
        .orderBy("user_id")
        .show(5)
    )

    # 1b. Holt-Winters (round-8): the seasonal completion — level + trend
    #     + m-periodic seasonal indices; forecast adds the next index
    from zio_analytics_spark.operators.timeseries import holt_winters

    hw = holt_winters(
        events.select("user_id", "event_id", "ts", "value"),
        "value", order_by=["ts", "event_id"], partition_by=["user_id"],
        season_length=4, n_buckets=16,
    )
    hw.orderBy("user_id", "event_id").show(5)

    # 2-3. survival: hours-of-activity until first purchase, censored else
    subj = events.groupBy("user_id").agg(
        ((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / F.lit(3_600_000_000))
        .cast("long")
        .alias("t"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("ev"),
    )
    kaplan_meier(subj, "t", "ev").orderBy("t").show(8)
    arms = subj.withColumn("arm", hash_cohort(F.col("user_id")))
    logrank_test(arms, "t", "ev", "arm").show()

    # 3b. Poisson-bootstrap CI for the mean event value: 40 resample means
    # from ONE scan (per-row hash Poisson weights - no global resampling)
    bootstrap_mean_ci(events, "value", "event_id").show()

    # 4. compaction plan: bin document "files" at 8 KiB of cumulative size
    files = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("file_id"), F.length("text").cast("long").alias("bytes")
    )
    plan = plan_compaction(files, target_bytes=8192)
    plan.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_files"), F.sum("bytes").alias("bin_bytes")
    ).orderBy("bin").show(6)

    # 5. linkage candidates: near-identical account balances
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_acctbal").alias("bal")
    )
    sorted_neighborhood_pairs(cust, "bal", "id", window=2).where(
        F.abs(F.col("b_key") - F.col("a_key")) < 1.0
    ).orderBy("a_id").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
