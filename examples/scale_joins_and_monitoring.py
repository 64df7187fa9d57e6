"""Round-7 additions tour: scale-safe joins + pipeline monitoring.

Run: python examples/scale_joins_and_monitoring.py [sf_dir]

Four operators that exist because their textbook formulations hit scale
cliffs, plus the experiment readout that never collects raw rows:

1. Bloom pre-filter join (operators/bloom.py) — drop non-matching fact
   rows at the scan, before the shuffle.
2. Interval overlap join (operators/intervals.py) — grid cells +
   reference-point dedup instead of a per-block cartesian.
3. ExactSubstr dedup (operators/dedup.py) — Lee et al.'s suffix-array
   criterion as diagonal gram-hash runs.
4. Association rules (operators/basket.py) — Apriori-pruned within-basket
   pair mining.
5. CUSUM drift detection + Welch/chi-square A/B readout
   (operators/timeseries.py, operators/stats.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.operators.basket import association_rules  # noqa: E402
from zio_analytics_spark.operators.bloom import bloom_prefilter_join  # noqa: E402
from zio_analytics_spark.operators.dedup import substring_span_pairs  # noqa: E402
from zio_analytics_spark.operators.intervals import interval_overlap_pairs  # noqa: E402
from zio_analytics_spark.operators.stats import hash_cohort, welch_ttest  # noqa: E402
from zio_analytics_spark.operators.timeseries import cusum  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("scale-joins-example")

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    part = read_table(spark, sf_dir, "part")
    events = read_table(spark, sf_dir, "events")
    docs = read_table(spark, sf_dir, "documents")

    # 1. Bloom pre-filter: urgent big orders -> 8 KiB filter -> fact scan
    urgent = orders.where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000)
    ).select("o_orderkey")
    joined = bloom_prefilter_join(li, urgent, "l_orderkey", "o_orderkey")
    print("bloom-prefiltered join rows:", joined.count())

    # 2. Interval overlap: shipments per supplier with intersecting windows
    epoch = F.lit("1970-01-01").cast("date")
    iv = li.select(
        F.col("l_suppkey").alias("suppkey"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("iid"),
        F.datediff(F.col("l_shipdate").cast("date"), epoch).cast("long").alias("s"),
        (
            F.datediff(F.col("l_shipdate").cast("date"), epoch).cast("long")
            + F.col("l_linenumber")
        ).alias("e"),
    )
    overlaps = interval_overlap_pairs(iv, "iid", "s", "e", ["suppkey"], cell_width=8)
    print("overlapping shipment pairs:", overlaps.count())

    # 3. ExactSubstr: verbatim shared runs of >= 50 chars between documents
    spans = substring_span_pairs(docs, gram_len=25, min_len=50)
    spans.orderBy(F.desc("max_span")).show(5, truncate=False)

    # 4. Association rules over brand baskets
    baskets = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        F.col("l_orderkey").alias("bk"), F.col("p_brand").alias("item")
    )
    rules = association_rules(baskets, "bk", "item", min_support=0.02, min_confidence=0.1)
    rules.orderBy(F.desc("lift")).show(5)

    # 5. Monitoring: CUSUM drift per user + Welch A/B readout per event type
    drift = cusum(
        events, "value", ["ts", "event_id"], ["user_id"],
        target=50.0, slack=10.0, threshold=200.0,
    )
    print("alarmed events:", drift.where("alarm").count())
    welch_ttest(events, ["event_type"], "value", hash_cohort(F.col("user_id"))).show()

    spark.stop()


if __name__ == "__main__":
    main()
