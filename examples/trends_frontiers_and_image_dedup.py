"""Trend analysis + multi-objective shortlists + image dedup tour
(round-7 batch 2/3 surface).

Run: python examples/trends_frontiers_and_image_dedup.py [sf_dir]

1. OLS trend + Theil–Sen robust slope per event type (operators/stats.py)
2. Hourly autocorrelation fingerprint (operators/timeseries.py)
3. Fixed-as-of decayed counters — the feature-store snapshot aggregate
4. Pareto frontier of parts per brand, window strategy (operators/skyline.py)
5. Perceptual aHash fingerprints + Hamming-banded image near-dup pairs
   (operators/multimodal.py)
6. Class rebalancing by deterministic oversampling (operators/splits.py)
7. Calibration bins for a hash-Bernoulli synthetic model (operators/stats.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.operators.multimodal import (  # noqa: E402
    encode_png,
    perceptual_ahash,
)
from zio_analytics_spark.operators.skyline import pareto_frontier  # noqa: E402
from zio_analytics_spark.operators.splits import oversample_balance  # noqa: E402
from zio_analytics_spark.operators.stats import (  # noqa: E402
    calibration_bins,
    ols_simple,
    theil_sen_slope,
)
from zio_analytics_spark.operators.timeseries import (  # noqa: E402
    autocorrelation,
    decayed_sum,
)
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("trends-frontiers-example")

    events = read_table(spark, sf_dir, "events")
    docs = read_table(spark, sf_dir, "documents")
    part = read_table(spark, sf_dir, "part")
    emb = read_table(spark, sf_dir, "embeddings")

    # 1. is event value trending? least-squares vs outlier-robust slope
    base = F.lit("2024-01-01").cast("timestamp")
    days = (F.unix_micros(F.col("ts")) - F.unix_micros(base)) / 86400e6
    xs = events.select("event_type", days.alias("d"), "value")
    ols_simple(xs, "d", "value", ["event_type"]).show()
    daily = events.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", "ts").cast("date"), base.cast("date")).alias("d"),
    ).agg(F.avg("value").alias("v"))
    theil_sen_slope(daily, "d", "v", ["event_type"]).show()

    # 2. seasonality fingerprint: hourly-series ACF at lags 1..3
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.avg("value").alias("v"))
    autocorrelation(hourly, "h", "v", ["event_type"], lags=(1, 2, 3)).orderBy(
        "event_type", "lag"
    ).show(9)

    # 3. decayed counters as of month-end (half-life 7 days)
    decayed_sum(
        events, "ts", "value", as_of="2024-01-31", group_cols=["event_type"]
    ).show()

    # 4. cheapest-vs-largest frontier per brand — no self-join (window plan)
    frontier = pareto_frontier(
        part.select("p_partkey", "p_brand", "p_retailprice", "p_size"),
        minimize=["p_retailprice"],
        maximize=["p_size"],
        block_cols=["p_brand"],
    )
    frontier.orderBy("p_brand", "p_retailprice").show(8)

    # 5. image fingerprints → near-dup pairs between DISTINCT hashes
    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                payloads.append(
                    encode_png(
                        8 * (1 + i % 3),
                        8 * (1 + i % 2),
                        lambda x, y, i=i: (
                            (i + 3 * x + 7 * y) % 256,
                            (2 * i + 5 * x + y) % 256,
                            (i + x + 11 * y) % 256,
                        ),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    hashed = perceptual_ahash(
        docs.select("doc_id").mapInPandas(encode, "doc_id long, payload binary")
    )
    hashed.groupBy("ahash").count().orderBy(F.desc("count")).show(5)

    # 6. oversample embedding classes to the majority count, deterministically
    balanced = oversample_balance(emb.select("vec_id", "label"), "label", on="vec_id")
    balanced.groupBy("label").count().orderBy("label").show()

    # 7. reliability diagram of a perfectly calibrated hash-Bernoulli model
    unit = lambda salt: (  # noqa: E731
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col("vec_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    scored = emb.select(
        unit("cal").alias("s"), (unit("out") < unit("cal")).cast("int").alias("y")
    )
    calibration_bins(scored, "s", "y").orderBy("bin").show()

    spark.stop()


if __name__ == "__main__":
    main()
