"""Model-eval + training-pair generation tour (round-7 surface).

Run: python examples/eval_and_pair_generation.py [sf_dir]

1. ROC-AUC via the distributed Mann–Whitney rank sum (operators/stats.py)
2. Trailing 7-day distinct users from OR-mergeable day bitmaps
   (operators/sketch.py)
3. Deterministic contrastive negatives via md5-ring rotations
   (operators/pairs.py)
4. Apriori level-3 frequent brand triples (operators/basket.py)
5. k-hop BFS over the customer–supplier purchase graph
   (operators/graph.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zio_analytics_spark.operators.basket import frequent_triples  # noqa: E402
from zio_analytics_spark.operators.graph import bfs_distances  # noqa: E402
from zio_analytics_spark.operators.pairs import contrastive_negatives  # noqa: E402
from zio_analytics_spark.operators.sketch import sliding_distinct  # noqa: E402
from zio_analytics_spark.operators.stats import auc_roc, hash_cohort  # noqa: E402
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("eval-pairs-example")

    events = read_table(spark, sf_dir, "events")
    docs = read_table(spark, sf_dir, "documents")
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    part = read_table(spark, sf_dir, "part")

    # 1. does event value predict purchases? AUC per cohort arm
    scored = events.select(
        hash_cohort(F.col("user_id")).cast("long").alias("arm"),
        "value",
        (F.col("event_type") == "purchase").alias("lab"),
    )
    auc_roc(scored, "value", "lab", ["arm"]).show()

    # 2. trailing 7-day distinct users, incremental via day bitmaps
    sliding_distinct(events, "ts", "user_id", window_days=7).orderBy("day").show(10)

    # 3. contrastive negatives: 2 reproducible negatives per document
    contrastive_negatives(docs, "doc_id", k=2).show(6)

    # 4. frequent brand triples (Apriori level 3)
    baskets = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        F.col("l_orderkey").alias("bk"), F.col("p_brand").alias("item")
    )
    frequent_triples(baskets, "bk", "item", min_support=0.004).orderBy(
        F.desc("triple_count")
    ).show(5)

    # 5. purchase-graph reach from one customer
    edges = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    src = spark.createDataFrame([("c1",)], "node string")
    bfs_distances(edges, src, max_hops=3).groupBy("dist").count().orderBy("dist").show()

    spark.stop()


if __name__ == "__main__":
    main()
