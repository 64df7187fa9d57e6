"""Record-linkage tour (round-8 surface): the full classic pipeline —
candidate BLOCKING, Fellegi-Sunter parameter estimation by EM, and
log-likelihood-ratio scoring into link / possible / non-link decisions.

Run: python examples/record_linkage.py [sf_dir]

1. Blocking, two complementary families (never a cross join):
   - SymSpell deletion neighborhoods → all name pairs within edit
     distance 1 (operators/linkage.py fuzzy_pairs_symspell)
   - sorted-neighborhood on account balance → pairs within 3 rank
     positions (sorted_neighborhood_pairs)
2. Agreement vectors over the balance-blocked pairs: same nation, same
   market segment, balance within 50.
3. Fellegi-Sunter EM (3 deterministic rounds): match proportion p and
   per-field m/u rates — no labels needed, the mixture separates itself.
4. LLR scoring + thresholding into link / possible / non-link.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from zio_analytics_spark import get_spark
from zio_analytics_spark.operators.linkage import (
    fellegi_sunter_em,
    fellegi_sunter_score,
    fuzzy_pairs_symspell,
    sorted_neighborhood_pairs,
)
from zio_analytics_spark.sources.parquet import read_table


def main(sf_dir: str) -> None:
    spark = get_spark("example_record_linkage")
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
    )

    print("== blocking 1: SymSpell edit-distance-1 name pairs ==")
    fuzzy_pairs_symspell(cust, "name", "id", max_edit=1).show(5)

    print("== blocking 2: sorted-neighborhood on balance (window 3) ==")
    pairs = sorted_neighborhood_pairs(cust.select("id", "bal"), "bal", "id", window=3)
    pairs.show(5)

    # agreement vectors on the blocked candidates
    a = cust.select(F.col("id").alias("a_id"), F.col("nat").alias("a_nat"),
                    F.col("seg").alias("a_seg"))
    b = cust.select(F.col("id").alias("b_id"), F.col("nat").alias("b_nat"),
                    F.col("seg").alias("b_seg"))
    g = (
        pairs.join(a, "a_id").join(b, "b_id")
        .select(
            "a_id", "b_id",
            F.when(F.col("a_nat") == F.col("b_nat"), 1.0).otherwise(0.0).alias("g1"),
            F.when(F.col("a_seg") == F.col("b_seg"), 1.0).otherwise(0.0).alias("g2"),
            F.when(F.abs(F.col("b_key") - F.col("a_key")) < 50.0, 1.0)
            .otherwise(0.0).alias("g3"),
        )
    )

    print("== Fellegi-Sunter EM (3 rounds, unsupervised) ==")
    est = fellegi_sunter_em(g, ["g1", "g2", "g3"], n_iters=3)
    est.orderBy("iter", "param", "j").show(21)

    rows = est.collect()
    last = max(r["iter"] for r in rows)
    m = [r["value"] for r in sorted(rows, key=lambda r: r["j"])
         if r["iter"] == last and r["param"] == "m"]
    u = [r["value"] for r in sorted(rows, key=lambda r: r["j"])
         if r["iter"] == last and r["param"] == "u"]

    print("== LLR scores -> link / possible / non-link ==")
    scored = fellegi_sunter_score(g, ["g1", "g2", "g3"], m, u)
    decided = scored.withColumn(
        "decision",
        F.when(F.col("score") >= 2.0, "link")
        .when(F.col("score") >= 0.0, "possible")
        .otherwise("non-link"),
    )
    decided.groupBy("decision").count().orderBy("decision").show()
    decided.orderBy(F.desc("score")).show(5)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
