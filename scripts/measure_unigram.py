"""A/B the unigram Viterbi engines in ONE session (same-load comparison):
first-shot unigram_model cost per engine, phases labelled. Usage:
  python scripts/measure_unigram.py [sql-first|arrow-first]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def main() -> int:
    order = sys.argv[1] if len(sys.argv) > 1 else "sql-first"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure_unigram")
    # bench.py-equivalent warmups (session costs, not query costs)
    import pandas as pd
    from pyspark.sql import functions as F

    spark.range(1000).selectExpr("sum(id)").collect()
    read_table(spark, sf_dir, "region").collect()

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(100_000, numPartitions=32).select(_warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()
    # warm mapInPandas too (separate eval path from pandas_udf)
    spark.range(1000, numPartitions=4).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    from zio_analytics_spark.operators.unigram import unigram_model

    docs = read_table(spark, sf_dir, "documents")
    engines = ["sql", "arrow"] if order == "sql-first" else ["arrow", "sql"]
    for eng in engines:
        spark.sparkContext.setJobDescription(f"unigram_model[{eng}]")
        t0 = time.perf_counter()
        pieces, seg = unigram_model(docs, n_iters=2, max_piece_len=3, top_k=64,
                                    engine=eng)
        n = pieces.count() + seg.count()
        dt = time.perf_counter() - t0
        print(f"unigram_model[{eng}]: {dt:.3f}s  ({n} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
