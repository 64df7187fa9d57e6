"""Per-phase timing of unigram_model (arrow or sql engine) at sf0.1."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402

t_last = [time.perf_counter()]


def lap(label: str) -> None:
    now = time.perf_counter()
    print(f"{label}: {now - t_last[0]:.3f}s", flush=True)
    t_last[0] = now


def main() -> int:
    eng = sys.argv[1] if len(sys.argv) > 1 else "arrow"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure_unigram_phases")
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
    spark.range(1000, numPartitions=4).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    from zio_analytics_spark.tmpdirs import scratch_dir

    spark.range(1000).write.mode("overwrite").parquet(scratch_dir(prefix="zas_warm_"))
    lap("warmups")

    from zio_analytics_spark.operators import unigram as U
    from zio_analytics_spark.tmpdirs import materialize_table

    docs = read_table(spark, sf_dir, "documents")
    vocab = U._word_freqs(docs, "text", U.WORD_PATTERN).localCheckpoint()
    lap("vocab localCheckpoint")

    pieces0, _ = U._seed_pieces(vocab, 3, 64, engine=eng)
    rows = pieces0.collect()
    lap(f"seed pass ({len(rows)} pieces)")

    cur = sorted((r["piece"], int(r["cnt"])) for r in rows)
    alphabet = sorted(p for p, _ in cur if len(p) == 1)
    for rnd in range(2):
        if eng == "arrow":
            lp = {p: int(il) for p, _c, il in U._ilogp_rows(spark, cur)}
            lap(f"round {rnd}: ilogp collect ({len(lp)})")
            counts = (
                U._viterbi_recount_arrow(vocab, lp, 3)
                .groupBy("piece")
                .agg(F.sum("cnt").alias("cnt"))
                .collect()
            )
            lap(f"round {rnd}: recount ({len(counts)} pieces)")
        else:
            cur_df = spark.createDataFrame(cur, "piece string, cnt long")
            counts = (
                U._viterbi_paths(vocab, U._with_ilogp(cur_df), 3)
                .select("freq", F.explode("toks").alias("piece"))
                .groupBy("piece")
                .agg(F.sum("freq").alias("cnt"))
                .collect()
            )
            lap(f"round {rnd}: viterbi+recount ({len(counts)} pieces)")
        cmap = {r["piece"]: int(r["cnt"]) for r in counts}
        cur = sorted(
            [(p, c) for p, c in cmap.items() if len(p) > 1]
            + [(ch, max(cmap.get(ch, 0), 1)) for ch in alphabet]
        )
    if eng == "arrow":
        scored = U._ilogp_rows(spark, cur)
        pieces = U._pieces_df(spark, scored)
        lap("final pieces local frame")
        lp = {p: int(il) for p, _c, il in scored}
        seg_df = U._viterbi_paths_arrow(vocab, lp, 3).select("word", "toks")
    else:
        pieces = materialize_table(
            U._with_ilogp(spark.createDataFrame(cur, "piece string, cnt long")),
            prefix="zas_unigram_",
        )
        lap("final pieces materialize")
        seg_df = U._viterbi_paths(vocab, pieces, 3).select("word", "toks")
    seg = materialize_table(seg_df, prefix="zas_unigram_seg_")
    lap(f"seg materialize ({seg.count()} words)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
