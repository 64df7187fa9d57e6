"""Assemble a training MIX from a cleaned corpus — the round-4 operator
tour: redact → normalize → dedup → rebalance sources → cut a token budget →
assign contiguous sample ids → pack sequences → write Z-ordered shards.

    python examples/training_mix.py [sf_dir] [out_dir]

Every step is a deterministic, shuffle-disciplined DataFrame transform;
re-running the pipeline on a grown corpus changes membership only where
the hash rules say it must (mixing/budget evictions), never by RNG.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from zio_analytics_spark import get_spark
from zio_analytics_spark.operators import cleaning, dedup, text
from zio_analytics_spark.operators.layout import assign_contiguous_ids, zorder_write
from zio_analytics_spark.sources.parquet import read_table


def main(sf_dir: str, out_dir: str) -> None:
    spark = get_spark("example_training_mix")
    docs = read_table(spark, sf_dir, "documents")

    # 1. PII out, canonical text form (one codegen'd projection)
    red = cleaning.redact_pii(docs, "text")
    norm = cleaning.normalize_text(red, "redacted", out_col="text_norm").select(
        "doc_id", "lang", "source", F.col("text_norm").alias("text")
    )

    # 2. exact dedup on the NORMALIZED form (case/spacing variants collapse)
    keep = norm.groupBy(F.sha2("text", 256)).agg(F.min("doc_id").alias("doc_id"))
    deduped = norm.join(keep, "doc_id", "left_semi")

    # 3. rebalance: full English, thinner tails (hash-acceptance, map-side)
    mixed = cleaning.mix_sources(
        deduped,
        rates={"en": 1.0, "de": 0.6, "es": 0.6, "fr": 0.4, "zh": 0.4},
        strat_col="lang",
        id_cols=["doc_id"],
        seed="mix-v1",
    )

    # 4. cut a fixed token budget per language (greedy hash-order prefix)
    budget = text.token_budget_select(mixed, budget=50_000, group_col="lang")
    sample = mixed.join(budget.select("doc_id"), "doc_id", "left_semi")

    # 5. contiguous 0..N-1 sample ids in content-hash order (no global sort)
    order = F.conv(F.substring(F.md5(F.concat_ws("|", F.lit("ids"), "doc_id")), 1, 15), 16, 10).cast("long")
    with_ids = assign_contiguous_ids(sample, order, tiebreak=["doc_id"])

    # 6. pack into fixed-size training sequences per language
    with_counts = with_ids.withColumn(
        "n_tokens", F.size(text.tokens("text")).cast("long")
    )
    packed = text.pack_sequences(
        with_counts, max_len=512, order_by="seq_id", partition_by=("lang",)
    )

    # 7. Z-ordered shards: (lang-bucket, seq-bucket) locality for readers
    final = with_ids.select(
        "doc_id", "lang", "source", "seq_id", "text",
        F.pmod(F.xxhash64("lang"), F.lit(64)).alias("lb"),
        F.pmod(F.col("seq_id"), F.lit(256)).alias("sb"),
    )
    zorder_write(final, out_dir, cols=["lb", "sb"], bits=8, n_files=8)

    kept = spark.read.parquet(out_dir)
    print(f"docs in -> {docs.count()}, mix out -> {kept.count()}")
    print("packs:", packed.count())


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="zas_mix_")
    main(sf, out)
