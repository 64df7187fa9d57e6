"""End-to-end LLM training-data pipeline over the documents/embeddings
tables: quality filter → exact dedup → near-dup removal (MinHash LSH) →
language id + token stats → partitioned parquet out.

    python examples/llm_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from zio_analytics_spark import get_spark
from zio_analytics_spark.operators import dedup, text
from zio_analytics_spark.sinks import write_parquet
from zio_analytics_spark.sources.parquet import read_table


def main(sf_dir: str, out_dir: str) -> None:
    spark = get_spark("example_llm_pipeline")
    docs = read_table(spark, sf_dir, "documents")

    # 1. quality signals + filter (all Column expressions, one scan)
    quality = text.quality_stats(docs).where(
        (F.col("n_tokens") >= 20) & (F.col("stopword_ratio") < 0.5)
    )
    docs_q = docs.join(quality.select("doc_id"), "doc_id", "left_semi")

    # 1b. TRAINED quality model (round-8): learn a logistic classifier on
    #     cheap signals from a labeled seed, score the corpus in one fused
    #     expression — the fastText/FineWeb-Edu-style stage
    from zio_analytics_spark.operators.classify import logreg_score, logreg_train

    feats = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("label"),
        (F.length("text") / 1000.0).alias("x1"),
        ((F.length("text") - F.length(F.regexp_replace("text", " ", ""))) / 100.0).alias("x2"),
    )
    trained = logreg_train(feats, ["x1", "x2"], n_iters=4).collect()
    last = max(r["iter"] for r in trained)
    w = [r["w"] for r in sorted(trained, key=lambda r: r["j"]) if r["iter"] == last]
    print("== learned quality weights (bias, len, spaces) ==", [round(x, 4) for x in w])
    logreg_score(feats, w, ["x1", "x2"]).orderBy(F.desc("score")).show(3)

    # 2. exact dedup: keep the smallest doc_id per identical content
    keepers = docs_q.groupBy(F.sha2("text", 256)).agg(F.min("doc_id").alias("doc_id"))
    docs_e = docs_q.join(keepers, "doc_id", "left_semi")

    # 3. near-dup removal: MinHash-LSH candidates, exact-Jaccard verified;
    #    drop the higher doc_id of each surviving pair
    near = dedup.minhash_lsh_pairs(docs_e, threshold=0.7)
    docs_n = docs_e.join(near.select(F.col("doc_b").alias("doc_id")), "doc_id", "left_anti")

    # 3b. SEMANTIC dedup (round-8, SemDeDup): k-means cells block the
    #     embedding-cosine pair search — never an all-pairs join
    from zio_analytics_spark.operators.clustering import kmeans_assign

    emb = read_table(spark, sf_dir, "embeddings")
    cells = kmeans_assign(emb, "embedding", "vec_id", k=10, n_iter=2, dim=64)
    sem = dedup.embedding_dup_pairs(
        emb.select("vec_id", "embedding").join(cells, "vec_id"),
        block_cols=["cluster"], threshold=0.2,
    )
    print(f"semantic near-dup pairs (within k-means cells): {sem.count()}")

    # 4. enrich: language id + token stats
    enriched = (
        docs_n.join(text.language_id(docs_n), "doc_id")
        .join(text.token_stats(docs_n), "doc_id")
        .select("doc_id", "source", "guessed_lang", "n_tokens", "n_unique", "text")
    )

    # 5. partitioned parquet out (prunes by source downstream)
    write_parquet(enriched, out_dir, partition_by=["source"])

    kept = spark.read.parquet(out_dir)
    print(f"input docs: {docs.count()}, cleaned docs: {kept.count()}")
    kept.groupBy("guessed_lang").count().show()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="llm_out_") + "/docs"
    main(sf, out)
