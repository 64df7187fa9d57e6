"""Hybrid retrieval stack over the documents/embeddings tables: BM25
keyword scores ⊕ vector cosine top-k fused with Reciprocal Rank Fusion,
plus the storage path (int8-quantized vectors, k-means cells) a 100 TB
deployment would layer underneath.

    python examples/hybrid_retrieval.py [sf_dir] [query_terms...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zio_analytics_spark import get_spark
from zio_analytics_spark.operators import similarity
from zio_analytics_spark.operators.clustering import kmeans_assign
from zio_analytics_spark.operators.text import bm25_scores
from zio_analytics_spark.sources.parquet import read_table


def main(sf_dir: str, terms: list[str]) -> None:
    spark = get_spark("example_hybrid_retrieval")
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")

    # --- keyword side: BM25, corpus never shuffles -----------------------
    kw100 = (
        bm25_scores(docs, terms)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(100)
        .select(
            "doc_id",
            F.row_number().over(W.orderBy(F.col("bm25").desc(), "doc_id")).alias("kw_rank"),
        )
    )

    # --- vector side: cosine top-k against a query vector ----------------
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    vs100 = (
        similarity.brute_force_topk(emb.where(F.col("vec_id") != 0), qv, k=100)
        .select(
            "vec_id",
            F.row_number().over(W.orderBy(F.col("sim").desc(), "vec_id")).alias("vec_rank"),
        )
    )

    # --- reciprocal rank fusion (k = 60) ---------------------------------
    fused = (
        kw100.join(vs100, kw100.doc_id == vs100.vec_id, "full_outer")
        .select(
            F.coalesce(kw100.doc_id, vs100.vec_id).alias("doc_id"),
            (
                F.coalesce(1.0 / (F.lit(60) + F.col("kw_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(60) + F.col("vec_rank")), F.lit(0.0))
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
    )
    print("top-10 fused:")
    for r in fused.collect():
        print(f"  doc {r.doc_id}: rrf={r.rrf:.5f}")

    # --- the storage layer a large corpus adds under this ----------------
    # int8 codes: 4x fewer vector bytes per ANN sweep
    codes = similarity.quantize_int8(emb, dim=64)
    # k-means cells: the IVF partition layout (prune to probed cells)
    cells = kmeans_assign(emb, k=10, n_iter=3, dim=64)
    summary = cells.groupBy("cluster").count().orderBy("cluster")
    print("k-means cell sizes:", [(r.cluster, r["count"]) for r in summary.collect()])
    print("quantized rows:", codes.count())
    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(sf, sys.argv[2:] or ["join", "hash"])
