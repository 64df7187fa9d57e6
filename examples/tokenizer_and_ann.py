"""Round-6 surface tour: train a BPE tokenizer from the corpus, segment
every document with it, then compress the embedding table with IVF-PQ and
run a probed ADC nearest-neighbor search — the tokenizer-construction and
vector-index workloads of a training-data pipeline, end to end.

    python examples/tokenizer_and_ann.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zio_analytics_spark import get_spark
from zio_analytics_spark.operators.bpe import bpe_segment, bpe_train
from zio_analytics_spark.operators.pq import ivfpq_fit_encode, ivfpq_search
from zio_analytics_spark.sources.parquet import read_table


def main(sf_dir: str) -> None:
    spark = get_spark("example_tokenizer_and_ann")
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")

    # --- tokenizer: learn merges from the corpus, then apply them --------
    # One corpus scan builds the Zipf-bounded (word, freq) vocab; each
    # merge iteration is a pair-count aggregate + a one-row argmax.
    print("== learned BPE merges ==")
    bpe_train(docs, n_merges=8).show(truncate=False)
    # Apply side: the segmented vocab broadcasts into ONE corpus pass.
    print("== per-document subword counts (sample) ==")
    bpe_segment(docs, n_merges=8).orderBy("doc_id").show(5)

    # --- unigram-LM (SentencePiece-style), the second tokenizer family --
    # Top-down: seed a substring candidate vocab, hard-EM prunes it; the
    # Viterbi DP is integer fixed-point so training is fully deterministic.
    from zio_analytics_spark.operators.unigram import unigram_tokenize, unigram_train

    print("== unigram-LM piece vocabulary (top by count) ==")
    unigram_train(docs, n_iters=2, max_piece_len=3, top_k=64).orderBy(
        "cnt", ascending=False
    ).show(12, truncate=False)
    print("== per-document piece sequences (sample) ==")
    unigram_tokenize(docs, n_iters=2, max_piece_len=3, top_k=64).orderBy(
        "doc_id"
    ).show(3, truncate=80)

    # --- ANN: coarse cells + residual PQ codes + probed ADC search -------
    # 64-dim float vectors become (cell, 4 codes): 64x smaller; search
    # probes 2 of 8 cells and scores via lookup tables, no decompression.
    # fit_encode shares ONE coarse-assignment pass between training and
    # encoding (the materialized residual table).
    coarse, codebooks, encoded = ivfpq_fit_encode(emb, n_cells=8, m=4, k=16, n_iter=2)
    query = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    print("== IVF-PQ top-10 for the first vector's query ==")
    ivfpq_search(encoded, coarse, codebooks, list(query), nprobe=2, top_k=10).show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
