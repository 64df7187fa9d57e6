"""[EXT] Deduplication operators for LLM-data pipelines (SURVEY.md §2.4 tail).

Four tiers, increasing fuzziness:

- ``exact_dedup``       — hash-groupBy on a content digest.
- ``jaccard_pairs``     — exact n-gram Jaccard within blocks (quadratic per
                          block; use when blocks are small or as the verifier).
- ``minhash_lsh_pairs`` — MinHash signatures + banded LSH: near-linear
                          candidate generation, then exact-Jaccard verify.
- ``simhash_pairs``     — 64-bit SimHash fingerprints + banded Hamming join.
- ``embedding_dup_pairs`` — cosine near-dup over an embedding column.

Scale design: every candidate generator is a *blocked equi-join* (band/bucket
key), never a cross join — the quadratic step only ever happens inside a
bucket. MinHash/Jaccard math stays in Column expressions (xxhash64 /
array_intersect / aggregate — JVM codegen); SimHash uses one Arrow-vectorized
pandas_udf because 64-lane bit-majority is a numpy job, not an expression.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from zio_analytics_spark.operators.text import tokens, word_shingles

__all__ = [
    "exact_dedup",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "embedding_dup_pairs",
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: one keeper (min id) + copy count per distinct content.

    Groups on a 256-bit content digest rather than the full text so the
    shuffle carries 32 bytes per row instead of whole documents — the digest
    is collision-free for practical purposes at 100 TB.
    """
    digest = F.sha2(F.col(text_col), 256).alias("__digest")
    return (
        df.select(digest, F.col(id_col))
        .groupBy("__digest")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
        .drop("__digest")
        .select("keeper_id", "n_copies")
    )


def _pair_jaccard(sh_a: Column, sh_b: Column) -> Column:
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(sh_a) + F.size(sh_b) - inter
    return inter / union


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: Sequence[str] = (),
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-``n``-gram Jaccard pairs within blocks, via an
    **inverted-index set-similarity join** (the canonical distributed
    algorithm): explode distinct shingles → equi-join on (shingle, blocks) →
    the per-pair match count IS the intersection size; union follows from
    the per-doc set sizes.

    Only pairs sharing ≥1 shingle are ever generated, so for ``threshold``
    > 0 the result is identical to the brute-force within-block cross join
    while the cost is shuffle-on-shingle + aggregate — near-linear when
    shingle frequencies are low. A shingle occurring in k docs contributes
    k² join rows: hot shingles (boilerplate) are the skew risk; AQE
    skew-join covers moderate cases, and shingle-frequency capping is the
    documented escape hatch for pathological corpora.

    Shingles are compared as xxhash64 values (8-byte longs, not strings):
    a cross-engine-identical 2^-64 collision risk buys a large constant
    factor. Output: ``doc_a, doc_b (doc_a < doc_b), jaccard``.
    """
    if threshold <= 0:
        raise ValueError("jaccard_pairs requires threshold > 0 (pairs sharing no shingle are never emitted)")
    sh = (
        df.select(
            *block_cols,
            F.col(id_col),
            F.array_distinct(F.transform(word_shingles(text_col, n), lambda s: F.xxhash64(s))).alias("__sh"),
        )
        .where(F.size("__sh") > 0)
        .select(*block_cols, F.col(id_col), F.col("__sh"), F.size("__sh").alias("__sz"))
    )
    tok = sh.select(*block_cols, F.col(id_col), F.col("__sz"), F.explode("__sh").alias("__t"))
    a = tok.select(
        *[F.col(c).alias(f"{c}__a") for c in block_cols],
        F.col(id_col).alias("doc_a"), F.col("__sz").alias("__sza"), F.col("__t"),
    )
    b = tok.select(
        *[F.col(c).alias(f"{c}__b") for c in block_cols],
        F.col(id_col).alias("doc_b"), F.col("__sz").alias("__szb"), F.col("__t"),
    )
    cond = F.col("doc_a") < F.col("doc_b")
    for c in block_cols:
        cond = cond & (F.col(f"{c}__a") == F.col(f"{c}__b"))
    inter = (
        a.join(b, ["__t"])
        .where(cond)
        .groupBy("doc_a", "doc_b", "__sza", "__szb")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    j = F.col("__inter") / (F.col("__sza") + F.col("__szb") - F.col("__inter"))
    # Filter on the raw value — threshold semantics identical to an oracle
    # that filters unrounded.
    return (
        inter.select("doc_a", "doc_b", j.alias("__j"))
        .where(F.col("__j") >= threshold)
        .select("doc_a", "doc_b", F.col("__j").alias("jaccard"))
    )


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: array of per-seed minima of xxhash64(seed, shingle)."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(F.lit(seed), s)))
            for seed in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, exact-Jaccard verified.

    Pipeline: shingle → 16-way MinHash (Column exprs, no UDF) → split the
    signature into ``bands`` band-hashes → explode → self-equi-join on
    (band index, band hash) → distinct candidate pairs → verify with exact
    Jaccard ≥ threshold.

    Scale: candidate generation is shuffle-on-band-key (near-linear); only
    verified candidates pay the array-intersect cost. Recall for j ≥ 0.5 with
    16 hashes / 8 bands of 2: 1-(1-j²)^8 ≈ 0.93 at j=0.5, →1 quickly above.
    """
    rows_per_band = num_hashes // bands
    # Shingle table is read three times (signature build + two verify joins):
    # persist it. At 100 TB this is a materialized intermediate table.
    sh = (
        df.select(F.col(id_col).alias("doc"), word_shingles(text_col, n).alias("__sh"))
        .where(F.size("__sh") > 0)
        .persist()
    )
    sig = sh.withColumn("__sig", minhash_signature(F.col("__sh"), num_hashes))
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(*[F.element_at("__sig", i * rows_per_band + r + 1) for r in range(rows_per_band)]).alias("bh"),
            )
            for i in range(bands)
        ]
    )
    # Band join on SLIM rows (doc, band-key) only — never shuffle the shingle
    # arrays 8×; candidates re-join the shingle table for verification.
    banded = sig.select("doc", F.explode(band_arr).alias("b"))
    a = banded.select(F.col("doc").alias("doc_a"), "b")
    b = banded.select(F.col("doc").alias("doc_b"), "b")
    cand = (
        a.join(b, ["b"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = (
        cand.join(sh.select(F.col("doc").alias("doc_a"), F.col("__sh").alias("__sh_a")), "doc_a")
        .join(sh.select(F.col("doc").alias("doc_b"), F.col("__sh").alias("__sh_b")), "doc_b")
    )
    j = _pair_jaccard(F.col("__sh_a"), F.col("__sh_b"))
    return (
        verified.select("doc_a", "doc_b", j.alias("__j"))
        .where(F.col("__j") >= threshold)
        .select("doc_a", "doc_b", F.col("__j").alias("jaccard"))
    )


@F.pandas_udf(LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (Arrow-vectorized).

    numpy bit-majority across token hashes; deterministic (python hashlib
    blake2b per token, 8-byte digest).
    """
    import hashlib

    import numpy as np

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        words = (t or "").split()
        if not words:
            continue
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
                for w in set(words)
            ),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(hs)
        sim = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sim.astype(np.int64))
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document 64-bit SimHash fingerprint."""
    return df.select(F.col(id_col), _simhash64(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidate generation: split the 64-bit fingerprint into 4 16-bit bands —
    any pair with Hamming ≤ 3 agrees exactly on ≥1 band (pigeonhole), so a
    banded equi-join finds all of them without a cross join. Verify with
    ``bit_count(xor)``.
    """
    # Persist the fingerprint table: both sides of the self-join read it, and
    # without this the pandas-UDF hashing runs twice. At 100 TB you'd write
    # fingerprints to a table once and band-join from there.
    fp = simhash(df, text_col, id_col).withColumnRenamed(id_col, "doc").persist()
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
            )
            for i in range(4)
        ]
    )
    banded = fp.select("doc", "simhash", F.explode(bands).alias("b"))
    a = banded.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"), "b")
    b = banded.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"), "b")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    # Filter on the cheap bit_count BEFORE deduplicating pairs: shared-vocab
    # corpora put many docs in the same band bucket, so the candidate set is
    # much larger than the survivor set — dedup only survivors.
    return (
        a.join(b, ["b"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def cluster_duplicates(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs: assign every node the
    minimum id reachable through the pair graph (the cluster representative).

    Iterative min-label propagation on DataFrames: each round, every node
    takes the min of its own label and its neighbors' labels; stops at
    fixpoint. Rounds needed ≈ graph diameter (≤ log n with doubling data);
    each round is one shuffle over the edge list — the standard large-graph
    CC shape (no driver-side graph materialization).

    Returns ``(node, cluster)`` where cluster = min doc id of the component.
    """
    # localCheckpoint (not persist): iterative self-joins double the logical
    # plan each round, and Catalyst re-analyzes the WHOLE lineage even when
    # data is cached — analysis cost explodes exponentially by ~iteration 8.
    # Checkpointing truncates lineage so every round plans against a flat
    # materialized relation. (On a cluster with a checkpoint dir, use
    # checkpoint() for fault tolerance; local semantics are identical.)
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("cluster"), F.coalesce(F.col("nbr_min"), F.col("cluster"))).alias("cluster"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_cols: Sequence[str] = (),
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks.

    Exact within blocks (pass LSH buckets or cluster labels as ``block_cols``
    at scale). Cosine is computed in double precision via zip_with/aggregate —
    JVM-side, no UDF.
    """
    from zio_analytics_spark.operators.similarity import cosine_similarity

    v = df.select(*block_cols, F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    a = v.select(*[F.col(c).alias(f"{c}__a") for c in block_cols], F.col(id_col).alias("id_a"), F.col("__v").alias("__va"))
    b = v.select(*[F.col(c).alias(f"{c}__b") for c in block_cols], F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"))
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(f"{c}__a") == F.col(f"{c}__b"))
    cos = cosine_similarity(F.col("__va"), F.col("__vb"))
    return (
        a.join(b, cond)
        .select("id_a", "id_b", cos.alias("__c"))
        .where(F.col("__c") >= threshold)
        .select("id_a", "id_b", F.col("__c").alias("cosine"))
    )
