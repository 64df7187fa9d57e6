"""[EXT] Deterministic contrastive-pair generation for training data.

Contrastive/embedding training wants, per anchor document, k "random"
negatives drawn uniformly from the corpus. The naive approaches both fail
at 100 TB: a cross join is quadratic, and RNG sampling is neither
partition-stable nor reproducible across re-executions (the same
exactly-once argument as ``splits.py``). The deterministic restatement:

1. Arrange the corpus on a RING — every id gets a gap-free position in
   the md5-hash total order (``layout.assign_contiguous_ids``: the
   distributed rank, never a single-task ``row_number``). Hash order ≈
   random order, so ring neighbors are unrelated documents.
2. Derive k global ROTATIONS from the seed (md5-derived offsets in
   [1, N−1]); negative j of the anchor at position p is the document at
   position ``(p + r_j) mod N``.
3. Materialize pairs with ONE equi-join on position (after a k-way
   codegen explode) — cost k·N rows, never N².

Every anchor gets exactly k negatives, never itself (offsets exclude 0
mod N); a rotation is a bijection, so each document also SERVES as a
negative exactly k times — balanced load, no hot negatives. Offsets may
collide for tiny corpora (k distinct rotations are not guaranteed);
documented, harmless for training. Fully replayable: the oracle
recomputes the ring with ``row_number`` over the same md5 key and the
same offset arithmetic.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["contrastive_negatives", "ring_offsets"]


def ring_offsets(k: int, n: int, seed: str = "neg") -> list[int]:
    """The k md5-derived ring rotations, each in [1, n-1] (never 0 — an
    anchor is never its own negative)."""
    if n < 2:
        raise ValueError("need at least 2 ids to draw negatives")
    return [
        int(hashlib.md5(f"{seed}|off|{j}".encode()).hexdigest()[:8], 16) % (n - 1) + 1
        for j in range(k)
    ]


def contrastive_negatives(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    seed: str = "neg",
) -> DataFrame:
    """Per distinct ``id_col`` value, k deterministic pseudo-random
    negatives: ``(anchor_id, j, negative_id)``. See module docstring for
    the ring construction; ``seed`` varies the ring AND the rotations, so
    epochs can use fresh pairings reproducibly (seed="neg-epoch3")."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from zio_analytics_spark.operators.layout import assign_contiguous_ids

    ids = df.select(id_col).distinct()
    hash60 = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    ranked = assign_contiguous_ids(
        ids.withColumn("__h", hash60), "__h", tiebreak=[id_col], id_name="__pos"
    ).select(id_col, "__pos")
    n = ranked.count()
    offs = ring_offsets(k, n, seed)
    targets = ranked.select(
        F.col(id_col).alias("anchor_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        ((F.col("__pos") + F.lit(off)) % F.lit(n)).alias("__tpos"),
                    )
                    for j, off in enumerate(offs)
                ]
            )
        ).alias("__t"),
    ).select("anchor_id", "__t.j", "__t.__tpos")
    neg = ranked.select(
        F.col("__pos").alias("__tpos"), F.col(id_col).alias("negative_id")
    )
    return targets.join(neg, "__tpos").select("anchor_id", "j", "negative_id")
