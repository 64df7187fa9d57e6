"""[EXT] Top-K operators (absent in the reference — SURVEY.md §2.4: no
sorts/limits exist there).

``top_k`` is a global sorted limit — Spark plans this as ``TakeOrderedAndProject``
(per-partition heap of K, then a K-row merge on the driver), which is the
right plan at any scale: no global sort, no full shuffle.

``top_k_per_group`` is the ranking-window idiom: one hash exchange on the
group keys, in-partition sort, ``row_number() <= k``. Always pass a total
order (tiebreaker columns) or results are nondeterministic under ties.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["top_k", "top_k_per_group", "weighted_sample_per_group"]


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: ``ORDER BY ... LIMIT k`` (→ TakeOrderedAndProject)."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via ``row_number`` over (partition, order)."""
    w = W.partitionBy(*group_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def weighted_sample_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    weight: Column,
    id_cols: Sequence[str],
    k: int,
    seed: str = "ws",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — the
    Efraimidis–Spirakis A-ES scheme: each row gets key ``u^(1/w)`` with
    ``u`` uniform in (0,1), and the top-k keys per group are a correct
    weighted sample (heavier rows win proportionally more often).

    ``u`` is CONTENT-HASH derived (md5 of seed+ids → 32-bit fraction), not
    RNG: the sample is reproducible under repartitioning/retries and
    stable under corpus growth — the same determinism contract as
    ``mix_sources``/``sample_per_group``, which a resumable 100 TB job
    needs (a retried task must draw the same sample). One ranked window
    per group; no global sort. Rows with non-positive weight are excluded
    (their key is undefined).
    """
    key = F.concat_ws("|", F.lit(seed), *[F.col(c).cast("string") for c in id_cols])
    u = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") + 1.0) / (
        float(1 << 32) + 1.0
    )
    es_key = F.pow(u, 1.0 / weight)
    w = W.partitionBy(*group_by).orderBy(
        F.col("__es").desc(), *[F.col(c) for c in id_cols]
    )
    return (
        df.where(weight > 0)
        .withColumn("__es", es_key)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__es", "__rn")
    )
