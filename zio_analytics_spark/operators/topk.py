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

__all__ = ["top_k", "top_k_per_group"]


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
