"""Stream-stream joins [EXT] (SURVEY.md §2.4 — absent in the reference).

Watermarked interval join: each side declares a watermark, and the join
condition bounds event-time distance so Spark can expire buffered state.
Without the time bound a stream-stream join would buffer both sides forever —
the bound IS the scale story.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: str,
    right_ts: str,
    watermark: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``on`` with ``right_ts ∈ [left_ts - lower, left_ts + upper]``.

    ``watermark`` applies to both sides; state for rows outside the interval
    (plus watermark slack) is dropped by the streaming engine.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        on
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)
