"""[EXT] As-of join — "for each left row, the most recent right row at or
before its timestamp, per key".

Absent in the reference (no joins at all — SURVEY.md §2.4); standard in
time-series engines.

Implementation: the **union-merge** strategy, not a theta join. Both sides are
tagged and unioned, then a single hash-shuffle on the key plus an in-partition
sort lets ``last(..., ignorenulls=True)`` carry the most recent right-side
payload forward onto each left row.

Scale: one exchange on the join key and one sort — the same cost profile as a
sort-merge join, with no O(|L|·|R|) pair blow-up and no per-group
materialization. Skewed keys are handled by AQE skew-split since this is a
plain window over a shuffle. This beats ``applyInPandas``+``pd.merge_asof``
(which materializes each key group in Python) at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    direction: str = "backward",
    suffix: str = "",
) -> DataFrame:
    """Left as-of join: attach the latest ``right`` row with
    ``right_time <= left_time`` (direction='backward') per key.

    ``right_values`` are the right-side columns to carry; they appear on the
    output (optionally suffixed). Left rows with no prior right row get NULLs.
    Right side should be unique per (key, time) — pre-dedupe if not, or the
    carried row among equal times is the last by union order.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")

    reserved = [c for c in (*left.columns, *right.columns) if c.startswith("__asof_")]
    if reserved:
        raise ValueError(f"input columns collide with internal __asof_* tags: {reserved}")
    clashes = [c for c in right_values if f"{c}{suffix}" in left.columns]
    if clashes:
        raise ValueError(
            f"right_values {clashes} collide with left columns under suffix "
            f"{suffix!r}; pass a non-empty suffix (e.g. '_right')"
        )

    payload = F.struct(*[F.col(c) for c in right_values]).alias("__asof_v")
    r = right.select(
        F.col(right_on).alias("__asof_k"),
        F.col(right_time).alias("__asof_t"),
        payload,
        F.lit(1).alias("__asof_side"),
    )
    l = left.select(
        "*",
        F.col(left_on).alias("__asof_k"),
        F.col(left_time).alias("__asof_t"),
        F.lit(None).cast(r.schema["__asof_v"].dataType).alias("__asof_v"),
        F.lit(0).alias("__asof_side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # At equal timestamps the right row sorts first (side desc) so a left row
    # at exactly t matches a right row at t — the conventional `<=` as-of.
    w = (
        W.partitionBy("__asof_k")
        .orderBy(F.col("__asof_t").asc(), F.col("__asof_side").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.withColumn("__asof_match", F.last("__asof_v", ignorenulls=True).over(w))

    out_cols = [c for c in left.columns]
    out = carried.where(F.col("__asof_side") == 0).select(
        *out_cols,
        *[F.col(f"__asof_match.{c}").alias(f"{c}{suffix}") for c in right_values],
    )
    return out
