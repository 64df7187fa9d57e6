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
    tolerance=None,
) -> DataFrame:
    """Left as-of join per key:

    - ``direction='backward'`` — latest right row with ``right_time <=
      left_time`` (the default, and the conventional as-of);
    - ``direction='forward'`` — earliest right row with ``right_time >=
      left_time`` (same union-merge, time order reversed);
    - ``direction='nearest'`` — whichever of the two is closer in absolute
      time; exact ties take the backward match.

    All three keep the union-merge cost profile: ONE exchange on the key.
    ``forward`` flips the in-partition sort; ``nearest`` evaluates both
    carries — two in-partition sorts over the same hash partitioning, still
    no second shuffle.

    ``tolerance`` (optional Column/interval literal, e.g.
    ``F.expr("INTERVAL 30 DAYS")`` for timestamps or a numeric literal for
    numeric times) nulls the carried values when the matched row is further
    than the tolerance — pandas ``merge_asof(tolerance=...)`` semantics
    (post-filter of the chosen match, not "nearest within window"). Costs
    one extra codegen'd conditional; no plan change.

    ``right_values`` are the right-side columns to carry; they appear on the
    output (optionally suffixed). Left rows with no match in the chosen
    direction get NULLs. Right side should be unique per (key, time) —
    pre-dedupe if not, or the carried row among equal times is the last by
    union order.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")

    reserved = [c for c in (*left.columns, *right.columns) if c.startswith("__asof_")]
    if reserved:
        raise ValueError(f"input columns collide with internal __asof_* tags: {reserved}")
    clashes = [c for c in right_values if f"{c}{suffix}" in left.columns]
    if clashes:
        raise ValueError(
            f"right_values {clashes} collide with left columns under suffix "
            f"{suffix!r}; pass a non-empty suffix (e.g. '_right')"
        )

    # Payload carries the right event time too, so 'nearest' can compare
    # distances without a second pass over the inputs.
    payload = F.struct(
        F.col(right_time).alias("__asof_rt"),
        F.struct(*[F.col(c) for c in right_values]).alias("v"),
    ).alias("__asof_v")
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

    # At equal timestamps the right row sorts first (side desc) so a left
    # row at exactly t matches a right row at t — `<=` / `>=` inclusive.
    def carry(descending: bool):
        t = F.col("__asof_t").desc() if descending else F.col("__asof_t").asc()
        w = (
            W.partitionBy("__asof_k")
            .orderBy(t, F.col("__asof_side").desc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return F.last("__asof_v", ignorenulls=True).over(w)

    if direction == "backward":
        match = carry(descending=False)
    elif direction == "forward":
        match = carry(descending=True)
    else:
        back, fwd = carry(descending=False), carry(descending=True)
        # Both distances are non-negative by construction (back.rt <= t <=
        # fwd.rt), so plain subtraction compares correctly for numeric AND
        # timestamp times (timestamp difference yields a comparable interval).
        dist_b = F.col("__asof_t") - back["__asof_rt"]
        dist_f = fwd["__asof_rt"] - F.col("__asof_t")
        match = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(dist_f < dist_b, fwd)  # tie -> backward (conventional)
            .otherwise(back)
        )
    carried = u.withColumn("__asof_match", match)
    if tolerance is not None:
        rt = F.col("__asof_match.__asof_rt")
        # abs distance via greatest of both subtractions: valid for numeric
        # times AND timestamps (interval results compare against interval
        # tolerances; F.abs does not accept intervals)
        dist = F.greatest(F.col("__asof_t") - rt, rt - F.col("__asof_t"))
        carried = carried.withColumn(
            "__asof_match",
            F.when(dist <= tolerance, F.col("__asof_match")).otherwise(
                F.lit(None).cast(carried.schema["__asof_match"].dataType)
            ),
        )

    out_cols = [c for c in left.columns]
    out = carried.where(F.col("__asof_side") == 0).select(
        *out_cols,
        *[F.col(f"__asof_match.v.{c}").alias(f"{c}{suffix}") for c in right_values],
    )
    return out
