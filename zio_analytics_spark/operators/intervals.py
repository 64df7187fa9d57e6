"""[EXT] Interval overlap join: all pairs of intervals that intersect.

The classic temporal join the relational engine has no native operator for
(Spark's range-join support is equi-band only; Flink ships the
stream-stream interval join, which this repo covers separately in
streaming/). A naive formulation is a theta-join ``a.start < b.end AND
b.start < a.end`` — a cartesian product per block, the textbook scale
cliff. The distributed re-expression here is grid blocking with
reference-point deduplication (the partition-based spatial-merge join
family — Patel & DeWitt 1996, SIGMOD; the reference-point dedup rule from
Dittrich & Seeger 2000, ICDE):

1. Each interval is exploded to the fixed-width grid cells it touches
   (``sequence(floor(s/w), floor(e/w))`` — a codegen HOF, one row per
   covered cell).
2. Candidates come from an ordinary EQUI-join on ``(block_cols..., cell)``
   — hash-partitionable, AQE-skew-splittable, never a cartesian.
3. An overlapping pair appears once in EVERY cell both intervals touch;
   instead of a ``distinct`` (a second shuffle over the pair set), each
   pair is OWNED by exactly one cell — the one containing the overlap's
   left edge ``greatest(a.s, b.s)`` — and the other copies are dropped by
   a codegen predicate. Exact, duplicate-free, no extra shuffle.

Overlap semantics are OPEN-interval: ``a.s < b.e AND b.s < a.e`` (touching
endpoints do NOT overlap), so ``overlap_len = least(ends) -
greatest(starts)`` is always positive on emitted pairs.

Scale shape (100 TB): cost is candidates-per-cell, tuned via
``cell_width`` — set it near the median interval length so each interval
touches O(1) cells while cells stay selective; hot blocks split under AQE
because the join is a plain equi-join on slim (block, cell, id, s, e)
rows. The reference has no join operator at all (DataStream.scala:40-56);
this is [EXT] surface (SURVEY.md §2.4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_join", "interval_overlap_pairs"]


def _cells(start: Column, end: Column, w: int) -> Column:
    # Inclusive end cell: with open-interval semantics an overlap's left
    # edge greatest(s_a, s_b) is < both ends, so it lies in some cell
    # <= floor(end/w) for each side — the range is a tight superset of
    # every cell the owner rule can pick.
    return F.sequence(F.floor(start / w), F.floor(end / w))


def _side(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    block_cols: Sequence[str],
    tag: str,
    w: int,
    block_prefix: str = "",
) -> DataFrame:
    return df.select(
        *[F.col(c).alias(f"{block_prefix}{c}") for c in block_cols],
        F.col(id_col).alias(f"id_{tag}"),
        F.col(start_col).cast("long").alias(f"start_{tag}"),
        F.col(end_col).cast("long").alias(f"end_{tag}"),
    ).withColumn(
        f"__cell_{tag}",
        F.explode(_cells(F.col(f"start_{tag}"), F.col(f"end_{tag}"), w)),
    )


def _overlap_core(
    a: DataFrame, b: DataFrame, block_cols: Sequence[str], w: int, extra: Column | None
) -> DataFrame:
    sa, ea = F.col("start_a"), F.col("end_a")
    sb, eb = F.col("start_b"), F.col("end_b")
    cond = (F.col("__cell_a") == F.col("__cell_b")) & (sa < eb) & (sb < ea)
    for c in block_cols:
        cond = cond & (F.col(c) == F.col(f"__b_{c}"))
    if extra is not None:
        cond = cond & extra
    owner = F.floor(F.greatest(sa, sb) / w) == F.col("__cell_a")
    return (
        a.join(b, cond)
        .where(owner)
        .select(
            *block_cols,
            "id_a",
            "id_b",
            "start_a",
            "end_a",
            "start_b",
            "end_b",
            (F.least(ea, eb) - F.greatest(sa, sb)).alias("overlap_len"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str, str],
    right_cols: tuple[str, str, str],
    block_cols: Sequence[str] = (),
    cell_width: int = 32,
) -> DataFrame:
    """All (left, right) pairs whose [start, end) intervals intersect,
    restricted to equal ``block_cols`` (must exist on both sides).

    ``left_cols``/``right_cols`` are ``(id, start, end)`` column names;
    start/end must be integer-valued (epoch days/seconds — the caller
    picks the unit; ``cell_width`` is in that unit). Output:
    ``(*block_cols, id_a, id_b, start_a, end_a, start_b, end_b,
    overlap_len)``.
    """
    if cell_width <= 0:
        raise ValueError("cell_width must be positive")
    w = int(cell_width)
    a = _side(left, *left_cols, block_cols, "a", w)
    b = _side(right, *right_cols, block_cols, "b", w, block_prefix="__b_")
    return _overlap_core(a, b, block_cols, w, None)


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    block_cols: Sequence[str] = (),
    cell_width: int = 32,
) -> DataFrame:
    """Self-join variant: unordered pairs of rows of ``df`` (within equal
    ``block_cols``) whose intervals intersect, emitted once with
    ``id_a < id_b`` — the id ordering replaces the dedup a symmetric
    self-join would otherwise need ON TOP of the cell-ownership dedup.
    Same output shape as :func:`interval_overlap_join`.
    """
    if cell_width <= 0:
        raise ValueError("cell_width must be positive")
    w = int(cell_width)
    slim = df.select(*block_cols, id_col, start_col, end_col)
    a = _side(slim, id_col, start_col, end_col, block_cols, "a", w)
    b = _side(
        slim, id_col, start_col, end_col, block_cols, "b", w, block_prefix="__b_"
    )
    return _overlap_core(a, b, block_cols, w, F.col("id_a") < F.col("id_b"))
