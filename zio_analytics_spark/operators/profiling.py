"""[EXT] Data profiling & distribution-drift detection.

Operational companions to the pipeline operators: before data flows into
training or dashboards, profile it; between epochs, measure drift.

- ``profile_table``: one row per profiled column — null count, distinct
  count, min/max (stringified for a uniform schema). ONE aggregate pass
  over the table computes every column's stats together (not one job per
  column — at 100 TB a per-column loop is N full scans).
- ``psi_drift``: Population Stability Index between a reference and a
  current sample of a numeric column. Bins are equi-depth quantiles OF THE
  REFERENCE (the convention: the baseline defines the binning), counts
  are one aggregate per side, and the PSI sum happens on a bins-sized
  frame. PSI < 0.1 ≈ stable, 0.1–0.25 ≈ drifting, > 0.25 ≈ shifted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table", "psi_drift"]


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile in long format: ``(column, n_rows, n_nulls,
    n_distinct, min_str, max_str)``. All columns' statistics are computed
    in ONE aggregate pass; the long format comes from a single row
    exploded driver-side-free via ``stack``."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (column, n_nulls, n_distinct, min_str, max_str)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


def psi_drift(
    reference: DataFrame,
    current: DataFrame,
    col: str,
    n_bins: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """PSI of ``current`` against ``reference`` on numeric ``col``.

    Pass 1: ``n_bins - 1`` exact quantile boundaries of the REFERENCE
    (bounded driver state — swap approx_percentile at 100 TB). Pass 2: one
    bucket-count aggregate per side (strict-``>`` rule, ties share a bin).
    The PSI term sum runs over an ``n_bins``-row frame; ``epsilon`` guards
    empty bins (standard smoothing). Returns a 1-row frame
    ``(psi, n_bins)``.
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = reference.agg(
        F.expr(f"percentile({col}, array({', '.join(map(str, qs))}))")
    ).first()[0]
    if bounds is None:
        raise ValueError("psi_drift: empty/all-null reference cannot define bins")
    c = F.col(col)
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (c > F.lit(float(b))).cast("int")

    def counts(df: DataFrame, name: str) -> DataFrame:
        # NULLs have no bucket (their bin expression is NULL, absent from
        # the 0..n_bins-1 spine) — they must leave the denominator too, or
        # bin fractions stop summing to 1 and PSI biases downward whenever
        # null rates differ between the two populations
        return (
            df.where(c.isNotNull())
            .select(bucket.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ref_n = reference.where(c.isNotNull()).count()
    cur_n = current.where(c.isNotNull()).count()
    spine = reference.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    joined = (
        spine.join(counts(reference, "__cr"), "bin", "left")
        .join(counts(current, "__cc"), "bin", "left")
    )
    # uniform Laplace smoothing over the COMPLETE bin spine (empty bins
    # included) keeps fractions summing to 1 and every log finite
    p_ref = (F.coalesce("__cr", F.lit(0)) + epsilon) / (ref_n + n_bins * epsilon)
    p_cur = (F.coalesce("__cc", F.lit(0)) + epsilon) / (cur_n + n_bins * epsilon)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return joined.agg(
        F.sum(term).alias("psi"), F.lit(n_bins).cast("int").alias("n_bins")
    )
