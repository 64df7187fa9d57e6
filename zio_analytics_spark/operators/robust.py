"""[EXT] Robust statistics for data cleaning: winsorization & MAD outliers.

Numeric-column hygiene before a value feeds model training or aggregate
dashboards: clip or flag the tails without letting the tails themselves
define the scale (mean/stddev are what the outliers corrupt — median/MAD
are the robust pair).

Scale shape: both are TWO-PASS — pass 1 is one aggregate computing the
robust location/scale (a handful of doubles to the driver, same bounded
materialization a broadcast performs; swap exact ``percentile`` for
``approx_percentile`` at 100 TB), pass 2 is a codegen'd projection with
the thresholds inlined as literals. No window, no shuffle beyond the
aggregate's own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["winsorize", "mad_outliers"]


def winsorize(
    df: DataFrame,
    col: str,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``col`` to its [lower_q, upper_q] quantile band (winsorizing:
    tail values move TO the fence, they aren't dropped — row count and
    non-tail values are untouched)."""
    if not (0.0 <= lower_q < upper_q <= 1.0):
        raise ValueError("need 0 <= lower_q < upper_q <= 1")
    lo, hi = df.agg(
        F.expr(f"percentile({col}, {lower_q})"), F.expr(f"percentile({col}, {upper_q})")
    ).first()
    if lo is None:  # empty/all-null input: nothing to clip
        return df.withColumn(out_col or col, F.col(col))
    clipped = F.least(F.greatest(F.col(col), F.lit(float(lo))), F.lit(float(hi)))
    return df.withColumn(out_col or col, clipped)


def mad_outliers(
    df: DataFrame,
    col: str,
    k: float = 3.0,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Flag rows where ``|x - median| > k * MAD`` (median absolute
    deviation). Breakdown point 50%: unlike z-scores, half the data can be
    garbage before the fence moves. Adds ``flag_col`` (boolean) plus the
    deviation ratio ``__dev`` for ranking; a zero MAD (majority-constant
    column) flags exactly the non-modal values.
    """
    med = df.agg(F.expr(f"percentile({col}, 0.5)")).first()[0]
    if med is None:  # empty/all-null input: no location to deviate from
        return df.withColumn("__dev", F.lit(None).cast("double")).withColumn(
            flag_col, F.lit(None).cast("boolean")
        )
    mad = df.agg(
        F.expr(f"percentile(abs({col} - {float(med)!r}), 0.5)")
    ).first()[0]
    dev = F.abs(F.col(col) - F.lit(float(med)))
    if mad == 0:
        return df.withColumn("__dev", dev).withColumn(flag_col, dev > 0)
    return df.withColumn("__dev", dev / F.lit(float(mad))).withColumn(
        flag_col, F.col("__dev") > k
    )
