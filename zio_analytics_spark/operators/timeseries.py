"""[EXT] Time-series rollups — hypertable-style cascading downsampling.

``cascade_rollup`` materializes a hierarchy of time-bucket aggregates
(e.g. minute → hour → day) where every coarser level is computed FROM the
next finer level, not from raw data. For re-aggregable functions
(count/sum/min/max) the results are identical to aggregating raw rows, but
the raw table is scanned exactly once: at 100 TB the minute level is ~5
orders of magnitude smaller than raw, so the hour/day levels cost almost
nothing — the continuous-aggregate pattern of time-series stores, expressed
as plain DataFrame plans.

avg must travel as (sum, count) through the cascade and be finalized at
the end — averaging averages is wrong; the helper enforces this by taking
re-aggregable primitives only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "cascade_rollup",
    "cusum",
    "ewma",
    "holt",
    "holt_winters",
    "autocorrelation",
    "decayed_sum",
]

# name → (initial agg over raw, re-agg over finer level)
_REAGG = {
    "count": (lambda c: F.count(c), lambda name: F.sum(name)),
    "sum": (lambda c: F.sum(c), lambda name: F.sum(name)),
    "min": (lambda c: F.min(c), lambda name: F.min(name)),
    "max": (lambda c: F.max(c), lambda name: F.max(name)),
}


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    measures: dict[str, tuple[str, str]],
    levels: Sequence[str],
) -> dict[str, DataFrame]:
    """Build cascading rollups.

    ``measures`` maps output name → (fn, column) with fn in
    {count, sum, min, max}; ``levels`` are interval strings ordered finest →
    coarsest (each must evenly divide into the next, e.g. ["1 minute",
    "1 hour", "1 day"]). Returns {level: DataFrame} where each frame has
    ``bucket_start`` + keys + measure columns.
    """
    for fn, _ in measures.values():
        if fn not in _REAGG:
            raise ValueError(f"{fn!r} is not re-aggregable; supported: {sorted(_REAGG)}")

    out: dict[str, DataFrame] = {}
    current: DataFrame | None = None
    for i, level in enumerate(levels):
        if i == 0:
            aggs = [ _REAGG[fn][0](col).alias(name) for name, (fn, col) in measures.items() ]
            src_ts = F.col(ts_col)
            src = df
        else:
            aggs = [ _REAGG[fn][1](name).alias(name) for name, (fn, _) in measures.items() ]
            src_ts = F.col("bucket_start")
            src = current
        level_df = (
            src.groupBy(
                F.window(src_ts, level).getField("start").alias("bucket_start"),
                *[F.col(k) for k in key_cols],
            )
            .agg(*aggs)
        )
        out[level] = level_df
        current = level_df
    return out


def interpolate_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Fill NULL gaps in a per-key series by LINEAR interpolation between
    the nearest non-null neighbors (the resampling companion to gap-fill:
    ``gapfill_hours`` densifies the time axis with nulls, this makes the
    values continuous).

    Two ignore-nulls window carries per key — previous (value, time) and
    next (value, time) — then a codegen'd lerp:
    ``pv + (nv - pv) * (t - pt) / (nt - pt)``. Edges with only one
    neighbor stay NULL (strict interpolation, no extrapolation). Both
    windows share ONE hash partitioning on the key (forward carry is just
    the reversed in-partition sort), so the cost profile is a single
    exchange — the as-of join's shape.

    ``ts_col`` may be a timestamp (converted to epoch-µs for the ratio) or
    numeric.
    """
    from pyspark.sql.types import TimestampType, TimestampNTZType

    t_raw = F.col(ts_col)
    is_ts = isinstance(df.schema[ts_col].dataType, (TimestampType, TimestampNTZType))
    t = F.unix_micros(t_raw) if is_ts else t_raw.cast("double")
    v = F.col(value_col)
    wb = (
        W.partitionBy(key_col)
        .orderBy(t)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(key_col)
        .orderBy(t.desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pv = F.last(v, ignorenulls=True).over(wb)
    pt = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wb)
    nv = F.last(v, ignorenulls=True).over(wf)
    nt = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wf)
    lerp = pv + (nv - pv) * (t - pt) / (nt - pt)
    filled = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(pv.isNull() | nv.isNull(), F.lit(None).cast("double"))
        .otherwise(lerp)
    )
    return df.withColumn(out_col or value_col, filled)


def ewma(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    alpha: float = 0.25,
    out_col: str = "ewma",
    n_buckets: int | None = None,
    engine: str = "auto",
) -> DataFrame:
    """Exponentially weighted moving average per key:
    ``e₁ = x₁; eₜ = α·xₜ + (1−α)·eₜ₋₁`` over ``order_by`` within each
    ``partition_by`` group — the smoothing/anomaly-baseline primitive.

    An EWMA is a linear RECURRENCE, not an associative aggregate, so the
    window fast path doesn't apply; the closed-form window trick
    (Σ xᵢ/(1−α)^i scaled back) overflows doubles after ~700 rows, so it is
    deliberately NOT used. Instead each key's slice runs a sequential
    Arrow-batched scan (``applyInPandas``) — per-key state like the
    reference's MapAccumulate (DataStream.scala:44-45), parallel across
    keys, linear within. The recurrence is evaluated as literally
    ``α·x + (1−α)·e`` in float64, one multiply each and one add per step,
    so an oracle replaying the same expression sequence is bit-identical
    (with α=0.25 both coefficients are exactly representable).

    ``n_buckets`` trades Python-invocation count for in-task work: by
    default the scan runs one ``applyInPandas`` call PER KEY (~ms of
    Arrow/pandas round-trip each — the cogroup lesson); with ``n_buckets``
    set, keys hash into that many cogroups and the recurrence resets at
    key boundaries INSIDE each invocation, so the Python round-trip count
    is the bucket count (sized to cluster cores), not the key count.
    Same math, same output, verified identical.

    ``engine`` picks the in-task evaluator (round-6 perf fix — the round-5
    audit flagged the Python ``for`` as the one interpreter-speed inner
    loop left in the repo):

    - ``"pandas"``: ``groupby(keys).ewm(alpha, adjust=False).mean()`` —
      the identical recurrence in Cython. Measured equivalence vs the
      loop (test_timeseries): BIT-IDENTICAL for the shipped α=0.25 (and
      0.5/0.125/0.75) across random keys/magnitudes — which is what keeps
      the recursive-CTE oracle hash-green — and within 1 ulp (~1e-13
      relative) for arbitrary α, where pandas' internal weighted-average
      form rounds differently. ~50× faster in-task. pandas SKIPS NaN
      inputs (carries the prior state forward) where the loop propagates
      them, so it requires a NaN-free column.
    - ``"loop"``: the original per-row evaluation — keeps NaN-propagation
      semantics and serves as the executable spec.
    - ``"auto"`` (default): ``"pandas"`` when the batch has no NaNs,
      else ``"loop"`` — semantics never silently change.

    Returns ``partition_by + order_by + (value_col, out_col)``.
    """
    import numpy as np

    part = list(partition_by)
    order = list(order_by)
    if not part:
        raise ValueError("ewma requires partition_by keys (per-key recurrence)")
    if engine not in ("auto", "pandas", "loop"):
        raise ValueError(f"unknown ewma engine: {engine!r}")
    a, b = float(alpha), 1.0 - float(alpha)
    out_cols = part + order + [value_col, out_col]

    def scan(pdf):
        pdf = pdf.sort_values(part + order, kind="mergesort").reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        use_pandas = engine == "pandas" or (
            engine == "auto" and not np.isnan(vals).any()
        )
        if use_pandas:
            # Groups are contiguous after the sort and groupby(sort=False)
            # preserves first-appearance order, so the concatenated group
            # results align positionally with the sorted frame.
            # dropna=False: null partition keys form their own group (they
            # are contiguous after the sort); the default dropna=True would
            # DROP those rows and break the positional assignment below.
            out = (
                pdf.groupby(part, sort=False, dropna=False)[value_col]
                .ewm(alpha=a, adjust=False)
                .mean()
                .to_numpy()
            )
        else:
            out = np.empty(len(vals), dtype=np.float64)
            # Normalize nulls to None so NaN keys compare equal (matches the
            # pandas engine's dropna=False grouping; float('nan') != float('nan')
            # would otherwise restart the recurrence on every null-key row).
            keys = list(
                zip(
                    *(
                        pdf[c].astype(object).where(pdf[c].notna(), None).tolist()
                        for c in part
                    )
                )
            )
            e, prev = 0.0, object()
            for i in range(len(vals)):
                k = keys[i]
                if k != prev:
                    e, prev = vals[i], k
                else:
                    e = a * vals[i] + b * e
                out[i] = e
        pdf = pdf.copy()
        pdf[out_col] = out
        return pdf[out_cols]

    schema_parts = []
    for c in out_cols[:-1]:
        schema_parts.append(f"{c} {df.schema[c].dataType.simpleString()}")
    schema_parts.append(f"{out_col} double")
    schema = ", ".join(schema_parts)
    if n_buckets:
        bkt = F.pmod(
            F.xxhash64(*[F.col(c) for c in part]), F.lit(n_buckets)
        ).cast("int")
        return (
            df.withColumn("__bkt", bkt)
            .groupBy("__bkt")
            .applyInPandas(lambda pdf: scan(pdf.drop(columns="__bkt")), schema)
        )
    return df.groupBy(*part).applyInPandas(scan, schema)


def cusum(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    key_cols: Sequence[str] = (),
    target: float = 0.0,
    slack: float = 0.0,
    threshold: float | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point scores (Page 1954, Biometrika 41):
    per key, ordered by ``order_cols`` (which must be a total order within
    each key),

        hi_i = max(0, hi_{i-1} + (x_i - target - slack))
        lo_i = max(0, lo_{i-1} - (x_i - target) - slack)

    The recurrence looks inherently sequential — a scale cliff if run as a
    per-key Python scan. But the clamped sum has a CLOSED FORM by the
    reflection identity: with d_i = x_i - target - slack and prefix sums
    P_i = Σ_{j<=i} d_j,

        hi_i = P_i - min(0, min_{j<=i} P_j)

    (the min term is "the last time the walk would have clamped"), so both
    sides become two ordinary cumulative-window expressions — fully
    parallel across keys, whole-stage codegen within a key, no UDF and no
    sequential state. ``tests/test_timeseries.py`` proves the closed form
    equals the literal recurrence on random walks.

    Emits every input row plus ``cusum_hi`` / ``cusum_lo`` (rounded 6 dp:
    the closed form and any recurrence replay accumulate float error in
    different orders) and, when ``threshold`` is given, an ``alarm`` flag.
    """
    d_hi = F.col(value_col) - F.lit(float(target)) - F.lit(float(slack))
    d_lo = -(F.col(value_col) - F.lit(float(target))) - F.lit(float(slack))
    w = (
        W.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    staged = df.withColumn("__p_hi", F.sum(d_hi).over(w)).withColumn(
        "__p_lo", F.sum(d_lo).over(w)
    )
    hi = F.round(
        F.col("__p_hi") - F.least(F.lit(0.0), F.min("__p_hi").over(w)), 6
    )
    lo = F.round(
        F.col("__p_lo") - F.least(F.lit(0.0), F.min("__p_lo").over(w)), 6
    )
    out = (
        staged.withColumn("cusum_hi", hi)
        .withColumn("cusum_lo", lo)
        .drop("__p_hi", "__p_lo")
    )
    if threshold is not None:
        out = out.withColumn(
            "alarm",
            (F.col("cusum_hi") > threshold) | (F.col("cusum_lo") > threshold),
        )
    return out


def autocorrelation(
    df: DataFrame,
    order_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    lags: Sequence[int] = (1, 2, 3),
) -> DataFrame:
    """Per-group autocorrelation of an ordered series at each requested lag:
    acf(k) = corr(xₜ, xₜ₋ₖ) over the pairs where both sides exist — the
    pairwise ("Pearson on lagged pairs") ACF estimator, the one a SQL
    ``corr(x, lag(x, k))`` replays exactly.

    One window pass builds all lag columns (single Exchange on the group
    key + one in-partition sort serves EVERY lag), one hash aggregate
    computes all corr pairs, and ``stack`` unpivots to the long
    ``(group..., lag, n_pairs, acf)`` form — no per-lag scans, no
    self-joins. The first k rows of each series have a null lagged partner
    and drop out of corr on both engines identically.

    SCALE: the series should be pre-aggregated to its natural grain
    (hourly/daily buckets) before calling — the window sort is then over
    bounded per-group series, and the aggregate state is a handful of
    moments per (group, lag). Ordering ties in ``order_col`` make lag
    nondeterministic; pass a unique bucket column (the pre-aggregation
    grain guarantees this). Rounded 6 dp."""
    g = list(group_cols)
    lags = list(lags)
    if not lags or any(k < 1 for k in lags):
        raise ValueError("lags must be >= 1")
    w = W.partitionBy(*[F.col(c) for c in g]).orderBy(order_col)
    lagged = df.select(
        *g,
        F.col(value_col).cast("double").alias("__v"),
        *[F.lag(F.col(value_col).cast("double"), k).over(w).alias(f"__l{k}") for k in lags],
    )
    agg = lagged.groupBy(*g).agg(
        *[F.corr("__v", f"__l{k}").alias(f"__c{k}") for k in lags],
        *[F.count(F.when(F.col(f"__l{k}").isNotNull(), 1)).alias(f"__n{k}") for k in lags],
    )
    stack_args = ", ".join(f"{k}, __c{k}, __n{k}" for k in lags)
    long = agg.select(
        *g,
        F.expr(f"stack({len(lags)}, {stack_args}) AS (lag, __acf, __n)"),
    )
    return long.select(
        *g,
        F.col("lag").cast("int").alias("lag"),
        F.col("__n").cast("long").alias("n_pairs"),
        F.round("__acf", 6).alias("acf"),
    )


def decayed_sum(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    as_of: str,
    half_life_days: float = 7.0,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exponential time-decayed aggregate as of a fixed instant — the
    feature-store "decayed counter": each observation contributes
    ``value · 2^(−age/half_life)``, so yesterday's events matter ~10%
    less (at 7 d half-life) and last month's barely at all.

    Unlike EWMA (a sequential per-key recurrence — see :func:`ewma`),
    the fixed-as-of decayed sum is a PLAIN WEIGHTED AGGREGATE: the weight
    is a pure function of the row's own timestamp, so it parallelizes
    like any sum — map-side partials, bytes shuffled ∝ #groups — and
    needs no ordering, no state, no window. That associativity is why
    production feature stores snapshot decayed counters this way at any
    scale. Returns ``(group..., n, decayed_sum, decayed_weight)`` —
    weight is the decayed row count, so sum/weight is the decayed mean.
    Rounded 6 dp (cross-row float merge order)."""
    g = list(group_cols)
    age_days = (
        F.unix_micros(F.lit(as_of).cast("timestamp"))
        - F.unix_micros(F.col(ts_col))
    ) / 86400e6
    w = F.pow(F.lit(0.5), age_days / F.lit(half_life_days))
    v = F.col(value_col).cast("double")
    return df.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum(v * w), 6).alias("decayed_sum"),
        F.round(F.sum(w), 6).alias("decayed_weight"),
    )


def holt(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    alpha: float = 0.5,
    beta: float = 0.25,
    level_col: str = "level",
    trend_col: str = "trend",
    n_buckets: int | None = None,
) -> DataFrame:
    """Holt double exponential smoothing per key (Holt 1957 — public
    algorithm): the trend-aware sibling of :func:`ewma`, the standard
    short-horizon forecaster for drifting series (EWMA lags a trending
    signal by design; Holt tracks level AND slope)::

        l₁ = x₁                       b₁ = 0
        lₜ = α·xₜ + (1−α)·(lₜ₋₁ + bₜ₋₁)
        bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁

    Same scale shape as :func:`ewma`: a true two-state linear recurrence
    — not an associative aggregate — so each key's slice runs one
    sequential Arrow scan (``applyInPandas``), parallel across keys;
    ``n_buckets`` hashes keys into cogroups so Python invocations scale
    with cores, not keys. Each step is evaluated LITERALLY as the two
    expressions above in float64, so a recursive-CTE oracle replaying the
    identical expression sequence is bit-identical when α and β are
    exactly representable (the defaults 0.5/0.25 are dyadic). One-step
    forecasts are ``level + trend`` downstream.

    Returns ``partition_by + order_by + (value_col, level_col,
    trend_col)``. Requires a NaN-free value column (the loop would
    propagate NaN into all later state — matching EWMA's loop engine)."""
    import numpy as np

    part = list(partition_by)
    order = list(order_by)
    if not part:
        raise ValueError("holt requires partition_by keys (per-key recurrence)")
    a, one_a = float(alpha), 1.0 - float(alpha)
    g, one_g = float(beta), 1.0 - float(beta)
    out_cols = part + order + [value_col, level_col, trend_col]

    def scan(pdf):
        pdf = pdf.sort_values(part + order, kind="mergesort").reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        lvl = np.empty(len(vals), dtype=np.float64)
        trd = np.empty(len(vals), dtype=np.float64)
        keys = list(
            zip(
                *(
                    pdf[c].astype(object).where(pdf[c].notna(), None).tolist()
                    for c in part
                )
            )
        )
        l = t = 0.0
        prev = object()
        for i in range(len(vals)):
            k = keys[i]
            if k != prev:
                l, t, prev = vals[i], 0.0, k
            else:
                l_new = a * vals[i] + one_a * (l + t)
                t = g * (l_new - l) + one_g * t
                l = l_new
            lvl[i] = l
            trd[i] = t
        pdf = pdf.copy()
        pdf[level_col] = lvl
        pdf[trend_col] = trd
        return pdf[out_cols]

    schema_parts = [
        f"{c} {df.schema[c].dataType.simpleString()}" for c in part + order + [value_col]
    ]
    schema_parts += [f"{level_col} double", f"{trend_col} double"]
    schema = ", ".join(schema_parts)
    if n_buckets:
        bkt = F.pmod(
            F.xxhash64(*[F.col(c) for c in part]), F.lit(n_buckets)
        ).cast("int")
        return (
            df.withColumn("__bkt", bkt)
            .groupBy("__bkt")
            .applyInPandas(lambda pdf: scan(pdf.drop(columns="__bkt")), schema)
        )
    return df.groupBy(*part).applyInPandas(scan, schema)


def holt_winters(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    season_length: int,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    level_col: str = "level",
    trend_col: str = "trend",
    seasonal_col: str = "seasonal",
    n_buckets: int | None = None,
) -> DataFrame:
    """Additive Holt-Winters triple exponential smoothing per key
    (Winters 1960 — public algorithm): the seasonal completion of
    :func:`holt` for series with a repeating period (daily load curves,
    weekly traffic). Exactly-replayable state initialization — seasonal
    indices start at ZERO (the first season learns them on the fly) and
    the level starts at x₁ — so every step is the literal textbook
    recurrence with ``m = season_length``::

        t = 1:  l₁ = x₁        b₁ = 0        s₁ = 0
        t ≥ 2:  lₜ = α·(xₜ − sₜ₋ₘ) + (1−α)·(lₜ₋₁ + bₜ₋₁)
                bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
                sₜ = γ·(xₜ − lₜ) + (1−γ)·sₜ₋ₘ       (sₜ₋ₘ = 0 while t ≤ m)

    One-step forecast downstream = ``level + trend + s_{t+1−m}``. Same
    scale shape as :func:`holt`/:func:`ewma`: a true (m+2)-state linear
    recurrence, one sequential Arrow scan per key (``applyInPandas``),
    parallel across keys, ``n_buckets`` for many-key corpora. The
    defaults α=0.5/β=0.25/γ=0.25 are dyadic, each step evaluates the
    expressions literally in float64, and the seasonal look-back is a
    rotating m-slot buffer — a recursive-CTE oracle carrying the same
    buffer as a list column replays bit-identically.

    Returns ``partition_by + order_by + (value_col, level_col, trend_col,
    seasonal_col)``. NaN-free values required (state would poison)."""
    import numpy as np

    part = list(partition_by)
    order = list(order_by)
    if not part:
        raise ValueError("holt_winters requires partition_by keys")
    m = int(season_length)
    if m < 2:
        raise ValueError(f"season_length must be >= 2, got {season_length}")
    a, one_a = float(alpha), 1.0 - float(alpha)
    g, one_g = float(beta), 1.0 - float(beta)
    gs, one_gs = float(gamma), 1.0 - float(gamma)
    out_cols = part + order + [value_col, level_col, trend_col, seasonal_col]

    def scan(pdf):
        pdf = pdf.sort_values(part + order, kind="mergesort").reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        lvl = np.empty(len(vals), dtype=np.float64)
        trd = np.empty(len(vals), dtype=np.float64)
        sea = np.empty(len(vals), dtype=np.float64)
        keys = list(
            zip(
                *(
                    pdf[c].astype(object).where(pdf[c].notna(), None).tolist()
                    for c in part
                )
            )
        )
        l = t = 0.0
        buf: list = []
        prev = object()
        for i in range(len(vals)):
            k = keys[i]
            if k != prev:
                l, t, prev = vals[i], 0.0, k
                s = 0.0
                buf = [0.0] * (m - 1) + [s]
            else:
                sm = buf[0]
                l_new = a * (vals[i] - sm) + one_a * (l + t)
                t = g * (l_new - l) + one_g * t
                l = l_new
                s = gs * (vals[i] - l) + one_gs * sm
                buf = buf[1:] + [s]
            lvl[i] = l
            trd[i] = t
            sea[i] = s
        pdf = pdf.copy()
        pdf[level_col] = lvl
        pdf[trend_col] = trd
        pdf[seasonal_col] = sea
        return pdf[out_cols]

    schema_parts = [
        f"{c} {df.schema[c].dataType.simpleString()}" for c in part + order + [value_col]
    ]
    schema_parts += [
        f"{level_col} double",
        f"{trend_col} double",
        f"{seasonal_col} double",
    ]
    schema = ", ".join(schema_parts)
    if n_buckets:
        bkt = F.pmod(
            F.xxhash64(*[F.col(c) for c in part]), F.lit(n_buckets)
        ).cast("int")
        return (
            df.withColumn("__bkt", bkt)
            .groupBy("__bkt")
            .applyInPandas(lambda pdf: scan(pdf.drop(columns="__bkt")), schema)
        )
    return df.groupBy(*part).applyInPandas(scan, schema)
