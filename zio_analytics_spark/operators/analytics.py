"""[EXT] Event analytics: funnels, cohort retention, time-series gap-fill.

The reference's event-time machinery stops at windowed folds
(/root/reference/src/main/scala/zio/analytics/DataStream.scala:55,
Window.scala:8-31); these are the product-analytics operators a user of such
an engine reaches for next. All three are pure DataFrame compositions — no
UDFs — so Catalyst owns the physical plan end to end.

Scale notes (100 TB):
- ``funnel_counts`` aggregates per user *first* (events -> one row per user
  per stage), so the joins run on |users|, not |events|; each stage frame is
  orders of magnitude smaller than the raw stream.
- ``cohort_retention`` is two hash aggregations and one equi-join on
  ``user_id``; the first-seen frame is |users|-sized and AQE will broadcast
  it when small enough.
- ``gapfill_hours`` generates missing buckets with ``sequence`` + ``explode``
  (JVM-side, no driver loop); the generated side grows with |users| x span,
  never with raw event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["funnel_counts", "cohort_retention", "gapfill_hours"]


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_gap=None,
) -> DataFrame:
    """Strictly-ordered funnel: one row, one column per stage.

    A user reaches stage i iff they have a stage-i event *strictly after*
    their earliest stage-(i-1) arrival (earliest-arrival semantics, the
    standard product-analytics definition). Count of reaching users per stage.

    ``max_gap`` (optional interval Column, e.g. ``F.expr("INTERVAL 1
    HOUR")``) adds the conversion-DEADLINE variant: stage i must land
    within the gap of the previous arrival — the "purchase within an hour
    of the click" product question. Same per-stage hash-equi-join plan,
    one extra residual comparison.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    ev = events.select(user_col, type_col, ts_col).where(F.col(type_col).isin(stages))

    reached = (
        ev.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    counts = [reached.agg(F.count(F.lit(1)).alias(f"stage_{stages[0]}"))]
    for stage in stages[1:]:
        reached = (
            ev.where(F.col(type_col) == stage)
            .join(reached.select(user_col, F.col("__t").alias("__prev")), on=user_col)
            .where(
                (F.col(ts_col) > F.col("__prev"))
                & (
                    F.lit(True)
                    if max_gap is None
                    else F.col(ts_col) <= F.col("__prev") + max_gap
                )
            )
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        counts.append(reached.agg(F.count(F.lit(1)).alias(f"stage_{stage}")))
    out = counts[0]
    for c in counts[1:]:
        # Combining single-row scalar frames: this plans as a
        # BroadcastNestedLoopJoin over 1x1 inputs, which is the intended
        # (and free) way to lay scalar aggregates side by side — the
        # data-scale joins above are all hash equi-joins on user_id.
        out = out.crossJoin(c)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    unit: str = "week",
) -> DataFrame:
    """Cohort retention: (cohort_<unit>, <unit>_offset, active_users).

    A user's cohort is the ``unit``-truncated period ('week' = Monday-based,
    or 'day') of their first event; they are active at offset w iff they have
    any event in cohort + w periods. Truncated periods differ by an exact
    multiple of the unit, so the offset is integer-exact.
    """
    days = {"week": 7, "day": 1}[unit]
    cohort_col, offset_col = f"cohort_{unit}", f"{unit}_offset"
    first_seen = (
        events.groupBy(user_col)
        .agg(F.date_trunc(unit, F.min(ts_col)).alias(cohort_col))
    )
    active = (
        events.select(user_col, F.date_trunc(unit, ts_col).alias("__p"))
        .join(first_seen, on=user_col)
        .select(
            user_col,
            cohort_col,
            (
                F.datediff(F.to_date("__p"), F.to_date(cohort_col)) / days
            ).cast("long").alias(offset_col),
        )
        .distinct()
    )
    return active.groupBy(cohort_col, offset_col).agg(
        F.count(F.lit(1)).alias("active_users")
    )


def gapfill_hours(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense hourly series per user: every hour between a user's first and
    last event, with zero-filled gaps.

    (user, hour, n_events, sum_value); missing hours appear with n_events=0,
    sum_value=0.0. The dense axis is built with ``sequence()`` + ``explode``
    — generated JVM-side per user, never a driver loop.
    """
    hourly = (
        events.groupBy(user_col, F.date_trunc("hour", ts_col).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
    )
    spans = hourly.groupBy(user_col).agg(
        F.min("hour").alias("__h0"), F.max("hour").alias("__h1")
    )
    dense = spans.select(
        user_col,
        F.explode(F.sequence("__h0", "__h1", F.expr("interval 1 hour"))).alias("hour"),
    )
    return (
        dense.join(hourly, on=[user_col, "hour"], how="left")
        .select(
            user_col,
            "hour",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    consecutive event types per user — the sequence-analytics summary a
    path/recommendation model starts from.

    One window pass per user (lag over the user's time order — a total
    order requires ``order_tiebreak`` when timestamps can tie), then a
    hash aggregate on the tiny (from, to) domain; the probability
    denominator is a window sum over that aggregate, not a second scan.

    Returns ``(from_type, to_type, n, p)`` where ``p`` is row-normalized
    per ``from_type``.
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = W.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(user_col, F.col(type_col).alias("to_type"), *order)
        .withColumn("from_type", F.lag("to_type").over(w))
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(W.partitionBy("from_type"))
    return pairs.withColumn("p", F.col("n") / total)
