"""Composable event-analytics pipeline over the events table.

Run: python examples/event_analytics.py [sf_dir]

Chains the [EXT] product-analytics operators (operators/analytics.py):
funnel → cohort retention → gap-filled hourly series, all from one scan
definition — each is a lazy DataFrame, so Catalyst plans them independently
and shares nothing but the (cached-by-OS) parquet pages.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zio_analytics_spark.operators.analytics import (  # noqa: E402
    cohort_retention,
    funnel_counts,
    gapfill_hours,
)
from zio_analytics_spark.session import get_spark  # noqa: E402
from zio_analytics_spark.sources.parquet import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("event-analytics-example")
    events = read_table(spark, sf_dir, "events")

    print("== funnel (view -> click -> purchase) ==")
    funnel_counts(events, ["view", "click", "purchase"]).show()

    print("== weekly cohort retention ==")
    cohort_retention(events, unit="week").orderBy("cohort_week", "week_offset").show(10)

    print("== gap-filled hourly series (first user) ==")
    g = gapfill_hours(events)
    first_user = g.select("user_id").orderBy("user_id").first()["user_id"]
    g.where(g.user_id == first_user).orderBy("hour").show(10)


if __name__ == "__main__":
    main()
