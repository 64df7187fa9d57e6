"""[EXT] Frequency-sketch operators: heavy hitters at scale.

``heavy_hitters`` finds the items whose frequency is >= ``min_ratio`` of the
total — EXACTLY — without ever shuffling the full item cardinality:

- **Pass 1 (candidates)**: a ``mapInPandas`` scan counts items *within each
  partition* (the whole partition streams through the Arrow iterator, so the
  per-partition count is complete). An item is emitted as a candidate iff its
  local frequency >= ``min_ratio`` x the partition's row count. By pigeonhole,
  every global heavy hitter must clear that bar in at least one partition
  (if it were below the ratio in every partition, its global sum would be
  below the ratio of the total), so the union of local candidates is a
  guaranteed superset. Each partition emits at most ``1/min_ratio`` items,
  so the candidate set is tiny regardless of data volume — this is the
  SpaceSaving/Misra-Gries style bound that makes the operator viable at
  100 TB where a raw ``groupBy(item)`` would shuffle billions of keys.
- **Pass 2 (verify)**: exact counts restricted to the candidates via a
  broadcast semi-join, then filter by the global threshold. The output is
  exact, which is what lets the driver check it against a plain
  ``GROUP BY ... HAVING`` oracle.

The reference has no sketch operators (its only aggregation is Fold,
/root/reference/src/main/scala/zio/analytics/DataStream.scala:47); this is
part of the [EXT] LLM-pipeline surface (SURVEY.md §2.4).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters", "partition_candidates"]


def partition_candidates(items: DataFrame, col: str, min_ratio: float) -> DataFrame:
    """Per-partition candidate heavy hitters (superset of the global ones)."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        n = 0
        for pdf in batches:
            vals = pdf[col].dropna()
            n += len(pdf)
            counts.update(vals)
        bar = min_ratio * n
        out = [k for k, c in counts.items() if c >= bar]
        yield pd.DataFrame({col: pd.Series(out, dtype=object)})

    return items.select(col).mapInPandas(scan, schema=f"{col} string").distinct()


def heavy_hitters(
    items: DataFrame,
    col: str,
    min_ratio: float,
    freq_col: str = "freq",
) -> DataFrame:
    """Items with global frequency >= ``min_ratio`` * total rows — exact.

    ``items`` is one row per occurrence (e.g. exploded tokens). Returns
    ``(col, freq_col)``; equivalent to ``GROUP BY col HAVING count(*) >=
    min_ratio * total`` but with the shuffle bounded by the candidate set.
    """
    total = items.count()
    cand = partition_candidates(items, col, min_ratio)
    exact = (
        items.join(F.broadcast(cand), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(freq_col))
        .where(F.col(freq_col) >= F.lit(min_ratio) * F.lit(total))
    )
    return exact
