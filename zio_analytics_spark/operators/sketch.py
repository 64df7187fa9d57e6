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

__all__ = ["heavy_hitters", "partition_candidates", "equi_depth_bins", "cms_build", "cms_estimate", "sliding_distinct"]


def _candidate_scan(items: DataFrame, col: str, min_ratio: float) -> DataFrame:
    """Pass-1 scan: per-partition candidates PLUS the partition row count.

    Each partition emits its local heavy-hitter candidates (``col`` set,
    ``__part_rows`` null) and exactly one sentinel row (``col`` null,
    ``__part_rows`` = partition row count). Folding the total into this scan
    means ``heavy_hitters`` never runs a separate ``count()`` job over the
    full input — at 100 TB that second scan is the difference between two
    reads and three. The candidate schema is derived from the input column's
    type (not hardcoded string) so numeric/binary keys semi-join without
    implicit casts that could silently drop candidates.
    """
    dtype = items.schema[col].dataType.simpleString()

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        n = 0
        for pdf in batches:
            vals = pdf[col].dropna()
            n += len(pdf)
            counts.update(vals)
        bar = min_ratio * n
        out = [k for k, c in counts.items() if c >= bar]
        yield pd.DataFrame(
            {
                col: pd.Series(out + [None], dtype=object),
                "__part_rows": pd.Series([None] * len(out) + [n], dtype="Int64"),
            }
        )

    return items.select(col).mapInPandas(scan, schema=f"{col} {dtype}, __part_rows long")


def partition_candidates(items: DataFrame, col: str, min_ratio: float) -> DataFrame:
    """Per-partition candidate heavy hitters (superset of the global ones)."""
    return (
        _candidate_scan(items, col, min_ratio)
        .where(F.col(col).isNotNull())
        .select(col)
        .distinct()
    )


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

    Two input scans total: pass 1 emits (candidates + per-partition totals)
    in ONE ``mapInPandas`` read, collected in ONE job — the scan output is
    bounded at ``partitions x (1/min_ratio + 1)`` rows, so pulling it to the
    driver is exactly the materialization a broadcast join performs anyway,
    and nothing is left behind in the executor block store (no lingering
    ``persist``). Pass 2 is the broadcast semi-join + exact count.
    Candidates are never null (pass 1 drops nulls), so the null sentinel
    rows are unambiguous.
    """
    dtype = items.schema[col].dataType.simpleString()
    rows = _candidate_scan(items, col, min_ratio).collect()
    total = sum(r["__part_rows"] for r in rows if r["__part_rows"] is not None)
    cand_vals = sorted({r[col] for r in rows if r[col] is not None})
    spark = items.sparkSession
    cand = spark.createDataFrame([(v,) for v in cand_vals], f"{col} {dtype}")
    exact = (
        items.join(F.broadcast(cand), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(freq_col))
        .where(F.col(freq_col) >= F.lit(min_ratio) * F.lit(total))
    )
    return exact


def equi_depth_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Equal-frequency histogram: exact quantile boundaries → bucket counts.

    Two passes, neither a global sort (the naive ``ntile`` formulation is a
    single-task total-order window — a scale cliff this operator exists to
    avoid):

    1. ONE aggregate computes the ``n_bins - 1`` exact interior quantiles
       (``percentile(col, array(...))``); the boundary list is bounded
       (n_bins doubles) so collecting it to the driver is the same
       materialization a broadcast performs.
    2. Bucket id = ``1 + Σ [value > boundary_i]`` — a codegen'd projection
       (boundaries inlined as literals), then an ordinary hash aggregate.

    Ties sit deterministically on the strict ``>`` rule: equal values always
    share a bucket (so bucket sizes deviate from n/n_bins exactly where
    duplicate mass forces them to). At 100 TB swap pass 1's exact percentile
    for ``approx_percentile`` — pass 2 is unchanged.

    Returns ``(bucket, n, lo, hi)`` — count and value range per bucket.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = df.agg(
        F.expr(f"percentile({col}, array({', '.join(map(str, qs))}))")
    ).first()[0]
    if bounds is None:  # empty/all-null input: no bins to report
        return df.sparkSession.createDataFrame(
            [], f"{bucket_col} int, n long, lo {df.schema[col].dataType.simpleString()}, "
            f"hi {df.schema[col].dataType.simpleString()}"
        )
    c = F.col(col)
    bucket = F.lit(1)
    for b in bounds:
        bucket = bucket + (c > F.lit(float(b))).cast("int")
    return (
        df.select(bucket.alias(bucket_col), c)
        .groupBy(bucket_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
        )
    )


def cms_build(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 3,
    seed: str = "cms",
) -> DataFrame:
    """Count-min sketch of a column: ``depth`` hash rows × ``width``
    counters. Returns the counter table ``(row, bucket, cnt)`` —
    ``depth·width`` cells regardless of input size (the mergeable-sketch
    property: counters from different partitions/days just add).

    The row-``r`` hash is the first 8 hex digits of
    ``md5('<seed>|r|' || value)`` mod width — md5 is engine-identical,
    so unlike library sketches this one is EXACTLY replayable by a SQL
    oracle (same buckets, same counters, same estimates). The build is
    one aggregate whose key space is depth·width: map-side partial
    aggregation collapses the per-row explosion before the exchange, so
    the shuffle carries at most depth·width cells per map task at any
    data scale.
    """
    c = F.col(col).cast("string")
    rows = []
    for r in range(depth):
        bucket = (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}|{r}|"), c)), 1, 8), 16, 10)
            .cast("long")
            % width
        )
        rows.append(
            df.select(F.lit(r).alias("row"), bucket.alias("bucket"))
        )
    all_rows = rows[0]
    for other in rows[1:]:
        all_rows = all_rows.unionAll(other)
    return all_rows.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    counters: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 3,
    seed: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every row of ``items``: estimate =
    min over hash rows of the addressed counter (the classic one-sided
    bound: estimate ≥ true count, with overestimate probability shrinking
    geometrically in ``depth``). The counter table is depth·width cells —
    it BROADCASTS; the items side never shuffles."""
    c = F.col(col).cast("string")
    sel = items.select(F.col(col))
    for r in range(depth):
        bucket = (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}|{r}|"), c)), 1, 8), 16, 10)
            .cast("long")
            % width
        )
        sel = sel.withColumn(f"__b{r}", bucket)
    out = sel
    for r in range(depth):
        cr = counters.where(F.col("row") == r).select(
            F.col("bucket").alias(f"__b{r}"), F.col("cnt").alias(f"__c{r}")
        )
        out = out.join(F.broadcast(cr), f"__b{r}", "left")
    est = F.least(*[F.coalesce(F.col(f"__c{r}"), F.lit(0)) for r in range(depth)])
    return out.select(F.col(col), est.alias("est"))


def sliding_distinct(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    window_days: int = 7,
    day_col: str = "day",
    out_col: str = "n_distinct",
) -> DataFrame:
    """EXACT distinct-id count over a trailing ``window_days`` window, per
    observed day — the aggregate a naive engine cannot make incremental:
    ``count(DISTINCT)`` is not re-aggregable, so the textbook plan
    re-scans ``window_days`` of raw data for EVERY output day.

    The mergeable restatement (the agg_bitmap_distinct story, extended to
    windows): raw rows collapse once into per-(day, 32k-bucket) BITMAP
    segments — fixed 4 KB partials, exact, OR-mergeable. Each segment then
    fans out to the ≤ ``window_days`` target days it serves (a codegen
    ``sequence``/``explode`` over the day spine), and per-day results are
    one ``bitmap_or_agg`` + popcount over day×bucket-grain rows — orders
    of magnitude below raw grain. At 100 TB the day segments PERSIST:
    tomorrow's window is one OR over stored bitmaps, zero re-scan of
    history. Only days that appear in the data are emitted (observed-day
    spine, matching a plain windowed COUNT(DISTINCT) oracle).
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    day = F.to_date(F.col(ts_col))
    seg = (
        df.select(
            day.alias("__day"),
            F.bitmap_bucket_number(F.col(id_col)).alias("__bucket"),
            F.bitmap_bit_position(F.col(id_col)).alias("__pos"),
        )
        .groupBy("__day", "__bucket")
        .agg(F.bitmap_construct_agg(F.col("__pos")).alias("__bm"))
    )
    days = seg.select(F.col("__day").alias("__target")).distinct()
    contrib = seg.withColumn(
        "__target",
        F.explode(
            F.sequence(
                F.col("__day"), F.date_add(F.col("__day"), window_days - 1)
            )
        ),
    ).join(F.broadcast(days), "__target", "left_semi")
    return (
        contrib.groupBy("__target", "__bucket")
        .agg(F.bitmap_or_agg(F.col("__bm")).alias("__orbm"))
        .groupBy("__target")
        .agg(F.sum(F.bitmap_count(F.col("__orbm"))).alias(out_col))
        .select(F.col("__target").alias(day_col), out_col)
    )
