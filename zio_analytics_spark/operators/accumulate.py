"""``map_accumulate`` — stateful ordered scan.

Reference: ``MapAccumulate`` threads state S through the stream in arrival
order, one output per row (/root/reference/src/main/scala/zio/analytics/
DataStream.scala:44-45; interpreter Local.scala:139-151 via ``mapAccum``).

Arrival order doesn't exist in a distributed batch engine, so the contract is
re-stated over an explicit sort order (the reference's arrival order was
equally explicit — it was the literal insertion order):

1. **Associative fast path** (default): the accumulator update is an
   associative aggregate (sum/count/min/max/...), so the scan is a running
   window aggregate — ``Window.orderBy(ord).rowsBetween(unboundedPreceding,
   currentRow)``. With ``partition_by`` keys this is fully parallel (the
   common case at scale: running state per user/key). Without keys Spark
   plans a single-partition window — correct, but serialized; that is
   inherent to a total-order scan, not a Spark limitation (the reference is
   *always* serialized here: one fiber, Local.scala:139-151).

2. **General path** (``map_accumulate_general``): arbitrary Python state
   function, per-partition ``applyInPandas`` scan after a range
   repartition-and-sort when keyed, or an explicit single partition when a
   total order is demanded. Streaming equivalent:
   :func:`zio_analytics_spark.streaming.stateful.map_accumulate_stream`.
"""

from __future__ import annotations

import warnings
from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["map_accumulate", "map_accumulate_general"]

#: Above this many rows, a keyless (total-order) scan is almost certainly a
#: mistake at scale — the whole input funnels through ONE task. The guard is
#: advisory (warn) by default because total-order semantics are sometimes the
#: point; ``keyless_limit`` makes it a hard error or disables it.
KEYLESS_ROW_WARN_THRESHOLD = 10_000_000


def _guard_keyless(df: DataFrame, op: str, keyless_limit: int | None) -> None:
    """Warn (or raise) when a keyless total-order scan looks too big.

    The size check is a distributed ``count()`` — itself parallel and cheap
    relative to the single-task scan it guards against.
    """
    if keyless_limit == 0:
        return
    limit = keyless_limit or KEYLESS_ROW_WARN_THRESHOLD
    n = df.count()
    if n > limit:
        msg = (
            f"{op} without partition_by forces a single-task total-order scan "
            f"over {n:,} rows (> {limit:,}); pass partition_by keys, or "
            "keyless_limit=0 to acknowledge the total-order cliff"
        )
        if keyless_limit is not None:
            raise ValueError(msg)
        warnings.warn(msg, ResourceWarning, stacklevel=3)


def map_accumulate(
    df: DataFrame,
    order_by: Sequence[Column | str],
    running: dict[str, Column],
    partition_by: Sequence[str] = (),
    keyless_limit: int | None = None,
) -> DataFrame:
    """Associative fast path: running aggregates over an explicit order.

    ``running`` maps output-column name → aggregate expression, e.g.
    ``{"running_sum": F.sum("value")}``. Each becomes
    ``agg.over(window.rowsBetween(unboundedPreceding, currentRow))``.

    Without ``partition_by`` Spark plans a single-partition window; above
    ``keyless_limit`` rows (default: warn at ``KEYLESS_ROW_WARN_THRESHOLD``,
    raise if a limit is given, ``0`` disables) the keyless guard fires.
    """
    if not partition_by:
        _guard_keyless(df, "map_accumulate", keyless_limit)
    w = W.partitionBy(*partition_by) if partition_by else W.partitionBy()
    w = w.orderBy(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    w = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    out = df
    for name, agg in running.items():
        out = out.withColumn(name, agg.over(w))
    return out


def map_accumulate_general(
    df: DataFrame,
    order_by: Sequence[str],
    fn: Callable,
    schema: Any,
    init_state: Callable[[], Any],
    partition_by: Sequence[str] = (),
    keyless_limit: int | None = None,
) -> DataFrame:
    """General path: arbitrary Python accumulator ``fn(state, pdf) -> (state, pdf_out)``.

    ``fn`` receives the state and a sorted pandas chunk, returns updated state
    and the output chunk. With ``partition_by``, state is per-key and the scan
    runs parallel per group (``applyInPandas``). Without keys the frame is
    coalesced to ONE partition — a documented scale cliff that only total-order
    semantics can demand; the keyless guard warns above
    ``KEYLESS_ROW_WARN_THRESHOLD`` rows (raises if ``keyless_limit`` is given,
    ``keyless_limit=0`` disables).
    """
    def scan(pdf):
        pdf = pdf.sort_values(list(order_by), kind="mergesort")
        state = init_state()
        state, out = fn(state, pdf)
        return out

    if partition_by:
        return df.groupBy(*partition_by).applyInPandas(lambda pdf: scan(pdf), schema)

    def scan_partition(it):
        import pandas as pd

        chunks = list(it)
        if not chunks:
            return
        yield scan(pd.concat(chunks, ignore_index=True))

    _guard_keyless(df, "map_accumulate_general", keyless_limit)
    return df.coalesce(1).mapInPandas(scan_partition, schema)
