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

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["map_accumulate", "map_accumulate_general"]

#: Above this many rows, a keyless (total-order) scan is almost certainly a
#: mistake at scale — the whole input funnels through ONE task. The guard
#: fires AT EXECUTION TIME (an expression/in-task check, never a plan-build
#: job — constructing the DataFrame stays lazy and free); ``keyless_limit``
#: overrides the threshold, ``keyless_limit=0`` disables it.
KEYLESS_ROW_LIMIT = 10_000_000


def _keyless_msg(op: str, limit: int) -> str:
    return (
        f"{op} without partition_by forces a single-task total-order scan "
        f"over more than {limit:,} rows; pass partition_by keys, or "
        "keyless_limit=0 to acknowledge the total-order cliff"
    )


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

    Without ``partition_by`` Spark plans a single-partition window. The
    keyless guard is a DEFERRED runtime check: EVERY running column is
    wrapped in ``when(row_count > limit, raise_error(...))`` over the same
    frame, so exceeding ``keyless_limit`` rows (default
    ``KEYLESS_ROW_LIMIT``; ``0`` disables) fails the job with a clear
    message no matter which subset of the output columns a downstream
    ``select`` keeps — Catalyst prunes unreferenced columns, so a guard on
    only one of them would vanish with it. The running count is one extra
    aggregate in the SAME single window pass (not one per column, and no
    extra job); building the plan never triggers a Spark job (laziness is
    part of the DataFrame contract; an eager count here would itself be a
    full scan at 100 TB, running even for never-executed plans).
    """
    w = W.partitionBy(*partition_by) if partition_by else W.partitionBy()
    w = w.orderBy(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    w = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    guard: Column | None = None
    if not partition_by and keyless_limit != 0:
        limit = keyless_limit or KEYLESS_ROW_LIMIT
        guard = F.count(F.lit(1)).over(w) > F.lit(limit)
    out = df
    for name, agg in running.items():
        expr = agg.over(w)
        if guard is not None:
            expr = F.when(
                guard, F.raise_error(F.lit(_keyless_msg("map_accumulate", limit)))
            ).otherwise(expr)
        out = out.withColumn(name, expr)
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
    coalesced to ONE partition — a documented scale cliff that only
    total-order semantics can demand; the keyless guard counts rows INSIDE
    the scan task and raises past ``keyless_limit`` (default
    ``KEYLESS_ROW_LIMIT``, ``0`` disables) — a deferred in-task check, so
    building the plan never triggers a Spark job.
    """
    def scan(pdf):
        pdf = pdf.sort_values(list(order_by), kind="mergesort")
        state = init_state()
        state, out = fn(state, pdf)
        return out

    if partition_by:
        return df.groupBy(*partition_by).applyInPandas(lambda pdf: scan(pdf), schema)

    limit = None if keyless_limit == 0 else (keyless_limit or KEYLESS_ROW_LIMIT)
    msg = _keyless_msg("map_accumulate_general", limit or 0)

    def scan_partition(it):
        import pandas as pd

        chunks = []
        n = 0
        for chunk in it:
            n += len(chunk)
            if limit is not None and n > limit:
                raise ValueError(msg)
            chunks.append(chunk)
        if not chunks:
            return
        yield scan(pd.concat(chunks, ignore_index=True))

    return df.coalesce(1).mapInPandas(scan_partition, schema)
