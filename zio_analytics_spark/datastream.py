"""DataStream — the engine's fluent API, parity with the reference's plan ADT.

Reference: ``sealed abstract class DataStream[A]``
(/root/reference/src/main/scala/zio/analytics/DataStream.scala:5,40-56) — a lazy
logical plan built by a fluent builder and executed by an interpreter
(/root/reference/src/main/scala/zio/analytics/Local.scala:114-229).

Here the logical plan IS the Spark DataFrame (also lazy, also one plan node
per fluent call), and the interpreter is Catalyst + Tungsten. ``DataStream``
wraps::

    (df: DataFrame, key_cols: list[str], ts_col: str | None)

The reference's type-states ``Grouped[K, V]`` (Expression.scala:5) and
``Timestamped[A]`` (Expression.scala:7) become *tracked metadata* — key
columns and an event-time column — instead of nested structs, so every
operator lowers to vanilla DataFrame ops and Catalyst sees a plain relational
plan it can optimize (pushdown/pruning/join selection, SURVEY.md §4).

Scale notes (100 TB): ``group_by`` is logical-only, exactly like the
reference's ``GroupBy`` (Local.scala:157-160 just maps) — the shuffle happens
once, at the consuming ``fold``/``fold_window``, and Spark's hash aggregate
does map-side partial aggregation so the exchange carries partial states, not
rows. ``fold`` defaults to native aggregates; the reference's
whole-group-as-list contract (``Group.values: Chunk[V]``, Expression.scala:6;
materialized via ``runCollect`` at Local.scala:170-174) is available via
``fold_group``/``collect_list`` but is a deliberate opt-in because it is a
memory cliff at scale.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from zio_analytics_spark.windows import WindowAssigner

__all__ = ["DataStream"]

#: A column reference: a Column, a column name, or a USER LAMBDA over the
#: row proxy (``lambda r: r.value * 2``) — the reference's ``f(Expression.
#: Id())`` construction (DataStream.scala:59-84): the lambda runs ONCE at
#: plan-build time and must return a Column; no closure survives into the
#: plan. See zio_analytics_spark.functions.arrows.
ColumnLike = Column | str | Callable[..., Column]


def _to_col(c: ColumnLike) -> Column:
    if isinstance(c, str):
        return F.col(c)
    if isinstance(c, Column):
        return c
    if callable(c):
        from zio_analytics_spark.functions.arrows import apply_row_lambda

        out = apply_row_lambda(c)
        if not isinstance(out, Column):
            raise TypeError(
                f"row lambda must return a Column, got {type(out).__name__}"
            )
        return out
    raise TypeError(f"expected Column, name, or row lambda; got {type(c).__name__}")


_INTERVAL_UNITS_US = {
    "microsecond": 1, "microseconds": 1,
    "millisecond": 1_000, "milliseconds": 1_000,
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
}


def _interval_to_micros(interval: str) -> int:
    """Parse a simple '<n> <unit>' Spark interval string to microseconds."""
    n, unit = interval.strip().split()
    try:
        return int(n) * _INTERVAL_UNITS_US[unit.lower()]
    except KeyError:
        raise ValueError(f"unsupported interval unit in {interval!r}") from None


class DataStream:
    """A typed stream/table of rows: a lazy Spark plan plus grouping/time metadata."""

    def __init__(
        self,
        df: DataFrame,
        key_cols: Sequence[str] = (),
        ts_col: str | None = None,
    ) -> None:
        self.df = df
        self.key_cols = list(key_cols)
        self.ts_col = ts_col

    # ------------------------------------------------------------------ #
    # construction

    @classmethod
    def from_literals(cls, spark: SparkSession, rows: Sequence[Any], schema: Any | None = None) -> "DataStream":
        """Reference ``fromLiterals`` (DataStream.scala:87-88)."""
        from zio_analytics_spark.sources.literals import from_literals

        return cls(from_literals(spark, rows, schema))

    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str) -> "DataStream":
        """[EXT] parquet scan source (SURVEY.md §2.4)."""
        return cls(spark.read.parquet(path))

    def _with(self, df: DataFrame, key_cols: Sequence[str] | None = None, ts_col: Any = ...) -> "DataStream":
        return DataStream(
            df,
            self.key_cols if key_cols is None else key_cols,
            self.ts_col if ts_col is ... else ts_col,
        )

    # ------------------------------------------------------------------ #
    # stateless core — reference §2.1 #2-4

    def map(self, *cols: ColumnLike, **named: ColumnLike) -> "DataStream":
        """Per-row projection — reference ``Map`` (DataStream.scala:41; Local.scala:119-121).

        ``named`` kwargs alias columns: ``.map(disc_price=col*...)``. Grouping
        keys are NOT preserved; use ``map_values`` on a grouped stream.
        """
        exprs = [_to_col(c) for c in cols]
        exprs += [_to_col(c).alias(n) for n, c in named.items()]
        return DataStream(self.df.select(*exprs), ts_col=None)

    def map_concat(self, arr: ColumnLike, alias: str, keep: Sequence[ColumnLike] = ()) -> "DataStream":
        """flatMap: row → 0..n rows — reference ``MapConcat`` (DataStream.scala:42; Local.scala:131-137).

        The reference's shape is "map to a List, then emit its elements":
        ``.map_concat(F.split(text, ' '), 'word')`` ≡ explode. Arbitrary
        fan-out beyond array-explode goes through ``map_in_pandas``.
        """
        kept = [_to_col(c) for c in keep]
        return DataStream(self.df.select(*kept, F.explode(_to_col(arr)).alias(alias)), ts_col=None)

    def filter(self, pred: ColumnLike) -> "DataStream":
        """Per-row predicate — reference ``Filter`` (DataStream.scala:43; Local.scala:123-129).

        Watermark passthrough (Local.scala:126-128) is implicit in Spark."""
        return self._with(self.df.where(_to_col(pred)))

    def with_column(self, name: str, expr: ColumnLike) -> "DataStream":
        """[EXT] convenience projection that keeps all existing columns."""
        return self._with(self.df.withColumn(name, _to_col(expr)))

    # ------------------------------------------------------------------ #
    # grouping + aggregation — reference §2.1 #6-8

    def group_by(self, *keys: ColumnLike, **named: ColumnLike) -> "DataStream":
        """Assign a grouping key — reference ``GroupBy`` (DataStream.scala:46-47).

        Logical only: no shuffle happens here (the reference's interpreter
        just tags rows, Local.scala:157-160; Spark defers the exchange to the
        consuming aggregation). Regrouping an already-grouped stream appends
        key columns — the ``ComputeGrouping`` nested-key typeclass
        (DataStream.scala:7-38) degenerates to a list append.
        """
        df = self.df
        new_keys = list(self.key_cols)
        for k in keys:
            if isinstance(k, str):
                new_keys.append(k)
            else:
                raise TypeError("group_by: pass Column keys as named kwargs so the key has a name")
        for name, expr in named.items():
            df = df.withColumn(name, _to_col(expr))
            new_keys.append(name)
        return DataStream(df, key_cols=new_keys, ts_col=self.ts_col)

    def map_values(self, **named: ColumnLike) -> "DataStream":
        """Transform values, keys unchanged — reference ``MapValues``
        (DataStream.scala:49,76-77; Local.scala:177-183). A projection that
        preserves the key columns."""
        if not self.key_cols:
            raise ValueError("map_values requires a grouped stream (call group_by first)")
        exprs = [F.col(k) for k in self.key_cols]
        exprs += [_to_col(c).alias(n) for n, c in named.items()]
        ts = self.ts_col if self.ts_col in {*self.key_cols, *named} else None
        return DataStream(self.df.select(*exprs), key_cols=self.key_cols, ts_col=ts)

    def fold(self, *aggs: Column, **named_aggs: Column) -> "DataStream":
        """Aggregate each group — reference ``Fold`` (DataStream.scala:48; Local.scala:162-175).

        Fast path: native aggregate expressions (hash agg, partial+final —
        the exchange ships partial states, not rows). The reference instead
        materializes every group as a list (``runCollect``,
        Local.scala:170-174) — that literal contract is ``fold_group`` /
        ``F.collect_list``, kept opt-in because it's a scale cliff.
        """
        if not self.key_cols:
            raise ValueError("fold requires a grouped stream (call group_by first)")
        exprs = list(aggs) + [a.alias(n) for n, a in named_aggs.items()]
        out = self.df.groupBy(*[F.col(k) for k in self.key_cols]).agg(*exprs)
        return DataStream(out)

    def fold_group(self, fn: Callable, schema: Any) -> "DataStream":
        """Whole-group reduction with an arbitrary Python function —
        the reference's literal ``Fold`` contract (``Group[K, Chunk[V]]``,
        Expression.scala:6) via ``applyInPandas``: each group arrives as one
        pandas DataFrame. Use only when native aggregates can't express the
        reduction; groups must fit in executor memory (same cliff as the
        reference's ``runCollect``, Local.scala:170-174).
        """
        if not self.key_cols:
            raise ValueError("fold_group requires a grouped stream")
        out = self.df.groupBy(*[F.col(k) for k in self.key_cols]).applyInPandas(fn, schema)
        return DataStream(out)

    # ------------------------------------------------------------------ #
    # event time + windows — reference §2.1 #9-10, §2.2

    def assign_timestamps(self, ts: ColumnLike, watermark_delay: str | None = None) -> "DataStream":
        """Designate the event-time column — reference ``AssignTimestamps``
        (DataStream.scala:50,69-70; Local.scala:185-193).

        ``ts`` must be/cast-to TimestampType. ``watermark_delay`` (e.g.
        ``'10 minutes'``) applies ``withWatermark`` — meaningful on streaming
        frames, a no-op marker on batch. The reference's "drop prior
        watermarks" rule (Local.scala:189-192) is moot here: Spark derives
        watermarks from the declared column.
        """
        name = ts if isinstance(ts, str) else "ts"
        df = self.df if isinstance(ts, str) else self.df.withColumn(name, _to_col(ts))
        if watermark_delay is not None:
            df = df.withWatermark(name, watermark_delay)
        return DataStream(df, key_cols=self.key_cols, ts_col=name)

    def fold_window(self, assigner: WindowAssigner, *aggs: Column, **named_aggs: Column) -> "DataStream":
        """Windowed incremental aggregation per (key, window) — reference
        ``FoldWindow`` (DataStream.scala:51-56; Local.scala:195-228).

        Spark natively reproduces the reference's machinery: window
        assignment incl. sliding duplication (Local.scala:200-206),
        incremental partial aggregation (:214-226), emit-on-watermark
        (:221-225) and late-data drop (:215-219) in streaming append mode.
        The output carries ``window.start``/``window.end`` columns
        (``[start, end)`` — SURVEY.md §2.2 bound-convention note).
        """
        if self.ts_col is None:
            raise ValueError("fold_window requires assign_timestamps first")
        if not self.key_cols:
            raise ValueError("fold_window requires a grouped stream")
        exprs = list(aggs) + [a.alias(n) for n, a in named_aggs.items()]
        win = assigner.assign(F.col(self.ts_col)).alias("window")
        out = self.df.groupBy(win, *[F.col(k) for k in self.key_cols]).agg(*exprs)
        out = out.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(c) for c in out.columns if c != "window"],
        )
        return DataStream(out)

    def fold_window_group(self, assigner: WindowAssigner, fn: Callable, schema: Any) -> "DataStream":
        """Windowed whole-group fold with an arbitrary Python reducer — the
        reference ``FoldWindow``'s general ``z``/``f`` contract
        (DataStream.scala:51-56) when native aggregates can't express the
        fold. Each (key, window) group arrives as one pandas DataFrame with
        ``window_start``/``window_end`` columns present.

        All three assigners are supported in batch: tumbling labels rows by
        epoch-aligned bucket arithmetic; sliding EXPLODES each row into the
        windows covering it (the reference's duplication, Local.scala:
        200-206, done as sequence+explode); session labels rows by
        gaps-and-islands (new-session flag where the gap exceeds the
        threshold, running count = session id) and derives the merged
        interval per group — the same semantics ``F.session_window``
        produces in the native path.

        Groups must fit in executor memory; prefer ``fold_window`` (native
        incremental aggregates) whenever possible — this path materializes
        the group, like the reference's ``Fold`` (Local.scala:170-174),
        where native windowed aggs keep O(1) state per (key, window).
        """
        if self.ts_col is None:
            raise ValueError("fold_window_group requires assign_timestamps first")
        if not self.key_cols:
            raise ValueError("fold_window_group requires a grouped stream")
        us = F.unix_micros(F.col(self.ts_col))
        size_us = _interval_to_micros(assigner.size)
        # Epoch-aligned bucketing uses pmod, not Java's signed %: for
        # pre-epoch (negative) event times `us - us % step` would yield a
        # start AFTER the event — pmod keeps start ≤ ts on both sides of
        # the epoch, matching F.window's floor semantics in the native path.
        if assigner.kind == "tumbling":
            start_us = us - F.pmod(us, F.lit(size_us))
            with_win = self.df.withColumn("__ws", start_us).withColumn(
                "__we", start_us + F.lit(size_us)
            )
        elif assigner.kind == "sliding":
            step_us = _interval_to_micros(assigner.step)
            # windows starting at multiples of step in (ts - size, ts]
            last_start = us - F.pmod(us, F.lit(step_us))
            n_back = -(-size_us // step_us) - 1  # ceil(size/step) - 1
            starts = F.sequence(
                last_start - F.lit(n_back * step_us), last_start, F.lit(step_us)
            )
            with_win = (
                self.df.withColumn("__ws", F.explode(starts))
                # both bounds: a window contains ts iff ws ≤ ts < ws + size
                .where((F.col("__ws") <= us) & ((F.col("__ws") + F.lit(size_us)) > us))
                .withColumn("__we", F.col("__ws") + F.lit(size_us))
            )
        elif assigner.kind == "session":
            gap_us = size_us  # session assigner stores the gap in .size
            keyw = W.partitionBy(*[F.col(k) for k in self.key_cols]).orderBy(us)
            prev = F.lag(us).over(keyw)
            new_s = F.when(prev.isNull() | ((us - prev) > F.lit(gap_us)), 1).otherwise(0)
            sid = F.sum(new_s).over(
                keyw.rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            sw = W.partitionBy(*[F.col(k) for k in self.key_cols], F.col("__sid"))
            with_win = (
                self.df.withColumn("__us", us)
                .withColumn("__sid", sid)
                .withColumn("__ws", F.min("__us").over(sw))
                .withColumn("__we", F.max("__us").over(sw) + F.lit(gap_us))
                .drop("__us", "__sid")
            )
        else:
            raise ValueError(f"unknown window kind: {assigner.kind}")
        with_win = with_win.withColumn(
            "window_start", F.timestamp_micros(F.col("__ws"))
        ).withColumn("window_end", F.timestamp_micros(F.col("__we"))).drop("__ws", "__we")
        out = with_win.groupBy(
            "window_start", "window_end", *[F.col(k) for k in self.key_cols]
        ).applyInPandas(fn, schema)
        return DataStream(out)

    # ------------------------------------------------------------------ #
    # stateful scan — reference §2.1 #5 (implemented in operators.accumulate)

    def map_accumulate(
        self,
        order_by: Sequence[ColumnLike],
        running: dict[str, Column],
        partition_by: Sequence[str] = (),
    ) -> "DataStream":
        """Stateful ordered scan — reference ``MapAccumulate``
        (DataStream.scala:44-45; Local.scala:139-151). See
        :mod:`zio_analytics_spark.operators.accumulate` for the
        associative-fast-path / general-path contract.
        """
        from zio_analytics_spark.operators.accumulate import map_accumulate

        return DataStream(
            map_accumulate(self.df, order_by=order_by, running=running, partition_by=partition_by),
            key_cols=self.key_cols,
            ts_col=self.ts_col,
        )

    # ------------------------------------------------------------------ #
    # [EXT] relational layer (absent in the reference — SURVEY.md §2.4)

    def join(
        self,
        other: "DataStream | DataFrame",
        on: Any,
        how: str = "inner",
        broadcast_other: bool = False,
    ) -> "DataStream":
        """[EXT] join; ``broadcast_other=True`` hints the small side to skip the shuffle."""
        right = other.df if isinstance(other, DataStream) else other
        if broadcast_other:
            right = F.broadcast(right)
        return DataStream(self.df.join(right, on, how))

    def order_by(self, *cols: ColumnLike) -> "DataStream":
        return self._with(self.df.orderBy(*[_to_col(c) for c in cols]))

    def limit(self, n: int) -> "DataStream":
        return self._with(self.df.limit(n))

    def distinct(self) -> "DataStream":
        return self._with(self.df.distinct())

    def union(self, other: "DataStream | DataFrame") -> "DataStream":
        return self._with(self.df.unionByName(other.df if isinstance(other, DataStream) else other))

    def intersect(self, other: "DataStream | DataFrame") -> "DataStream":
        return self._with(self.df.intersect(other.df if isinstance(other, DataStream) else other))

    def except_all(self, other: "DataStream | DataFrame") -> "DataStream":
        return self._with(self.df.exceptAll(other.df if isinstance(other, DataStream) else other))

    def rollup_fold(self, *keys: str, **named_aggs: Column) -> "DataStream":
        """[EXT] hierarchical subtotals: GROUP BY ROLLUP(keys)."""
        out = self.df.rollup(*keys).agg(*[a.alias(n) for n, a in named_aggs.items()])
        return DataStream(out)

    def cube_fold(self, *keys: str, **named_aggs: Column) -> "DataStream":
        """[EXT] all grouping-set combinations: GROUP BY CUBE(keys)."""
        out = self.df.cube(*keys).agg(*[a.alias(n) for n, a in named_aggs.items()])
        return DataStream(out)

    def pivot_fold(self, pivot_col: str, values: Sequence[str], agg: Column, fill=None) -> "DataStream":
        """[EXT] pivot the grouped stream on ``pivot_col``; pass ``values``
        explicitly (scanning for distinct pivot values is an extra job at
        scale) and ``fill`` for absent combinations."""
        if not self.key_cols:
            raise ValueError("pivot_fold requires a grouped stream")
        out = self.df.groupBy(*[F.col(k) for k in self.key_cols]).pivot(pivot_col, list(values)).agg(agg)
        if fill is not None:
            out = out.na.fill(fill)
        return DataStream(out)

    def as_of_join(
        self,
        other: "DataStream | DataFrame",
        on: str,
        other_on: str,
        time: str,
        other_time: str,
        values: Sequence[str],
    ) -> "DataStream":
        """[EXT] backward as-of join (see operators/asof.py for the
        union-merge strategy and its scale contract)."""
        from zio_analytics_spark.operators.asof import asof_join

        right = other.df if isinstance(other, DataStream) else other
        return DataStream(
            asof_join(self.df, right, on, other_on, time, other_time, values),
            key_cols=self.key_cols,
            ts_col=self.ts_col,
        )

    # ------------------------------------------------------------------ #
    # escape hatches (UDTF-like) and execution

    def map_in_pandas(self, fn: Callable, schema: Any) -> "DataStream":
        """[EXT] per-partition Arrow-batched transform (the vetted slow path)."""
        return DataStream(self.df.mapInPandas(fn, schema))

    def repartition(self, n: int, *cols: ColumnLike) -> "DataStream":
        return self._with(self.df.repartition(n, *[_to_col(c) for c in cols]))

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)

    def to_df(self) -> DataFrame:
        return self.df

    def collect(self):
        return self.df.collect()

    def __repr__(self) -> str:  # pragma: no cover
        keys = f", keys={self.key_cols}" if self.key_cols else ""
        ts = f", ts={self.ts_col}" if self.ts_col else ""
        return f"DataStream({self.df.schema.simpleString()}{keys}{ts})"
