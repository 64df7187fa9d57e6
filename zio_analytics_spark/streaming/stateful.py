"""Streaming ``MapAccumulate`` — arbitrary keyed state over an unbounded
stream, parity with /root/reference/src/main/scala/zio/analytics/
DataStream.scala:44-45 (interpreter Local.scala:139-151).

The reference threads one state value through the whole stream on a single
fiber. The distributed restatement is *keyed* state —
``applyInPandasWithState``: state per key, partitioned across executors,
checkpointed by the state store. A single global state (the literal
reference semantics) is the degenerate key ``lit(1)`` — correct, serialized,
and documented as such (total order costs parallelism in any engine).

Spark 4's successor API, ``transformWithStateInPandas`` (StatefulProcessor
with typed value/list/map state + timers), is the natural next target for
this module; it is unavailable in this container (its driver worker needs
``google.protobuf``, which is not importable here — verified empirically,
re-probed negative round 6, 2026-08-14), so the stable
``applyInPandasWithState`` remains the implementation. The
``map_accumulate_stream`` contract is API-agnostic: swapping the backend
changes no caller.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["map_accumulate_stream", "map_accumulate_stream_multi", "running_sum_stream"]


def map_accumulate_stream(
    stream: DataFrame,
    key_cols: list[str],
    fn: Callable[[Any, pd.DataFrame], tuple[Any, pd.DataFrame]],
    init_state: Callable[[], Any],
    output_schema: str,
    state_schema: str,
) -> DataFrame:
    """Keyed stateful scan over a stream via ``applyInPandasWithState``.

    ``fn(state, pdf) -> (new_state, out_pdf)`` is the reference's
    ``(S, A) => (S, B)`` step, batched. State must round-trip through the
    declared ``state_schema`` tuple.
    """

    def step(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        s = state.get if state.exists else (init_state(),)
        acc = s[0]
        outs = []
        for pdf in pdfs:
            acc, out = fn(acc, pdf)
            outs.append(out)
        state.update((acc,))
        for out in outs:
            yield out

    return stream.groupBy(*key_cols).applyInPandasWithState(
        step,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_sum_stream(stream: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """Demo instance: per-key running sum (the canonical MapAccumulate)."""
    key_schema = ", ".join(f"{k} long" for k in key_cols)

    def fn(acc: float, pdf: pd.DataFrame):
        sums = pdf[value_col].cumsum() + acc
        out = pdf[key_cols].copy()
        out["running_sum"] = sums
        return (acc + float(pdf[value_col].sum()), out)

    return map_accumulate_stream(
        stream,
        key_cols,
        fn,
        init_state=lambda: 0.0,
        output_schema=f"{key_schema}, running_sum double",
        state_schema="acc double",
    )


def map_accumulate_stream_multi(
    stream: DataFrame,
    key_cols: list[str],
    fn: Callable[[tuple, pd.DataFrame], tuple[tuple, pd.DataFrame]],
    init_state: Callable[[], tuple],
    output_schema: str,
    state_schema: str,
) -> DataFrame:
    """:func:`map_accumulate_stream` for MULTI-FIELD state: ``fn`` takes
    and returns the whole state TUPLE (one element per ``state_schema``
    field) instead of a single packed value — what two-state recurrences
    like Holt need without NaN-flag packing tricks."""

    def step(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        acc = tuple(state.get) if state.exists else tuple(init_state())
        outs = []
        for pdf in pdfs:
            acc, out = fn(acc, pdf)
            outs.append(out)
        state.update(tuple(acc))
        for out in outs:
            yield out

    return stream.groupBy(*key_cols).applyInPandasWithState(
        step,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
