"""``from_literals`` — the reference's only source.

Parity target: ``DataStream.fromLiterals[A: Type](as: A*)``
(/root/reference/src/main/scala/zio/analytics/DataStream.scala:40,87-88;
interpreter /root/reference/src/main/scala/zio/analytics/Local.scala:116-117).

The reference appends a final ``Long.MaxValue`` watermark to flush windows;
Spark handles end-of-stream flushing internally, so a plain bounded DataFrame
carries the same semantics (SURVEY.md §1.1 Record row).

Tuples map to positional ``_1, _2, …`` columns, mirroring the reference's
``TupleN → Product`` row model (SURVEY.md §1.2).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = ["from_literals"]


def from_literals(
    spark: SparkSession,
    rows: Sequence[Any],
    schema: Any | None = None,
) -> DataFrame:
    """Bounded in-memory source of literal rows.

    ``rows`` may be tuples (→ columns ``_1, _2, …``), dicts, or Rows. An
    explicit ``schema`` (DDL string or StructType) skips inference, matching
    the reference's static-schema philosophy (SURVEY.md §1.2).
    """
    if not rows and schema is None:
        raise ValueError("from_literals: empty input requires an explicit schema")
    if schema is not None:
        return spark.createDataFrame(rows, schema=schema)
    first = rows[0]
    if isinstance(first, tuple) and not hasattr(first, "_fields"):
        names = [f"_{i + 1}" for i in range(len(first))]
        return spark.createDataFrame(rows, schema=names)
    return spark.createDataFrame(rows)
