"""Scalar function surface.

The reference's complete scalar library is 2 arithmetic ops, 1 string
function, 2 list functions, and structural plumbing
(/root/reference/src/main/scala/zio/analytics/Expression.scala:19-43; eval
Local.scala:7-52 — SURVEY.md §2.3). Catalyst's ``Column`` is our expression
IR (same reified-tree idea as the reference's ``Expression[A, B]`` arrows,
Expression.scala:9), so the mapping is a direct re-export plus named parity
aliases below. Beyond parity, the full ``pyspark.sql.functions`` surface is
the [EXT] library (comparisons, booleans, dates, math, JSON, maps — none of
which exist in the reference, SURVEY.md §2.3 tail).

Staying on these (JVM-side, whole-stage-codegen'd) expressions instead of
Python UDFs is the #1 hot-path rule at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import *  # noqa: F401,F403 — [EXT] full surface re-export

__all__ = [  # noqa: F405
    "lit_",
    "sum_",
    "mul",
    "split",
    "length",
    "list_sum",
    "nth_column",
    "flip_tuple",
    "fan_out",
]


def lit_(v) -> Column:
    """Literals — reference ``LongLiteral``/``StringLiteral``/``BooleanLiteral``
    (Expression.scala:23-25; auto-lift :94)."""
    return F.lit(v)


def sum_(a: Column, b: Column) -> Column:
    """Reference ``Sum`` (Expression.scala:37; Local.scala:25)."""
    return a + b


def mul(a: Column, b: Column) -> Column:
    """Reference ``Mul`` (Expression.scala:36; Local.scala:24)."""
    return a * b


def split(s: Column | str, pattern: str) -> Column:
    """Reference string ``Split`` — Java-regex split (Expression.scala:38; Local.scala:26)."""
    return F.split(s if isinstance(s, Column) else F.col(s), pattern)


def length(arr: Column | str) -> Column:
    """Reference ``Length``: List → Long (Expression.scala:27; Local.scala:34-35)."""
    return F.size(arr if isinstance(arr, Column) else F.col(arr)).cast("long")


def list_sum(arr: Column | str) -> Column:
    """Reference ``ListSum``: List[Long] → Long (Expression.scala:33; Local.scala:46-47)."""
    c = arr if isinstance(arr, Column) else F.col(arr)
    return F.aggregate(c, F.lit(0).cast("long"), lambda acc, x: acc + x)


def nth_column(struct: Column | str, n: int) -> Column:
    """Reference ``NthColumn`` — positional field access ``._1/._2/...``
    (Expression.scala:40; Local.scala:27). 1-based like Scala tuples."""
    c = struct if isinstance(struct, Column) else F.col(struct)
    return c.getField(f"_{n}")


def flip_tuple(struct: Column | str) -> Column:
    """Reference ``FlipTuple`` (Expression.scala:34; Local.scala:28)."""
    c = struct if isinstance(struct, Column) else F.col(struct)
    return F.struct(c.getField("_2").alias("_1"), c.getField("_1").alias("_2"))


def fan_out(*cols: Column) -> Column:
    """Reference ``FanOut`` / ``&&&`` — pair two expressions into a product
    (Expression.scala:21; Local.scala:11-15)."""
    return F.struct(*[c.alias(f"_{i + 1}") for i, c in enumerate(cols)])
