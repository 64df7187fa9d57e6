"""Point-free expression arrows + the row proxy — the reference's user API.

The reference's users never name columns: they write lambdas that are
applied to ``Expression.Id()`` at plan-build time, producing a reified
expression tree (/root/reference/src/main/scala/zio/analytics/
DataStream.scala:59-84), and compose expressions with the arrow operators
``>>>`` (Compose), ``&&&`` (FanOut) and ``***`` (Split)
(Expression.scala:20-22, sugar :46-49).

PySpark's ``Column`` IS that reified tree (SURVEY.md §1.3), so both pieces
are thin:

- :class:`RowProxy` — what a user lambda receives from ``DataStream``
  methods (``.filter(lambda r: r.value > 0)``): attribute/item access
  emits Columns rooted at the row, exactly the ``f(Expression.Id())``
  trick. Nested/tuple fields chain for free (``r.pair._1`` → Column
  ``getField``).
- :class:`Arrow` — a reified ``Column → Column`` function with the
  reference's combinators, spelled with Python's operators:

  ===========  ==========  ====================================
  reference    here        semantics
  ===========  ==========  ====================================
  ``f >>> g``  ``f >> g``  compose: g after f (Expression.scala:46)
  ``f <<< g``  ``f << g``  compose: f after g (Expression.scala:47)
  ``f &&& g``  ``f & g``   fan-out to tuple ``(_1, _2)`` (:48)
  ``f *** g``  ``f % g``   per-side on a tuple (:49)
  ===========  ==========  ====================================

Arrows build plain Columns, so everything stays inside Catalyst/codegen —
the composition layer costs nothing at runtime.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["Arrow", "RowProxy", "arrow", "id_", "const", "nth", "fst", "snd", "swap"]


def _to_col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


class Arrow:
    """Reference ``Expression[A, B]``: a reified row-level function,
    composable point-free. Wraps ``Column -> Column``."""

    def __init__(self, fn: Callable[[Column], Column]) -> None:
        self._fn = fn

    def __call__(self, c: Column | str) -> Column:
        return self._fn(_to_col(c))

    def __rshift__(self, g: "Arrow | Callable") -> "Arrow":
        """``f >> g`` = reference ``f >>> g``: f, then g."""
        g = arrow(g)
        return Arrow(lambda c: g(self(c)))

    def __lshift__(self, g: "Arrow | Callable") -> "Arrow":
        """``f << g`` = reference ``f <<< g``: g, then f."""
        g = arrow(g)
        return Arrow(lambda c: self(g(c)))

    def __and__(self, g: "Arrow | Callable") -> "Arrow":
        """``f & g`` = reference ``f &&& g`` (FanOut): one input, tuple out."""
        g = arrow(g)
        return Arrow(
            lambda c: F.struct(self(c).alias("_1"), g(c).alias("_2"))
        )

    def __mod__(self, g: "Arrow | Callable") -> "Arrow":
        """``f % g`` = reference ``f *** g`` (Split): tuple in, tuple out,
        f on ``_1`` and g on ``_2``."""
        g = arrow(g)
        return Arrow(
            lambda c: F.struct(
                self(c.getField("_1")).alias("_1"),
                g(c.getField("_2")).alias("_2"),
            )
        )


def arrow(fn: Arrow | Callable[[Column], Column]) -> Arrow:
    """Lift a plain ``Column -> Column`` function (e.g. ``F.upper``) to an Arrow."""
    return fn if isinstance(fn, Arrow) else Arrow(fn)


#: Reference ``Id`` (Expression.scala:19) — the identity arrow.
id_ = Arrow(lambda c: c)


def const(v) -> Arrow:
    """Reference literals (Expression.scala:23-25): ignore input, emit ``v``."""
    return Arrow(lambda _c: F.lit(v))


def nth(n: int) -> Arrow:
    """Reference ``NthColumn`` ``._1/._2/...`` (Expression.scala:40) — 1-based."""
    return Arrow(lambda c: c.getField(f"_{n}"))


fst = nth(1)
snd = nth(2)

#: Reference ``FlipTuple`` (Expression.scala:34).
swap = Arrow(
    lambda c: F.struct(c.getField("_2").alias("_1"), c.getField("_1").alias("_2"))
)


class RowProxy:
    """The ``Expression.Id()`` trick (DataStream.scala:59-84): user lambdas
    receive one of these; touching it emits Columns. ``r.value`` /
    ``r["value"]`` → ``F.col("value")``; chained access reaches struct
    fields because Column itself supports it (``r.pair._1``)."""

    __slots__ = ()

    def __getattr__(self, name: str) -> Column:
        if name.startswith("__"):  # keep Python protocol lookups sane
            raise AttributeError(name)
        return F.col(name)

    def __getitem__(self, name: str) -> Column:
        return F.col(name)


ROW = RowProxy()


def apply_row_lambda(f):
    """Apply a user lambda to the row proxy ONCE at plan-build time (the
    reference runs user lambdas once against ``Expression.Id()`` — no user
    closure survives into the plan; same here: the result is a Column)."""
    return f(ROW)
