"""Window assigners — parity with /root/reference/src/main/scala/zio/analytics/Window.scala.

| reference                              | here                     | Spark primitive            |
|----------------------------------------|--------------------------|----------------------------|
| ``WindowAssigner.tumbling(size)`` (:28)| ``tumbling(size)``       | ``F.window(ts, size)``     |
| ``WindowAssigner.sliding(size, step)`` (:29) | ``sliding(size, step)`` | ``F.window(ts, size, step)`` |
| ``WindowAssigner.session(gap)`` (:30, declared but ``assign = ???`` :23-26) | ``session(gap)`` | ``F.session_window(ts, gap)`` |

Conventions (SURVEY.md §2.2):
- Bounds are Spark's ``[start, end)``; the reference's inclusive upper bound
  (``lowerBound + sizeMillis - 1``, Window.scala:17) is the same bucket with an
  off-by-one-millisecond representation. We normalize to Spark everywhere.
- The reference's sliding assigner has a step-alignment bug (scan starts at a
  *size*-aligned boundary, Window.scala:13-14, missing earlier covering
  windows). We deliberately follow Spark/Flink semantics instead — every
  window of length ``size`` starting at a multiple of ``step`` that covers the
  timestamp.
- Session windows complete the reference's TODO (Window.scala:24).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["WindowAssigner", "tumbling", "sliding", "session"]


@dataclass(frozen=True)
class WindowAssigner:
    """A window assignment spec; ``assign(ts)`` yields Spark's window struct column.

    ``kind``: 'tumbling' | 'sliding' | 'session'. Durations are Spark interval
    strings (e.g. ``'10 minutes'``), the unit-safe analog of the reference's
    ``Duration`` millis.
    """

    kind: str
    size: str  # window size, or gap for sessions
    step: str | None = None

    def assign(self, ts: Column | str) -> Column:
        if self.kind == "tumbling":
            return F.window(ts, self.size)
        if self.kind == "sliding":
            return F.window(ts, self.size, self.step)
        if self.kind == "session":
            return F.session_window(ts, self.size)
        raise ValueError(f"unknown window kind: {self.kind}")


def tumbling(size: str) -> WindowAssigner:
    """Fixed, non-overlapping windows aligned to the epoch (Window.scala:12-13,28)."""
    return WindowAssigner("tumbling", size)


def sliding(size: str, step: str) -> WindowAssigner:
    """Overlapping windows: one per multiple of ``step`` covering the ts (Window.scala:29)."""
    return WindowAssigner("sliding", size, step)


def session(gap: str) -> WindowAssigner:
    """Gap-based sessions — implements what the reference left as ``???`` (Window.scala:23-26)."""
    return WindowAssigner("session", gap)
