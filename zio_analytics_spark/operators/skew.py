"""[EXT] Skew mitigation: salting for hot keys.

AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default in session.py)
splits skewed sort-merge partitions automatically at runtime; these manual
operators cover the cases AQE can't fix:

- ``salted_join``: a hot key on the probe side of a shuffle join — salt the
  big side into ``n`` sub-keys and replicate the small side's matching rows
  once per salt, turning one giant partition into ``n`` even ones.
- ``two_phase_agg``: high-cardinality-per-key aggregation with hot keys —
  partial-aggregate on (key, salt), then merge per key. (Plain ``groupBy``
  already does map-side partial aggregation; the explicit two-phase form is
  for expensive aggregates over heavy keys, e.g. collect-based folds.)

Both are pure Column-expression transforms — no UDFs, no data movement
beyond the intended shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "two_phase_agg"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted into ``n_salts`` sub-partitions.

    The big side's salt is derived from a hash of its whole row (spreads a
    hot key uniformly, deterministic); the small side is exploded ×n_salts so
    every (key, salt) combination finds its match. Use when one join key
    dominates; costs n_salts× the small side's shuffle size.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).alias("__salt")
    b = big.select("*", salt)
    s = small.select(
        "*", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)])).alias("__salt")
    )
    out = b.join(s, [*on, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial: dict[str, Column],
    merge: dict[str, Column],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation over (key, salt) → key.

    ``partial`` maps name → aggregate over raw rows; ``merge`` maps final
    name → aggregate over the partial columns (referencing the ``partial``
    names). Example::

        two_phase_agg(df, ["k"],
                      partial={"s": F.sum("v"), "c": F.count("*")},
                      merge={"total": F.sum("s"), "n": F.sum("c")})
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("__salt")
    staged = (
        df.select("*", salt)
        .groupBy(*keys, "__salt")
        .agg(*[a.alias(n) for n, a in partial.items()])
    )
    return staged.groupBy(*keys).agg(*[a.alias(n) for n, a in merge.items()])
