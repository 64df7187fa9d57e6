"""[EXT] Market-basket analysis: pairwise association rules at scale.

Support / confidence / lift over co-occurring items (Agrawal, Imieliński &
Swami 1993, SIGMOD — the original association-rule formulation; the
frequent-item pruning is the Apriori property from Agrawal & Srikant 1994,
VLDB: a pair can only be frequent if BOTH its items are). The engine
shapes that keep it linear at 100 TB:

- **Itemset dedup first**: baskets collapse to distinct (basket, item)
  rows before anything counts — multiplicity inside a basket never
  inflates support.
- **Apriori prune before pairing**: item supports are ONE hash aggregate;
  the frequent-item set (bounded by 1/min_support items, tiny by
  construction) broadcasts back as a semi-join, so infrequent items never
  enter the quadratic step.
- **Within-basket pair generation**: pairs come from a per-basket sorted
  item array (`collect_set` → `array_sort`) expanded by a nested
  `transform`/`slice` HOF — cost is Σ basket_size², bounded by the
  (pruned) basket width, NEVER a cross-basket product; one shuffle total
  for the pair counts thanks to map-side partial aggregation.
- **Rule scoring is arithmetic on broadcast aggregates**: confidence =
  supp(a∪b)/supp(a), lift = n·supp(a∪b)/(supp(a)·supp(b)) — the item
  support table re-joins broadcast.

The reference has no join/itemset surface (DataStream.scala:40-56); this
is [EXT] surface (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zio_analytics_spark.tmpdirs import materialize_table

__all__ = ["association_rules", "frequent_pairs", "frequent_triples"]

def _basket_arrays(
    baskets: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """ONE shuffle over the raw (basket, item) rows -> the per-basket
    sorted distinct item array, materialized to scratch parquet (round-16
    restructure, guide §2.3/§2.4). ``collect_set`` dedups within the
    aggregate (map-side partial), so the separate ``distinct()`` shuffle
    the miners used to run first — plus the second groupBy-basket shuffle
    per lattice level — collapse into this single pass. Every later step
    (basket count, item supports, level prunes, pair/triple expansion)
    derives from this table without touching the raw rows again."""
    return materialize_table(
        baskets.groupBy(basket_col)
        .agg(F.array_sort(F.collect_set(item_col)).alias("__items"))
        .select("__items"),
        prefix="zas_basket_arr_",
    )


def _filter_items(arr: DataFrame, keep: list) -> DataFrame:
    """Prune array elements to ``keep`` (a driver-side list bounded by
    avg_basket_width / min_support items — corpus-size-INDEPENDENT, the
    same order of driver state as the frequent-pair table the miners
    already broadcast). ``array_intersect`` preserves the first
    argument's (sorted) order."""
    elem = arr.schema["__items"].dataType.elementType
    # always cast the keep-list literal to the array's ELEMENT type: for
    # integer item columns F.lit([...Python ints...]) would be
    # array<bigint> and array_intersect would silently widen __items —
    # and thus the mined item types — to bigint (round-17 ADVICE fix)
    lit = (F.lit(keep) if keep else F.array()).cast(
        f"array<{elem.simpleString()}>"
    )
    return arr.select(F.array_intersect("__items", lit).alias("__items"))


def _pair_counts(arr: DataFrame) -> DataFrame:
    """All i<j pairs of each basket's sorted item array (nested
    transform/slice HOFs — cost Σ width², never a cross-basket product),
    hash-aggregated to ``(item_a, item_b, pair_count)``."""
    items = F.col("__items")
    pairs = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + F.lit(2), F.size(items)),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    return (
        arr.select(F.explode(pairs).alias("__p"))
        .select("__p.item_a", "__p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )


def _item_supports(arr: DataFrame, item_col: str) -> DataFrame:
    """Per-item basket counts from the array table (identical to counting
    the deduplicated (basket, item) rows — the arrays ARE those rows)."""
    return (
        arr.select(F.explode("__items").alias(item_col))
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("__supp"))
    )


def _frequent_items(arr: DataFrame, item_col: str, bar: float) -> list:
    return sorted(
        r[item_col]
        for r in _item_supports(arr, item_col)
        .where(F.col("__supp") >= bar)
        .collect()
    )


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float,
) -> DataFrame:
    """Unordered item pairs whose basket co-occurrence ratio is
    >= ``min_support``: returns ``(item_a, item_b, pair_count)`` with
    ``item_a < item_b``. ``baskets`` is one row per (basket, item)
    occurrence; duplicates within a basket are collapsed first.
    """
    if not 0 < min_support <= 1:
        raise ValueError("min_support must be in (0, 1]")
    arr = _basket_arrays(baskets, basket_col, item_col)
    n_baskets = arr.count()
    bar = min_support * n_baskets
    pruned = _filter_items(arr, _frequent_items(arr, item_col, bar))
    return _pair_counts(pruned).where(F.col("pair_count") >= bar)


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Pairwise association rules ``antecedent -> consequent`` with
    ``support`` (co-occurrence ratio), ``confidence`` (P(consequent |
    antecedent)) and ``lift`` (confidence / P(consequent)), filtered to
    ``support >= min_support`` and ``confidence >= min_confidence``.
    Every qualifying pair yields BOTH directed rules (their supports and
    lifts are equal; confidences differ). Ratios are rounded to 6 dp
    (cross-row aggregate float discipline — catalog convention).
    """
    if not 0 < min_support <= 1:
        raise ValueError("min_support must be in (0, 1]")
    arr = _basket_arrays(baskets, basket_col, item_col)
    n_baskets = arr.count()
    bar = min_support * n_baskets
    supp = _item_supports(arr, item_col)
    freq = _frequent_items(arr, item_col, bar)
    pairs = _pair_counts(_filter_items(arr, freq)).where(
        F.col("pair_count") >= bar
    )
    both = pairs.unionByName(
        pairs.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "pair_count",
        )
    ).select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_count",
    )
    a_supp = F.broadcast(
        supp.select(F.col(item_col).alias("antecedent"), F.col("__supp").alias("__sa"))
    )
    c_supp = F.broadcast(
        supp.select(F.col(item_col).alias("consequent"), F.col("__supp").alias("__sc"))
    )
    n = F.lit(float(n_baskets))
    return (
        both.join(a_supp, "antecedent")
        .join(c_supp, "consequent")
        .select(
            "antecedent",
            "consequent",
            F.round(F.col("pair_count") / n, 6).alias("support"),
            F.round(F.col("pair_count") / F.col("__sa"), 6).alias("confidence"),
            F.round(
                F.col("pair_count") * n / (F.col("__sa") * F.col("__sc")), 6
            ).alias("lift"),
        )
        .where(F.col("confidence") >= min_confidence)
    )


def frequent_triples(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float,
) -> DataFrame:
    """Level-3 of the Apriori lattice: unordered item TRIPLES with basket
    co-occurrence ratio >= ``min_support`` — ``(item_a, item_b, item_c,
    triple_count)``, items sorted ascending.

    The faithful level-wise prune, all broadcast-sized: (1) frequent PAIRS
    are mined first (level 2) and materialized once (three semi-join sides
    read them); (2) only items appearing in some frequent pair enter the
    per-basket arrays (tighter than the frequent-item prune — applied as
    an array intersect on the shared array table, no re-shuffle); (3)
    candidate triples from the Σ width³ within-basket HOF expansion are
    semi-joined against the frequent-pair set on ALL THREE sub-pairs
    before counting — the Apriori property (every sub-pair of a frequent
    triple is frequent) makes the pruned count set identical to the naive
    3-way self-join, which is what the oracle checks.
    """
    if not 0 < min_support <= 1:
        raise ValueError("min_support must be in (0, 1]")
    arr = _basket_arrays(baskets, basket_col, item_col)
    n_baskets = arr.count()
    bar = min_support * n_baskets
    # The frequent-pair set is bounded driver state (≤ avg_width²/
    # min_support rows — the same table the old plan broadcast three
    # times, each build re-running the pair aggregation): collect it ONCE;
    # the pair-item prune list then costs zero extra jobs, and the three
    # Apriori sub-pair semi-joins broadcast a createDataFrame of the
    # collected rows instead of re-running the pair aggregation per build.
    # (A struct-membership isin() filter was tried instead of the joins
    # and measured SLOWER — a 300-way In over structs does not fold to a
    # hash set — so the semi-joins stay.)
    pair_rows = (
        _pair_counts(_filter_items(arr, _frequent_items(arr, item_col, bar)))
        .where(F.col("pair_count") >= bar)
        .collect()
    )
    pair_set = sorted((r["item_a"], r["item_b"]) for r in pair_rows)
    pair_items = sorted({a for a, _ in pair_set} | {b for _, b in pair_set})
    pruned = _filter_items(arr, pair_items)
    items = F.col("__items")
    # all i<j<k index triples of the sorted array (0-based HOF indices;
    # slice() positions are 1-based: y = absolute index i+1+j, so elements
    # after y start at 1-based position i+j+3)
    triples = F.flatten(
        F.transform(
            items,
            lambda x, i: F.flatten(
                F.transform(
                    F.slice(items, i + F.lit(2), F.size(items)),
                    lambda y, j: F.transform(
                        F.slice(items, i + j + F.lit(3), F.size(items)),
                        lambda z: F.struct(
                            x.alias("item_a"), y.alias("item_b"), z.alias("item_c")
                        ),
                    ),
                )
            ),
        )
    )
    cand = pruned.select(F.explode(triples).alias("__t")).select(
        "__t.item_a", "__t.item_b", "__t.item_c"
    )
    pp = F.broadcast(
        cand.sparkSession.createDataFrame(
            pair_set, schema=cand.select("item_a", "item_b").schema
        )
    )
    cand = (
        cand.join(pp, ["item_a", "item_b"], "left_semi")
        .join(
            pp.select(F.col("item_a"), F.col("item_b").alias("item_c")),
            ["item_a", "item_c"],
            "left_semi",
        )
        .join(
            pp.select(
                F.col("item_a").alias("item_b"), F.col("item_b").alias("item_c")
            ),
            ["item_b", "item_c"],
            "left_semi",
        )
    )
    return (
        cand.groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).alias("triple_count"))
        .where(F.col("triple_count") >= bar)
    )
