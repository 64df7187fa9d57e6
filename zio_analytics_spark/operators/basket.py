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

__all__ = ["association_rules", "frequent_pairs", "frequent_triples"]


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
    distinct = baskets.select(basket_col, item_col).distinct()
    n_baskets = distinct.select(basket_col).distinct().count()
    return _frequent_pairs(
        distinct, basket_col, item_col, min_support * n_baskets
    )


def _frequent_pairs(
    distinct: DataFrame, basket_col: str, item_col: str, bar: float
) -> DataFrame:
    """Core pair mining over an already-deduplicated (basket, item) table
    with an absolute count threshold — shared so :func:`association_rules`
    pays the basket-count job only once."""
    item_supp = (
        distinct.groupBy(item_col).agg(F.count(F.lit(1)).alias("__supp"))
    )
    frequent = item_supp.where(F.col("__supp") >= bar).select(item_col)
    pruned = distinct.join(F.broadcast(frequent), item_col, "left_semi")
    arr = (
        pruned.groupBy(basket_col)
        .agg(F.array_sort(F.collect_set(item_col)).alias("__items"))
        .select("__items")
    )
    items = F.col("__items")
    # All i<j pairs of the sorted per-basket array: for each element x at
    # 0-based index i, pair it with every later element. Codegen HOFs —
    # no UDF, no per-basket Python.
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
        .where(F.col("pair_count") >= bar)
    )


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
    distinct = baskets.select(basket_col, item_col).distinct()
    n_baskets = distinct.select(basket_col).distinct().count()
    pairs = _frequent_pairs(
        distinct, basket_col, item_col, min_support * n_baskets
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
    supp = distinct.groupBy(item_col).agg(F.count(F.lit(1)).alias("__supp"))
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
    are mined first (level 2); (2) only items appearing in some frequent
    pair enter the per-basket arrays (tighter than the frequent-item
    prune); (3) candidate triples from the Σ width³ within-basket HOF
    expansion are semi-joined against the frequent-pair set on ALL THREE
    sub-pairs before counting — the Apriori property (every sub-pair of a
    frequent triple is frequent) makes the pruned count set identical to
    the naive 3-way self-join, which is what the oracle checks.
    """
    if not 0 < min_support <= 1:
        raise ValueError("min_support must be in (0, 1]")
    distinct = baskets.select(basket_col, item_col).distinct()
    n_baskets = distinct.select(basket_col).distinct().count()
    bar = min_support * n_baskets
    pairs = _frequent_pairs(distinct, basket_col, item_col, bar)
    pair_items = (
        pairs.select(F.col("item_a").alias(item_col))
        .unionByName(pairs.select(F.col("item_b").alias(item_col)))
        .distinct()
    )
    pruned = distinct.join(F.broadcast(pair_items), item_col, "left_semi")
    arr = (
        pruned.groupBy(basket_col)
        .agg(F.array_sort(F.collect_set(item_col)).alias("__items"))
        .select("__items")
    )
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
    cand = arr.select(F.explode(triples).alias("__t")).select(
        "__t.item_a", "__t.item_b", "__t.item_c"
    )
    pp = F.broadcast(pairs.select("item_a", "item_b"))
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
