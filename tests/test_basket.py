"""Association rules (operators/basket.py): hand-computed support /
confidence / lift on a crafted basket set, Apriori-prune soundness,
within-basket multiplicity collapse, and the HOF pair expansion."""

from __future__ import annotations

import itertools
from collections import Counter

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators.basket import association_rules, frequent_pairs


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "bk long, item string")


_ROWS = [
    # 5 baskets: {a,b,c}, {a,b}, {a,c}, {b,c}, {a,b,c}
    (1, "a"), (1, "b"), (1, "c"),
    (2, "a"), (2, "b"),
    (3, "a"), (3, "c"),
    (4, "b"), (4, "c"),
    (5, "a"), (5, "b"), (5, "c"),
]


def test_frequent_pairs_counts(spark):
    got = {
        (r["item_a"], r["item_b"]): r["pair_count"]
        for r in frequent_pairs(_baskets(spark, _ROWS), "bk", "item", 0.5).collect()
    }
    # co-occurrence: ab=3, ac=3, bc=3 — all >= 0.5 * 5 baskets
    assert got == {("a", "b"): 3, ("a", "c"): 3, ("b", "c"): 3}


def test_rule_metrics_hand_computed(spark):
    rules = {
        (r["antecedent"], r["consequent"]): (r["support"], r["confidence"], r["lift"])
        for r in association_rules(
            _baskets(spark, _ROWS), "bk", "item", min_support=0.5
        ).collect()
    }
    # supp(a)=supp(b)=supp(c)=4/5; every pair count = 3
    # support = 3/5, confidence = 3/4, lift = (3*5)/(4*4)
    assert set(rules) == {(x, y) for x in "abc" for y in "abc" if x != y}
    for v in rules.values():
        assert v == (0.6, 0.75, round(15 / 16, 6))


def test_min_support_prunes(spark):
    rows = _ROWS + [(6, "d"), (6, "a")]  # ad co-occurs once: 1/6 < 0.5
    got = frequent_pairs(_baskets(spark, rows), "bk", "item", 0.5).collect()
    assert all("d" not in (r["item_a"], r["item_b"]) for r in got)


def test_duplicate_items_in_basket_collapse(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    got = {
        (r["item_a"], r["item_b"]): r["pair_count"]
        for r in frequent_pairs(_baskets(spark, rows), "bk", "item", 0.1).collect()
    }
    assert got == {("a", "b"): 2}  # multiplicity never inflates support


def test_min_confidence_is_directional(spark):
    # a appears in 4 baskets, d in 1; pair ad in 1 basket.
    rows = [(i, "a") for i in range(1, 5)] + [(1, "d")]
    rules = {
        (r["antecedent"], r["consequent"]): r["confidence"]
        for r in association_rules(
            _baskets(spark, rows), "bk", "item", min_support=0.2, min_confidence=0.5
        ).collect()
    }
    # d->a has confidence 1.0; a->d only 0.25 (filtered)
    assert rules == {("d", "a"): 1.0}


def test_prune_equals_unpruned_randomized(spark):
    import random

    rng = random.Random(3)
    items = list("abcdefgh")
    rows = []
    for bk in range(60):
        for it in rng.sample(items, rng.randrange(1, 5)):
            rows.append((bk, it))
    df = _baskets(spark, rows)
    got = {
        (r["item_a"], r["item_b"]): r["pair_count"]
        for r in frequent_pairs(df, "bk", "item", 0.08).collect()
    }
    # brute force without any pruning
    per_basket = {}
    for bk, it in rows:
        per_basket.setdefault(bk, set()).add(it)
    counts = Counter(
        p for s in per_basket.values() for p in itertools.combinations(sorted(s), 2)
    )
    bar = 0.08 * len(per_basket)
    want = {p: c for p, c in counts.items() if c >= bar}
    assert got == want


def test_min_support_validation(spark):
    with pytest.raises(ValueError):
        frequent_pairs(_baskets(spark, _ROWS), "bk", "item", 0.0)


def test_frequent_triples_matches_brute_force(spark):
    import random

    from zio_analytics_spark.operators.basket import frequent_triples

    rng = random.Random(5)
    items = list("abcdefgh")
    rows = []
    for bk in range(80):
        for it in rng.sample(items, rng.randrange(2, 6)):
            rows.append((bk, it))
    df = _baskets(spark, rows)
    got = {
        (r["item_a"], r["item_b"], r["item_c"]): r["triple_count"]
        for r in frequent_triples(df, "bk", "item", 0.05).collect()
    }
    per_basket = {}
    for bk, it in rows:
        per_basket.setdefault(bk, set()).add(it)
    counts = Counter(
        t for s in per_basket.values() for t in itertools.combinations(sorted(s), 3)
    )
    bar = 0.05 * len(per_basket)
    want = {t: c for t, c in counts.items() if c >= bar}
    assert got == want


def test_frequent_triples_hand_case(spark):
    from zio_analytics_spark.operators.basket import frequent_triples

    # abc in baskets 1,2,3 (3 >= bar=2); abd in baskets 3,4 (2 >= bar);
    # acd/bcd only in basket 3 (1 < bar) — and cd is not even a frequent
    # pair, so the level-2 prune drops those candidates before counting
    rows = (
        [(1, "a"), (1, "b"), (1, "c")]
        + [(2, "a"), (2, "b"), (2, "c")]
        + [(3, "a"), (3, "b"), (3, "c"), (3, "d")]
        + [(4, "a"), (4, "b"), (4, "d")]
    )
    got = {
        (r["item_a"], r["item_b"], r["item_c"]): r["triple_count"]
        for r in frequent_triples(_baskets(spark, rows), "bk", "item", 0.5).collect()
    }
    assert got == {("a", "b", "c"): 3, ("a", "b", "d"): 2}


def test_integer_items_keep_their_type(spark):
    """Round-17 ADVICE fix: the keep-list literal is cast to the array's
    element type, so integer item columns mine int item_a/item_b (the
    un-cast F.lit would widen them to bigint via array_intersect)."""
    from zio_analytics_spark.operators.basket import frequent_pairs

    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20)]
    df = spark.createDataFrame(rows, "basket_id int, item int")
    out = frequent_pairs(df, "basket_id", "item", min_support=0.5)
    types = dict(out.dtypes)
    assert types["item_a"] == "int" and types["item_b"] == "int"
    got = {(r["item_a"], r["item_b"]) for r in out.collect()}
    assert (10, 20) in got
