"""SymSpell fuzzy join: neighborhood completeness for every edit kind,
false-positive rejection, and the no-cross-join plan shape."""

from __future__ import annotations

from zio_analytics_spark.operators.linkage import fuzzy_pairs_symspell


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_finds_every_edit_kind(spark):
    df = _df(spark, [
        (1, "kitten"),
        (2, "mitten"),    # substitution
        (3, "kittens"),   # insertion
        (4, "kittn"),     # deletion... wait: kitten -> kittn is deletion of 'e'
        (5, "kitten"),    # exact duplicate (distance 0)
        (6, "sitting"),   # distance 3 from kitten — must NOT appear
    ])
    got = {(r.id_a, r.id_b): r.dist for r in
           fuzzy_pairs_symspell(df, "name", "id").collect()}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert got[(1, 5)] == 0
    assert not any(6 in p for p in got)


def test_colliding_deletions_rejected(spark):
    """'ab' and 'ba' share the delete neighborhood {a, b} but are distance
    2 — the levenshtein verify must reject them."""
    df = _df(spark, [(1, "ab"), (2, "ba")])
    assert fuzzy_pairs_symspell(df, "name", "id").count() == 0


def test_no_cross_join_in_plan(spark):
    df = _df(spark, [(i, f"name{i}") for i in range(50)])
    out = fuzzy_pairs_symspell(df, "name", "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_max_edit_2_matches_brute_force(spark):
    """d=2 neighborhood completeness against a brute-force cross check on
    a crafted set mixing substitutions, inserts, deletes and transposes."""
    names = [
        "kitten", "mitten", "sitten", "sittin", "kitte", "kit",
        "kettle", "written", "bitten", "biting", "kitten!!",
    ]
    df = _df(spark, list(enumerate(names)))
    got = {(r.id_a, r.id_b): r.dist for r in
           fuzzy_pairs_symspell(df, "name", "id", max_edit=2).collect()}

    def lev(a, b):
        import functools

        @functools.lru_cache(maxsize=None)
        def rec(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                rec(i - 1, j) + 1,
                rec(i, j - 1) + 1,
                rec(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return rec(len(a), len(b))

    want = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = lev(names[i], names[j])
            if d <= 2:
                want[(i, j)] = d
    assert got == want


def test_max_edit_3_documented_unsupported(spark):
    import pytest

    df = _df(spark, [(1, "x")])
    with pytest.raises(NotImplementedError):
        fuzzy_pairs_symspell(df, "name", "id", max_edit=3)
