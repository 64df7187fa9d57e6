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


# --- sorted_neighborhood_pairs / str_rank_key (round-7) ---------------------


def test_sorted_neighborhood_matches_bruteforce(spark):
    import random

    from zio_analytics_spark.operators.linkage import sorted_neighborhood_pairs

    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 10_000)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        (r["a_id"], r["b_id"]): r["gap"]
        for r in sorted_neighborhood_pairs(df, "v", "id", window=4).collect()
    }
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {}
    for i, (ai, _) in enumerate(order):
        for d in range(1, 5):
            if i + d < len(order):
                want[(ai, order[i + d][0])] = d
    assert got == want


def test_sorted_neighborhood_window_and_validation(spark):
    import pytest

    from zio_analytics_spark.operators.linkage import sorted_neighborhood_pairs

    df = spark.createDataFrame([(i, i * 10) for i in range(6)], "id long, v long")
    out = sorted_neighborhood_pairs(df, "v", "id", window=1).collect()
    assert {(r["a_id"], r["b_id"]) for r in out} == {(i, i + 1) for i in range(5)}
    assert all(r["gap"] == 1 for r in out)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "v", "id", window=0)


def test_str_rank_key_orders_like_strings(spark):
    import pytest

    from zio_analytics_spark.operators.linkage import str_rank_key

    words = ["", "a", "aa", "ab", "abcdefgh", "abcdefgi", "b", "zebra", "Customer#1"]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    rows = df.select("s", str_rank_key("s").alias("k")).collect()
    by_key = [r["s"] for r in sorted(rows, key=lambda r: (r["k"], r["s"]))]
    assert by_key == sorted(words)
    with pytest.raises(ValueError):
        str_rank_key("s", nbytes=9)


def test_sorted_neighborhood_on_string_keys(spark):
    from zio_analytics_spark.operators.linkage import (
        sorted_neighborhood_pairs,
        str_rank_key,
    )

    names = ["smith", "smyth", "smithe", "jones", "jonas", "brown"]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    pairs = sorted_neighborhood_pairs(
        df, str_rank_key("name"), "id", window=1, tiebreak=["name"]
    ).collect()
    order = sorted(range(len(names)), key=lambda i: names[i])
    want = {(order[i], order[i + 1]) for i in range(len(order) - 1)}
    assert {(r["a_id"], r["b_id"]) for r in pairs} == want


def test_str_rank_key_clamps_non_ascii(spark):
    # ascii() yields full code points (up to 0x10FFFF); unclamped they
    # would misorder vs ASCII tails and overflow int64 at nbytes=8. The
    # clamp keeps every key in signed-long range and preserves
    # ASCII-vs-non-ASCII order; clamped characters tie and fall through.
    from zio_analytics_spark.operators.linkage import str_rank_key

    words = ["abc", "abĀ", "ab\U0010ffff", "\U0010ffff" * 8, "zzz"]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    rows = df.select("s", str_rank_key("s").alias("k")).collect()
    ks = {r["s"]: r["k"] for r in rows}
    imax = (1 << 63) - 1
    assert all(0 <= k <= imax for k in ks.values())
    # all-clamped string hits the exact int64 ceiling, no overflow wrap
    assert ks["\U0010ffff" * 8] == imax
    # ASCII strings stay below any non-ASCII-leading comparison point;
    # code points at/above the clamp tie (both -> 255 at position 3)
    assert ks["abc"] < ks["abĀ"] == ks["ab\U0010ffff"]
    assert ks["zzz"] < ks["\U0010ffff" * 8]


# --- Fellegi-Sunter (round-8) -----------------------------------------------

def _naive_fs_em(rows, K, n_iters, p0=0.1, m0=0.8, u0=0.2):
    p, m, u = round(p0, 6), [round(m0, 6)] * K, [round(u0, 6)] * K
    out = []
    for it in range(n_iters):
        sg = 0.0
        sgj = [0.0] * K
        suj = [0.0] * K
        for g in rows:
            pm, pu = p, 1.0 - p
            for j in range(K):
                pm *= m[j] * g[j] + (1.0 - m[j]) * (1.0 - g[j])
                pu *= u[j] * g[j] + (1.0 - u[j]) * (1.0 - g[j])
            r = pm / (pm + pu)
            sg += r
            for j in range(K):
                sgj[j] += r * g[j]
                suj[j] += (1.0 - r) * g[j]
        n = len(rows)
        cl = lambda x: min(max(x, 0.000001), 0.999999)  # noqa: E731
        p = cl(round(sg / n, 6))
        for j in range(K):
            m[j] = cl(round(sgj[j] / sg, 6))
            u[j] = cl(round(suj[j] / (n - sg), 6))
        out.append((it, p, tuple(m), tuple(u)))
    return out


def test_fellegi_sunter_matches_naive(spark):
    import random

    import pytest

    from zio_analytics_spark.operators.linkage import fellegi_sunter_em

    rng = random.Random(23)
    # a mixture: 30% true matches (fields mostly agree), 70% non-matches
    rows = []
    for _ in range(400):
        if rng.random() < 0.3:
            g = tuple(1.0 if rng.random() < 0.9 else 0.0 for _ in range(3))
        else:
            g = tuple(1.0 if rng.random() < 0.15 else 0.0 for _ in range(3))
        rows.append(g)
    df = spark.createDataFrame(rows, "g1 double, g2 double, g3 double")
    got = fellegi_sunter_em(df, ["g1", "g2", "g3"], n_iters=3).collect()
    want = _naive_fs_em(rows, 3, 3)
    by_iter = {}
    for r in got:
        by_iter.setdefault(r["iter"], {})[(r["param"], r["j"])] = r["value"]
    for it, p, m, u in want:
        d = by_iter[it]
        assert d[("p", 0)] == pytest.approx(p, abs=2e-6)
        for j in range(3):
            assert d[("m", j + 1)] == pytest.approx(m[j], abs=2e-6)
            assert d[("u", j + 1)] == pytest.approx(u[j], abs=2e-6)
    # the model must actually separate: matches agree far more often
    final = by_iter[2]
    for j in range(3):
        assert final[("m", j + 1)] > final[("u", j + 1)] + 0.3


def test_fellegi_sunter_score_weights(spark):
    import math

    import pytest

    from zio_analytics_spark.operators.linkage import fellegi_sunter_score

    df = spark.createDataFrame(
        [(1.0, 0.0), (0.0, 1.0), (1.0, 1.0)], "g1 double, g2 double"
    )
    m, u = [0.9, 0.8], [0.1, 0.2]
    got = {
        (r["g1"], r["g2"]): r["score"]
        for r in fellegi_sunter_score(df, ["g1", "g2"], m, u).collect()
    }
    w1a, w1d = math.log2(0.9 / 0.1), math.log2(0.1 / 0.9)
    w2a, w2d = math.log2(0.8 / 0.2), math.log2(0.2 / 0.8)
    assert got[(1.0, 0.0)] == round(w1a + w2d, 6)
    assert got[(0.0, 1.0)] == round(w1d + w2a, 6)
    assert got[(1.0, 1.0)] == round(w1a + w2a, 6)
    with pytest.raises(ValueError):
        fellegi_sunter_score(df, ["g1", "g2"], [0.5], [0.5])


def test_fellegi_sunter_validation(spark):
    import pytest

    from zio_analytics_spark.operators.linkage import fellegi_sunter_em

    df = spark.createDataFrame([(1.0,)], "g1 double")
    with pytest.raises(ValueError):
        fellegi_sunter_em(df, [], n_iters=1)
    with pytest.raises(ValueError):
        fellegi_sunter_em(df, ["g1"], n_iters=0)
    # degenerate initial params fail fast, BEFORE any Spark aggregate —
    # init_p=0/1 would make every responsibility exactly 0/1 and the
    # M-step divide by zero
    for bad in ({"init_p": 0.0}, {"init_p": 1.0}, {"init_m": 0.0},
                {"init_u": 1.0}, {"init_m": -0.2}, {"init_u": 1.5}):
        with pytest.raises(ValueError, match="strictly inside"):
            fellegi_sunter_em(df, ["g1"], n_iters=1, **bad)
