"""Experiment statistics (operators/stats.py): Welch t / chi-square against
hand-computed closed forms, cohort determinism, and degenerate arms."""

from __future__ import annotations

import math
import statistics

from pyspark.sql import functions as F

from zio_analytics_spark.operators.stats import (
    chi2_independence,
    hash_cohort,
    welch_ttest,
)


def _welch_expected(a, b):
    n0, n1 = len(a), len(b)
    m0, m1 = statistics.fmean(a), statistics.fmean(b)
    s0, s1 = statistics.variance(a), statistics.variance(b)
    se0, se1 = s0 / n0, s1 / n1
    t = (m0 - m1) / math.sqrt(se0 + se1)
    df = (se0 + se1) ** 2 / (se0**2 / (n0 - 1) + se1**2 / (n1 - 1))
    return round(m0 - m1, 6), round(t, 6), round(df, 6)


def test_welch_matches_closed_form(spark):
    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [2.0, 2.5, 3.5]
    rows = [("g", 0, v) for v in a] + [("g", 1, v) for v in b]
    df = spark.createDataFrame(rows, "grp string, arm int, value double")
    out = welch_ttest(df, ["grp"], "value", F.col("arm")).collect()[0]
    diff, t, dof = _welch_expected(a, b)
    assert (out["n_control"], out["n_treat"]) == (5, 3)
    assert out["mean_diff"] == diff
    assert out["t_stat"] == t
    assert out["df"] == dof


def test_welch_single_observation_arm_is_null(spark):
    rows = [("g", 0, 1.0), ("g", 0, 2.0), ("g", 1, 5.0)]
    df = spark.createDataFrame(rows, "grp string, arm int, value double")
    out = welch_ttest(df, ["grp"], "value", F.col("arm")).collect()[0]
    assert out["t_stat"] is None and out["df"] is None  # var undefined at n=1


def test_hash_cohort_deterministic_and_balanced(spark):
    df = spark.range(0, 2000).select(hash_cohort(F.col("id")).alias("arm"), "id")
    counts = {r["arm"]: r["c"] for r in df.groupBy("arm").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {0, 1}
    assert abs(counts[0] - counts[1]) < 200  # ~50/50 within 10%
    again = {r["id"]: r["arm"] for r in df.collect()}
    redo = {
        r["id"]: r["arm"]
        for r in spark.range(0, 2000)
        .select(hash_cohort(F.col("id")).alias("arm"), "id")
        .collect()
    }
    assert again == redo


def test_chi2_hand_computed_2x2(spark):
    # contingency: arm0: x=30, y=10; arm1: x=10, y=30
    rows = (
        [(0, "x")] * 30 + [(0, "y")] * 10 + [(1, "x")] * 10 + [(1, "y")] * 30
    )
    df = spark.createDataFrame(rows, "arm int, cat string")
    out = chi2_independence(df, "arm", "cat").collect()[0]
    # all expected = 20; chi2 = 4 * (10^2 / 20) = 20
    assert out["chi2"] == 20.0
    assert out["df"] == 1
    assert out["n"] == 80


def test_chi2_zero_observed_cell_included(spark):
    # arm1 never shows category 'y': the (1, 'y') cell is a ZERO cell whose
    # expected count still contributes (0-exp)^2/exp
    rows = [(0, "x")] * 10 + [(0, "y")] * 10 + [(1, "x")] * 20
    df = spark.createDataFrame(rows, "arm int, cat string")
    out = chi2_independence(df, "arm", "cat").collect()[0]
    # row totals: 20, 20; col totals: x=30, y=10; n=40
    # exp: (0,x)=15 (0,y)=5 (1,x)=15 (1,y)=5
    want = round((10 - 15) ** 2 / 15 + (10 - 5) ** 2 / 5 + (20 - 15) ** 2 / 15 + (0 - 5) ** 2 / 5, 6)
    assert out["chi2"] == want
    assert out["df"] == 1


def test_chi2_independent_data_is_small(spark):
    # perfectly proportional table → chi2 exactly 0
    rows = [(0, "x")] * 30 + [(0, "y")] * 10 + [(1, "x")] * 60 + [(1, "y")] * 20
    df = spark.createDataFrame(rows, "arm int, cat string")
    out = chi2_independence(df, "arm", "cat").collect()[0]
    assert out["chi2"] == 0.0


# ---------------------------------------------------------------------------
# auc_roc (Mann–Whitney)
# ---------------------------------------------------------------------------


def test_auc_perfect_and_reversed(spark):
    from zio_analytics_spark.operators.stats import auc_roc

    rows = [(float(i), i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, "s double, lab boolean")
    assert auc_roc(df, "s", "lab").collect()[0]["auc"] == 1.0
    rev = spark.createDataFrame([(float(i), i < 5) for i in range(10)], "s double, lab boolean")
    assert auc_roc(rev, "s", "lab").collect()[0]["auc"] == 0.0


def test_auc_with_ties_matches_rank_sum_by_hand(spark):
    from zio_analytics_spark.operators.stats import auc_roc

    # scores: 1,1,2,3,3,3 labels: -,+,-,+,+,-
    rows = [(1.0, 0), (1.0, 1), (2.0, 0), (3.0, 1), (3.0, 1), (3.0, 0)]
    df = spark.createDataFrame(rows, "s double, lab int")
    out = auc_roc(df, "s", "lab").collect()[0]
    # avg ranks: score1 -> 1.5, score2 -> 3, score3 -> 5
    # rank_sum over positives = 1.5 + 5 + 5 = 11.5; n+=3, n-=3
    # AUC = (11.5 - 3*4/2) / 9 = 5.5/9
    assert out["auc"] == round(5.5 / 9, 6)
    assert (out["n_pos"], out["n_neg"]) == (3, 3)


def test_auc_random_matches_sklearn_style_reference(spark):
    import random

    from zio_analytics_spark.operators.stats import auc_roc

    rng = random.Random(17)
    rows = [
        (float(rng.randrange(0, 30)) / 2.0, rng.random() < 0.4) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "s double, lab boolean")
    got = auc_roc(df, "s", "lab").collect()[0]["auc"]
    # reference: explicit pairwise P(s+ > s-) + 0.5 P(=)
    pos = [s for s, l in rows if l]
    neg = [s for s, l in rows if not l]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    assert got == round(wins / (len(pos) * len(neg)), 6)


def test_auc_single_class_is_null_and_groups_isolate(spark):
    from zio_analytics_spark.operators.stats import auc_roc

    rows = [("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 0), ("b", 2.0, 1)]
    df = spark.createDataFrame(rows, "g string, s double, lab int")
    out = {r["g"]: r["auc"] for r in auc_roc(df, "s", "lab", ["g"]).collect()}
    assert out["a"] is None
    assert out["b"] == 1.0


# --- ols_simple / theil_sen_slope (round-7 batch 2) -----------------------


def test_ols_matches_numpy_lstsq(spark):
    import numpy as np

    from zio_analytics_spark.operators.stats import ols_simple

    rng = np.random.RandomState(7)
    x = rng.uniform(0, 10, 200)
    y = 3.5 * x - 2.0 + rng.normal(0, 0.5, 200)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(x, y)],
        "grp string, x double, y double",
    )
    out = ols_simple(df, "x", "y", ["grp"]).collect()[0]
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert out["n"] == 200
    assert abs(out["slope"] - slope) < 1e-6
    assert abs(out["intercept"] - intercept) < 1e-6
    assert abs(out["r2"] - r * r) < 1e-6


def test_ols_degenerate_x_is_null_and_null_pairs_excluded(spark):
    from zio_analytics_spark.operators.stats import ols_simple

    rows = [("flat", 1.0, 2.0), ("flat", 1.0, 5.0), ("ok", 0.0, 1.0), ("ok", 2.0, 5.0), ("ok", None, 99.0)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = {r["grp"]: r for r in ols_simple(df, "x", "y", ["grp"]).collect()}
    assert out["flat"]["slope"] is None  # var(x)=0
    assert out["ok"]["n"] == 2  # null-x row never enters the fit
    assert out["ok"]["slope"] == 2.0
    assert out["ok"]["intercept"] == 1.0


def test_theil_sen_resists_outlier_where_ols_breaks(spark):
    from zio_analytics_spark.operators.stats import ols_simple, theil_sen_slope

    # perfect slope-2 line with one wild outlier
    rows = [("g", float(i), 2.0 * i) for i in range(10)]
    rows[7] = ("g", 7.0, 1000.0)
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    ts = theil_sen_slope(df, "x", "y", ["grp"]).collect()[0]
    ls = ols_simple(df, "x", "y", ["grp"]).collect()[0]
    assert ts["n_pairs"] == 45
    assert abs(ts["ts_slope"] - 2.0) < 1e-9  # median shrugs the outlier off
    assert abs(ls["slope"] - 2.0) > 5  # OLS is dragged far away


def test_theil_sen_matches_scipy_style_median_of_pairwise(spark):
    import itertools
    import statistics

    from zio_analytics_spark.operators.stats import theil_sen_slope

    xs = [0.0, 1.0, 2.0, 4.0, 7.0, 11.0]
    ys = [1.0, 2.5, 2.0, 6.0, 9.5, 12.0]
    expected = round(
        statistics.median(
            (ys[j] - ys[i]) / (xs[j] - xs[i])
            for i, j in itertools.combinations(range(len(xs)), 2)
        ),
        6,
    )
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "grp string, x double, y double"
    )
    out = theil_sen_slope(df, "x", "y", ["grp"]).collect()[0]
    assert out["ts_slope"] == expected
    # duplicate-x pairs are excluded: add a tie and pair count grows by
    # (points paired with the tie that have distinct x) only
    df2 = df.unionByName(
        spark.createDataFrame([("g", 2.0, 3.0)], "grp string, x double, y double")
    )
    out2 = theil_sen_slope(df2, "x", "y", ["grp"]).collect()[0]
    assert out2["n_pairs"] == out["n_pairs"] + 5  # 6 others, one shares x=2.0
