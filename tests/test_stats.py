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


# --- skew_kurtosis / confusion_stats / calibration_bins (round-7 batch 3) --


def test_skew_kurtosis_matches_spark_builtins_and_scipy_forms(spark):
    import numpy as np

    from zio_analytics_spark.operators.stats import skew_kurtosis

    rng = np.random.RandomState(3)
    vals = np.concatenate([rng.normal(10, 2, 300), rng.exponential(5, 100)])
    df = spark.createDataFrame([("g", float(v)) for v in vals], "grp string, v double")
    out = skew_kurtosis(df, "v", ["grp"]).collect()[0]
    # population (biased) forms, same as scipy.stats.skew/kurtosis(bias=True)
    m = vals.mean()
    m2 = ((vals - m) ** 2).mean()
    m3 = ((vals - m) ** 3).mean()
    m4 = ((vals - m) ** 4).mean()
    assert out["n"] == 400
    assert abs(out["skewness"] - m3 / m2**1.5) < 1e-5
    assert abs(out["kurtosis"] - (m4 / m2**2 - 3)) < 1e-5
    # Spark's own builtins compute the identical population definitions
    builtin = df.groupBy("grp").agg(
        F.skewness("v").alias("sk"), F.kurtosis("v").alias("ku")
    ).collect()[0]
    assert abs(out["skewness"] - builtin["sk"]) < 1e-5
    assert abs(out["kurtosis"] - builtin["ku"]) < 1e-5


def test_skew_kurtosis_degenerate_group_is_null(spark):
    from zio_analytics_spark.operators.stats import skew_kurtosis

    df = spark.createDataFrame([("g", 5.0)] * 4, "grp string, v double")
    out = skew_kurtosis(df, "v", ["grp"]).collect()[0]
    assert out["var_pop"] == 0.0
    assert out["skewness"] is None and out["kurtosis"] is None


def test_confusion_stats_hand_checked(spark):
    from zio_analytics_spark.operators.stats import confusion_stats

    # true: a a a b b c ; pred: a b a b b a
    rows = list(zip("aaabbc", "abab" + "ba"))
    df = spark.createDataFrame(rows, "t string, p string")
    out = {r["cls"]: r for r in confusion_stats(df, "t", "p").collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["tp"], a["fp"], a["fn"]) == (2, 1, 1)
    assert a["precision"] == round(2 / 3, 6) and a["recall"] == round(2 / 3, 6)
    assert a["f1"] == round(2 / 3, 6)
    assert (b["tp"], b["fp"], b["fn"]) == (2, 1, 0)
    assert b["recall"] == 1.0
    # class c never predicted: precision undefined, recall 0, f1 undefined
    assert (c["tp"], c["fp"], c["fn"]) == (0, 0, 1)
    assert c["precision"] is None and c["recall"] == 0.0 and c["f1"] is None


def test_confusion_stats_pred_only_class_appears(spark):
    from zio_analytics_spark.operators.stats import confusion_stats

    df = spark.createDataFrame([("x", "y"), ("x", "x")], "t string, p string")
    out = {r["cls"]: r for r in confusion_stats(df, "t", "p").collect()}
    assert set(out) == {"x", "y"}
    y = out["y"]
    assert (y["tp"], y["fp"], y["fn"]) == (0, 1, 0)
    assert y["precision"] == 0.0 and y["recall"] is None


def test_calibration_bins_edges_and_rates(spark):
    from zio_analytics_spark.operators.stats import calibration_bins

    rows = [
        (0.05, 0), (0.05, 0), (0.05, 0), (0.05, 1),  # bin 0: rate .25
        (0.55, 1), (0.55, 0),                          # bin 5: rate .5
        (1.0, 1),                                      # score exactly 1 → top bin
        (0.999, 1),
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    out = {r["bin"]: r for r in calibration_bins(df, "s", "y", n_bins=10).collect()}
    assert set(out) == {0, 5, 9}
    assert out[0]["n"] == 4 and out[0]["pos_rate"] == 0.25
    assert out[5]["n"] == 2 and out[5]["pos_rate"] == 0.5
    assert out[9]["n"] == 2  # 1.0 folded into bin 9, not a phantom bin 10
    import pytest

    with pytest.raises(ValueError):
        calibration_bins(df, "s", "y", n_bins=0)


# --- kaplan_meier (round-7) --------------------------------------------------


def test_kaplan_meier_hand_computed(spark):
    from zio_analytics_spark.operators.stats import kaplan_meier

    # classic toy: durations (event=1 observed, 0 censored)
    # t=1: d=1 n=6 -> S=5/6; t=3: d=1 n=4 -> S=5/6*3/4; t=5: d=1 n=2 -> *1/2
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1), (6, 0)]
    df = spark.createDataFrame(rows, "t long, ev int")
    got = {r["t"]: r for r in kaplan_meier(df, "t", "ev").collect()}
    assert set(got) == {1, 3, 5}
    assert (got[1]["n_risk"], got[1]["n_events"]) == (6, 1)
    assert (got[3]["n_risk"], got[3]["n_events"]) == (4, 1)
    assert (got[5]["n_risk"], got[5]["n_events"]) == (2, 1)
    assert abs(got[1]["survival"] - 5 / 6) < 1e-6
    assert abs(got[3]["survival"] - 5 / 6 * 3 / 4) < 1e-6
    assert abs(got[5]["survival"] - 5 / 6 * 3 / 4 * 1 / 2) < 1e-6
    # Nelson-Aalen cumulative hazard: sum of d/n up to t
    assert abs(got[1]["cum_hazard"] - 1 / 6) < 1e-6
    assert abs(got[3]["cum_hazard"] - (1 / 6 + 1 / 4)) < 1e-6
    assert abs(got[5]["cum_hazard"] - (1 / 6 + 1 / 4 + 1 / 2)) < 1e-6


def test_kaplan_meier_censoring_matters(spark):
    from zio_analytics_spark.operators.stats import kaplan_meier

    # same event times; censored subjects keep n_risk high -> higher survival
    with_cens = [(2, 1), (4, 1)] + [(5, 0)] * 8
    without = [(2, 1), (4, 1)]
    df1 = spark.createDataFrame(with_cens, "t long, ev int")
    df2 = spark.createDataFrame(without, "t long, ev int")
    s1 = {r["t"]: r["survival"] for r in kaplan_meier(df1, "t", "ev").collect()}
    s2 = {r["t"]: r["survival"] for r in kaplan_meier(df2, "t", "ev").collect()}
    assert s1[4] > 0.7 and s2[4] == 0.0  # naive (no censored) curve hits 0


def test_kaplan_meier_all_die_hits_zero_and_groups(spark):
    from zio_analytics_spark.operators.stats import kaplan_meier

    rows = [("a", 1, 1), ("a", 2, 1), ("b", 1, 1), ("b", 9, 0)]
    df = spark.createDataFrame(rows, "g string, t long, ev int")
    got = {
        (r["g"], r["t"]): r["survival"]
        for r in kaplan_meier(df, "t", "ev", group_cols=["g"]).collect()
    }
    assert got[("a", 2)] == 0.0  # final event kills the whole risk set
    assert got[("b", 1)] == 0.5  # censored subject holds the curve up


def test_logrank_identical_groups_near_zero(spark):
    from zio_analytics_spark.operators.stats import logrank_test

    # two identical survival experiences -> observed == expected, chi2 = 0
    rows = [("a", t, e) for t, e in [(1, 1), (2, 1), (3, 0), (4, 1)]] + [
        ("b", t, e) for t, e in [(1, 1), (2, 1), (3, 0), (4, 1)]
    ]
    df = spark.createDataFrame(rows, "g string, t long, ev int")
    r = logrank_test(df, "t", "ev", "g").collect()[0]
    assert r["observed_1"] == r["expected_1"]
    assert r["chi2"] == 0.0


def test_logrank_separated_groups_large_chi2(spark):
    from zio_analytics_spark.operators.stats import logrank_test

    # group a dies early, group b survives long: curves clearly differ
    rows = [("a", t, 1) for t in range(1, 11)] + [("b", t, 1) for t in range(20, 30)]
    df = spark.createDataFrame(rows, "g string, t long, ev int")
    r = logrank_test(df, "t", "ev", "g").collect()[0]
    assert r["chi2"] > 10.0  # p << 0.01 at 1 df
    assert r["observed_1"] == 10.0
    assert r["expected_1"] < 6.0


def test_logrank_hand_computed_two_times(spark):
    from zio_analytics_spark.operators.stats import logrank_test

    # t=1: group a's subject dies (n1=1... use concrete small case):
    # a: durations [1 (event), 3 (censored)]; b: [2 (event), 3 (censored)]
    rows = [("a", 1, 1), ("a", 3, 0), ("b", 2, 1), ("b", 3, 0)]
    df = spark.createDataFrame(rows, "g string, t long, ev int")
    r = logrank_test(df, "t", "ev", "g").collect()[0]
    # t=1: d=1, n1=2, n=4 -> E1 += 0.5, V += 1*(0.5)(0.5)(3)/3 = 0.25
    # t=2: d=1, n1=1, n=3 -> E1 += 1/3, V += (1/3)(2/3)(2)/2 = 2/9
    assert r["observed_1"] == 1.0
    assert abs(r["expected_1"] - (0.5 + 1 / 3)) < 1e-6
    assert abs(r["variance"] - (0.25 + 2 / 9)) < 1e-6


def test_logrank_requires_two_groups(spark):
    import pytest

    from zio_analytics_spark.operators.stats import logrank_test

    df = spark.createDataFrame([("a", 1, 1)], "g string, t long, ev int")
    with pytest.raises(ValueError):
        logrank_test(df, "t", "ev", "g")


# --- poisson bootstrap (round-7) ---------------------------------------------


def test_poisson_weights_distribution(spark):
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.stats import poisson_weight

    df = spark.range(20_000)
    stats = df.select(poisson_weight(F.col("id"), 0).alias("w")).agg(
        F.avg("w").alias("m"), F.avg(F.when(F.col("w") == 0, 1.0).otherwise(0.0)).alias("p0")
    ).collect()[0]
    assert abs(stats["m"] - 1.0) < 0.03  # Poisson(1) mean
    assert abs(stats["p0"] - 0.3679) < 0.02  # P(0) = 1/e
    # different resamples draw different weights, same resample is stable
    a = df.select(poisson_weight(F.col("id"), 0).alias("w")).collect()
    b = df.select(poisson_weight(F.col("id"), 1).alias("w")).collect()
    a2 = df.select(poisson_weight(F.col("id"), 0).alias("w")).collect()
    assert [r["w"] for r in a] == [r["w"] for r in a2]
    assert [r["w"] for r in a] != [r["w"] for r in b]


def test_bootstrap_ci_covers_mean_and_narrows(spark):
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.stats import bootstrap_mean_ci

    small = spark.range(200).select(F.col("id"), (F.col("id") % 50).cast("double").alias("v"))
    big = spark.range(20_000).select(F.col("id"), (F.col("id") % 50).cast("double").alias("v"))
    rs = bootstrap_mean_ci(small, "v", "id").collect()[0]
    rb = bootstrap_mean_ci(big, "v", "id").collect()[0]
    for r in (rs, rb):
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    # 100x more data -> much narrower interval (sqrt-n shrinkage)
    assert (rb["ci_hi"] - rb["ci_lo"]) < (rs["ci_hi"] - rs["ci_lo"]) / 3


def test_bootstrap_validates(spark):
    import pytest

    from zio_analytics_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "v", "id", n_resamples=2)


def test_bootstrap_empty_and_null_semantics(spark):
    """Round-17 ADVICE fixes: an empty input yields one row with n = 0
    (not NULL), and NULL values do not dilute the headline mean — the
    b = -1 lane reproduces avg()'s NULL-skipping denominator."""
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.stats import bootstrap_mean_ci

    empty = spark.createDataFrame([], "id long, v double")
    r = bootstrap_mean_ci(empty, "v", "id").collect()
    assert len(r) == 1 and r[0]["n"] == 0 and r[0]["mean"] is None

    withnull = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 30.0)], "id long, v double"
    )
    r = bootstrap_mean_ci(withnull, "v", "id").collect()[0]
    assert r["n"] == 4  # n counts rows, like the oracle's count(*)
    assert r["mean"] == 20.0  # avg skips the NULL: (10+20+30)/3, not /4
