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
