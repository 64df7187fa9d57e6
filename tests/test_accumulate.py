"""MapAccumulate paths: associative window fast path vs general pandas scan
must agree (SURVEY.md §7 step 5)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators.accumulate import map_accumulate, map_accumulate_general


def _frame(spark):
    rows = [(1, "a", 2.0), (2, "a", 3.0), (3, "b", 5.0), (4, "a", 1.0), (5, "b", 4.0)]
    return spark.createDataFrame(rows, "id long, k string, v double")


def test_associative_running_sum_keyed(spark):
    out = map_accumulate(_frame(spark), order_by=["id"], running={"rs": F.sum("v")}, partition_by=["k"])
    got = {r.id: r.rs for r in out.collect()}
    assert got == {1: 2.0, 2: 5.0, 3: 5.0, 4: 6.0, 5: 9.0}


def test_associative_total_order(spark):
    out = map_accumulate(_frame(spark), order_by=["id"], running={"rs": F.sum("v")})
    got = {r.id: r.rs for r in out.collect()}
    assert got == {1: 2.0, 2: 5.0, 3: 10.0, 4: 11.0, 5: 15.0}


def test_general_path_matches_fast_path(spark):
    def fn(state, pdf):
        pdf = pdf.copy()
        pdf["rs"] = pdf["v"].cumsum() + state
        return state + pdf["v"].sum(), pdf[["id", "rs"]]

    general = map_accumulate_general(
        _frame(spark), ["id"], fn, "id long, rs double", lambda: 0.0
    )
    fast = map_accumulate(_frame(spark), order_by=["id"], running={"rs": F.sum("v")})
    assert {(r.id, r.rs) for r in general.collect()} == {(r.id, r.rs) for r in fast.collect()}


def test_general_path_keyed(spark):
    def fn(state, pdf):
        pdf = pdf.copy()
        pdf["rs"] = pdf["v"].cumsum() + state
        return state + pdf["v"].sum(), pdf[["id", "k", "rs"]]

    out = map_accumulate_general(
        _frame(spark), ["id"], fn, "id long, k string, rs double", lambda: 0.0, partition_by=["k"]
    )
    got = {r.id: r.rs for r in out.collect()}
    assert got == {1: 2.0, 2: 5.0, 3: 5.0, 4: 6.0, 5: 9.0}


def test_state_threading_non_associative(spark):
    """A genuinely order-dependent accumulator (sign-flipping) — the case
    the window fast path can't express (reference Local.scala:139-151)."""

    def fn(state, pdf):
        out_vals, s = [], state
        for v in pdf["v"]:
            s = v - s  # depends on full prefix, not associative
            out_vals.append(s)
        pdf = pdf.copy()
        pdf["acc"] = out_vals
        return s, pdf[["id", "acc"]]

    out = map_accumulate_general(_frame(spark), ["id"], fn, "id long, acc double", lambda: 0.0)
    got = [r.acc for r in sorted(out.collect(), key=lambda r: r.id)]
    # manual: 2-0=2; 3-2=1; 5-1=4; 1-4=-3; 4-(-3)=7
    assert got == [2.0, 1.0, 4.0, -3.0, 7.0]


def test_keyless_guard_is_lazy(spark):
    """Constructing a keyless map_accumulate must trigger NO Spark job:
    the guard is an execution-time check, not an eager count (which would
    itself be a full scan at 100 TB, run even for never-executed plans)."""
    df = _frame(spark)
    sc = spark.sparkContext
    sc.setJobGroup("keyless-guard-construction", "plan build only")
    try:
        map_accumulate(df, order_by=["id"], running={"rs": F.sum("v")})
        map_accumulate_general(
            df, ["id"], lambda s, p: (s, p), "id long, k string, v double", lambda: 0
        )
        jobs = sc.statusTracker().getJobIdsForGroup("keyless-guard-construction")
        assert list(jobs) == [], f"plan construction launched Spark jobs: {jobs}"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)


def test_keyless_guard_fires_at_execution(spark):
    """Past the limit, the deferred guard fails the JOB (not the plan build)
    with the total-order-cliff message; under the limit values are
    untouched; partition_by / keyless_limit=0 disable it."""
    df = _frame(spark)

    over = map_accumulate(df, order_by=["id"], running={"rs": F.sum("v")}, keyless_limit=2)
    with pytest.raises(Exception, match="single-task total-order scan"):
        over.collect()
    gen = map_accumulate_general(
        df, ["id"], lambda s, p: (s, p), "id long, k string, v double", lambda: 0,
        keyless_limit=2,
    )
    with pytest.raises(Exception, match="single-task total-order scan"):
        gen.collect()

    # guard active but under the limit: values flow through unchanged
    under = map_accumulate(df, order_by=["id"], running={"rs": F.sum("v")}, keyless_limit=10)
    assert {r.id: r.rs for r in under.collect()} == {1: 2.0, 2: 5.0, 3: 10.0, 4: 11.0, 5: 15.0}

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # keyed path and explicit acknowledgement: no guard, collect fine
        map_accumulate(
            df, order_by=["id"], running={"rs": F.sum("v")}, partition_by=["k"]
        ).collect()
        map_accumulate(
            df, order_by=["id"], running={"rs": F.sum("v")}, keyless_limit=0
        ).collect()


def test_keyless_guard_survives_column_pruning(spark):
    """The guard must fire no matter WHICH output column survives a
    downstream select: Catalyst prunes unreferenced window columns, so a
    guard embedded only in the first running column would silently vanish
    when a consumer projects the second (the round-3 defect)."""
    df = _frame(spark)
    over = map_accumulate(
        df,
        order_by=["id"],
        running={"rs": F.sum("v"), "rc": F.count(F.lit(1))},
        keyless_limit=2,
    )
    with pytest.raises(Exception, match="single-task total-order scan"):
        over.select("rc").collect()  # prunes "rs" — guard must still trip
    with pytest.raises(Exception, match="single-task total-order scan"):
        over.select("rs").collect()
