from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators.timeseries import cascade_rollup


def _events(spark):
    rows = [
        ("2024-01-01 00:05:00", "a", 1.0),
        ("2024-01-01 00:45:00", "a", 2.0),
        ("2024-01-01 01:05:00", "a", 4.0),
        ("2024-01-01 03:05:00", "b", 8.0),
        ("2024-01-02 00:05:00", "a", 16.0),
    ]
    return spark.createDataFrame(rows, "ts_s string, k string, v double").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "k", "v"
    )


def test_cascade_levels_match_direct_aggregation(spark):
    ev = _events(spark)
    levels = cascade_rollup(
        ev, "ts", ["k"],
        measures={"n": ("count", "v"), "total": ("sum", "v"), "vmax": ("max", "v")},
        levels=["1 hour", "1 day"],
    )
    hour = {(r.bucket_start.isoformat(), r.k): (r.n, r.total) for r in levels["1 hour"].collect()}
    assert hour[("2024-01-01T00:00:00", "a")] == (2, 3.0)
    assert hour[("2024-01-01T01:00:00", "a")] == (1, 4.0)

    # day level (derived from hour) == direct day aggregation over raw
    direct = {
        (r.d.isoformat(), r.k): (r.n, r.total, r.vmax)
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("d"), "k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("total"), F.max("v").alias("vmax"))
        .collect()
    }
    derived = {
        (r.bucket_start.isoformat(), r.k): (r.n, r.total, r.vmax)
        for r in levels["1 day"].collect()
    }
    assert derived == direct


def test_cascade_rejects_non_reaggregable(spark):
    with pytest.raises(ValueError, match="not re-aggregable"):
        cascade_rollup(_events(spark), "ts", ["k"], {"a": ("avg", "v")}, ["1 hour"])


def test_interpolate_linear_basic(spark):
    from zio_analytics_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 10, None), ("a", 20, None), ("a", 40, 50.0),
         ("a", 50, None),           # trailing edge: no next neighbor
         ("b", 0, None), ("b", 5, 7.0)],  # leading edge: no prev neighbor
        "k string, t long, v double",
    )
    out = {(r["k"], r["t"]): r["v"] for r in
           interpolate_linear(df, "k", "t", "v").collect()}
    assert out[("a", 0)] == 10.0 and out[("a", 40)] == 50.0   # anchors kept
    assert out[("a", 10)] == 20.0 and out[("a", 20)] == 30.0  # lerp on t, not row index
    assert out[("a", 50)] is None and out[("b", 0)] is None   # strict: no extrapolation
    assert out[("b", 5)] == 7.0


def test_interpolate_linear_timestamp_axis(spark):
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 0.0),
         ("a", "2024-01-01 01:00:00", None),
         ("a", "2024-01-01 03:00:00", 9.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {str(r["ts"]): r["v"] for r in interpolate_linear(df, "k", "ts", "v").collect()}
    assert out["2024-01-01 01:00:00"] == 3.0  # 1/3 of the way in TIME


def test_ewma_recurrence_hand_computed(spark):
    """e1=x1; et = 0.25*xt + 0.75*e(t-1) — exact binary coefficients, so
    the comparison is equality, not approx."""
    from zio_analytics_spark.operators.timeseries import ewma

    rows = [(1, 1, "2024-01-01 00:00:00", 8.0),
            (1, 2, "2024-01-01 01:00:00", 4.0),
            (1, 3, "2024-01-01 02:00:00", 0.0),
            (2, 4, "2024-01-01 00:00:00", 2.0)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, value double"
    ).selectExpr("user_id", "event_id", "CAST(ts_s AS timestamp) AS ts", "value")
    out = {r.event_id: r.ewma for r in ewma(
        df, "value", order_by=["ts", "event_id"], partition_by=["user_id"]
    ).collect()}
    assert out[1] == 8.0
    assert out[2] == 0.25 * 4.0 + 0.75 * 8.0      # 7.0
    assert out[3] == 0.25 * 0.0 + 0.75 * 7.0      # 5.25
    assert out[4] == 2.0  # independent key restarts the recurrence


def test_ewma_requires_partition_keys(spark):
    import pytest as _pytest

    from zio_analytics_spark.operators.timeseries import ewma

    df = spark.range(5).selectExpr("id AS user_id", "id AS event_id",
                                   "CAST(id AS double) AS value")
    with _pytest.raises(ValueError, match="partition_by"):
        ewma(df, "value", order_by=["event_id"], partition_by=[])


def test_ewma_bucketed_identical_to_per_key(spark):
    """n_buckets changes only the Python-invocation grouping — the
    recurrence resets at key boundaries inside the scan, so results are
    identical to the per-key form (including keys colliding in a bucket)."""
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.timeseries import ewma

    df = spark.range(300).select(
        (F.col("id") % 17).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    per_key = ewma(df, "value", ["event_id"], ["user_id"])
    bucketed = ewma(df, "value", ["event_id"], ["user_id"], n_buckets=4)
    a = sorted(map(tuple, per_key.collect()))
    b = sorted(map(tuple, bucketed.collect()))
    assert a == b


def test_ewma_pandas_engine_bit_identical_to_loop(spark):
    """Round-6 vectorization: the Cython groupby-ewm path must reproduce the
    literal a*x + b*e loop BIT-IDENTICALLY for the shipped alpha=0.25 (what
    keeps the recursive-CTE oracle hash-green), and within 1 ulp for
    arbitrary alpha (pandas' internal weighted-average form)."""
    import math
    import random

    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.timeseries import ewma

    rnd = random.Random(42)
    rows = [
        (i % 23, i, rnd.gauss(0.0, 1.0) * rnd.choice([1e-6, 1.0, 1e6]))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")

    for alpha, exact in [(0.25, True), (0.5, True), (0.719, False)]:
        loop = ewma(
            df, "value", ["event_id"], ["user_id"], alpha=alpha,
            n_buckets=4, engine="loop",
        )
        fast = ewma(
            df, "value", ["event_id"], ["user_id"], alpha=alpha,
            n_buckets=4, engine="pandas",
        )
        a = {r.event_id: r.ewma for r in loop.collect()}
        b = {r.event_id: r.ewma for r in fast.collect()}
        assert a.keys() == b.keys()
        for k in a:
            if exact:
                assert a[k] == b[k], (alpha, k, a[k].hex(), b[k].hex())
            else:
                assert math.isclose(a[k], b[k], rel_tol=1e-11), (alpha, k)


def test_ewma_auto_engine_falls_back_on_nulls(spark):
    """auto must preserve the loop's NaN-propagation semantics: a null value
    poisons the rest of its key's chain rather than being skipped."""
    from zio_analytics_spark.operators.timeseries import ewma

    rows = [(1, 0, 2.0), (1, 1, None), (1, 2, 4.0), (2, 0, 8.0), (2, 1, 10.0)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    out = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma(df, "value", ["event_id"], ["user_id"], alpha=0.25).collect()
    }
    import math

    def poisoned(v):  # arrow maps the scan's NaN to SQL null on the way out
        return v is None or math.isnan(v)

    assert out[(1, 0)] == 2.0
    assert poisoned(out[(1, 1)]) and poisoned(out[(1, 2)])
    assert out[(2, 0)] == 8.0 and out[(2, 1)] == 0.25 * 10.0 + 0.75 * 8.0


def test_ewma_null_partition_keys(spark):
    """Round-7 advice fix: null partition keys must form their own group
    (dropna=False in the pandas engine) rather than crash with a length
    mismatch, and both engines must agree on the grouping."""
    from zio_analytics_spark.operators.timeseries import ewma

    rows = [
        (None, 0, 8.0),
        (None, 1, 4.0),
        (1, 2, 2.0),
        (1, 3, 6.0),
        (None, 4, 0.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    for engine in ("pandas", "loop", "auto"):
        out = {
            r.event_id: r.ewma
            for r in ewma(
                df, "value", ["event_id"], ["user_id"], alpha=0.25, engine=engine
            ).collect()
        }
        assert out[0] == 8.0, engine
        assert out[1] == 0.25 * 4.0 + 0.75 * 8.0, engine  # null key: one group
        assert out[4] == 0.25 * 0.0 + 0.75 * out[1], engine
        assert out[2] == 2.0 and out[3] == 0.25 * 6.0 + 0.75 * 2.0, engine


# ---------------------------------------------------------------------------
# cusum (Page 1954) — closed form vs the literal recurrence
# ---------------------------------------------------------------------------


def _cusum_recurrence(xs, target, slack):
    hi = lo = 0.0
    out = []
    for x in xs:
        hi = max(0.0, hi + ((x - target) - slack))
        lo = max(0.0, lo + (-(x - target) - slack))
        out.append((round(hi, 6), round(lo, 6)))
    return out


def test_cusum_closed_form_equals_recurrence_random_walks(spark):
    import random

    from zio_analytics_spark.operators.timeseries import cusum

    rng = random.Random(13)
    rows = []
    series = {}
    for k in ("a", "b", "c"):
        xs = [round(rng.uniform(-5, 15), 3) for _ in range(200)]
        series[k] = xs
        rows += [(k, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, i long, x double")
    got = {
        (r["k"], r["i"]): (r["cusum_hi"], r["cusum_lo"])
        for r in cusum(
            df, "x", order_cols=["i"], key_cols=["k"], target=4.0, slack=1.0
        ).collect()
    }
    for k, xs in series.items():
        want = _cusum_recurrence(xs, 4.0, 1.0)
        for i, w in enumerate(want):
            assert got[(k, i)] == w, (k, i)


def test_cusum_alarm_and_reset(spark):
    from zio_analytics_spark.operators.timeseries import cusum

    # in-control, then a level shift: hi side climbs and alarms; a
    # below-target run resets it to zero (the clamp)
    xs = [10.0, 10.0, 30.0, 30.0, 30.0, 0.0, 0.0, 10.0]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "k string, i long, x double"
    )
    out = {
        r["i"]: (r["cusum_hi"], r["alarm"])
        for r in cusum(
            df, "x", ["i"], ["k"], target=10.0, slack=2.0, threshold=30.0
        ).collect()
    }
    # d_hi = x - 12: -2, -2, 18, 18, 18, -12, -12, -2 → clamped: 0,0,18,36,54,42,30,28
    assert [out[i][0] for i in range(8)] == [0.0, 0.0, 18.0, 36.0, 54.0, 42.0, 30.0, 28.0]
    assert [out[i][1] for i in range(8)] == [
        False, False, False, True, True, True, False, False,
    ]


def test_cusum_keys_are_independent(spark):
    from zio_analytics_spark.operators.timeseries import cusum

    df = spark.createDataFrame(
        [("a", 0, 100.0), ("b", 0, 0.0)], "k string, i long, x double"
    )
    out = {
        r["k"]: r["cusum_hi"]
        for r in cusum(df, "x", ["i"], ["k"], target=0.0).collect()
    }
    assert out == {"a": 100.0, "b": 0.0}


def test_cusum_seeded_closed_form_across_batch_splits():
    """The streaming twin (catalog streaming_cusum) advances each
    micro-batch by P = state + cumsum(d); S = P - min(0, cummin P).
    Prove that seeded form equals the literal recurrence for EVERY way of
    splitting the series into batches (the state carry-over contract)."""
    import itertools
    import random

    import numpy as np
    import pandas as pd

    rng = random.Random(21)
    xs = [round(rng.uniform(-8, 12), 3) for _ in range(12)]
    want = _cusum_recurrence(xs, 2.0, 1.0)

    def run_split(cuts):
        state = 0.0
        out = []
        parts = np.split(np.array(xs), cuts)
        for part in parts:
            if len(part) == 0:
                continue
            d = pd.Series(part) - 2.0 - 1.0
            p = state + d.cumsum()
            s = p - np.minimum(p.cummin(), 0.0)
            out.extend(round(v, 6) for v in s)
            state = float(s.iloc[-1])
        return out

    for r in (1, 2, 3):
        for cuts in itertools.combinations(range(1, 12), r):
            got = run_split(list(cuts))
            assert got == [h for h, _ in want], cuts


# --- autocorrelation (round-7 batch 2) ------------------------------------


def test_autocorr_matches_numpy_lagged_corr(spark):
    import numpy as np

    from zio_analytics_spark.operators.timeseries import autocorrelation

    rng = np.random.RandomState(11)
    # AR(1)-ish series so lag-1 correlation is strongly positive
    v = [0.0]
    for _ in range(199):
        v.append(0.8 * v[-1] + rng.normal())
    df = spark.createDataFrame(
        [("s", i, float(x)) for i, x in enumerate(v)],
        "grp string, t int, v double",
    )
    out = {
        r["lag"]: r
        for r in autocorrelation(df, "t", "v", ["grp"], lags=(1, 2)).collect()
    }
    for k in (1, 2):
        a = np.array(v[k:])
        b = np.array(v[:-k])
        expected = float(np.corrcoef(a, b)[0, 1])
        assert out[k]["n_pairs"] == 200 - k
        assert abs(out[k]["acf"] - expected) < 1e-6
    assert out[1]["acf"] > 0.7  # the AR(1) signal is visible


def test_autocorr_groups_isolate_and_lag_validation(spark):
    import pytest

    from zio_analytics_spark.operators.timeseries import autocorrelation

    rows = [("a", i, float(i % 2)) for i in range(10)] + [
        ("b", i, float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = {
        (r["grp"], r["lag"]): r["acf"]
        for r in autocorrelation(df, "t", "v", ["grp"], lags=(1,)).collect()
    }
    assert out[("a", 1)] == -1.0  # alternating series: perfect anti-correlation
    assert out[("b", 1)] == 1.0  # linear ramp: perfect correlation
    with pytest.raises(ValueError):
        autocorrelation(df, "t", "v", ["grp"], lags=(0,))


def test_decayed_sum_closed_form(spark):
    import math

    from zio_analytics_spark.operators.timeseries import decayed_sum

    rows = [
        ("g", "2024-01-31 00:00:00", 10.0),  # age 0 → weight 1
        ("g", "2024-01-24 00:00:00", 10.0),  # age 7d → weight 0.5
        ("g", "2024-01-17 00:00:00", 10.0),  # age 14d → weight 0.25
    ]
    df = spark.createDataFrame(rows, "grp string, ts string, value double").select(
        "grp", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = decayed_sum(df, "ts", "value", as_of="2024-01-31", group_cols=["grp"]).collect()[0]
    assert out["n"] == 3
    assert out["decayed_sum"] == 17.5
    assert out["decayed_weight"] == 1.75
    # arbitrary half-life
    out2 = decayed_sum(
        df, "ts", "value", as_of="2024-01-31", half_life_days=14.0, group_cols=["grp"]
    ).collect()[0]
    assert abs(out2["decayed_sum"] - round(10 * (1 + 0.5**0.5 + 0.5), 6)) < 1e-9
    assert math.isclose(
        out2["decayed_weight"], round(1 + 0.5**0.5 + 0.5, 6), rel_tol=1e-9
    )


# --- holt (round-7) ---------------------------------------------------------


def test_holt_matches_python_replay(spark):
    import random

    from zio_analytics_spark.operators.timeseries import holt

    rng = random.Random(13)
    rows = [(k, i, float(rng.randrange(-500, 500))) for k in range(5) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    got = {
        (r["k"], r["i"]): (r["level"], r["trend"])
        for r in holt(df, "v", order_by=["i"], partition_by=["k"]).collect()
    }
    for k in range(5):
        l = t = None
        for i in range(40):
            x = dict(((a, b), v) for a, b, v in rows)[(k, i)]
            if l is None:
                l, t = x, 0.0
            else:
                ln = 0.5 * x + 0.5 * (l + t)
                t = 0.25 * (ln - l) + 0.75 * t
                l = ln
            assert got[(k, i)] == (l, t), (k, i)  # bit-identical


def test_holt_tracks_linear_trend_where_ewma_lags(spark):
    from zio_analytics_spark.operators.timeseries import ewma, holt

    rows = [(1, i, float(10 * i)) for i in range(60)]  # pure trend
    df = spark.createDataFrame(rows, "k long, i long, v double")
    h = holt(df, "v", order_by=["i"], partition_by=["k"]).orderBy("i").collect()
    e = ewma(df, "v", order_by=["i"], partition_by=["k"], alpha=0.5).orderBy("i").collect()
    # after burn-in, holt's one-step forecast is near-exact; ewma lags
    last_h = h[-1]
    assert abs((last_h["level"] + last_h["trend"]) - 10 * 60) < 1.0
    assert e[-1]["ewma"] < 10 * 59 - 5  # ewma sits measurably behind


def test_holt_bucketed_equals_per_key(spark):
    import random

    from zio_analytics_spark.operators.timeseries import holt

    rng = random.Random(29)
    rows = [(k, i, float(rng.randrange(1000))) for k in range(12) for i in range(15)]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    a = holt(df, "v", order_by=["i"], partition_by=["k"]).collect()
    b = holt(df, "v", order_by=["i"], partition_by=["k"], n_buckets=4).collect()
    key = lambda r: (r["k"], r["i"])
    assert sorted(map(tuple, a), key=lambda t: t[:2]) == sorted(map(tuple, b), key=lambda t: t[:2])


def test_holt_requires_keys(spark):
    import pytest

    from zio_analytics_spark.operators.timeseries import holt

    df = spark.createDataFrame([(1, 1.0)], "i long, v double")
    with pytest.raises(ValueError):
        holt(df, "v", order_by=["i"], partition_by=[])


def test_holt_winters_matches_python_replay(spark):
    import random

    from zio_analytics_spark.operators.timeseries import holt_winters

    rng = random.Random(31)
    m = 4
    rows = [
        (k, i, float(rng.randrange(-500, 500)) + 50.0 * (i % m))
        for k in range(4)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    got = {
        (r["k"], r["i"]): (r["level"], r["trend"], r["seasonal"])
        for r in holt_winters(
            df, "v", order_by=["i"], partition_by=["k"], season_length=m
        ).collect()
    }
    vals = dict(((a, b), v) for a, b, v in rows)
    for k in range(4):
        l = t = None
        buf = []
        for i in range(30):
            x = vals[(k, i)]
            if l is None:
                l, t, s = x, 0.0, 0.0
                buf = [0.0] * (m - 1) + [s]
            else:
                sm = buf[0]
                ln = 0.5 * (x - sm) + 0.5 * (l + t)
                t = 0.25 * (ln - l) + 0.75 * t
                l = ln
                s = 0.25 * (x - l) + 0.75 * sm
                buf = buf[1:] + [s]
            assert got[(k, i)] == (l, t, s), (k, i)  # bit-identical


def test_holt_winters_learns_pure_seasonal_pattern(spark):
    from zio_analytics_spark.operators.timeseries import holt_winters

    m = 4
    pattern = [0.0, 100.0, -50.0, 10.0]
    rows = [(1, i, 500.0 + pattern[i % m]) for i in range(160)]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    out = (
        holt_winters(df, "v", order_by=["i"], partition_by=["k"], season_length=m)
        .orderBy("i")
        .collect()
    )
    # after burn-in the one-step forecast level+trend+s_{t+1-m} is near-exact
    for r in out[-m:]:
        i = r["i"]
        nxt = 500.0 + pattern[(i + 1) % m]
        s_next = next(x["seasonal"] for x in out if x["i"] == i + 1 - m)
        assert abs((r["level"] + r["trend"] + s_next) - nxt) < 2.0, i  # noqa: E501


def test_holt_winters_bucketed_and_validation(spark):
    import pytest

    from zio_analytics_spark.operators.timeseries import holt_winters

    rows = [(k, i, float((k * 7 + i * 13) % 100)) for k in range(8) for i in range(12)]
    df = spark.createDataFrame(rows, "k long, i long, v double")
    a = holt_winters(df, "v", order_by=["i"], partition_by=["k"], season_length=3).collect()
    b = holt_winters(
        df, "v", order_by=["i"], partition_by=["k"], season_length=3, n_buckets=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError):
        holt_winters(df, "v", order_by=["i"], partition_by=[], season_length=3)
    with pytest.raises(ValueError):
        holt_winters(df, "v", order_by=["i"], partition_by=["k"], season_length=1)
