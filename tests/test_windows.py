"""Window assigner semantics + properties (SURVEY.md §5.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_analytics_spark import DataStream, session, sliding, tumbling


def _windows_for(spark, ts_ms_values, assigner):
    ds = (
        DataStream.from_literals(spark, [(t,) for t in ts_ms_values], "ts_ms long")
        .with_column("ts", F.timestamp_millis(F.col("ts_ms")))
        .assign_timestamps("ts")
        .group_by(g=F.lit(1))
        .fold_window(assigner, n=F.count("*"), items=F.collect_list("ts_ms"))
    )
    return ds.collect()


def _ms(dt):
    return int(dt.timestamp() * 1000)


def test_sliding_coverage_property(spark):
    """Every ts lands in exactly size/step windows, and each covers it."""
    size_ms, step_ms = 20, 5
    ts_values = list(range(0, 100, 7))
    rows = _windows_for(spark, ts_values, sliding("20 milliseconds", "5 milliseconds"))
    per_ts = {}
    for r in rows:
        start, end = _ms(r.window_start), _ms(r.window_end)
        assert end - start == size_ms
        assert start % step_ms == 0
        for t in r.items:
            assert start <= t < end
            per_ts[t] = per_ts.get(t, 0) + 1
    assert all(c == size_ms // step_ms for c in per_ts.values())
    assert set(per_ts) == set(ts_values)


def test_tumbling_partition_property(spark):
    """Tumbling windows tile the axis: each ts in exactly one window."""
    ts_values = list(range(0, 100, 3))
    rows = _windows_for(spark, ts_values, tumbling("10 milliseconds"))
    seen = {}
    for r in rows:
        start, end = _ms(r.window_start), _ms(r.window_end)
        assert end - start == 10 and start % 10 == 0
        for t in r.items:
            assert t not in seen
            seen[t] = True
    assert set(seen) == set(ts_values)


def test_session_window_merge_semantics(spark):
    """Sessions merge on overlapping OR adjacent [ts, ts+gap) ranges: an
    event at exactly prev_ts + gap still merges; a new session starts only
    when ts - prev_ts > gap (strictly). Completes the reference's
    unimplemented session assigner (Window.scala:23-26)."""
    # gap = 10ms: [0, 5, 12] chain (diffs < 10); 22 == 12+10 → adjacent →
    # MERGES (measured Spark behavior); 40 - 22 = 18 > 10 → new session.
    rows = _windows_for(spark, [0, 5, 12, 22, 40], session("10 milliseconds"))
    spans = sorted((_ms(r.window_start), _ms(r.window_end), r.n) for r in rows)
    assert spans == [(0, 32, 4), (40, 50, 1)]


def test_fold_window_group_custom_reducer(spark):
    """Arbitrary per-(key, window) fold — the reference FoldWindow's general
    z/f contract via a pandas reducer."""
    import pandas as pd

    from zio_analytics_spark import DataStream

    rows = [(5, "a", 1.0), (8, "a", 5.0), (15, "a", 2.0)]
    ds = (
        DataStream.from_literals(spark, rows, schema="ts_s long, k string, v double")
        .with_column("ts", F.timestamp_seconds(F.col("ts_s")))
        .assign_timestamps("ts")
        .group_by("k")
    )

    def rng(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": [pdf["window_start"].iloc[0]],
                "k": [pdf["k"].iloc[0]],
                "spread": [pdf["v"].max() - pdf["v"].min()],
            }
        )

    out = ds.fold_window_group(
        tumbling("10 seconds"), rng, "window_start timestamp, k string, spread double"
    ).collect()
    got = {(r.window_start.second, r.k): r.spread for r in out}
    assert got == {(0, "a"): 4.0, (10, "a"): 0.0}


def _count_reducer():
    import pandas as pd

    def cnt(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": [pdf["window_start"].iloc[0]],
                "window_end": [pdf["window_end"].iloc[0]],
                "k": [pdf["k"].iloc[0]],
                "n": [len(pdf)],
            }
        )

    return cnt, "window_start timestamp, window_end timestamp, k string, n long"


def _group_vs_native(spark, assigner, ts_list):
    """fold_window_group(count) must equal the native fold_window(count)
    for the same assigner — proving the hand-rolled sliding duplication and
    session gaps-and-islands labeling match Spark's own window semantics."""
    from zio_analytics_spark import DataStream

    rows = [(t, "a") for t in ts_list] + [(t + 3, "b") for t in ts_list[::2]]
    ds = (
        DataStream.from_literals(spark, rows, schema="ts_ms long, k string")
        .with_column("ts", F.timestamp_millis(F.col("ts_ms")))
        .assign_timestamps("ts")
        .group_by("k")
    )
    native = {
        (r.window_start, r.window_end, r.k): r.n
        for r in ds.fold_window(assigner, n=F.count("*")).collect()
    }
    fn, schema = _count_reducer()
    grouped = {
        (r.window_start, r.window_end, r.k): r.n
        for r in ds.fold_window_group(assigner, fn, schema).collect()
    }
    assert grouped == native and native


def test_fold_window_group_sliding_matches_native(spark):
    from zio_analytics_spark import sliding

    _group_vs_native(spark, sliding("10 milliseconds", "5 milliseconds"), [0, 3, 7, 12, 26])
    # size not a multiple of step: membership filter must trim ineligible starts
    _group_vs_native(spark, sliding("10 milliseconds", "4 milliseconds"), [0, 3, 9, 17])


def test_fold_window_group_session_matches_native(spark):
    from zio_analytics_spark import session

    _group_vs_native(spark, session("10 milliseconds"), [0, 5, 12, 22, 40])


def test_fold_window_group_pre_epoch_timestamps(spark):
    """Pre-epoch (negative) event times: Java's signed % would place the
    window start AFTER the event (the round-3 advisory); pmod bucketing
    must agree with the native F.window floor semantics on both sides of
    the epoch, for every assigner."""
    from zio_analytics_spark import session, sliding, tumbling

    ts = [-23, -15, -10, -3, 0, 4, 11]
    _group_vs_native(spark, tumbling("10 milliseconds"), ts)
    _group_vs_native(spark, sliding("10 milliseconds", "5 milliseconds"), ts)
    _group_vs_native(spark, sliding("10 milliseconds", "4 milliseconds"), ts)
    _group_vs_native(spark, session("10 milliseconds"), ts)
