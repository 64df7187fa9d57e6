"""Event-analytics operators (operators/analytics.py) and the heavy-hitters
sketch (operators/sketch.py) on crafted fixtures with hand-computed answers."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from zio_analytics_spark.operators.analytics import (
    cohort_retention,
    funnel_counts,
    gapfill_hours,
)
from zio_analytics_spark.operators.sketch import heavy_hitters, partition_candidates


def _ts(day: int, hour: int = 0, minute: int = 0):
    return dt.datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )


class TestFunnel:
    def test_strict_ordering(self, spark):
        rows = [
            # u1 completes the funnel in order
            (1, "view", _ts(1, 9), 1.0),
            (1, "click", _ts(1, 10), 1.0),
            (1, "purchase", _ts(1, 11), 1.0),
            # u2 clicks BEFORE viewing -> click doesn't count; no purchase
            (2, "click", _ts(1, 8), 1.0),
            (2, "view", _ts(1, 9), 1.0),
            # u3 views only
            (3, "view", _ts(1, 9), 1.0),
            # u4 purchase without view/click -> counts nowhere
            (4, "purchase", _ts(1, 9), 1.0),
        ]
        out = funnel_counts(_events(spark, rows), ["view", "click", "purchase"]).collect()[0]
        assert (out["stage_view"], out["stage_click"], out["stage_purchase"]) == (3, 1, 1)

    def test_equal_timestamp_not_counted(self, spark):
        # strictly-after semantics: click at the exact view instant is ignored
        rows = [(1, "view", _ts(1, 9), 1.0), (1, "click", _ts(1, 9), 1.0)]
        out = funnel_counts(_events(spark, rows), ["view", "click"]).collect()[0]
        assert (out["stage_view"], out["stage_click"]) == (1, 0)

    def test_earliest_arrival_used(self, spark):
        # u1's SECOND view is after the click, but funnel uses the earliest
        # view, so the click still counts.
        rows = [
            (1, "view", _ts(1, 8), 1.0),
            (1, "click", _ts(1, 9), 1.0),
            (1, "view", _ts(1, 10), 1.0),
        ]
        out = funnel_counts(_events(spark, rows), ["view", "click"]).collect()[0]
        assert (out["stage_view"], out["stage_click"]) == (1, 1)


class TestCohortRetention:
    def test_day_cohorts(self, spark):
        rows = [
            (1, "view", _ts(1, 9), 1.0),   # cohort day 1
            (1, "view", _ts(3, 9), 1.0),   # active offset 2
            (2, "view", _ts(1, 12), 1.0),  # cohort day 1, offset 0 only
            (3, "view", _ts(2, 9), 1.0),   # cohort day 2
            (3, "view", _ts(2, 23), 1.0),  # same day -> still offset 0, once
        ]
        out = {
            (r["cohort_day"].day, r["day_offset"]): r["active_users"]
            for r in cohort_retention(_events(spark, rows), unit="day").collect()
        }
        assert out == {(1, 0): 2, (1, 2): 1, (2, 0): 1}

    def test_week_cohorts_monday_truncated(self, spark):
        # 2024-01-01 is a Monday; Jan 8 starts the next week.
        rows = [
            (1, "view", _ts(3, 9), 1.0),   # cohort week of Jan 1
            (1, "view", _ts(8, 9), 1.0),   # next week -> offset 1
        ]
        out = {
            (r["cohort_week"].day, r["week_offset"]): r["active_users"]
            for r in cohort_retention(_events(spark, rows), unit="week").collect()
        }
        assert out == {(1, 0): 1, (1, 1): 1}


class TestGapfill:
    def test_zero_filled_gaps(self, spark):
        rows = [
            (1, "view", _ts(1, 9, 30), 2.0),
            (1, "view", _ts(1, 12, 0), 3.0),  # hours 10, 11 missing
        ]
        out = {r["hour"].hour: (r["n_events"], r["sum_value"]) for r in
               gapfill_hours(_events(spark, rows)).collect()}
        assert out == {9: (1, 2.0), 10: (0, 0.0), 11: (0, 0.0), 12: (1, 3.0)}

    def test_single_hour_user(self, spark):
        rows = [(1, "view", _ts(1, 9), 1.0), (1, "view", _ts(1, 9, 59), 4.0)]
        out = gapfill_hours(_events(spark, rows)).collect()
        assert len(out) == 1 and out[0]["n_events"] == 2 and out[0]["sum_value"] == 5.0


class TestHeavyHitters:
    def test_exact_counts_and_threshold(self, spark):
        # 100 rows: 'a' x 50, 'b' x 30, singletons x 20
        vals = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(20)]
        df = spark.createDataFrame([(v,) for v in vals], "token string").repartition(4)
        out = {r["token"]: r["freq"] for r in heavy_hitters(df, "token", 0.25).collect()}
        assert out == {"a": 50, "b": 30}

    def test_candidates_are_superset(self, spark):
        vals = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(20)]
        df = spark.createDataFrame([(v,) for v in vals], "token string").repartition(4)
        cand = {r["token"] for r in partition_candidates(df, "token", 0.25).collect()}
        assert {"a", "b"} <= cand

    def test_matches_plain_groupby(self, spark, sf_dir):
        from zio_analytics_spark.sources.parquet import read_table

        docs = read_table(spark, sf_dir, "documents")
        toks = docs.select(
            F.explode(F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")).alias(
                "token"
            )
        )
        total = toks.count()
        expected = {
            (r["token"], r["freq"])
            for r in toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("freq"))
            .where(F.col("freq") >= 0.002 * total)
            .collect()
        }
        got = {(r["token"], r["freq"]) for r in heavy_hitters(toks, "token", 0.002).collect()}
        assert got == expected


class TestIVF:
    def test_recall_vs_brute_force(self, spark, sf_dir):
        from zio_analytics_spark.operators import similarity
        from zio_analytics_spark.sources.parquet import read_table

        emb = read_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
        qv = [
            float(x)
            for x in read_table(spark, sf_dir, "embeddings")
            .where(F.col("vec_id") == 0)
            .first()["embedding"]
        ]
        exact = [r["vec_id"] for r in similarity.brute_force_topk(emb, qv, k=10).collect()]
        approx = [r["vec_id"] for r in similarity.ivf_topk(emb, qv, k=10, n_cells=8, nprobe=3).collect()]
        recall = len(set(exact) & set(approx)) / 10
        assert recall >= 0.5, f"IVF recall {recall} too low vs brute force"
        assert len(approx) == 10


class TestChunking:
    def test_boundaries(self, spark, sf_dir):
        from zio_analytics_spark.catalog import CATALOG

        # crafted frame via a temp view shadowing isn't possible here; use
        # the operator logic directly on a tiny frame instead.
        docs = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(40))),  # 40 tokens -> starts 1,17,33
             (2, "only three tokens"),                   # 3 tokens  -> one chunk
             (3, "   ")],                                # no tokens -> no rows
            "doc_id long, text string",
        )
        toks = docs.selectExpr(
            "doc_id", "filter(split(trim(text), '\\\\s+'), x -> x != '') AS w"
        ).where(F.size("w") >= 1)
        exploded = toks.selectExpr(
            "doc_id", "w", "explode(sequence(1, size(w), 16)) AS start"
        )
        out = exploded.selectExpr(
            "doc_id", "start", "size(slice(w, start, 32)) AS n"
        ).collect()
        rows = {(r["doc_id"], r["start"]): r["n"] for r in out}
        assert rows == {(1, 1): 32, (1, 17): 24, (1, 33): 8, (2, 1): 3}
        assert CATALOG["text_chunking"] is not None

    def test_udtf_matches_jvm(self, spark, sf_dir):
        from zio_analytics_spark.catalog import CATALOG

        jvm = CATALOG["text_chunking"].fn(spark, sf_dir)
        udtf = CATALOG["udtf_chunk_text"].fn(spark, sf_dir)
        assert sorted(map(tuple, jvm.collect())) == sorted(map(tuple, udtf.collect()))


class TestNewAggregates:
    def test_argminmax_crafted(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 5.0), ("a", 2, 9.0), ("a", 3, 1.0), ("b", 4, 2.0)],
            "k string, id long, v double",
        )
        out = {
            r["k"]: (r["top"], r["bottom"])
            for r in df.groupBy("k")
            .agg(F.max_by("id", "v").alias("top"), F.min_by("id", "v").alias("bottom"))
            .collect()
        }
        assert out == {"a": (2, 3), "b": (4, 4)}

    def test_funnel_stage_monotonicity(self, spark, sf_dir):
        """Stage counts can never increase down the funnel (real data)."""
        from zio_analytics_spark.operators.analytics import funnel_counts
        from zio_analytics_spark.sources.parquet import read_table

        ev = read_table(spark, sf_dir, "events")
        row = funnel_counts(ev, ["view", "click", "purchase"]).collect()[0]
        assert row["stage_view"] >= row["stage_click"] >= row["stage_purchase"]


def test_psi_drift_detects_shift_and_identity(spark):
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.profiling import psi_drift

    base = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    same = psi_drift(base, base, "v", n_bins=10).first()["psi"]
    assert abs(same) < 1e-9  # identical distributions -> ~0
    shifted = spark.range(2000).select(((F.col("id") % 100) + 60.0).alias("v"))
    drift = psi_drift(base, shifted, "v", n_bins=10).first()["psi"]
    assert drift > 0.25  # a 60% shift is a 'shifted' verdict


def test_profile_table_nulls_and_distinct(spark):
    from zio_analytics_spark.operators.profiling import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "x long, s string"
    )
    out = {r["column"]: r for r in profile_table(df, ["x", "s"]).collect()}
    assert out["x"]["n_rows"] == 4 and out["x"]["n_nulls"] == 1
    assert out["x"]["n_distinct"] == 3 and out["x"]["min_str"] == "1"
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["max_str"] == "b"


def test_funnel_deadline_drops_late_conversions(spark):
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.analytics import funnel_counts

    rows = [
        (1, "a", "2024-01-01 00:00:00"),
        (1, "b", "2024-01-01 00:30:00"),   # within 1h -> converts
        (2, "a", "2024-01-01 00:00:00"),
        (2, "b", "2024-01-01 02:00:00"),   # too late under 1h deadline
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    unbounded = funnel_counts(df, ["a", "b"]).first()
    bounded = funnel_counts(df, ["a", "b"], max_gap=F.expr("INTERVAL 1 HOUR")).first()
    assert unbounded["stage_b"] == 2
    assert bounded["stage_b"] == 1 and bounded["stage_a"] == 2


def test_event_transitions_probabilities(spark):
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.analytics import event_transitions

    rows = [(1, i, t, f"2024-01-01 00:0{i}:00") for i, t in enumerate("abab")] + [
        (2, i, t, f"2024-01-01 00:0{i}:00") for i, t in enumerate("aac")
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in event_transitions(df, order_tiebreak="event_id").collect()}
    # user1: a->b, b->a, a->b ; user2: a->a, a->c
    assert got[("a", "b")][0] == 2 and got[("a", "a")][0] == 1 and got[("a", "c")][0] == 1
    assert abs(got[("a", "b")][1] - 0.5) < 1e-12   # 2 of 4 from-a transitions
    assert got[("b", "a")] == (1, 1.0)
