"""Scale machinery: salting equivalence, bucketed co-located joins, and
plan-shape assertions (pushdown/pruning/broadcast) — the 100 TB contract,
checked at test size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators.skew import salted_join, two_phase_agg


def _skewed(spark):
    # one hot key (90%) + long tail
    hot = [(1, float(i % 7)) for i in range(900)]
    tail = [(1 + (i % 50) + 1, float(i)) for i in range(100)]
    return spark.createDataFrame(hot + tail, "k long, v double")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 60)], "k long, name string")
    plain = big.join(small, ["k"]).groupBy("k", "name").agg(F.round(F.sum("v"), 4).alias("s"))
    salted = (
        salted_join(big, small, ["k"], n_salts=4)
        .groupBy("k", "name")
        .agg(F.round(F.sum("v"), 4).alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.n, r.total)
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.round(F.sum("v"), 4).alias("total")).collect()
    }
    two = {
        (r.k): (r.n, r.total)
        for r in two_phase_agg(
            df,
            ["k"],
            partial={"s": F.sum("v"), "c": F.count("*")},
            merge={"total": F.round(F.sum("s"), 4), "n": F.sum("c")},
        ).collect()
    }
    assert plain == two


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketed tables co-locate equi-join keys at write time: the join plan
    must contain NO shuffle (Exchange) — this is how repeated 100 TB joins
    amortize their shuffle."""
    a = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 10000).withColumn("w", F.col("id") % 7)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a.write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("bt_a")
        b.write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("bt_b")
        joined = spark.table("bt_a").join(spark.table("bt_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    """Filters and projections must reach the parquet scan."""
    from zio_analytics_spark.sources.parquet import read_table

    li = read_table(spark, sf_dir, "lineitem")
    q = li.where(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]" in plan
    # pruned read schema: only the two referenced columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_broadcast_hint_produces_broadcast_join(spark, sf_dir):
    from zio_analytics_spark.datastream import DataStream
    from zio_analytics_spark.sources.parquet import read_table

    li = DataStream(read_table(spark, sf_dir, "lineitem"))
    part = DataStream(read_table(spark, sf_dir, "part"))
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"), broadcast_other=True)
    plan = joined.to_df()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_aqe_enabled_and_adaptive_plan(spark, sf_dir):
    """AQE must be active: runtime partition coalescing + skew handling are
    the session's primary scale levers (session.py DEFAULT_CONFIG)."""
    from zio_analytics_spark.sources.parquet import read_table

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in plan
