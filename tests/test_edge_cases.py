"""Edge cases: empty inputs, degenerate groups, k > n — operators must
degrade gracefully, not throw."""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_analytics_spark import DataStream, tumbling
from zio_analytics_spark.operators import dedup, similarity, text
from zio_analytics_spark.operators.topk import top_k, top_k_per_group


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string, lang string")


def test_fold_window_empty_input(spark):
    ds = (
        DataStream(spark.createDataFrame([], "ts timestamp, k string"))
        .assign_timestamps("ts")
        .group_by("k")
        .fold_window(tumbling("1 hour"), n=F.count("*"))
    )
    assert ds.collect() == []


def test_fold_empty_input(spark):
    out = (
        DataStream(spark.createDataFrame([], "k string, v double"))
        .group_by("k")
        .fold(s=F.sum("v"))
        .collect()
    )
    assert out == []


def test_dedup_operators_empty_input(spark):
    docs = _empty_docs(spark)
    assert dedup.exact_dedup(docs).collect() == []
    assert dedup.jaccard_pairs(docs, block_cols=["lang"]).collect() == []
    assert dedup.minhash_lsh_pairs(docs).collect() == []
    assert dedup.simhash_pairs(docs).collect() == []


def test_cluster_duplicates_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup.cluster_duplicates(pairs).collect() == []


def test_topk_k_exceeds_n(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    assert len(top_k(df, [F.col("v").desc()], 100).collect()) == 2
    assert len(top_k_per_group(df, ["id"], [F.col("v")], 100).collect()) == 2


def test_brute_force_topk_empty(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert similarity.brute_force_topk(df, [1.0, 0.0], k=5).collect() == []


def test_token_stats_single_token_and_empty_text(spark):
    df = spark.createDataFrame([(1, "word"), (2, "")], "doc_id long, text string")
    rows = {r.doc_id: r for r in text.token_stats(df).collect()}
    assert rows[1].n_tokens == 1 and rows[1].avg_token_len == 4.0
    assert rows[2].n_tokens == 0  # empty text → 0 tokens, null avg (no crash)


def test_group_by_single_group_whole_table(spark):
    """Degenerate grouping: one group holding everything (lit key)."""
    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    out = DataStream(df).group_by(g=F.lit(1)).fold(n=F.count("*"), s=F.sum("v")).collect()
    assert [(r.n, r.s) for r in out] == [(100, 4950)]


def test_asof_join_empty_right(spark):
    from zio_analytics_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 1, 10)], "eid long, k long, t long")
    right = spark.createDataFrame([], "k long, t long, px double")
    out = asof_join(left, right, "k", "k", "t", "t", ["px"]).collect()
    assert len(out) == 1 and out[0].px is None


def test_round4_operators_empty_inputs(spark):
    """Quantile-based operators must degrade gracefully on empty input
    instead of crashing on a None boundary."""
    import pytest
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.profiling import psi_drift
    from zio_analytics_spark.operators.robust import mad_outliers, winsorize
    from zio_analytics_spark.operators.sketch import equi_depth_bins

    empty = spark.range(0).select(F.col("id").cast("double").alias("v"))
    assert winsorize(empty, "v", out_col="c").count() == 0
    assert mad_outliers(empty, "v").count() == 0
    assert equi_depth_bins(empty, "v", n_bins=4).count() == 0
    with pytest.raises(ValueError):
        psi_drift(empty, empty, "v")
    # all-null column behaves like empty (percentile skips nulls)
    nulls = spark.range(5).select(F.lit(None).cast("double").alias("v"))
    assert winsorize(nulls, "v", out_col="c").count() == 5
    assert equi_depth_bins(nulls, "v", n_bins=4).count() == 0


def test_cms_one_sided_and_exact_on_sparse(spark):
    """CMS property tests: estimates never undercount; with width >>
    distinct values there are no collisions, so estimates are exact; and
    counters from two half-streams MERGE (add) to the full sketch."""
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.sketch import cms_build, cms_estimate

    rows = [(i, f"tok{i % 7}") for i in range(700)]
    df = spark.createDataFrame(rows, "i long, tok string")
    counters = cms_build(df, "tok", width=512, depth=3)
    items = df.select("tok").distinct()
    est = {r.tok: r.est for r in cms_estimate(counters, items, "tok", width=512, depth=3).collect()}
    assert est == {f"tok{i}": 100 for i in range(7)}  # sparse -> exact

    # mergeability: sketch(first half) + sketch(second half) == sketch(all)
    h1 = cms_build(df.where("i < 350"), "tok", width=512, depth=3)
    h2 = cms_build(df.where("i >= 350"), "tok", width=512, depth=3)
    merged = (
        h1.unionAll(h2).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    est2 = {r.tok: r.est for r in cms_estimate(merged, items, "tok", width=512, depth=3).collect()}
    assert est2 == est
