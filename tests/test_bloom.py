"""Bloom-filter join pre-filtering (operators/bloom.py): the published
construction's two invariants — zero false negatives, bounded false-positive
rate — plus result-identity of the prefiltered join with the exact join."""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_analytics_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    bloom_prefilter_join,
)


def test_no_false_negatives(spark):
    dim = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    words = bloom_build(dim, "k")
    hits = dim.where(bloom_contains(words, F.col("k"))).count()
    assert hits == 500  # every inserted key MUST pass


def test_false_positive_rate_bounded(spark):
    dim = spark.range(0, 1000).select(F.col("id").alias("k"))
    words = bloom_build(dim, "k", m_bits=1 << 14)  # m/n=16.4, k=3 → p≈0.4%
    absent = spark.range(1000, 21000).select(F.col("id").alias("k"))
    fp = absent.where(bloom_contains(words, F.col("k"))).count()
    assert fp / 20000 < 0.05, fp


def test_word_array_is_dense_and_small(spark):
    dim = spark.range(0, 10).select(F.col("id").alias("k"))
    words = bloom_build(dim, "k", m_bits=1 << 10)
    assert len(words) == (1 << 10) // 64
    assert all(isinstance(w, int) for w in words)
    # k=3 hashes × 10 keys → at most 30 set bits
    assert sum(bin(w & ((1 << 64) - 1)).count("1") for w in words) <= 30


def test_prefilter_join_identical_to_exact_join(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("fk"), (F.col("id") * 2).alias("v")
    )
    dim = spark.range(0, 40).select((F.col("id") * 13).alias("dk"), F.lit("d").alias("tag"))
    got = (
        bloom_prefilter_join(fact, dim, "fk", "dk")
        .select("fk", "v", "tag")
        .collect()
    )
    want = (
        fact.join(dim, fact["fk"] == dim["dk"], "inner").select("fk", "v", "tag").collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_prefilter_drops_rows_before_join(spark):
    fact = spark.range(0, 5000).select((F.col("id") % 997).alias("fk"))
    dim = spark.range(0, 10).select((F.col("id") * 100).alias("dk"))
    words = bloom_build(dim, "dk")
    kept = fact.where(bloom_contains(words, F.col("fk"))).count()
    true_hits = fact.join(dim, fact["fk"] == dim["dk"], "left_semi").count()
    # filter passes all true rows and only a small FP surplus
    assert kept >= true_hits
    assert kept <= true_hits + int(0.05 * 5000)


def test_m_bits_must_be_word_multiple(spark):
    import pytest

    dim = spark.range(0, 10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(dim, "k", m_bits=100)
