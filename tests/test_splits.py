"""Deterministic content-hash dataset splitting (operators/splits.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators.splits import hash_split


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, f"document number {i} with some content") for i in range(n)],
        "doc_id long, text string",
    )


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = _docs(spark)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in hash_split(df, w, on="text").collect()}
    b = {r.doc_id: r.split for r in hash_split(df.repartition(13), w, on="text").collect()}
    assert a == b  # membership is content-addressed, not partition-addressed
    # roughly proportional (binomial tolerance at n=400)
    from collections import Counter

    c = Counter(a.values())
    assert 0.7 * 400 <= c["train"] <= 0.9 * 400
    assert c["val"] > 0 and c["test"] > 0


def test_hash_split_stable_under_growth(spark):
    """Adding documents must never move an existing document's split."""
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = {r.doc_id: r.split for r in hash_split(_docs(spark, 100), w, on="text").collect()}
    big = {r.doc_id: r.split for r in hash_split(_docs(spark, 400), w, on="text").collect()}
    assert all(big[d] == s for d, s in small.items())


def test_hash_split_salt_namespaces(spark):
    w = {"a": 0.5, "b": 0.5}
    s1 = {r.doc_id: r.split for r in hash_split(_docs(spark), w, on="text", salt="x").collect()}
    s2 = {r.doc_id: r.split for r in hash_split(_docs(spark), w, on="text", salt="y").collect()}
    assert s1 != s2  # independent draws
    # exact dups land in the same split regardless (content-addressed)
    dup = spark.createDataFrame([(1, "same"), (2, "same")], "doc_id long, text string")
    out = {r.doc_id: r.split for r in hash_split(dup, w, on="text").collect()}
    assert out[1] == out[2]


def test_hash_split_rejects_bad_weights(spark):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(_docs(spark), {"a": 0.5, "b": 0.2}, on="text")


def test_weighted_sample_prefers_heavy_rows(spark):
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.topk import weighted_sample_per_group

    # 500 light rows (w=1) + 100 heavy rows (w=50): a 100-row weighted
    # sample should be dominated by heavy rows (each heavy row has ~50x a
    # light row's inclusion odds); zero-weight rows must never appear
    rows = [(i, "g", 1.0) for i in range(500)] + \
           [(1000 + i, "g", 50.0) for i in range(100)] + \
           [(2000 + i, "g", 0.0) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    out = weighted_sample_per_group(
        df, group_by=["grp"], weight=F.col("w"), id_cols=["id"], k=100
    ).collect()
    assert len(out) == 100
    ids = {r["id"] for r in out}
    heavy = sum(1 for i in ids if 1000 <= i < 2000)
    assert heavy >= 70          # expectation ~91 of 100; 70 is a safe floor
    assert all(i < 2000 for i in ids)  # zero-weight excluded
    # deterministic: second run identical
    again = {r["id"] for r in weighted_sample_per_group(
        df, group_by=["grp"], weight=F.col("w"), id_cols=["id"], k=100
    ).collect()}
    assert again == ids


def test_stratified_exact_split_quotas_per_stratum(spark):
    """Every stratum must hit its fractions EXACTLY (floor boundaries),
    including strata too small for hash_split to cover reliably."""
    import collections

    from zio_analytics_spark.operators.splits import stratified_exact_split

    rows = []
    i = 0
    for lang, n in [("en", 200), ("de", 37), ("sw", 5)]:
        for _ in range(n):
            rows.append((i, lang, f"text number {i} for {lang}"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = stratified_exact_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, on="text", strata=["lang"]
    ).collect()
    counts = collections.Counter((r.lang, r.split) for r in out)
    for lang, n in [("en", 200), ("de", 37), ("sw", 5)]:
        tr = int(0.8 * n)  # floor boundaries
        va = int(0.9 * n) - tr
        te = n - tr - va
        assert counts[(lang, "train")] == tr, (lang, dict(counts))
        assert counts[(lang, "val")] == va
        assert counts[(lang, "test")] == te
    # the 5-doc stratum is guaranteed val/test presence (floor(0.9*5)=4 -> 1 test)
    assert counts[("sw", "test")] >= 1
    # deterministic: identical assignment on re-run
    again = stratified_exact_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, on="text", strata=["lang"]
    ).collect()
    assert {(r.doc_id, r.split) for r in out} == {(r.doc_id, r.split) for r in again}


def test_stratified_exact_split_tiebreak_restores_determinism(spark):
    """Round-7 advice fix: duplicate `on` values share a sort key, so the
    documented contract requires a `tiebreak` column; with it, assignment is
    a pure function of (key, tiebreak) — stable across repartitionings."""
    from zio_analytics_spark.operators.splits import stratified_exact_split

    # every text duplicated: without tiebreak the ranks of the twin rows
    # are an arbitrary coin flip; with tiebreak=doc_id they are total-ordered
    rows = [(i, "en", f"dup text {i % 10}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = {"train": 0.5, "val": 0.5}
    base = {
        (r.doc_id, r.split)
        for r in stratified_exact_split(
            df, w, on="text", strata=["lang"], tiebreak="doc_id"
        ).collect()
    }
    for n_parts in (1, 7):
        again = {
            (r.doc_id, r.split)
            for r in stratified_exact_split(
                df.repartition(n_parts), w, on="text", strata=["lang"],
                tiebreak="doc_id",
            ).collect()
        }
        assert again == base, n_parts


def test_stratified_exact_split_validates(spark):
    import pytest as _pytest

    from zio_analytics_spark.operators.splits import stratified_exact_split

    df = spark.createDataFrame([(1, "en", "t")], "doc_id long, lang string, text string")
    with _pytest.raises(ValueError, match="sum to 1"):
        stratified_exact_split(df, {"a": 0.5}, on="text", strata=["lang"])
    with _pytest.raises(ValueError, match="stratum column"):
        stratified_exact_split(df, {"a": 1.0}, on="text", strata=[])


# --- oversample_balance (round-7 batch 3) ---------------------------------


def test_oversample_exactly_uniform_and_deterministic(spark):
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.splits import oversample_balance

    rows = [(i, "maj") for i in range(50)] + [(100 + i, "mid") for i in range(20)] + [
        (200 + i, "min") for i in range(7)
    ]
    df = spark.createDataFrame(rows, "id long, label string")
    out = oversample_balance(df, "label", on="id")
    counts = {r["label"]: r["c"] for r in out.groupBy("label").agg(F.count("*").alias("c")).collect()}
    assert counts == {"maj": 50, "mid": 50, "min": 50}
    # copy 1 present for every original row; copies contiguous from 1
    firsts = out.where(F.col("copy_id") == 1).count()
    assert firsts == 77
    per_row = {
        (r["id"]): r["m"]
        for r in out.groupBy("id").agg(F.max("copy_id").alias("m")).collect()
    }
    assert all(v >= 1 for v in per_row.values())
    # deterministic: same input → identical multiset of (id, copy_id)
    again = oversample_balance(df, "label", on="id")
    a = sorted((r["id"], r["copy_id"]) for r in out.collect())
    b = sorted((r["id"], r["copy_id"]) for r in again.collect())
    assert a == b


def test_oversample_majority_class_untouched(spark):
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.splits import oversample_balance

    rows = [(i, "a") for i in range(10)] + [(50 + i, "b") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, label string")
    out = oversample_balance(df, "label", on="id")
    # already balanced: every row exactly once
    assert out.count() == 20
    assert out.agg(F.max("copy_id").alias("m")).collect()[0]["m"] == 1
