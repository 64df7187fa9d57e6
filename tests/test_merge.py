from __future__ import annotations

from pyspark.sql import functions as F

from zio_analytics_spark.operators.merge import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame([(1, "old"), (2, "keep")], "id long, v string")
    source = spark.createDataFrame([(1, "new"), (3, "insert")], "id long, v string")
    out = {r.id: r.v for r in merge_upsert(target, source, ["id"]).collect()}
    assert out == {1: "new", 2: "keep", 3: "insert"}


def test_scd2_apply(spark):
    dim = spark.createDataFrame(
        [
            (1, "a_v1", "2024-01-01", "2024-02-01"),   # closed history
            (1, "a_v2", "2024-02-01", "9999-12-31"),   # open
            (2, "b_v1", "2024-01-01", "9999-12-31"),   # open, unchanged
        ],
        "id long, attr string, f string, t string",
    ).select(
        "id", "attr",
        F.col("f").cast("timestamp").alias("valid_from"),
        F.col("t").cast("timestamp").alias("valid_to"),
    )
    changes = spark.createDataFrame(
        [(1, "a_v3", "2024-03-15")], "id long, attr string, ts string"
    ).select("id", "attr", F.col("ts").cast("timestamp").alias("ts"))

    out = scd2_apply(dim, changes, ["id"], "ts")
    rows = sorted(
        (r.id, r.attr, str(r.valid_from)[:10], str(r.valid_to)[:10]) for r in out.collect()
    )
    assert rows == [
        (1, "a_v1", "2024-01-01", "2024-02-01"),   # untouched history
        (1, "a_v2", "2024-02-01", "2024-03-15"),   # closed at change ts
        (1, "a_v3", "2024-03-15", "9999-12-31"),   # new open version
        (2, "b_v1", "2024-01-01", "9999-12-31"),   # unchanged key stays open
    ]


def test_table_diff_null_position_distinguishing(spark):
    """Spark's hash skips null inputs — bare per-column structs would make
    (NULL,'x') and ('x',NULL) digest identically and misclassify the row as
    'same' (the dangerous direction for a migration check). The digest pairs
    every value with an isNull marker, so null POSITION changes the hash."""
    from zio_analytics_spark.operators.merge import table_diff

    left = spark.createDataFrame(
        [(1, None, "x"), (2, "q", "q"), (3, None, None)],
        "id long, a string, b string",
    )
    right = spark.createDataFrame(
        [(1, "x", None), (2, "q", "q"), (3, None, None)],
        "id long, a string, b string",
    )
    out = {r.id: r.diff for r in table_diff(left, right, ["id"]).collect()}
    assert out == {1: "changed", 2: "same", 3: "same"}


def test_cdc_apply_ordering_and_ops(spark):
    """Per-key sequence order decides: U then D deletes; D then U
    resurrects; I of a fresh key lands; untouched keys survive."""
    from zio_analytics_spark.operators.merge import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    log = spark.createDataFrame(
        [
            (1, "a2", 1, "U"), (1, "x", 2, "D"),          # update then delete
            (2, "ignored", 1, "D"), (2, "b2", 2, "U"),    # delete then update
            (9, "new", 1, "I"),
        ],
        "id long, v string, seq long, op string",
    )
    out = {r.id: r.v for r in cdc_apply(base, log, ["id"]).collect()}
    assert out == {2: "b2", 3: "c", 9: "new"}
