"""Per-operator unit tests on tiny literal frames (the reference's
``fromLiterals`` style — DataStream.scala:87-88)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark import DataStream
from zio_analytics_spark.functions import fan_out, length, list_sum, nth_column, split


def _ds(spark, rows, schema):
    return DataStream.from_literals(spark, rows, schema)


def test_map(spark):
    out = _ds(spark, [(1, 2), (3, 4)], "a long, b long").map("a", c=F.col("a") + F.col("b")).collect()
    assert [(r.a, r.c) for r in out] == [(1, 3), (3, 7)]


def test_map_concat(spark):
    out = (
        _ds(spark, [("a b", 1), ("c", 2)], "s string, k long")
        .map_concat(F.split("s", " "), "w", keep=["k"])
        .collect()
    )
    assert sorted((r.k, r.w) for r in out) == [(1, "a"), (1, "b"), (2, "c")]


def test_map_concat_empty_fanout(spark):
    """MapConcat emits 0 rows for an empty list (Local.scala:131-137)."""
    out = (
        _ds(spark, [(1,)], "k long")
        .map_concat(F.array().cast("array<string>"), "w", keep=["k"])
        .collect()
    )
    assert out == []


def test_filter(spark):
    out = _ds(spark, [(1,), (5,)], "a long").filter(F.col("a") > 2).collect()
    assert [r.a for r in out] == [5]


def test_group_by_fold_and_nested_regroup(spark):
    """Nested regroup = multi-column key (ComputeGrouping, DataStream.scala:7-38)."""
    ds = _ds(spark, [("x", "u", 1), ("x", "u", 2), ("x", "v", 3)], "k1 string, k2 string, v long")
    out = ds.group_by("k1").group_by("k2").fold(s=F.sum("v")).collect()
    assert sorted((r.k1, r.k2, r.s) for r in out) == [("x", "u", 3), ("x", "v", 3)]


def test_fold_requires_grouping(spark):
    with pytest.raises(ValueError, match="grouped"):
        _ds(spark, [(1,)], "a long").fold(n=F.count("*"))


def test_map_values_preserves_key(spark):
    ds = _ds(spark, [("a", 1), ("b", 2)], "k string, v long")
    out = ds.group_by("k").map_values(v2=F.col("v") * 10).collect()
    assert sorted((r.k, r.v2) for r in out) == [("a", 10), ("b", 20)]
    with pytest.raises(ValueError, match="grouped"):
        _ds(spark, [(1,)], "a long").map_values(x=F.col("a"))


def test_fold_group_apply_in_pandas(spark):
    """Whole-group contract (Group[K, Chunk[V]], Expression.scala:6) via
    an arbitrary Python reduction."""

    def spread(pdf):
        import pandas as pd

        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "spread": [pdf["v"].max() - pdf["v"].min()]})

    ds = _ds(spark, [("a", 1), ("a", 5), ("b", 7)], "k string, v long")
    out = ds.group_by("k").fold_group(spread, "k string, spread long").collect()
    assert sorted((r.k, r.spread) for r in out) == [("a", 4), ("b", 0)]


def test_set_ops(spark):
    a = _ds(spark, [(1,), (2,), (3,)], "x long")
    b = _ds(spark, [(2,), (3,), (4,)], "x long")
    assert sorted(r.x for r in a.intersect(b).collect()) == [2, 3]
    assert sorted(r.x for r in a.except_all(b).collect()) == [1]
    assert sorted(r.x for r in a.union(b).distinct().collect()) == [1, 2, 3, 4]


def test_join_broadcast_hint(spark):
    left = _ds(spark, [(1, "a"), (2, "b")], "id long, v string")
    right = _ds(spark, [(1, 10.0)], "id long, w double")
    out = left.join(right, "id", "left", broadcast_other=True).collect()
    got = {r.id: r.w for r in out}
    assert got == {1: 10.0, 2: None}


def test_scalar_function_parity(spark):
    """Reference §2.3 surface: split/length/list_sum/nth_column/fan_out."""
    ds = _ds(spark, [("1,2,3",)], "s string")
    out = (
        ds.map(
            parts=split("s", ","),
            pair=fan_out(F.lit(7).cast("long"), F.lit("z")),
        )
        .map(
            n=length("parts"),
            total=list_sum(F.transform("parts", lambda x: x.cast("long"))),
            first=nth_column("pair", 1),
        )
        .collect()[0]
    )
    assert (out.n, out.total, out.first) == (3, 6, 7)


def test_flip_tuple(spark):
    from zio_analytics_spark.functions import fan_out, flip_tuple, nth_column

    ds = _ds(spark, [(1, "x")], "a long, b string")
    out = (
        ds.map(pair=fan_out(F.col("a"), F.col("b")))
        .map(flipped=flip_tuple("pair"))
        .map(first=nth_column("flipped", 1), second=nth_column("flipped", 2))
        .collect()[0]
    )
    assert (out.first, out.second) == ("x", 1)


def test_rollup_cube_pivot_methods(spark):
    ds = _ds(
        spark,
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)],
        "k1 string, k2 string, v long",
    )
    roll = ds.rollup_fold("k1", "k2", s=F.sum("v")).collect()
    assert len(roll) == 6  # 3 leaf + 2 k1 subtotals + 1 grand total
    assert {r.s for r in roll if r.k1 is None and r.k2 is None} == {6}

    cube = ds.cube_fold("k1", "k2", s=F.sum("v")).collect()
    assert len(cube) == 8  # + the 2 k2-only rows rollup lacks

    piv = ds.group_by("k1").pivot_fold("k2", ["x", "y"], F.sum("v"), fill=0).collect()
    got = {r.k1: (r.x, r.y) for r in piv}
    assert got == {"a": (1, 2), "b": (3, 0)}


def test_as_of_join_method(spark):
    left = _ds(spark, [(1, 1, 10)], "eid long, k long, t long")
    right = _ds(spark, [(1, 5, 2.5)], "k long, rt long, px double")
    out = left.as_of_join(right, on="k", other_on="k", time="t", other_time="rt", values=["px"]).collect()
    assert out[0].px == 2.5
