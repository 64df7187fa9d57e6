"""Point-free arrows + row proxy — the reference's user-facing expression
API (Expression.scala:19-49; DataStream.scala:59-84), over Catalyst Columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.datastream import DataStream
from zio_analytics_spark.functions.arrows import (
    Arrow,
    arrow,
    const,
    fst,
    id_,
    nth,
    snd,
    swap,
)
from zio_analytics_spark.windows import tumbling


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_compose_and_identity_laws(spark):
    """>>> is composition; id is its unit (Expression.scala:19-20,46-47)."""
    double = Arrow(lambda c: c * 2)
    inc = Arrow(lambda c: c + 1)
    x = F.lit(10)
    assert _one(spark, (double >> inc)(x)) == 21  # g after f
    assert _one(spark, (double << inc)(x)) == 22  # f after g
    assert _one(spark, (id_ >> double)(x)) == _one(spark, double(x)) == 20
    assert _one(spark, (double >> id_)(x)) == 20
    # associativity
    sq = Arrow(lambda c: c * c)
    assert _one(spark, ((double >> inc) >> sq)(x)) == _one(
        spark, (double >> (inc >> sq))(x)
    ) == 441


def test_fanout_split_swap_nth(spark):
    """&&& fans one input out to a tuple; *** maps a tuple per-side;
    FlipTuple and NthColumn behave like Expression.scala:34,40."""
    double = Arrow(lambda c: c * 2)
    inc = Arrow(lambda c: c + 1)
    x = F.lit(10)
    pair = (double & inc)(x)  # (20, 11)
    assert _one(spark, fst(pair)) == 20 and _one(spark, snd(pair)) == 11
    both = (double % inc)(pair)  # (40, 12)
    assert _one(spark, nth(1)(both)) == 40 and _one(spark, nth(2)(both)) == 12
    flipped = swap(pair)
    assert _one(spark, fst(flipped)) == 11 and _one(spark, snd(flipped)) == 20
    assert _one(spark, const(7)(x)) == 7
    # plain Column->Column functions lift implicitly on either side
    assert _one(spark, (arrow(F.sqrt) >> (lambda c: c + 0.5))(F.lit(16.0))) == 4.5


def test_row_proxy_emits_columns(spark):
    """Lambdas over the proxy ARE the reference's f(Expression.Id()) trick:
    run once at plan build, emit Columns, nested fields chain through."""
    df = spark.createDataFrame(
        [(1, 5.0, ("a", 2))], "id long, v double, pair struct<_1 string, _2 long>"
    )
    ds = DataStream(df)
    out = (
        ds.filter(lambda r: r.v > 1.0)
        .map(
            "id",
            doubled=lambda r: r.v * 2,
            tag=lambda r: r.pair._1,
            second=lambda r: r.pair._2 + 10,
        )
        .to_df()
        .first()
    )
    assert (out.id, out.doubled, out.tag, out.second) == (1, 10.0, "a", 12)


def test_row_lambda_must_return_column(spark):
    ds = DataStream(spark.range(1))
    with pytest.raises(TypeError, match="must return a Column"):
        ds.map(bad=lambda r: 42)


def test_wordcount_point_free_matches_reference_fixture(spark):
    """The WordCountSpec pipeline shape (WordCountSpec.scala:9-17) in
    point-free style: assign_timestamps(_._1) -> group_by(_._2) ->
    fold_window(tumbling 10ms). Expected output is the reference's own
    fixture (by inspection: quick@[10,20):2, brown@[30,40):1, brown@[40,50):1)."""
    rows = [(12, "quick"), (15, "quick"), (30, "brown"), (40, "brown")]
    ds = DataStream.from_literals(spark, rows, schema="ts_ms long, word string")
    got = {
        (r.word, r.start_ms, r.n)
        for r in (
            ds.assign_timestamps(lambda r: F.timestamp_millis(r.ts_ms))
            .group_by("word")
            .fold_window(tumbling("10 milliseconds"), n=F.count(F.lit(1)))
            .map("word", "n", start_ms=lambda r: F.unix_millis(r.window_start))
            .collect()
        )
    }
    assert got == {("quick", 10, 2), ("brown", 30, 1), ("brown", 40, 1)}
