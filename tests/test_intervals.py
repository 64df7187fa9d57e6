"""Interval overlap join (operators/intervals.py): open-interval semantics,
cell-ownership dedup exactness, block isolation, and randomized
equivalence with the brute-force theta join."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from zio_analytics_spark.operators.intervals import (
    interval_overlap_join,
    interval_overlap_pairs,
)


def _df(spark, rows, schema="k string, iid long, s long, e long"):
    return spark.createDataFrame(rows, schema)


def _brute_pairs(rows):
    out = {}
    for a in rows:
        for b in rows:
            if a[1] < b[1] and a[0] == b[0] and a[2] < b[3] and b[2] < a[3]:
                out[(a[0], a[1], b[1])] = min(a[3], b[3]) - max(a[2], b[2])
    return out


def test_open_interval_touching_endpoints_do_not_overlap(spark):
    rows = [("k", 1, 0, 10), ("k", 2, 10, 20), ("k", 3, 9, 12)]
    got = {
        (r["id_a"], r["id_b"]): r["overlap_len"]
        for r in interval_overlap_pairs(
            _df(spark, rows), "iid", "s", "e", ["k"], cell_width=4
        ).collect()
    }
    # 1-2 touch at 10 → NOT an overlap; 1-3 overlap [9,10); 2-3 overlap [10,12)
    assert got == {(1, 3): 1, (2, 3): 2}


def test_containment_and_multi_cell_spans(spark):
    # long interval spans many cells; contained interval must emit exactly once
    rows = [("k", 1, 0, 100), ("k", 2, 40, 45)]
    out = interval_overlap_pairs(
        _df(spark, rows), "iid", "s", "e", ["k"], cell_width=8
    ).collect()
    assert len(out) == 1
    assert (out[0]["id_a"], out[0]["id_b"], out[0]["overlap_len"]) == (1, 2, 5)


def test_blocks_isolate(spark):
    rows = [("a", 1, 0, 10), ("b", 2, 0, 10)]
    assert (
        interval_overlap_pairs(_df(spark, rows), "iid", "s", "e", ["k"]).count() == 0
    )


def test_randomized_equivalence_with_brute_force(spark):
    rng = random.Random(7)
    rows = []
    iid = 0
    for k in ("a", "b", "c"):
        for _ in range(60):
            s = rng.randrange(0, 500)
            rows.append((k, iid, s, s + rng.randrange(1, 40)))
            iid += 1
    for w in (4, 16, 64, 1000):  # incl. width >> span: everything in cell 0
        got = {
            (r["k"], r["id_a"], r["id_b"]): r["overlap_len"]
            for r in interval_overlap_pairs(
                _df(spark, rows), "iid", "s", "e", ["k"], cell_width=w
            ).collect()
        }
        assert got == _brute_pairs(rows), f"cell_width={w}"


def test_negative_coordinates(spark):
    # floor division (not int truncation) keeps cells correct below zero
    rows = [("k", 1, -10, -2), ("k", 2, -5, 3)]
    out = interval_overlap_pairs(
        _df(spark, rows), "iid", "s", "e", ["k"], cell_width=4
    ).collect()
    assert len(out) == 1 and out[0]["overlap_len"] == 3


def test_two_sided_join_matches_brute_force(spark):
    rng = random.Random(11)
    left = [("k", i, rng.randrange(0, 200), 0) for i in range(40)]
    left = [(k, i, s, s + rng.randrange(1, 25)) for (k, i, s, _) in left]
    right = [("k", 100 + i, rng.randrange(0, 200), 0) for i in range(40)]
    right = [(k, i, s, s + rng.randrange(1, 25)) for (k, i, s, _) in right]
    got = {
        (r["id_a"], r["id_b"]): r["overlap_len"]
        for r in interval_overlap_join(
            _df(spark, left),
            _df(spark, right),
            ("iid", "s", "e"),
            ("iid", "s", "e"),
            ["k"],
            cell_width=8,
        ).collect()
    }
    want = {
        (a[1], b[1]): min(a[3], b[3]) - max(a[2], b[2])
        for a in left
        for b in right
        if a[2] < b[3] and b[2] < a[3]
    }
    assert got == want


def test_cell_width_validation(spark):
    df = _df(spark, [("k", 1, 0, 1)])
    with pytest.raises(ValueError):
        interval_overlap_pairs(df, "iid", "s", "e", ["k"], cell_width=0)


def test_no_block_cols(spark):
    rows = [("x", 1, 0, 5), ("y", 2, 3, 8), ("z", 3, 100, 101)]
    got = {
        (r["id_a"], r["id_b"])
        for r in interval_overlap_pairs(
            _df(spark, rows), "iid", "s", "e", cell_width=4
        ).collect()
    }
    assert got == {(1, 2)}
