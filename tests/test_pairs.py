"""Contrastive negatives (operators/pairs.py): ring-rotation replay,
no-self pairs, balanced negative load, determinism, seed sensitivity."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from zio_analytics_spark.operators.pairs import contrastive_negatives, ring_offsets


def _ids_df(spark, n):
    return spark.range(0, n).selectExpr("id AS doc_id")


def _python_replay(ids, k, seed):
    def h(i):
        return int(
            hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15].join(("0x", "")), 16
        )

    key = {
        i: int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15], 16) for i in ids
    }
    ring = sorted(ids, key=lambda i: (key[i], i))
    pos = {i: p for p, i in enumerate(ring)}
    n = len(ids)
    offs = ring_offsets(k, n, seed)
    return {
        (i, j): ring[(pos[i] + off) % n]
        for i in ids
        for j, off in enumerate(offs)
    }


def test_matches_python_ring_replay(spark):
    ids = list(range(37))
    got = {
        (r["anchor_id"], r["j"]): r["negative_id"]
        for r in contrastive_negatives(_ids_df(spark, 37), "doc_id", k=3).collect()
    }
    assert got == _python_replay(ids, 3, "neg")


def test_never_self_and_exactly_k_per_anchor(spark):
    rows = contrastive_negatives(_ids_df(spark, 50), "doc_id", k=4).collect()
    assert all(r["anchor_id"] != r["negative_id"] for r in rows)
    per_anchor = Counter(r["anchor_id"] for r in rows)
    assert set(per_anchor.values()) == {4}
    # bijection per rotation: every doc serves as a negative exactly k times
    per_negative = Counter(r["negative_id"] for r in rows)
    assert set(per_negative.values()) == {4}


def test_deterministic_and_seed_sensitive(spark):
    a = sorted(
        map(tuple, contrastive_negatives(_ids_df(spark, 30), "doc_id", k=2).collect())
    )
    b = sorted(
        map(tuple, contrastive_negatives(_ids_df(spark, 30), "doc_id", k=2).collect())
    )
    c = sorted(
        map(
            tuple,
            contrastive_negatives(
                _ids_df(spark, 30), "doc_id", k=2, seed="neg-epoch2"
            ).collect(),
        )
    )
    assert a == b
    assert a != c


def test_validation(spark):
    with pytest.raises(ValueError):
        contrastive_negatives(_ids_df(spark, 10), "doc_id", k=0)
    with pytest.raises(ValueError):
        ring_offsets(2, 1)
