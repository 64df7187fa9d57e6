"""Product quantization (operators/pq.py): codebook training determinism,
encode/ADC mechanics, and retrieval quality on planted structure."""

from __future__ import annotations

import random

import pytest

from zio_analytics_spark.operators.pq import pq_adc_topk, pq_encode, pq_train


def _planted(spark, n_clusters=4, per=12, d=8, spread=0.05, seed=7):
    """Well-separated clusters: ADC with a reasonable codebook must rank
    same-cluster vectors above other clusters."""
    rnd = random.Random(seed)
    centers = [[rnd.uniform(-10, 10) for _ in range(d)] for _ in range(n_clusters)]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(per):
            rows.append(
                (vid, [x + rnd.gauss(0, spread) for x in c], ci)
            )
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_pq_codes_shape_and_determinism(spark):
    df = _planted(spark)
    cbs = pq_train(df, m=2, k=4, n_iter=2, dim=8)
    assert len(cbs) == 2 and all(len(cb) == 4 for cb in cbs)
    assert all(len(c) == 4 for cb in cbs for c in cb)
    enc1 = {r.vec_id: list(r.codes) for r in pq_encode(df, cbs).collect()}
    enc2 = {r.vec_id: list(r.codes) for r in pq_encode(df, cbs).collect()}
    assert enc1 == enc2
    assert all(0 <= c < 4 for codes in enc1.values() for c in codes)


def test_pq_adc_retrieves_planted_cluster(spark):
    """Query = a cluster member; the ADC top-(per) set must be exactly its
    cluster (separation >> spread, so quantization cannot confuse them)."""
    per = 12
    df = _planted(spark, per=per)
    cbs = pq_train(df, m=2, k=4, n_iter=2, dim=8)
    enc = pq_encode(df, cbs)
    query = df.where("vec_id = 30").collect()[0]["embedding"]  # cluster 2
    got = [r.vec_id for r in pq_adc_topk(enc, cbs, query, top_k=per).collect()]
    assert set(got) == set(range(2 * per, 3 * per))


def test_pq_train_validates_inputs(spark):
    df = _planted(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=3, k=4, dim=8)
    with pytest.raises(ValueError, match="query dim"):
        cbs = pq_train(df, m=2, k=4, n_iter=1, dim=8)
        pq_adc_topk(pq_encode(df, cbs), cbs, [0.0] * 5)


def test_ivfpq_retrieves_planted_cluster(spark):
    """IVF-PQ with enough probes must behave like PQ on planted clusters:
    query's cluster fills the top-per set; and the scored rows must be
    restricted to the probed cells only."""
    from zio_analytics_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_search,
        ivfpq_train,
    )

    per = 12
    df = _planted(spark, n_clusters=4, per=per)
    coarse, cbs = ivfpq_train(df, n_cells=4, m=2, k=4, n_iter=2, dim=8)
    enc = ivfpq_encode(df, coarse, cbs)
    query = df.where("vec_id = 30").collect()[0]["embedding"]  # cluster 2
    got = [r.vec_id for r in ivfpq_search(enc, coarse, cbs, query, nprobe=4, top_k=per).collect()]
    assert set(got) == set(range(2 * per, 3 * per))
    # nprobe=1: every returned vector must live in the single probed cell
    one = ivfpq_search(enc, coarse, cbs, query, nprobe=1, top_k=50)
    cells = {
        r.cell
        for r in enc.join(one.select("vec_id"), "vec_id").select("cell").collect()
    }
    assert len(cells) == 1


def test_ivfpq_residual_codes_differ_from_raw_pq(spark):
    """Residual encoding is real: with well-separated clusters the coarse
    tier absorbs the cluster offset, so PQ codes of vectors from DIFFERENT
    cells overlap (they encode residual shapes, not absolute position)."""
    from zio_analytics_spark.operators.pq import ivfpq_encode, ivfpq_train

    df = _planted(spark, n_clusters=4, per=12)
    coarse, cbs = ivfpq_train(df, n_cells=4, m=2, k=4, n_iter=2, dim=8)
    enc = ivfpq_encode(df, coarse, cbs).collect()
    cells = {r.vec_id: r.cell for r in enc}
    # coarse tier separates the planted clusters
    assert len({cells[v] for v in range(12)}) == 1
    assert cells[0] != cells[24]
