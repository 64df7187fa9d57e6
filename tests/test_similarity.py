"""Similarity search: brute-force exactness + LSH recall against it."""

from __future__ import annotations

import math

from zio_analytics_spark.operators import similarity
from zio_analytics_spark.sources.parquet import read_table


def test_cosine_similarity_column(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    vals = [r.c for r in df.select(similarity.cosine_similarity(df.a, df.b).alias("c")).collect()]
    assert vals[0] == 1.0 and vals[1] == 0.0
    assert math.isclose(vals[2], 1 / math.sqrt(2), rel_tol=1e-12)


def test_brute_force_topk_exact(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.where(emb.vec_id == 0).first()["embedding"]]
    got = similarity.brute_force_topk(emb.where(emb.vec_id != 0), q, k=5).collect()
    # verify against a driver-side numpy computation
    import numpy as np

    rows = emb.where(emb.vec_id != 0).select("vec_id", "embedding").collect()
    qv = np.array(q)
    sims = sorted(
        (
            (
                -float(np.dot(v, qv) / (np.linalg.norm(v) * np.linalg.norm(qv))),
                r.vec_id,
            )
            for r in rows
            for v in [np.array([float(x) for x in r.embedding])]
        )
    )[:5]
    expect = [vid for _, vid in sims]
    assert [r.vec_id for r in got] == expect


def test_lsh_topk_recall_on_clustered_data(spark):
    """Bucketed ANN recovers truly-close neighbors. Hyperplane LSH only
    concentrates when neighbors ARE close (cos ≳ 0.8) — the driver corpus
    has max pairwise cosine ≈ 0.5, so recall is tested on planted clusters."""
    import numpy as np

    rng = np.random.RandomState(7)
    q = rng.randn(32)
    near = [(i, (q + 0.15 * rng.randn(32)).tolist()) for i in range(10)]          # cos ≈ 0.97
    far = [(100 + i, rng.randn(32).tolist()) for i in range(200)]                 # cos ≈ 0
    df = spark.createDataFrame(near + far, "vec_id long, embedding array<double>")
    exact = {r.vec_id for r in similarity.brute_force_topk(df, q.tolist(), k=10).collect()}
    assert exact == {i for i in range(10)}  # sanity: the planted cluster IS the top-10
    approx = {
        r.vec_id
        for r in similarity.lsh_topk(df, q.tolist(), k=10, n_planes=6, probe_hamming=1).collect()
    }
    assert len(approx & exact) >= 8  # ≥ 80% recall on genuinely-near neighbors


def test_lsh_scan_reduction(spark, sf_dir):
    """The point of LSH: the candidate set is a fraction of the table."""
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    total = emb.count()
    q = [float(x) for x in emb.where(emb.vec_id == 0).first()["embedding"]]
    planes = similarity.make_planes(len(q), 6, seed=42)
    v = emb.withColumn("b", similarity.hyperplane_bucket(F.col("embedding").cast("array<double>"), planes))
    qb = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(q, p)) > 0:
            qb |= 1 << i
    probes = [qb] + [qb ^ (1 << i) for i in range(6)]
    cand = v.where(F.col("b").isin(probes)).count()
    assert cand < total * 0.5


def test_ivf_partitioned_index_recall_and_pruning(spark, tmp_path):
    """The precomputed IVF layout: build once (cells partitioned, centroid
    sidecar), query prunes to nprobe cell dirs, recall holds on planted
    clusters — and the sidecar never pollutes reads of the index dir."""
    import re

    import numpy as np

    from zio_analytics_spark.operators import ann_index

    rng = np.random.RandomState(11)
    q = rng.randn(32)
    near = [(i, (q + 0.15 * rng.randn(32)).tolist()) for i in range(10)]
    far = [(100 + i, rng.randn(32).tolist()) for i in range(300)]
    df = spark.createDataFrame(near + far, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    ann_index.build_ivf_index(df, path, n_cells=8)

    # plain read of the index dir sees only data columns + cell partition
    assert set(spark.read.parquet(path).columns) == {"vec_id", "embedding", "cell"}

    out = ann_index.query_ivf_index(spark, path, q.tolist(), k=10, nprobe=2)
    got = {r.vec_id for r in out.collect()}
    exact = {r.vec_id for r in similarity.brute_force_topk(df, q.tolist(), k=10).collect()}
    assert len(got & exact) >= 8

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[cell#\d+ IN \(", plan), plan[:3000]


def test_quantize_int8_reconstruction_error_bounded(spark):
    """Dequantized vectors must sit within scale/2 of the original per
    dimension; a constant dimension codes to 0."""
    import numpy as np

    from zio_analytics_spark.operators.similarity import quantize_int8

    rows = [(i, [float(i), -1.0 + i * 0.25, 7.0]) for i in range(9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.codes for r in quantize_int8(df, dim=3).collect()}
    lo0, hi0 = 0.0, 8.0
    scale0 = (hi0 - lo0) / 255.0
    for i in range(9):
        codes = out[i]
        assert 0 <= codes[0] <= 255
        assert abs(lo0 + codes[0] * scale0 - float(i)) <= scale0 / 2 + 1e-9
        assert codes[2] == 0  # constant dim -> code 0 by convention
    # extremes hit the rails exactly
    assert out[0][0] == 0 and out[8][0] == 255


# ---------------------------------------------------------------------------
# random_project (Achlioptas JL)
# ---------------------------------------------------------------------------


def test_rp_signs_deterministic_and_pm1():
    from zio_analytics_spark.operators.similarity import rp_signs

    a = rp_signs(8, 4)
    assert a == rp_signs(8, 4)
    assert a != rp_signs(8, 4, seed="other")
    assert all(s in (-1, 1) for row in a for s in row)
    assert len(a) == 4 and all(len(r) == 8 for r in a)


def test_random_project_matches_numpy(spark):
    import numpy as np

    from zio_analytics_spark.operators.similarity import random_project, rp_signs

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(20, 32)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: np.array(r["proj"])
        for r in random_project(df, "embedding", dim=32, k=8).collect()
    }
    R = np.array(rp_signs(32, 8), dtype="float64")
    want = (vecs.astype("float64") @ R.T) / np.sqrt(8.0)
    for i in range(20):
        assert np.allclose(got[i], want[i], rtol=0, atol=1e-9), i


def test_random_project_preserves_norms_on_average(spark):
    import numpy as np

    from zio_analytics_spark.operators.similarity import random_project

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(200, 64)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = random_project(df, "embedding", dim=64, k=16).collect()
    ratios = [
        float(np.linalg.norm(r["proj"]) / np.linalg.norm(vecs[r["vec_id"]]))
        for r in rows
    ]
    # JL: squared-norm ratio concentrates around 1; at k=16 allow wide but
    # bounded spread, and the MEAN must be close to 1
    assert 0.9 < float(np.mean(np.square(ratios))) < 1.1
    assert all(0.3 < x < 2.0 for x in ratios)


def test_mmr_prefers_diversity_over_redundancy(spark):
    import numpy as np

    from zio_analytics_spark.operators.similarity import brute_force_topk, mmr_select

    # query axis e0; ids 1-4: near-duplicates of the query (cos ~0.999);
    # id 10: a distinct but still-relevant direction (cos ~0.80)
    rng = np.random.default_rng(3)
    rows = []
    for i in range(1, 5):
        v = np.array([1.0, 0.0, 0.0, 0.0]) + 0.02 * rng.standard_normal(4)
        rows.append((i, [float(x) for x in v]))
    rows.append((10, [0.8, 0.6, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.0, 0.0, 0.0]

    plain = [r["vec_id"] for r in brute_force_topk(df, q, k=3).collect()]
    assert 10 not in plain  # pure relevance drowns in duplicates

    mmr = mmr_select(df, q, k=3, pool=5, lam=0.5)
    picked = [r["vec_id"] for r in mmr.orderBy("step").collect()]
    assert picked[0] in (1, 2, 3, 4)  # step 1 = pure relevance
    assert 10 in picked[:2]  # redundancy penalty promotes the diverse doc
    # steps are distinct docs and mmr scores are finite
    assert len(set(picked)) == 3


def test_mmr_step1_is_relevance_argmax(spark):
    from zio_analytics_spark.operators.similarity import brute_force_topk, mmr_select

    rows = [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.5, 0.25]
    top1 = brute_force_topk(df, q, k=1).collect()[0]["vec_id"]
    first = mmr_select(df, q, k=4, pool=10).orderBy("step").collect()[0]
    assert first["vec_id"] == top1 and first["step"] == 1


def test_quantize_int8_backticked_names(spark):
    """Round-17 ADVICE fix: identifier metacharacters in column names must
    survive the selectExpr fast path (backticks are escaped)."""
    from pyspark.sql import functions as F

    from zio_analytics_spark.operators.similarity import quantize_int8

    rows = [(i, [float(i), 7.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").select(
        F.col("vec_id").alias("the`id"), F.col("embedding").alias("ve`c")
    )
    out = {
        r["the`id"]: r.codes
        for r in quantize_int8(df, vec_col="ve`c", id_col="the`id", dim=2).collect()
    }
    assert out[0][0] == 0 and out[4][0] == 255 and out[2][1] == 0
