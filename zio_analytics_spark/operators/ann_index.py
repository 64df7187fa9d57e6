"""[EXT] Precomputed, partition-pruned ANN layout (SURVEY.md §2.4 tail).

``lsh_topk`` / ``ivf_topk`` (operators/similarity.py) compute their bucket /
cell assignment inline per query — fine for one-off exploration, wrong at
scale: every query re-scans and re-hashes the whole table. This module is
the scale path those docstrings promise:

- ``build_lsh_index``  — compute the random-hyperplane sign bucket ONCE and
  write the table **partitioned by bucket** (``write.partitionBy``). At
  100 TB this is the one-time index build, amortized over every query.
- ``query_lsh_index``  — read the index with ``bucket IN (probes)``: the
  filter is a PARTITION filter, so the scan plans with partition pruning
  and touches only ``len(probes) / 2^n_planes`` of the files (plan-asserted
  in tests/test_scale.py). Exact cosine top-k inside the probed buckets.

The bucket function is deterministic in ``(dim, n_planes, seed)`` (Gaussian
planes from a fixed RandomState — similarity.make_planes), so builder and
querier agree on the geometry without storing plane metadata next to the
index; an engine with evolving defaults would serialize the planes into the
index directory instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zio_analytics_spark.operators.similarity import (
    brute_force_topk,
    hyperplane_bucket,
    make_planes,
)

__all__ = [
    "build_lsh_index",
    "query_lsh_index",
    "query_bucket",
    "probe_buckets",
    "build_ivf_index",
    "query_ivf_index",
]


def query_bucket(query_vec: list[float], planes: list[list[float]]) -> int:
    """Sign bucket of a query vector (driver-side: tiny math, no Spark)."""
    qb = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, p)) > 0:
            qb |= 1 << i
    return qb


def probe_buckets(qb: int, n_planes: int, probe_hamming: int = 1) -> list[int]:
    """The query's bucket plus all buckets within Hamming ``probe_hamming``."""
    probes = {qb}
    if probe_hamming >= 1:
        probes.update(qb ^ (1 << i) for i in range(n_planes))
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qb ^ (1 << i) ^ (1 << j))
    return sorted(probes)


def build_lsh_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 42,
) -> None:
    """One-time index build: bucket each vector, write partitioned by bucket.

    Partition count is ``2^n_planes`` — size it so each bucket's files are
    a healthy parquet size at your scale (64 buckets over 100 TB ≈ 1.5 TB
    per bucket directory, itself split into many files by the writer).
    """
    dim = len(df.select(vec_col).first()[0])
    planes = make_planes(dim, n_planes, seed)
    out = df.withColumn(
        "bucket", hyperplane_bucket(F.col(vec_col).cast("array<double>"), planes)
    )
    out.write.partitionBy("bucket").mode("overwrite").parquet(path)


def query_lsh_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Partition-pruned ANN query: scan ONLY the probed bucket directories.

    ``bucket`` is a partition column, so ``bucket IN (probes)`` becomes a
    PartitionFilter — directories outside the probe set are never listed
    into the scan (the 100 TB contract: a query touches
    ``len(probes)/2^n_planes`` of the data).
    """
    planes = make_planes(len(query_vec), n_planes, seed)
    probes = probe_buckets(query_bucket(query_vec, planes), n_planes, probe_hamming)
    idx = spark.read.parquet(path).where(F.col("bucket").isin(probes))
    return brute_force_topk(idx, query_vec, k, vec_col, id_col)


def _centroids_path(path: str) -> str:
    # Underscore prefix: Spark's file index skips _-prefixed entries (like
    # _SUCCESS), so the sidecar never pollutes reads of the data directory.
    import os

    return os.path.join(path, "_ivf_centroids.npy")


def build_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
) -> None:
    """One-time IVF build: train centroids, assign each row's cell ONCE,
    write the table partitioned by cell, persist the centroids as an
    ``_``-prefixed sidecar inside the index directory (ignored by parquet
    readers, exactly like ``_SUCCESS``)."""
    import numpy as np

    from zio_analytics_spark.operators.similarity import ivf_cell_udf, train_ivf_centroids

    Cn = train_ivf_centroids(df, vec_col, id_col, n_cells)
    cell_of = ivf_cell_udf(Cn)
    out = df.withColumn("cell", cell_of(F.col(vec_col)))
    out.write.partitionBy("cell").mode("overwrite").parquet(path)
    with open(_centroids_path(path), "wb") as f:
        np.save(f, Cn)


def query_ivf_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
) -> DataFrame:
    """Partition-pruned IVF query: load the centroid sidecar, pick the
    ``nprobe`` nearest cells driver-side, scan only those cell directories
    (``cell IN (probes)`` is a PartitionFilter), exact cosine inside."""
    import numpy as np

    from zio_analytics_spark.operators.similarity import ivf_probes

    with open(_centroids_path(path), "rb") as f:
        Cn = np.load(f)
    probes = ivf_probes(Cn, query_vec, nprobe)
    idx = spark.read.parquet(path).where(F.col("cell").isin(probes))
    return brute_force_topk(idx, query_vec, k, vec_col, id_col)
