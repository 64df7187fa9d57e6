"""[EXT] Embedding similarity search (SURVEY.md §2.4 tail).

- ``cosine_similarity`` — a Column expression (zip_with + aggregate, double
  precision): the dot/norm math stays JVM-side in whole-stage codegen.
- ``brute_force_topk`` — exact top-k against a single query vector: broadcast
  the query, one scan, TakeOrderedAndProject. The baseline and the verifier.
- ``lsh_topk`` — random-hyperplane LSH: 2^p sign buckets; query probes its own
  bucket (plus Hamming-1 neighbors) so the scan touches ~1/2^p of the data.
  The scale path; approximate — recall is tested against brute force.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cosine_similarity", "brute_force_topk", "hyperplane_bucket", "lsh_topk"]


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, computed JVM-side."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sim_col: str = "sim",
    round_to: int | None = None,
) -> DataFrame:
    """Exact top-k rows by cosine similarity to ``query_vec``.

    The query vector is a literal array (broadcast to every task for free);
    ordering ties break on ``id_col`` so results are deterministic.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity(F.col(vec_col).cast("array<double>"), q)
    sim = F.round(sim, round_to) if round_to is not None else sim
    return (
        df.select(F.col(id_col), sim.alias(sim_col))
        .orderBy(F.col(sim_col).desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bucket id from random hyperplanes: bit i = (vec · plane_i) > 0."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(F.zip_with(vec, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def make_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's LSH bucket
    (plus buckets within Hamming ``probe_hamming`` of it), then exact cosine.

    At 100 TB the bucket column is precomputed/partitioned-by so a query
    reads only matching partitions; here it's computed inline.
    """
    dim = len(query_vec)
    planes = make_planes(dim, n_planes, seed)

    # Driver-side bucket of the query (tiny math, no Spark needed).
    qb = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, p)) > 0:
            qb |= 1 << i
    probes = [qb]
    if probe_hamming >= 1:
        probes += [qb ^ (1 << i) for i in range(n_planes)]

    v = df.withColumn("__bucket", hyperplane_bucket(F.col(vec_col).cast("array<double>"), planes))
    cand = v.where(F.col("__bucket").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)
