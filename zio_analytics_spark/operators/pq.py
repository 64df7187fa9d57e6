"""[EXT] Product Quantization (PQ) for vector compression + ADC search.

Jégou, Douze, Schmid 2011 ("Product Quantization for Nearest Neighbor
Search", IEEE TPAMI — public algorithm): split each d-dim vector into
``m`` subvectors, learn a small k-means codebook PER SUBSPACE, and store
each vector as ``m`` small codes (here m bytes — a 64-dim float vector
compresses 256 B → 4 B, 64×). Queries never decompress: Asymmetric
Distance Computation (ADC) precomputes, per subspace, the distance from
the query subvector to every codebook centroid (an m×k lookup table) and
scores a database vector as the SUM of m table lookups.

Scale shape:

- TRAINING is m independent Lloyd runs over subvector slices — same
  bounded-driver-state discipline as clustering.kmeans_assign (per
  iteration: one scan + a k×(d/m)-cell aggregate; only k·d doubles ever
  sit on the driver). Production trains on a sample (pass ``train_df``);
  the codebook is what matters, not seeing every row.
- ENCODING is one scan with the m argmin expressions inlined as Column
  HOFs (zip_with/aggregate — whole-stage codegen, no UDF), emitting the
  m-byte code array. This is the only full-corpus pass.
- ADC SEARCH broadcasts nothing and joins nothing: the m×k lookup table
  is inlined as literal arrays, so scoring is ``element_at`` sums inside
  codegen and the plan is scan → project → TakeOrdered(k).

Determinism contract (inherited from clustering.py so a DuckDB oracle can
replay every code): init = subvectors of the k smallest ids; argmin ties
to the lowest code; centroids rounded after every update; empty clusters
keep their previous centroid; fixed iteration count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pq_train", "pq_encode", "pq_adc_topk"]


def _argmin_expr(sub: Column, cents: list) -> Column:
    """Code = index of the nearest centroid (ties → lowest index), as an
    O(k)-node HOF expression tree (the k-means codegen lesson)."""
    dists = []
    for c in cents:
        lit_c = F.array(*[F.lit(x) for x in c])
        sq = F.zip_with(
            sub, lit_c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        )
        dists.append(F.aggregate(sq, F.lit(0.0), lambda a, b: a + b))
    arr = F.array(*dists)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
    dim: int | None = None,
    round_dp: int = 6,
) -> list:
    """Learn ``m`` per-subspace codebooks; returns a list of m lists of k
    centroids (each d/m floats) — bounded driver state (k·d doubles), the
    same materialization a broadcast would perform."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_d = dim // m
    init = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} training rows, got {len(init)}")
    codebooks = [
        [[float(x) for x in r[vec_col][j * sub_d : (j + 1) * sub_d]] for r in init]
        for j in range(m)
    ]
    # ONE scan per iteration for ALL subspaces: each row explodes into m
    # (subspace, code, subvector) structs and a single groupBy(j, code)
    # computes every codebook's update — iteration cost is one pass + an
    # (m·k)×(d/m)-cell aggregate regardless of m, not m passes.
    for _t in range(n_iter - 1):
        structs = []
        for j in range(m):
            sub = F.slice(F.col(vec_col), j * sub_d + 1, sub_d)
            structs.append(
                F.struct(
                    F.lit(j).alias("j"),
                    _argmin_expr(sub, codebooks[j]).alias("code"),
                    sub.alias("sub"),
                )
            )
        exploded = df.select(F.explode(F.array(*structs)).alias("s")).select(
            "s.j", "s.code", "s.sub"
        )
        rows = exploded.groupBy("j", "code").agg(
            *[
                F.round(F.avg(F.col("sub")[i].cast("double")), round_dp).alias(f"x{i}")
                for i in range(sub_d)
            ]
        ).collect()
        new = {
            (int(r["j"]), int(r["code"])): [r[f"x{i}"] for i in range(sub_d)]
            for r in rows
        }
        codebooks = [
            [new.get((j, c), codebooks[j][c]) for c in range(k)] for j in range(m)
        ]
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One scan → ``(id_col, codes array<int> length m)``: every vector
    replaced by its m nearest-centroid codes."""
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    codes = []
    for j, cents in enumerate(codebooks):
        sub = F.slice(F.col(vec_col), j * sub_d + 1, sub_d)
        codes.append(_argmin_expr(sub, cents))
    return df.select(id_col, F.array(*codes).alias("codes"))


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list,
    query: list,
    top_k: int = 10,
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """ADC search over PQ codes: per subspace, the query→centroid distances
    become one literal k-element array; a row's score is the sum of m
    ``element_at`` lookups — no decompression, no join, codegen all the
    way to TakeOrdered. Returns ``(id_col, adc_dist)`` for the ``top_k``
    nearest, distance rounded to ``round_dp`` (ordering key too, so ulp-
    level cross-engine summation drift cannot reorder the cut)."""
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    if len(query) != m * sub_d:
        raise ValueError(f"query dim {len(query)} != {m * sub_d}")
    dist = F.lit(0.0)
    for j, cents in enumerate(codebooks):
        qsub = [float(v) for v in query[j * sub_d : (j + 1) * sub_d]]
        lut = [
            sum((qv - cv) ** 2 for qv, cv in zip(qsub, cent)) for cent in cents
        ]
        lut_arr = F.array(*[F.lit(v) for v in lut])
        dist = dist + F.element_at(lut_arr, F.col("codes")[j] + 1)
    scored = encoded.select(
        id_col, F.round(dist, round_dp).alias("adc_dist")
    )
    return scored.orderBy("adc_dist", id_col).limit(top_k)
