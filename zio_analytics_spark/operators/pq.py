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

__all__ = [
    "pq_train",
    "pq_encode",
    "pq_adc_topk",
    "ivfpq_train",
    "ivfpq_encode",
    "ivfpq_search",
]


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


def _lloyd_full(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    n_iter: int,
    dim: int,
    round_dp: int = 6,
) -> list:
    """Full-dimension Lloyd returning the CENTROIDS (the coarse quantizer
    for IVF) under the same determinism contract as clustering.py."""
    init = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} rows, got {len(init)}")
    cents = [[float(x) for x in r[vec_col]] for r in init]
    for _t in range(n_iter - 1):
        assigned = df.select(
            F.col(vec_col).alias("__v"),
            _argmin_expr(F.col(vec_col), cents).alias("__c"),
        )
        rows = assigned.groupBy("__c").agg(
            *[
                F.round(F.avg(F.col("__v")[i].cast("double")), round_dp).alias(f"x{i}")
                for i in range(dim)
            ]
        ).collect()
        new = {int(r["__c"]): [r[f"x{i}"] for i in range(dim)] for r in rows}
        cents = [new.get(c, cents[c]) for c in range(k)]
    return cents


def ivfpq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
    dim: int | None = None,
) -> tuple[list, list]:
    """Train the two quantizer tiers: the coarse (IVF) centroids on full
    vectors, then PQ codebooks on the RESIDUALS x − centroid[cell] —
    residual codebooks are shared across cells, which is what keeps m·k
    centroids accurate over the whole space (the FAISS IVFPQ recipe).
    Returns ``(coarse, codebooks)``; both are bounded driver state."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    coarse = _lloyd_full(df, vec_col, id_col, n_cells, n_iter, dim)
    assigned = df.select(
        id_col, vec_col, _argmin_expr(F.col(vec_col), coarse).alias("cell")
    )
    res_df = assigned.select(
        id_col, _residual_expr(vec_col, coarse).alias(vec_col)
    )
    codebooks = pq_train(
        res_df, vec_col=vec_col, id_col=id_col, m=m, k=k, n_iter=n_iter, dim=dim
    )
    return coarse, codebooks


def _residual_expr(vec_col: str, cents: list) -> Column:
    """x − coarse_centroid[cell] as one Column expression: the per-cell
    centroid arrays inline as an array-of-arrays literal indexed by the
    cell assignment (no join, no UDF)."""
    table = F.array(*[F.array(*[F.lit(v) for v in c]) for c in cents])
    chosen = F.element_at(table, F.col("cell") + 1)
    return F.zip_with(
        F.col(vec_col), chosen, lambda x, y: x.cast("double") - y
    )


def ivfpq_encode(
    df: DataFrame,
    coarse: list,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ encoding (the FAISS IVFPQ layout's algebra): assign each
    vector to its nearest coarse centroid (inverted-list cell), then PQ-
    encode the RESIDUAL x − centroid[cell] — residuals are what make a
    shared codebook accurate across cells. One scan, all codegen. Returns
    ``(id_col, cell, codes)``; on disk this is exactly what
    ann_index-style ``partitionBy(cell)`` layouts store, so search scans
    prune to probed cells (PartitionFilters — proven in
    similarity_ann_partitioned) and read m bytes per vector."""
    assigned = df.select(
        id_col, vec_col, _argmin_expr(F.col(vec_col), coarse).alias("cell")
    )
    sub_d = len(codebooks[0][0])
    res = _residual_expr(vec_col, coarse)
    with_res = assigned.withColumn("__res", res)
    codes = [
        _argmin_expr(F.slice(F.col("__res"), j * sub_d + 1, sub_d), cents)
        for j, cents in enumerate(codebooks)
    ]
    return with_res.select(id_col, "cell", F.array(*codes).alias("codes"))


def ivfpq_search(
    encoded: DataFrame,
    coarse: list,
    codebooks: list,
    query: list,
    nprobe: int = 2,
    top_k: int = 10,
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Probed ADC search: rank coarse cells by query→centroid distance,
    keep the ``nprobe`` nearest (ties to the lower cell id), and score
    ONLY vectors in those cells with per-cell lookup tables built from
    the query's residual against that cell. Everything driver-side is
    k_c·d + nprobe·m·k doubles; the cell filter is a literal IN list, so
    a partitioned layout prunes the scan before it reads a byte of the
    other cells."""
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    qd = [
        sum((float(qv) - cv) ** 2 for qv, cv in zip(query, cent))
        for cent in coarse
    ]
    probed = sorted(range(len(coarse)), key=lambda c: (qd[c], c))[:nprobe]
    # per probed cell: LUTs from the query residual w.r.t. that cell
    per_cell_dist = []
    for cell in probed:
        qres = [float(q) - c for q, c in zip(query, coarse[cell])]
        dist = F.lit(0.0)
        for j, cents in enumerate(codebooks):
            qsub = qres[j * sub_d : (j + 1) * sub_d]
            lut = [sum((qv - cv) ** 2 for qv, cv in zip(qsub, cent)) for cent in cents]
            dist = dist + F.element_at(
                F.array(*[F.lit(v) for v in lut]), F.col("codes")[j] + 1
            )
        per_cell_dist.append((cell, dist))
    dist_expr = F.lit(None).cast("double")
    for cell, dist in per_cell_dist:
        dist_expr = F.when(F.col("cell") == cell, dist).otherwise(dist_expr)
    scored = (
        encoded.where(F.col("cell").isin([c for c, _ in per_cell_dist]))
        .select(id_col, F.round(dist_expr, round_dp).alias("adc_dist"))
    )
    return scored.orderBy("adc_dist", id_col).limit(top_k)
