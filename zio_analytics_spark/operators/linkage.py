"""[EXT] Record linkage: edit-distance fuzzy join at scale.

The naive fuzzy join is a cross join with ``levenshtein() <= d`` — O(N²)
string comparisons, never viable. The scale-correct form is SymSpell-style
DELETION-NEIGHBORHOOD blocking (Garbe's symmetric delete): for distance
d = 1, two strings are within one edit iff their {original ∪ one-char-
deletes} sets intersect — substitutions meet at the shared delete,
insert/delete meets the other side's original. Candidate generation is
therefore an EQUI-join on generated variants:

- neighborhood size is linear in string length (L+1 variants per row);
- the join key is ``xxhash64(variant)`` so the shuffle carries 8 bytes per
  variant, not the string (hash collisions can only ADD candidates, and
  the levenshtein verify removes them — completeness is one-sided safe);
- the final ``levenshtein`` runs only on candidate pairs (it also kills
  the distance-2 false positives where two DIFFERENT deletions collide,
  e.g. 'ab' vs 'ba').

Both Spark and DuckDB ship the same classic Levenshtein, so the whole
pipeline — neighborhood, blocking, verification — is oracle-replayable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fuzzy_pairs_symspell",
    "sorted_neighborhood_pairs",
    "str_rank_key",
    "fellegi_sunter_em",
    "fellegi_sunter_score",
]


def fuzzy_pairs_symspell(
    df: DataFrame,
    str_col: str,
    id_col: str,
    max_edit: int = 1,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_edit`` (currently 1 —
    the d ≥ 2 extension recurses the delete neighborhood, same contract).

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``.

    ``max_edit`` up to 2: depth-d neighborhoods recurse the delete step
    (d1 ∪ deletes-of-d1), O(L^d) variants per row — linear for d=1,
    quadratic for d=2; the completeness argument is per-edit: every
    substitution consumes one delete on EACH side, every insert/delete
    one delete on ONE side, so ≤ d deletes per side always meet.
    """
    if max_edit not in (1, 2):
        raise NotImplementedError(
            "symmetric-delete blocking implemented for max_edit in {1, 2}"
        )

    def dels(v):  # one-char deletes of a string Column / lambda variable
        n = F.length(v)
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(v.substr(F.lit(1), i - 1), v.substr(i + 1, n)),
        )

    s = F.col(str_col)
    d1 = dels(s)
    variants = F.array_union(F.array(s), d1)
    if max_edit == 2:
        variants = F.array_union(
            variants, F.array_distinct(F.flatten(F.transform(d1, dels)))
        )
    v = df.select(
        F.col(id_col).alias("__id"),
        F.explode(variants).alias("__var"),
    ).select("__id", F.xxhash64("__var").alias("__vh"))
    cand = (
        v.alias("a")
        .join(v.alias("b"), ["__vh"])
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    left = df.select(F.col(id_col).alias("id_a"), s.alias("__sa"))
    right = df.select(F.col(id_col).alias("id_b"), s.alias("__sb"))
    dist = F.levenshtein("__sa", "__sb")
    return (
        cand.join(left, "id_a")
        .join(right, "id_b")
        .where(dist <= max_edit)
        .select("id_a", "id_b", dist.cast("int").alias("dist"))
    )


def str_rank_key(col, nbytes: int = 8):
    """Order-preserving numeric key for a (printable-ASCII) string column:
    the big-endian value of its first ``nbytes`` bytes (short strings pad
    with 0 = lower than any character). Comparing keys equals comparing
    the strings' first ``nbytes`` chars, which is exactly what
    :func:`sorted_neighborhood_pairs` needs for its bucket boundaries —
    the FULL string then tie-breaks inside buckets, so the composite
    (key, string) order is the true lexicographic order for printable
    ASCII. Non-ASCII characters are CLAMPED (``ascii()`` returns the full
    code point, up to 0x10FFFF, which would both misorder digits and
    overflow int64 at nbytes=8): every position clamps to 255, and the
    leading position to 127, so the key always fits a signed long
    (max = 127·256⁷ + Σ 255·256^i = 2⁶³−1 exactly). All code points above
    the clamp tie at that position and fall through to later characters /
    the caller's tie-break — ASCII-vs-non-ASCII order is preserved, order
    AMONG clamped characters is not, so non-ASCII-heavy data loses some
    blocking recall (never correctness: the neighborhood window still
    bounds candidates)."""
    if not 1 <= nbytes <= 8:
        raise ValueError("nbytes must be 1..8 (fits a signed long)")
    c = F.col(col) if isinstance(col, str) else col
    key = F.lit(0).cast("long")
    for i in range(nbytes):
        ch = F.least(
            F.ascii(F.substring(c, i + 1, 1)), F.lit(127 if i == 0 else 255)
        )
        key = key * 256 + F.coalesce(ch, F.lit(0)).cast("long")
    return key


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_num,
    id_col: str,
    window: int = 3,
    tiebreak=(),
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995, SIGMOD —
    the OTHER classic record-linkage blocking family, complementary to
    SymSpell's deletion neighborhoods): sort the corpus by a linkage key
    and emit every pair within ``window`` rank positions. O(N·w)
    candidates instead of O(N²) — records with similar keys land adjacent
    regardless of their absolute values, which catches the near-misses a
    fixed-grid block boundary splits.

    Distributed shape: the global rank comes from
    :func:`~zio_analytics_spark.operators.layout.assign_contiguous_ids`
    (quantile buckets + in-bucket windows — no single-task sort), then
    candidates are an EQUI-join on ``rank + d`` for the ``window`` literal
    offsets (explode of ids+keys only). Never a cartesian; the window
    bounds candidates exactly.

    Returns ``(a_id, b_id, gap, a_key, b_key)`` with ``gap = rank(b) −
    rank(a) ∈ [1, window]`` and the order-key values carried for
    downstream scoring. ``(order_num, *tiebreak, id_col)`` should be a
    total order (the id is always appended as the final tiebreak)."""
    from zio_analytics_spark.operators.layout import assign_contiguous_ids

    if window < 1:
        raise ValueError("window must be >= 1")
    c = F.col(order_num) if isinstance(order_num, str) else order_num
    tb = list(tiebreak) + [id_col]
    ranked = assign_contiguous_ids(
        df.select(F.col(id_col), c.alias("__key"), *tiebreak),
        "__key",
        tiebreak=tb,
    )
    offsets = F.array(*[F.lit(d) for d in range(1, window + 1)])
    left = ranked.select(
        F.col(id_col).alias("a_id"),
        F.col("__key").alias("a_key"),
        F.col("seq_id").alias("__aseq"),
        F.explode(offsets).alias("__d"),
    ).select(
        "a_id",
        "a_key",
        "__aseq",
        (F.col("__aseq") + F.col("__d")).alias("__bseq"),
    )
    right = ranked.select(
        F.col(id_col).alias("b_id"),
        F.col("__key").alias("b_key"),
        F.col("seq_id").alias("__bseq"),
    )
    return left.join(right, "__bseq").select(
        "a_id",
        "b_id",
        (F.col("__bseq") - F.col("__aseq")).cast("int").alias("gap"),
        "a_key",
        "b_key",
    )


def fellegi_sunter_em(
    pairs: DataFrame,
    gamma_cols: Sequence[str],
    n_iters: int = 3,
    init_p: float = 0.1,
    init_m: float = 0.8,
    init_u: float = 0.2,
) -> DataFrame:
    """Fellegi-Sunter record-linkage parameter estimation (Fellegi &
    Sunter 1969, JASA — the classic probabilistic-linkage model; public
    algorithm): given candidate pairs with BINARY agreement indicators
    ``γ_j`` (same nation? balance within tolerance? …), estimate by EM
    the match proportion ``p`` and the per-field conditional agreement
    rates ``m_j = P(γ_j=1 | match)`` and ``u_j = P(γ_j=1 | non-match)``
    under the model's conditional-independence assumption.

    Deterministic by the same contract as classify.logreg_train: FIXED
    iteration count, literal initial values, and every parameter ROUNDED
    to 6 dp at the end of each M-step — so the parameter vector is an
    exact short decimal both engines agree on, and a SQL oracle replays
    every round (per-pair responsibilities are re-derived from the same
    literals). Scale shape: the E-step is a pure Column expression over
    the pair table (params enter as literals — no join, no UDF); the
    M-step is ONE map-side-combinable aggregate producing 2K+1 doubles;
    driver state per round = the parameter vector. Pair-table size is
    bounded by the upstream BLOCKING stage (sorted-neighborhood /
    SymSpell / LSH), never O(N²).

    Returns one row per (iteration, parameter): ``(iter, param, j, value)``
    with ``param ∈ {'p','m','u'}`` and ``j = 0`` for ``p``, 1-based field
    index otherwise.
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if not gamma_cols:
        raise ValueError("need at least one gamma column")
    for name, val in (("init_p", init_p), ("init_m", init_m), ("init_u", init_u)):
        # init_p=0 or 1 makes every responsibility exactly 0/1 and the
        # M-step divides by sg (or n-sg) — fail fast with the same strict
        # open-(0,1) contract fellegi_sunter_score enforces, instead of a
        # ZeroDivisionError after a full Spark aggregate.
        if not 0.0 < float(val) < 1.0:
            raise ValueError(f"{name} must be strictly inside (0, 1), got {val}")
    spark = pairs.sparkSession
    K = len(gamma_cols)
    g = [F.col(c).cast("double") for c in gamma_cols]
    p = round(float(init_p), 6)
    m = [round(float(init_m), 6)] * K
    u = [round(float(init_u), 6)] * K
    # Materialize the pair table once (round-16, guide §5): every EM
    # round re-aggregates it, and without this the whole upstream
    # blocking subtree (window sort + joins) re-executed per round —
    # n_iters + 1 recomputes. The table is bounded by the blocking stage
    # (docstring above), the same class cluster_duplicates checkpoints
    # per round. Measured 3.3-3.8 → 2.8-3.0 s on the sf0.1 entry.
    pairs = pairs.select(*gamma_cols).localCheckpoint()
    rows = []
    for it in range(n_iters):
        pm = F.lit(p)
        pu = F.lit(1.0 - p)
        for j in range(K):
            pm = pm * (F.lit(m[j]) * g[j] + F.lit(1.0 - m[j]) * (1.0 - g[j]))
            pu = pu * (F.lit(u[j]) * g[j] + F.lit(1.0 - u[j]) * (1.0 - g[j]))
        resp = pm / (pm + pu)
        aggs = [
            F.sum(resp).alias("sg"),
            F.count(F.lit(1)).alias("n"),
        ]
        for j in range(K):
            aggs.append(F.sum(resp * g[j]).alias(f"sgj{j}"))
            aggs.append(F.sum((1.0 - resp) * g[j]).alias(f"suj{j}"))
        r = pairs.agg(*aggs).collect()[0]
        if r["n"] == 0:
            raise ValueError("fellegi_sunter_em needs at least one pair")
        def clamp(x: float) -> float:
            # keep every estimate strictly inside (0, 1): a field that all
            # (or no) pairs agree on would otherwise converge to exactly
            # 0/1 after rounding and blow up the log-likelihood-ratio
            # weights (measured at sf0.1: dense balances push u₃ → 1.0).
            # The bounds are the 6-dp grid's end points as DECIMAL
            # literals (0.000001 / 0.999999) so the clamped double is
            # bit-identical to the SQL oracle's least/greatest literals.
            return min(max(x, 0.000001), 0.999999)

        sg = float(r["sg"])
        p = clamp(round(sg / r["n"], 6))
        for j in range(K):
            m[j] = clamp(round(float(r[f"sgj{j}"]) / sg, 6))
            u[j] = clamp(round(float(r[f"suj{j}"]) / (r["n"] - sg), 6))
        rows.append((it, "p", 0, p))
        for j in range(K):
            rows.append((it, "m", j + 1, m[j]))
            rows.append((it, "u", j + 1, u[j]))
    return spark.createDataFrame(rows, "iter int, param string, j int, value double")


def fellegi_sunter_score(
    pairs: DataFrame,
    gamma_cols: Sequence[str],
    m: Sequence[float],
    u: Sequence[float],
    score_col: str = "score",
    digits: int = 6,
) -> DataFrame:
    """Score candidate pairs with the Fellegi-Sunter log-likelihood-ratio
    weight: agreement on field j contributes ``log2(m_j/u_j)``,
    disagreement ``log2((1−m_j)/(1−u_j))`` — the classic linkage weight a
    threshold then turns into link / possible / non-link decisions. Pure
    Column expression (parameters are literals), rounded to ``digits``."""
    if len(m) != len(gamma_cols) or len(u) != len(gamma_cols):
        raise ValueError("m and u must match gamma_cols length")
    if any(not 0.0 < x < 1.0 for x in list(m) + list(u)):
        raise ValueError("m and u must lie strictly in (0, 1) — "
                         "fellegi_sunter_em clamps its estimates for this")
    import math as _math

    s = F.lit(0.0)
    for j, c in enumerate(gamma_cols):
        gj = F.col(c).cast("double")
        wa = _math.log2(m[j] / u[j])
        wd = _math.log2((1.0 - m[j]) / (1.0 - u[j]))
        s = s + F.lit(wa) * gj + F.lit(wd) * (1.0 - gj)
    return pairs.withColumn(score_col, F.round(s, digits))
