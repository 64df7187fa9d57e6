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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_pairs_symspell", "sorted_neighborhood_pairs", "str_rank_key"]


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
