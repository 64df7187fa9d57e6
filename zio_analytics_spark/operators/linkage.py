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

__all__ = ["fuzzy_pairs_symspell"]


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
