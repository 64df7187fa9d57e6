"""[EXT] Explicit Bloom-filter runtime join pre-filtering.

The classic big-join optimization (Bloom 1970, CACM 13(7); applied to
distributed joins since the original MapReduce-era semi-join literature):
build a tiny bit-array summary of the small side's join keys, broadcast it,
and drop non-matching fact rows AT THE SCAN, before they pay the shuffle.
Spark ships the same idea as an optimizer rule (injected
``BloomFilterMightContain`` under ``spark.sql.optimizer.runtime.bloomFilter.
enabled``), but it only fires on shuffle-join creation-side patterns the
rule recognizes; this module makes the filter a first-class *user*
operator — buildable once, reusable across many queries, applicable to any
predicate position (e.g. ahead of an aggregate that feeds the join).

Spark 4.1 does not register ``bloom_filter_agg`` / ``might_contain`` in the
public FunctionRegistry (probed round 7 — UNRESOLVED_ROUTINE), so the filter
is built from the published construction directly: ``k`` hash functions are
``xxhash64(key, seed_j) mod m``; the build is ONE aggregation (explode k
positions → ``bit_or`` of single-bit words), the probe is a pure-codegen
conjunction of ``element_at``/``bitwiseAND`` tests against the broadcast
word-array literal. No UDF anywhere.

Correctness contract: a Bloom filter has NO false negatives — every true
key passes — so ``prefilter + exact join ≡ exact join`` exactly; false
positives only cost wasted shuffle rows (rate ≈ (1 - e^{-kn/m})^k, ~1% at
m/n=10, k=3). That identity is what the catalog oracle checks.

Scale shape (100 TB): the build side is one narrow aggregate over the
(already small) dimension — m defaults to 2^16 bits = 8 KiB of driver
state, far below broadcast thresholds. The probe is a per-row O(k) bit
test fused into the fact scan's WholeStageCodegen, upstream of the join
shuffle: with a 1% selective dimension, ~99% of fact bytes never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_contains", "bloom_prefilter_join"]

_DEFAULT_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)  # odd 32-bit mix constants


def _positions(key: Column, m_bits: int, seeds: tuple[int, ...]) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(int(s))), F.lit(int(m_bits))) for s in seeds]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    seeds: tuple[int, ...] = _DEFAULT_SEEDS,
) -> list[int]:
    """Aggregate the distinct join keys of ``df[key_col]`` into an
    ``m_bits``-bit Bloom filter, returned as the dense list of
    ``m_bits // 64`` little-endian words (driver-side: 8 KiB at the
    default m — deliberately tiny, like a centroid table).

    One job: explode the k=``len(seeds)`` bit positions per key, group by
    word index, ``bit_or`` the single-bit contributions. The shuffle
    carries at most ``m_bits / 64`` rows regardless of corpus size.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, seeds))).alias("__p")
    words = (
        df.select(pos)
        .select(
            F.call_function("shiftright", F.col("__p"), F.lit(6)).cast("int").alias("__w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__p") % 64).cast("int")
            ).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r["__w"]] = r["__bits"]
    return dense


def bloom_contains(
    words: list[int],
    key: Column,
    seeds: tuple[int, ...] = _DEFAULT_SEEDS,
) -> Column:
    """Membership predicate against a filter built by :func:`bloom_build`.

    Pure codegen: the word array ships as ONE array literal (a single
    broadcast-sized constant in the plan, not 2^10 nodes — the round-7
    plan-size lesson), each seed contributes one
    ``element_at & (1 << bit) != 0`` test. Never returns false for a key
    that was in the build set.
    """
    m_bits = 64 * len(words)
    arr = F.lit(words).cast("array<bigint>")
    test = None
    for p in _positions(key, m_bits, seeds):
        word = F.element_at(arr, (F.call_function("shiftright", p, F.lit(6)) + 1).cast("int"))
        bit = F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
        t = word.bitwiseAND(bit) != 0
        test = t if test is None else (test & t)
    return test


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    seeds: tuple[int, ...] = _DEFAULT_SEEDS,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Inner-join ``fact`` to ``dim`` with a Bloom pre-filter on the fact
    scan: build the filter from ``dim[dim_key]`` (one small job), drop
    fact rows that cannot match *before* the join, then run the exact
    join (broadcast by default — the dim that fit in a Bloom filter fits
    in a broadcast) to eliminate the filter's false positives.

    Result is row-for-row identical to ``fact.join(dim, on)`` — the
    filter is an optimization, never a semantics change.
    """
    words = bloom_build(dim, dim_key, m_bits=m_bits, seeds=seeds)
    pre = fact.where(bloom_contains(words, F.col(fact_key), seeds=seeds))
    d = F.broadcast(dim) if broadcast_dim else dim
    return pre.join(d, pre[fact_key] == d[dim_key], "inner")
