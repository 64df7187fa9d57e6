"""[EXT] Storage-layout optimization: Z-order clustering & contiguous ids.

At 100 TB the scan is the query: what a file CONTAINS decides whether the
engine can skip it. Parquet readers prune at file/row-group level from
column min/max statistics — but statistics only help if the layout makes
them tight. These operators produce such layouts:

- ``zorder_value`` / ``zorder_write``: interleave the bits of two (or more)
  numeric dimensions into one Z-value and range-partition + sort the data
  by it. Each output file then covers a small axis-aligned rectangle of the
  key space, so a conjunctive 2-D range predicate skips most files on
  min/max alone — the standard multi-dimensional clustering trick (Delta
  OPTIMIZE ZORDER, Iceberg sort orders) built from plain Column
  expressions: no engine extension needed, just bit math + a sorted write.

- ``assign_contiguous_ids``: gap-free 0..N-1 ids in a deterministic
  content-hash order WITHOUT a single-task global sort. Pass 1 range-
  partitions by the order key and counts rows per partition (a few hundred
  longs to the driver — the same materialization a broadcast does); pass 2
  adds the partition's global offset to the in-partition rank. The naive
  ``row_number() OVER ()`` is one task sorting 100 TB; this is the
  standard two-pass replacement (cf. RDD zipWithIndex, which does exactly
  this at the RDD layer).

Both are deterministic, so a DuckDB oracle replays them exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "zorder_value",
    "zorder_write",
    "hilbert_value",
    "hilbert_write",
    "assign_contiguous_ids",
    "global_cumsum",
    "plan_compaction",
]


def zorder_value(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton/Z-value of non-negative integer columns: bit-interleave the
    low ``bits`` of each (values clamped into range). Pure Column bit math
    — whole-stage codegen, no UDF.

    With d dimensions the result uses d·bits bits (d·bits ≤ 63). Callers
    bucket raw values into [0, 2^bits) first (e.g. ``width_bucket``-style
    scaling) — clamping here is a safety net, not the quantizer.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    d = len(cs)
    if d * bits > 63:
        raise ValueError(f"{d} dims x {bits} bits exceeds a signed long")
    cap = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            v = F.least(F.greatest(c.cast("long"), F.lit(0)), F.lit(cap))
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * d + i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-value of ``cols``:
    ``repartitionByRange(z)`` (range exchange via a sampled boundary pass)
    then an in-partition sort, so every file covers a contiguous Z-range =
    a small rectangle of the key space. Readers then prune files/row-groups
    from per-column min/max stats for conjunctive range predicates on ANY
    prefix-free combination of the clustered dimensions."""
    z = zorder_value(cols, bits).alias("__z")
    clustered = df.withColumn("__z", z)
    parts = (
        clustered.repartitionByRange(n_files, "__z")
        if n_files
        else clustered.repartitionByRange("__z")
    )
    parts.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(path)


def assign_contiguous_ids(
    df: DataFrame,
    order_num: Column | str,
    tiebreak: Sequence[Column | str] = (),
    id_name: str = "seq_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Gap-free 0..N-1 ids following the total order ``(order_num,
    *tiebreak)``, without a global single-task sort.

    The naive ``row_number() OVER (ORDER BY ...)`` funnels everything
    through ONE task. Instead: (1) one aggregate computes ``n_buckets``
    APPROXIMATE quantile boundaries of ``order_num`` (sketch-based — no
    sort; an exact ``percentile`` over the full key column would itself be
    a heavy sort-aggregate at 100 TB) and a bucket id is assigned by
    strict-``>`` comparison against the inlined boundaries (ties always
    share a bucket, so bucket order respects value order); (2) one tiny
    aggregate counts rows per bucket → cumulative offsets, inlined as a
    literal map; (3) id = bucket offset + in-bucket ``row_number`` − 1,
    each bucket's window sorting only its own slice in parallel.

    Approximate boundaries are SAFE here: the final id is the global rank
    in ``(order_num, *tiebreak)`` order for ANY boundary placement —
    buckets respect value order by construction and offsets come from the
    actual per-bucket counts, so boundary skew costs only balance, never
    correctness. The boundaries are collected once and inlined as
    literals, so pass 2 and pass 3 see the identical bucketing.

    ``n_buckets`` defaults to ~1 bucket per 2M rows, clamped to
    [16, 4096] (one cheap count pass) — the pass-3 parallelism bound: a
    fixed 64 would mean 64 single-task window sorts (~1.6 TB/task at
    100 TB), while the cap keeps driver state and the boundary sketch
    bounded. Pass an explicit value to pin it.

    Everything driver-side is bounded (n_buckets values + counts — the
    same materialization a broadcast performs). Deliberately built from
    DATA-derived buckets, not ``spark_partition_id`` after a range
    exchange: range-exchange boundary sampling is not guaranteed stable
    across job re-executions, so physical partition ids are not a safe
    foundation for ids that must be exactly-once-deterministic.

    ``order_num`` must be numeric (hash your key into a long first);
    ``(order_num, *tiebreak)`` must be a total order or ids within a tie
    group are arbitrary.
    """
    c = F.col(order_num) if isinstance(order_num, str) else order_num
    tb = [F.col(t) if isinstance(t, str) else t for t in tiebreak]
    key = df.select(c.alias("__k"))
    if n_buckets is None:
        n_rows = key.count()
        n_buckets = max(16, min(4096, -(-n_rows // 2_000_000)))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = key.agg(
        F.expr(f"approx_percentile(__k, array({', '.join(map(str, qs))}))")
    ).first()[0]
    if bounds is None:  # empty input: single empty bucket, no ids to assign
        return df.withColumn(id_name, F.lit(None).cast("long"))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (c > F.lit(float(b))).cast("int")
    with_b = df.withColumn("__bkt", bucket)
    counts = {
        r["__bkt"]: r["n"]
        for r in with_b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for bk in sorted(counts):
        offsets[bk] = acc
        acc += counts[bk]
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(b) for b in sorted(offsets)]),
            F.array(*[F.lit(offsets[b]).cast("long") for b in sorted(offsets)]),
        ),
        F.col("__bkt"),
    )
    rank = F.row_number().over(W.partitionBy("__bkt").orderBy(c, *tb))
    return with_b.withColumn(id_name, off + rank.cast("long") - 1).drop("__bkt")


#: The 2-D Hilbert curve as a 4-state transducer over quadrant digits
#: (MSB first): state = the dihedral transform the quadrant walk has
#: accumulated so far (only 4 of the 8 square symmetries are reachable).
#: Derived by composing the Wikipedia ``xy2d`` rotation per level and
#: verified EXHAUSTIVELY against that reference for every point up to a
#: 64×64 grid (test_layout re-asserts at 32×32). Indexed by
#: ``state·4 + q`` with ``q = 2·x_bit + y_bit``.
_HILBERT_OUT = [0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0]
_HILBERT_TRANS = [1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2]


def hilbert_value(x_col: Column | str, y_col: Column | str, bits: int = 8) -> Column:
    """Hilbert-curve index of a 2-D point on a ``2^bits × 2^bits`` grid —
    pure Column math (no UDF), the locality-stronger sibling of
    :func:`zorder_value`: consecutive Hilbert indices are ALWAYS grid
    neighbors (step distance exactly 1 — asserted exhaustively in
    test_layout), where a Z-curve jumps across the key space at every
    power-of-two boundary. Tighter runs → tighter per-file min/max
    rectangles → better pruning on range predicates (what Delta/Iceberg
    ship as Hilbert clustering).

    Implementation: the table-driven Hilbert FSM (the standard encoding of
    Wikipedia's ``xy2d`` quadrant walk as a 4-state transducer —
    :data:`_HILBERT_OUT` / :data:`_HILBERT_TRANS`): first Morton-interleave
    the bits (x in the high bit of each pair — O(bits) independent terms),
    then fold ``(digit, state, window)`` through the base-4 digits MSB
    first with ONE ``F.aggregate(sequence(...))`` HOF. The window trick
    keeps every shift a CONSTANT (the DSL cannot shift by the lambda
    variable): the state carries the remaining Morton value ``w`` and each
    step reads ``w >> 2·(bits−1)`` then slides ``w ← (w mod 4^(bits−1))·4``.

    Why a runtime fold and not unrolled Columns: unrolling the walk
    level-by-level duplicates the (x, y) rotation state ~3× per level — an
    O(3^bits) Catalyst tree that took MINUTES to analyze at bits=8. The
    fold is O(bits) expression nodes (the interleave) + an O(1) lambda, so
    the ceiling is the coordinate domain, not the plan: ``bits ≤ 31``
    (2·bits ≤ 62 result bits).

    Inputs are clamped into range like :func:`zorder_value`. Determinism
    makes the index (and the layout it drives) oracle-replayable.
    """
    if bits < 1 or bits > 31:
        raise ValueError("hilbert_value supports 1..31 bits")
    cap = (1 << bits) - 1
    xc = F.col(x_col) if isinstance(x_col, str) else x_col
    yc = F.col(y_col) if isinstance(y_col, str) else y_col
    x = F.least(F.greatest(xc.cast("long"), F.lit(0)), F.lit(cap))
    y = F.least(F.greatest(yc.cast("long"), F.lit(0)), F.lit(cap))
    z = F.lit(0).cast("long")
    for level in range(bits):
        xb = F.shiftright(x, level).bitwiseAND(F.lit(1))
        yb = F.shiftright(y, level).bitwiseAND(F.lit(1))
        z = z + (xb * 2 + yb).cast("long") * F.lit(1 << (2 * level))
    out_arr = F.array(*[F.lit(v).cast("long") for v in _HILBERT_OUT])
    trans_arr = F.array(*[F.lit(v) for v in _HILBERT_TRANS])
    div = 1 << (2 * (bits - 1))  # the MSB base-4 digit's place value

    def step(acc: Column, _l: Column) -> Column:
        digit = F.shiftright(acc["w"], 2 * (bits - 1)).cast("int")
        idx = acc["s"] * 4 + digit + 1
        return F.struct(
            (acc["d"] * 4 + F.element_at(out_arr, idx)).alias("d"),
            F.element_at(trans_arr, idx).alias("s"),
            (acc["w"].bitwiseAND(F.lit(div - 1)) * 4).alias("w"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("d"), F.lit(0).alias("s"), z.alias("w")
    )
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(bits)), init, step, lambda acc: acc["d"]
    )


def hilbert_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by Hilbert index — same
    range-partition + in-partition sort shape as :func:`zorder_write`,
    with the curve's stronger locality driving the file rectangles."""
    h = hilbert_value(x_col, y_col, bits).alias("__h")
    clustered = df.withColumn("__h", h)
    parts = (
        clustered.repartitionByRange(n_files, "__h")
        if n_files
        else clustered.repartitionByRange("__h")
    )
    parts.sortWithinPartitions("__h").drop("__h").write.mode("overwrite").parquet(path)


def global_cumsum(
    df: DataFrame,
    order_num: Column | str,
    value_col: str,
    tiebreak: Sequence[Column | str] = (),
    out_name: str = "running_total",
    n_buckets: int | None = None,
) -> DataFrame:
    """EXACT global running total of ``value_col`` in ``(order_num,
    *tiebreak)`` order without a single-task global sort — the
    generalization of :func:`assign_contiguous_ids` (which is the cumsum
    of 1s): (1) approximate-quantile boundaries bucket the order key
    (ties share a bucket, so bucket order respects value order — skewed
    boundaries cost balance, never correctness); (2) one tiny aggregate
    sums ``value_col`` per bucket → cumulative VALUE offsets inlined as a
    literal map; (3) running total = bucket offset + in-bucket window
    cumsum, each bucket sorting only its own slice in parallel.

    The naive ``sum() OVER (ORDER BY ...)`` funnels 100 TB through ONE
    window task; this is the standard two-pass replacement. Values should
    be integral (exact offsets); ``(order_num, *tiebreak)`` must be a
    total order for a deterministic result."""
    c = F.col(order_num) if isinstance(order_num, str) else order_num
    tb = [F.col(t) if isinstance(t, str) else t for t in tiebreak]
    key = df.select(c.alias("__k"))
    if n_buckets is None:
        n_rows = key.count()
        n_buckets = max(16, min(4096, -(-n_rows // 2_000_000)))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = key.agg(
        F.expr(f"approx_percentile(__k, array({', '.join(map(str, qs))}))")
    ).first()[0]
    if bounds is None:
        return df.withColumn(out_name, F.lit(None).cast("long"))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (c > F.lit(float(b))).cast("int")
    with_b = df.withColumn("__bkt", bucket)
    sums = {
        r["__bkt"]: r["s"]
        for r in with_b.groupBy("__bkt")
        .agg(F.sum(F.col(value_col)).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for bk in sorted(sums):
        offsets[bk] = acc
        acc += sums[bk] or 0
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(b) for b in sorted(offsets)]),
            F.array(*[F.lit(offsets[b]).cast("long") for b in sorted(offsets)]),
        ),
        F.col("__bkt"),
    )
    win = (
        W.partitionBy("__bkt")
        .orderBy(c, *tb)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = off + F.sum(F.col(value_col)).over(win).cast("long")
    return with_b.withColumn(out_name, running).drop("__bkt")


def plan_compaction(
    files: DataFrame,
    target_bytes: int,
    size_col: str = "bytes",
    id_col: str = "file_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Small-files compaction PLANNER: assign each input file to an output
    bin by walking the files in ``id_col`` order and starting a new bin
    every ``target_bytes`` of cumulative size — exactly how Spark's own
    file-scan packs splits into tasks under ``files.maxPartitionBytes``,
    applied to the write side (the small-file problem: a 100 TB table
    ingested in 10 MB increments pays per-file open/footer costs on every
    scan until someone compacts).

    ``bin = floor((running_total − size) / target)`` over the EXACT
    distributed cumsum of :func:`global_cumsum` — no single-task sort, no
    driver loop; a bin may overflow ``target_bytes`` by at most its last
    file (the same overflow contract as Spark's split packing).
    Deterministic given unique ids, so a SQL window replays it. Returns
    ``(id, size, bin)``; the actual rewrite is then one
    ``repartition(bin)``-style shuffle reading each bin's files."""
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    run = global_cumsum(
        files.select(id_col, size_col),
        F.col(id_col),
        size_col,
        out_name="__run",
        n_buckets=n_buckets,
    )
    return run.select(
        id_col,
        size_col,
        F.floor((F.col("__run") - F.col(size_col)) / F.lit(target_bytes))
        .cast("long")
        .alias("bin"),
    )
