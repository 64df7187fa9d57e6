"""[EXT] MERGE / upsert / SCD2 emulation — the CDC patterns of a lakehouse
MERGE INTO, expressed with joins + unions (no Delta/Iceberg in this
container; the plans are the same shape those engines produce internally).

Scale notes: ``merge_upsert`` is one anti-join (target keys vs source keys,
broadcast when the changeset is small — the common CDC case) plus a union;
rewrite amplification is bounded by partition layout, so at 100 TB pair it
with partitioned/sorted writes (sinks.write_parquet_sorted) and overwrite
only affected partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "scd2_apply", "table_diff", "cdc_apply"]


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    broadcast_source: bool = True,
) -> DataFrame:
    """MERGE semantics: source rows insert-or-replace target rows by key.

    Equivalent to ``MERGE INTO target USING source ON keys WHEN MATCHED
    THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``. Source must be
    unique per key (pre-dedupe a CDC stream to its latest row first).
    """
    src_keys = source.select(*keys)
    if broadcast_source:
        src_keys = F.broadcast(src_keys)
    untouched = target.join(src_keys, list(keys), "left_anti")
    return untouched.unionByName(source)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    change_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    open_end: str = "9999-12-31",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close current rows for changed keys
    and append new versions.

    ``dim`` carries ``valid_from``/``valid_to`` (open rows have
    ``valid_to = open_end``); ``changes`` carries the new attribute values
    plus ``change_ts``. Output = history rows untouched + closed-out rows +
    new open rows.
    """
    open_rows = dim.where(F.col(valid_to) == F.lit(open_end).cast("timestamp"))
    closed_rows = dim.where(F.col(valid_to) != F.lit(open_end).cast("timestamp"))

    chg_keys = F.broadcast(changes.select(*keys, F.col(change_ts).alias("__new_from")))

    # open rows for changed keys get closed at the change timestamp
    closing = open_rows.join(chg_keys, list(keys)).withColumn(valid_to, F.col("__new_from")).drop("__new_from")
    # open rows for unchanged keys stay open
    still_open = open_rows.join(chg_keys.select(*keys), list(keys), "left_anti")

    new_versions = changes.withColumn(valid_from, F.col(change_ts)).withColumn(
        valid_to, F.lit(open_end).cast("timestamp")
    ).drop(change_ts)

    return closed_rows.unionByName(closing).unionByName(still_open).unionByName(new_versions)


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Symmetric table diff — the migration/backfill verification tool:
    classify every key as ``only_left`` / ``only_right`` / ``changed`` /
    ``same`` in ONE full outer join.

    Value comparison hashes the compared columns to one digest per side
    (null-safe: null and 'null' hash differently via typed struct
    serialization), so the join carries keys + two 64-bit hashes instead
    of full rows — at 100 TB the diff of two wide tables shuffles a few
    dozen bytes per row. ``compare_cols`` defaults to all non-key columns
    shared by both sides (by name).

    Returns ``(key_cols…, diff)`` with ``diff`` ∈ {only_left, only_right,
    changed, same}; callers usually filter ``diff != 'same'``.
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in keys]
    cmp_cols = list(compare_cols)

    def side(df: DataFrame, tag: str) -> DataFrame:
        # Spark's hash expressions SKIP null inputs (a null leaves the
        # accumulator unchanged), so hashing bare columns would make
        # (NULL, 'x') and ('x', NULL) collide across same-typed columns —
        # false-'same' is the dangerous direction for a diff tool. Pairing
        # every value with an explicit isNull marker makes null position-
        # distinguishing: the boolean always contributes to the digest.
        h = (
            F.xxhash64(*[F.struct(F.col(c).isNull(), F.col(c)) for c in cmp_cols])
            if cmp_cols
            else F.lit(0)
        )
        return df.select(*keys, h.alias(f"__h_{tag}"), F.lit(1).alias(f"__p_{tag}"))

    joined = side(left, "l").join(side(right, "r"), keys, "full_outer")
    diff = (
        F.when(F.col("__p_r").isNull(), F.lit("only_left"))
        .when(F.col("__p_l").isNull(), F.lit("only_right"))
        .when(F.col("__h_l") != F.col("__h_r"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return joined.select(*keys, diff.alias("diff"))


def cdc_apply(
    base: DataFrame,
    log: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change log (insert/update/delete rows with a total
    per-key order) to a base snapshot — the Debezium/binlog-compaction
    materialization step.

    ``log`` carries ``key_cols + value columns + seq_col + op_col`` with
    ``op`` ∈ {'I','U','D'}; ``base`` carries ``key_cols + value columns``
    and ranks BELOW every log entry (seq −1). Per key the HIGHEST-seq
    row wins (one hash-partitioned window, the same shuffle any
    compaction pays); a winning 'D' removes the key. Equal seqs within a
    key are a malformed log — the tie then breaks arbitrarily; dedupe
    upstream (same contract as merge_upsert).

    At 100 TB this is the periodic-compaction shape: the log is a day's
    binlog (small vs the snapshot), the window runs per key, and the
    output is the next snapshot — no driver-side state at all.
    """
    keys = list(key_cols)
    value_cols = [c for c in base.columns if c not in keys]
    stamped_base = base.select(
        *keys, *value_cols,
        F.lit(-1).cast("long").alias(seq_col),
        F.lit("I").alias(op_col),
    )
    unioned = stamped_base.unionByName(
        log.select(*keys, *value_cols, seq_col, op_col)
    )
    w = W.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return latest.where(F.col(op_col) != "D").select(*keys, *value_cols)
