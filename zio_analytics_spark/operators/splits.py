"""[EXT] Deterministic dataset splitting (SURVEY.md §2.4 tail).

``hash_split`` assigns every row a split label (train/val/test/...) from a
hash of row content — the correct way to split a training corpus at scale:

- **Deterministic & engine-reproducible**: no RNG, no ``zipWithIndex``, no
  dependence on partitioning or cluster size — membership is a pure
  function of the content (md5 is bit-identical across Spark, DuckDB, and
  every other engine, which also makes the operator oracle-checkable).
- **Stable under growth**: adding documents never moves an existing
  document to a different split (the classic leakage bug with
  ``randomSplit`` re-runs).
- **Salted**: a salt namespaces the assignment so two pipelines can draw
  independent splits from the same corpus.

The bucket is the first 8 hex digits of ``md5(salt || key)`` taken mod
10_000 (0.01% granularity), compared against cumulative weight thresholds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_split", "split_bucket", "stratified_exact_split", "oversample_balance"]

_BUCKETS = 10_000


def split_bucket(key: Column | str, salt: str = "") -> Column:
    """The 0..9999 assignment bucket: first 8 hex digits of md5(salt||key)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    on: Column | str,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Append ``split_col`` with a label from ``weights`` (label → fraction,
    must sum to 1 within rounding; insertion order defines the threshold
    layout). ``on`` is the content key — use the text/digest column, NOT a
    row number, so membership survives re-partitioning and corpus growth.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = split_bucket(on, salt)
    expr: Column | None = None
    upper = 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:
        upper += w * _BUCKETS
        cond = bucket < F.lit(int(round(upper)))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1][0])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def stratified_exact_split(
    df: DataFrame,
    weights: dict[str, float],
    on: Column | str,
    strata: list[str],
    salt: str = "",
    split_col: str = "split",
    tiebreak: Column | str | None = None,
) -> DataFrame:
    """EXACT per-stratum split quotas: within each stratum, rows rank by
    md5(salt||key) (key string as the tiebreak) and the first
    ⌊w_cum · n⌋ ranks take each label — so every stratum hits its
    fractions exactly (±1 row), which :func:`hash_split` only achieves in
    expectation and can miss badly for SMALL strata (a 30-doc language can
    land 100% in train by hash luck; stratified quotas guarantee its val/
    test presence).

    DETERMINISM CONTRACT: the window orders by (md5(salt||key), key), so
    ``on`` must be UNIQUE within each stratum — duplicate keys share a
    sort key and ``row_number`` over ties is engine/partitioning-dependent.
    If ``on`` can repeat (e.g. splitting on a category), pass ``tiebreak``
    (a unique id column) and it is appended to the window ORDER BY to
    restore a total order.

    Tradeoff vs :func:`hash_split`, stated honestly: ranks shift when the
    corpus grows, so membership is reproducible for a FIXED corpus
    (deterministic, engine-independent — the oracle replays it) but not
    growth-stable. Use hash_split for evolving corpora, this for frozen
    snapshots needing exact stratum proportions. One window shuffle keyed
    on the strata; no RNG anywhere.
    """
    from pyspark.sql import Window as W

    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if not strata:
        raise ValueError("stratified_exact_split requires at least one stratum column")
    key = F.col(on) if isinstance(on, str) else on
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    order = [h, key.cast("string")]
    if tiebreak is not None:
        tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
        order.append(tb.cast("string"))
    win = W.partitionBy(*strata).orderBy(*order)
    rn = F.row_number().over(win)
    n = F.count(F.lit(1)).over(W.partitionBy(*strata))
    labels = list(weights.items())
    expr: Column | None = None
    cum = 0.0
    for label, w in labels[:-1]:
        cum += w
        cond = rn <= F.floor(F.lit(cum) * n)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1][0])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def oversample_balance(
    df: DataFrame,
    label_col: str,
    on: Column | str,
    salt: str = "ob",
    copy_col: str = "copy_id",
) -> DataFrame:
    """Deterministic class rebalancing by oversampling: replicate each
    class's rows until every class reaches the MAJORITY class's count,
    exactly. No RNG — replication counts come from a salted-md5 rank, so
    the same corpus always yields the same resampled set and a SQL oracle
    replays every copy.

    Mechanics: per-class counts (one tiny aggregate, broadcast) give each
    class a base multiplier ⌊target/cnt⌋; the remainder target mod cnt
    goes to the first ``rem`` rows in (md5(salt||key), key) rank order.
    Rows are then exploded ``sequence(1, n_copies)`` → one output row per
    copy with ``copy_col`` ∈ [1, n_copies] (copy 1 = the original).
    Output class counts are exactly uniform (asserted in tests).

    SCALE: the rank window sorts within each class — the same exact-quota
    discipline (and cost) as :func:`stratified_exact_split`; at unbounded
    class sizes swap the remainder selection for a hash-threshold
    approximation (membership ∝ md5 < rem/cnt), which loses exactness for
    independence of class size. Explode multiplies bytes by the imbalance
    ratio — that is the point, but budget the output side accordingly.
    ``on`` must be unique within a class (the split-tiebreak contract)."""
    from pyspark.sql import Window as W

    key = F.col(on) if isinstance(on, str) else on
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__cnt"))
    target = counts.agg(F.max("__cnt").alias("__target"))
    sized = counts.crossJoin(F.broadcast(target))
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    rn = F.row_number().over(
        W.partitionBy(label_col).orderBy(h, key.cast("string"))
    )
    base = F.floor(F.col("__target") / F.col("__cnt")).cast("long")
    rem = F.col("__target") % F.col("__cnt")
    n_copies = base + (F.col("__rn") <= rem).cast("long")
    return (
        df.withColumn("__rn", rn)
        .join(F.broadcast(sized), label_col)
        .withColumn("__nc", n_copies)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("__nc").cast("int"))))
        .drop("__rn", "__cnt", "__target", "__nc")
    )
