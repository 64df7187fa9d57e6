"""[EXT] Trainable quality classifier — logistic regression by FIXED-
ITERATION batch gradient descent, the distributed restatement of the
classifier-based quality filtering stage every modern pre-training
pipeline runs (fastText-style quality models, FineWeb-Edu's educational
scorer): learn weights over cheap per-document signals from a labeled
seed set, then score the whole corpus in one broadcast pass.

Determinism contract (what makes a SQL oracle able to replay TRAINING,
not just scoring): iterations are FIXED (no convergence test), the
learning rate is a literal, and each iteration's gradient components are
ROUNDED to 6 dp before the weight update — so the weight vector is the
same short decimal literal in every engine after every round, and the
only cross-engine float surface is one rounded aggregate per (iteration,
feature), the exact discipline of clustering.kmeans / pq's Lloyd replay.

Scale design:

- Training runs on a SLIM feature frame (id, label, x₁…x_d) — at 100 TB
  you materialize features once (one corpus scan) and iterate on the
  ~10-100× smaller numeric table; the labeled seed set is usually tiny
  anyway (human/LLM labels), so iteration cost is seed-set-bound.
- Each iteration is ONE aggregate job producing d+1 doubles (map-side
  combinable Σ xᵢⱼ·(yᵢ − σ(w·xᵢ))); driver state per round = the weight
  vector — the bounded-driver-state discipline of bpe/kmeans.
- Scoring is a pure Column expression (weights enter as literals): no
  UDF, no join, fused into whatever scan produces the features.

Reference scope: the zio-analytics reference (Expression.scala:19-43) has
no ML surface; this is [EXT] LLM-pipeline surface (SURVEY.md §2), public
algorithm (logistic regression / gradient descent, any ML textbook).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["logreg_train", "logreg_score"]


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _dot(weights: list[float], feature_cols: Sequence[str]) -> Column:
    # w₀ (bias) + Σ wⱼ·xⱼ — weights are 6-dp literals, so both engines
    # evaluate the identical expression tree
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c).cast("double")
    return z


def logreg_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label",
    n_iters: int = 4,
    lr: float = 0.5,
) -> DataFrame:
    """Learn logistic-regression weights (bias + one per feature) with
    ``n_iters`` rounds of full-batch gradient ascent on the mean
    log-likelihood: ``wⱼ ← wⱼ + lr · round(Σ xⱼ·(y − σ(w·x)) / n, 6)``.

    Weights start at 0. Returns one row per (iteration, coefficient):
    ``(iter, j, grad, w)`` where ``j = 0`` is the bias (x₀ ≡ 1), ``grad``
    the ROUNDED mean-gradient component the update used, and ``w`` the
    weight AFTER the update (an exact short decimal by construction).
    The label must be 0/1; features should be roughly unit-scale (the
    caller normalizes — standard GD hygiene, not a hidden contract).
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if not feature_cols:
        raise ValueError("need at least one feature column")
    spark: SparkSession = df.sparkSession
    d = len(feature_cols)
    slim = df.select(
        F.col(label_col).cast("double").alias("__y"),
        *[F.col(c).cast("double").alias(f"__x{j}") for j, c in enumerate(feature_cols)],
    )
    cols = [f"__x{j}" for j in range(d)]
    weights = [0.0] * (d + 1)
    rows = []
    for it in range(n_iters):
        err = F.col("__y") - _sigmoid(_dot(weights, cols))
        aggs = [F.round(F.avg(err), 6).alias("g0")] + [
            F.round(F.avg(F.col(c) * err), 6).alias(f"g{j + 1}")
            for j, c in enumerate(cols)
        ]
        g = slim.agg(*aggs).collect()[0]
        if g["g0"] is None:
            raise ValueError("logreg_train needs at least one row")
        for j in range(d + 1):
            gj = float(g[f"g{j}"])
            # lr is a short decimal and gj has 6 dp: round the product to
            # 10 dp so the stored weight is exactly the literal both the
            # next Spark round and the oracle replay will use
            weights[j] = round(weights[j] + lr * gj, 10)
            rows.append((it, j, gj, weights[j]))
    return spark.createDataFrame(rows, "iter int, j int, grad double, w double")


def logreg_score(
    df: DataFrame,
    weights: Sequence[float],
    feature_cols: Sequence[str],
    score_col: str = "score",
    digits: int = 6,
) -> DataFrame:
    """Score every row with ``σ(w·x)`` (rounded to ``digits``): one pure
    Column expression over the feature columns — the corpus-side pass of
    classifier-based quality filtering. ``weights`` is the (bias,
    w₁…w_d) vector, e.g. the last iteration of :func:`logreg_train`."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"weights must have len(feature_cols)+1={len(feature_cols) + 1} "
            f"entries (bias first), got {len(weights)}"
        )
    return df.withColumn(
        score_col, F.round(_sigmoid(_dot(list(weights), feature_cols)), digits)
    )
