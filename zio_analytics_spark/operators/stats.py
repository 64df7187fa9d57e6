"""[EXT] Experiment-analysis statistics: Welch's t-test and the chi-square
independence test as pure distributed aggregates.

The production A/B readout at 100 TB is NOT a stats-library call over
collected data — it is moment aggregation (count / mean / sample variance
per arm: map-side partials, exact merge) followed by driver-free closed-form
arithmetic on those few numbers. Welch 1947 (Biometrika 34) for unequal
variances — the safe default when arms differ in size/spread; Pearson 1900
for categorical independence. Assignment is DETERMINISTIC (md5 bucket of
the unit id — same salted-hash discipline as ``splits.py``): re-running the
readout never reshuffles units between arms, and an md5-replaying SQL
oracle can verify every statistic end-to-end.

The reference has one aggregation primitive (Fold, DataStream.scala:47);
this is [EXT] surface (SURVEY.md §2.4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "hash_cohort",
    "welch_ttest",
    "chi2_independence",
    "auc_roc",
    "ols_simple",
    "theil_sen_slope",
    "skew_kurtosis",
    "confusion_stats",
    "calibration_bins",
    "kaplan_meier",
    "logrank_test",
    "poisson_weight",
    "bootstrap_mean_ci",
]


def hash_cohort(unit: Column, n_arms: int = 2, salt: str = "ab") -> Column:
    """Deterministic arm assignment: md5(salt|unit) bucket mod ``n_arms``.
    Engine-identical (DuckDB replays the same md5), partition-invariant,
    stable under data growth — a unit never switches arms."""
    h = F.md5(F.concat(F.lit(f"{salt}|"), unit.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_arms).cast("int")


def welch_ttest(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    cohort: Column,
) -> DataFrame:
    """Per group: Welch's unequal-variance t statistic and
    Welch–Satterthwaite degrees of freedom between cohort 0 and cohort 1.

    ONE hash aggregate computes n / mean / sample variance per arm via
    conditional aggregation (no second scan, no pivot shuffle); t and df
    are closed-form arithmetic on those six numbers. Rounded to 6 dp —
    cross-row float aggregates merge in engine-specific order. Groups
    where either arm has < 2 observations yield nulls (variance undefined).
    """
    c = cohort.alias("__arm")
    v = F.col(value_col)
    base = df.select(*group_cols, c, v.alias("__v"))
    arm = lambda a, col: F.when(F.col("__arm") == a, col)  # noqa: E731
    agg = base.groupBy(*group_cols).agg(
        F.count(arm(0, F.col("__v"))).alias("__n0"),
        F.avg(arm(0, F.col("__v"))).alias("__m0"),
        F.var_samp(arm(0, F.col("__v"))).alias("__s0"),
        F.count(arm(1, F.col("__v"))).alias("__n1"),
        F.avg(arm(1, F.col("__v"))).alias("__m1"),
        F.var_samp(arm(1, F.col("__v"))).alias("__s1"),
    )
    se0 = F.col("__s0") / F.col("__n0")
    se1 = F.col("__s1") / F.col("__n1")
    t = (F.col("__m0") - F.col("__m1")) / F.sqrt(se0 + se1)
    dof = (se0 + se1) * (se0 + se1) / (
        se0 * se0 / (F.col("__n0") - 1) + se1 * se1 / (F.col("__n1") - 1)
    )
    return agg.select(
        *group_cols,
        F.col("__n0").cast("long").alias("n_control"),
        F.col("__n1").cast("long").alias("n_treat"),
        F.round(F.col("__m0") - F.col("__m1"), 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("df"),
    )


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-square statistic for independence of two categorical
    columns: Σ (observed − expected)² / expected over the R×C contingency
    table, expected = row_total · col_total / N. Returns one row:
    ``(chi2, df, n)`` with df = (R−1)(C−1).

    One shuffle builds the contingency table (map-side combined); the
    row/column marginals are tiny (R and C rows), so the FULL R×C grid —
    including combinations with zero observations, whose (0−exp)²/exp
    terms the textbook statistic requires — is their cross product, with
    observed counts left-joined in (everything downstream of the first
    aggregate is R·C rows; the statistic never touches the raw rows
    again). Exact integer counts make the oracle replay trivially
    engine-identical; only the final ratio sum is rounded (6 dp)."""
    obs = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("__o"))
    row_tot = obs.groupBy(row_col).agg(F.sum("__o").alias("__rt"))
    col_tot = obs.groupBy(col_col).agg(F.sum("__o").alias("__ct"))
    n = obs.agg(F.sum("__o").alias("__n"))
    grid = (
        row_tot.crossJoin(F.broadcast(col_tot))
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(obs), [row_col, col_col], "left")
    )
    o = F.coalesce(F.col("__o"), F.lit(0))
    exp = F.col("__rt") * F.col("__ct") / F.col("__n")
    cell = (o - exp) * (o - exp) / exp
    return grid.agg(
        F.round(F.sum(cell), 6).alias("chi2"),
        (
            (F.count_distinct(F.col(row_col)) - 1)
            * (F.count_distinct(F.col(col_col)) - 1)
        ).cast("long").alias("df"),
        F.max("__n").cast("long").alias("n"),
    )


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """ROC-AUC per group via the Mann–Whitney rank-sum identity (AUC =
    P(score⁺ > score⁻) + ½P(=), i.e. U / (n⁺·n⁻)), with average ranks for
    ties — exactly what a stats library computes, restated for scale:

    The naive form ranks every raw row in one total order — a
    single-partition sort, the classic cliff. But ranks only change at
    distinct score values, so the pipeline aggregates FIRST
    (``groupBy(group, score)`` → count + positive count; grain = distinct
    scores, typically orders of magnitude smaller than rows), runs the
    cumulative window over that aggregated table, and computes
    avg_rank(s) = (#rows below s) + (count(s)+1)/2 per distinct score.
    AUC = (Σ_s pos(s)·avg_rank(s) − n⁺(n⁺+1)/2) / (n⁺·n⁻), one more
    aggregate. Groups lacking both classes yield NULL. Rounded 6 dp.

    ``label_col`` must be boolean or 0/1."""
    g = list(group_cols)
    lab = F.col(label_col).cast("int")
    agg = df.groupBy(*g, F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"), F.sum(lab).alias("__np")
    )
    w = (
        W.partitionBy(*[F.col(c) for c in g])
        .orderBy("__s")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = agg.withColumn(
        "__avg_rank",
        (F.sum("__n").over(w) - F.col("__n")) + (F.col("__n") + 1) / 2.0,
    )
    out = ranked.groupBy(*g).agg(
        F.sum(F.col("__np") * F.col("__avg_rank")).alias("__rank_sum"),
        F.sum("__np").cast("long").alias("n_pos"),
        (F.sum("__n") - F.sum("__np")).cast("long").alias("n_neg"),
    )
    auc = (
        F.col("__rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / (F.col("n_pos") * F.col("n_neg"))
    return out.select(
        *g,
        F.round(
            F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc), 6
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )


def ols_simple(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group simple linear regression ``y = intercept + slope·x`` as ONE
    distributed aggregate over sufficient statistics — the 100 TB regression
    is never a solver call, it is moment aggregation:

        slope = cov_pop(x, y) / var_pop(x);  intercept = ȳ − slope·x̄;
        r² = cov_pop(x, y)² / (var_pop(x) · var_pop(y))

    All six moments (n, x̄, ȳ, cov, varx, vary) come from one hash aggregate
    with map-side partials; the closed forms are per-group arithmetic on six
    numbers. Engine parity: DuckDB's ``regr_slope / regr_intercept / regr_r2``
    compute the identical ratios, so the oracle replays the whole fit.
    Degenerate groups follow SQL ``regr_*`` semantics — var(x) = 0 (or < 2
    rows) yields NULL slope/r², var(y) = 0 alone yields r² = 1 — guarded
    explicitly because Spark's ``corr`` instead raises DIVIDE_BY_ZERO under
    ANSI mode. Rounded 6 dp (cross-row float merges are order-sensitive).

    Only rows where BOTH x and y are non-null enter the fit (SQL
    ``regr_*`` semantics; Spark's covar_pop/corr skip null pairs the same
    way)."""
    g = list(group_cols)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    both = x.isNotNull() & y.isNotNull()
    base = df.select(*g, F.when(both, x).alias("__x"), F.when(both, y).alias("__y"))
    agg = base.groupBy(*g).agg(
        F.count("__x").alias("__n"),
        F.avg("__x").alias("__mx"),
        F.avg("__y").alias("__my"),
        F.covar_pop("__x", "__y").alias("__cxy"),
        F.var_pop("__x").alias("__vx"),
        F.var_pop("__y").alias("__vy"),
    )
    slope = F.when(F.col("__vx") > 0, F.col("__cxy") / F.col("__vx"))
    # r² from the same moments (cov²/(vx·vy)) rather than corr(): Spark's
    # corr raises DIVIDE_BY_ZERO under ANSI mode on a zero-variance group
    # where SQL regr_r2 is defined — NULL for var(x)=0, 1 for var(y)=0.
    r2 = F.when(
        (F.col("__vx") > 0) & (F.col("__vy") > 0),
        F.col("__cxy") * F.col("__cxy") / (F.col("__vx") * F.col("__vy")),
    ).otherwise(F.when(F.col("__vx") > 0, F.lit(1.0)))
    return agg.select(
        *g,
        F.col("__n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(F.col("__my") - slope * F.col("__mx"), 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def theil_sen_slope(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Theil–Sen robust slope per group: the MEDIAN of all pairwise slopes
    (yⱼ−yᵢ)/(xⱼ−xᵢ) over pairs with distinct x (Sen 1968, JASA 63 — public
    algorithm). Breakdown point ~29%: a third of the points can be arbitrary
    outliers before the estimate moves, where OLS breaks at one.

    SCALE CONTRACT: pairwise slopes are O(k²) in the per-group series length
    k, so the production shape is PRE-AGGREGATE FIRST — reduce raw rows to a
    bounded per-group series (e.g. one point per day: k ≤ 365 → ≤ 66k pairs
    per group, trivially block-local), then pair WITHIN the group via a
    self-equi-join on the group key. The join shuffles the bounded series,
    never raw rows; groups parallelize independently. Feeding unbounded raw
    rows per group is the same deliberate cliff as ``fold_group_collect``
    (documented there) — don't.

    The median is the exact interpolating percentile (both engines: mean of
    the two middle order statistics at even pair counts), so a
    ``quantile_cont(0.5)`` oracle replays it. Rounded 6 dp. Returns
    ``(group..., n_pairs, ts_slope)``; groups with zero distinct-x pairs
    yield no row (a join produces nothing to aggregate)."""
    g = list(group_cols)
    a = df.select(*g, F.col(x_col).alias("__xa"), F.col(y_col).alias("__ya"))
    b = df.select(*g, F.col(x_col).alias("__xb"), F.col(y_col).alias("__yb"))
    pairs = a.join(b, on=g) if g else a.crossJoin(b)
    pairs = pairs.where(F.col("__xa") < F.col("__xb"))
    pair_slope = (F.col("__yb") - F.col("__ya")) / (
        F.col("__xb").cast("double") - F.col("__xa").cast("double")
    )
    return (
        pairs.select(*g, pair_slope.alias("__s"))
        .groupBy(*g)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.percentile("__s", F.lit(0.5)), 6).alias("ts_slope"),
        )
    )


def skew_kurtosis(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group higher central moments — population skewness g₁ = m₃/m₂^1.5
    and excess kurtosis g₂ = m₄/m₂² − 3 — computed from RAW POWER SUMS
    (E[x], E[x²], E[x³], E[x⁴]) in one hash aggregate, with the central
    moments recovered by the binomial expansions:

        m₂ = s₂ − s₁²;  m₃ = s₃ − 3s₁s₂ + 2s₁³;
        m₄ = s₄ − 4s₁s₃ + 6s₁²s₂ − 3s₁⁴

    Power sums (not built-in skewness/kurtosis) because cross-engine
    DEFINITIONS diverge — DuckDB ships the sample-corrected g₁/g₂,
    Spark the population forms — while ``avg(pow(x, k))`` means the same
    thing everywhere, so an oracle replays the identical arithmetic.
    Spark's own ``F.skewness``/``F.kurtosis`` equal these forms
    (asserted in test_stats); zero-variance groups yield NULL (the
    built-ins agree). Rounded 6 dp."""
    g = list(group_cols)
    x = F.col(value_col).cast("double")
    agg = df.groupBy(*g).agg(
        F.count(x).alias("__n"),
        F.avg(x).alias("__s1"),
        F.avg(x * x).alias("__s2"),
        F.avg(x * x * x).alias("__s3"),
        F.avg(x * x * x * x).alias("__s4"),
    )
    s1, s2, s3, s4 = (F.col(f"__s{i}") for i in (1, 2, 3, 4))
    m2 = s2 - s1 * s1
    m3 = s3 - 3 * s1 * s2 + 2 * s1 * s1 * s1
    m4 = s4 - 4 * s1 * s3 + 6 * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
    return agg.select(
        *g,
        F.col("__n").cast("long").alias("n"),
        F.round(s1, 6).alias("mean"),
        F.round(m2, 6).alias("var_pop"),
        F.round(F.when(m2 > 0, m3 / F.pow(m2, F.lit(1.5))), 6).alias("skewness"),
        F.round(F.when(m2 > 0, m4 / (m2 * m2) - 3), 6).alias("kurtosis"),
    )


def confusion_stats(
    df: DataFrame,
    true_col: str,
    pred_col: str,
) -> DataFrame:
    """Multi-class confusion readout: per class, true positives / false
    positives / false negatives and precision / recall / F1.

    The raw scan collapses to the (true, pred) CONTINGENCY table first
    (one shuffle, grain = #classes², exact integer counts); every
    per-class statistic is a conditional sum over that tiny table — the
    eval never touches raw rows twice. Classes = every value observed in
    either column. Undefined ratios (no predicted positives, no actual
    positives, P+R = 0) are NULL, guarded explicitly for ANSI mode.
    Ratios rounded 6 dp; counts exact."""
    t, p = F.col("__t"), F.col("__p")
    pairs = (
        df.select(F.col(true_col).alias("__t"), F.col(pred_col).alias("__p"))
        .groupBy("__t", "__p")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    classes = (
        pairs.select(t.alias("cls"))
        .unionByName(pairs.select(p.alias("cls")))
        .distinct()
    )
    c = F.col("cls")
    joined = classes.crossJoin(F.broadcast(pairs))
    per = joined.groupBy("cls").agg(
        F.sum(F.when((t == c) & (p == c), F.col("__c")).otherwise(0)).alias("tp"),
        F.sum(F.when((p == c) & (t != c), F.col("__c")).otherwise(0)).alias("fp"),
        F.sum(F.when((t == c) & (p != c), F.col("__c")).otherwise(0)).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec))
    return per.select(
        "cls",
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins: bucket scores ∈ [0, 1] into ``n_bins``
    equal-width bins and report, per bin, the count, the mean predicted
    score, and the empirical positive rate — a calibrated model tracks
    the diagonal (|avg_score − pos_rate| small per bin), and the gap is
    the per-bin term of Expected Calibration Error.

    One hash aggregate over the binned scan; scores exactly 1.0 fold into
    the top bin (the standard closed-right edge). ``label_col`` must be
    boolean or 0/1. Mean/rate rounded 6 dp; ECE is the caller's weighted
    sum over the returned rows — kept per-bin here so the oracle can
    check every bin, not one scalar."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    bin_ = F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
    return (
        df.select(bin_.alias("bin"), s.alias("__s"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("__s"), 6).alias("avg_score"),
            F.round(F.avg("__y"), 6).alias("pos_rate"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival estimator (Kaplan & Meier 1958, JASA — the
    standard churn/retention/time-to-event curve, censoring-aware):
    ``Ŝ(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)`` over event times, where ``dᵢ`` =
    events at tᵢ and ``nᵢ`` = subjects still at risk (duration ≥ tᵢ;
    censored subjects count toward risk until their censoring time — the
    whole point vs a naive event-only histogram, which overstates churn
    by dropping survivors-so-far).

    Scale shape (the auc_roc discipline): raw subjects aggregate FIRST to
    one row per (group, duration) — ``d`` and total leaving ``t`` — so
    the risk set is a REVERSE cumulative window and the product is a
    forward one over the bounded distinct-duration grain, never the raw
    rows. The cumulative product runs as ``exp(Σ ln(1 − d/n))`` with a
    ``min(term) = 0`` guard (a time where everyone at risk dies sends the
    curve to exactly 0; ln would −inf). Windows order the aggregated
    table within each group — single-partition per group at distinct-
    duration grain, bounded by construction.

    ``event_col`` is 1 = observed, 0 = censored. Returns one row per
    EVENT time: ``(group_cols..., t, n_risk, n_events, survival,
    cum_hazard)`` — the last is the Nelson–Aalen estimator ``Σ dᵢ/nᵢ``,
    the additive sibling the log-rank variance is built from."""
    grp = list(group_cols)
    per_t = (
        df.groupBy(*grp, F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("n_events"),
            F.count(F.lit(1)).alias("__tot"),
        )
    )
    w_desc = (
        W.partitionBy(*grp)
        .orderBy(F.col("t").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    at_risk = per_t.withColumn("n_risk", F.sum("__tot").over(w_desc))
    ev_times = at_risk.where(F.col("n_events") > 0).withColumn(
        "__term", F.lit(1.0) - F.col("n_events") / F.col("n_risk")
    )
    w_asc = (
        W.partitionBy(*grp)
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # ln argument guarded at 0 (a time where everyone at risk dies):
    # DuckDB raises on ln(0) even under a CASE, because the window
    # aggregate evaluates for every row — the outer min-guard then emits
    # the exact 0 the sentinel 1.0 skipped.
    safe_term = F.when(F.col("__term") == 0.0, F.lit(1.0)).otherwise(F.col("__term"))
    surv = F.when(F.min("__term").over(w_asc) == 0.0, F.lit(0.0)).otherwise(
        F.exp(F.sum(F.log(safe_term)).over(w_asc))
    )
    # Nelson–Aalen cumulative hazard rides along for free: H(t) = Σ d/n
    # over the same event-time grain (its exp(−H) is the Fleming–
    # Harrington survival variant; emitting both costs one more window sum)
    hazard = F.sum(F.col("n_events") / F.col("n_risk")).over(w_asc)
    return ev_times.select(
        *grp,
        "t",
        "n_risk",
        "n_events",
        F.round(surv, round_dp).alias("survival"),
        F.round(hazard, round_dp).alias("cum_hazard"),
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966 / Peto 1972 — the standard
    significance test for "do these two survival curves differ?", the
    inferential partner of :func:`kaplan_meier`): at each pooled event
    time, compare group 1's OBSERVED events against the EXPECTED count
    under the null (events distribute proportionally to the at-risk
    sets), with the hypergeometric variance::

        E₁ₜ = dₜ·n₁ₜ/nₜ      V₁ₜ = dₜ·(n₁ₜ/nₜ)·(1−n₁ₜ/nₜ)·(nₜ−dₜ)/(nₜ−1)
        χ² = (Σ(d₁ₜ − E₁ₜ))² / ΣV₁ₜ          (1 df; V term 0 when nₜ = 1)

    Scale shape: subjects aggregate to the per-(group, duration) grain,
    the pooled time grid left-joins each group's leave counts (absent →
    0), at-risk sets are reverse cumulative sums over the bounded
    distinct-duration grid, and the statistic is one tiny aggregate over
    it — raw rows are touched exactly once. Exactly two groups (the
    lexicographically smaller is "group 1"); returns ONE row
    ``(observed_1, expected_1, variance, chi2)``, all rounded."""
    grp = F.col(group_col).cast("string")
    per_gt = (
        df.groupBy(grp.alias("g"), F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("d"),
            F.count(F.lit(1)).alias("tot"),
        )
    )
    groups = [r["g"] for r in per_gt.select("g").distinct().orderBy("g").collect()]
    if len(groups) != 2:
        raise ValueError(f"logrank_test needs exactly 2 groups, got {groups}")
    g1, g2 = groups
    times = per_gt.select("t").distinct()
    one = per_gt.where(F.col("g") == g1).select(
        "t", F.col("d").alias("d1"), F.col("tot").alias("tot1")
    )
    two = per_gt.where(F.col("g") == g2).select(
        "t", F.col("d").alias("d2"), F.col("tot").alias("tot2")
    )
    grid = (
        times.join(one, "t", "left")
        .join(two, "t", "left")
        .na.fill({"d1": 0, "tot1": 0, "d2": 0, "tot2": 0})
    )
    w_desc = W.orderBy(F.col("t").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    at_risk = grid.select(
        "t",
        "d1",
        "d2",
        F.sum("tot1").over(w_desc).alias("n1"),
        (F.sum("tot1").over(w_desc) + F.sum("tot2").over(w_desc)).alias("n"),
    )
    terms = at_risk.where((F.col("d1") + F.col("d2")) > 0).select(
        F.col("d1").cast("double").alias("d1"),
        (F.col("d1") + F.col("d2")).cast("double").alias("d"),
        F.col("n1").cast("double").alias("n1"),
        F.col("n").cast("double").alias("n"),
    )
    p = F.col("n1") / F.col("n")
    var = F.when(
        F.col("n") > 1.0,
        F.col("d") * p * (F.lit(1.0) - p) * (F.col("n") - F.col("d"))
        / (F.col("n") - 1.0),
    ).otherwise(F.lit(0.0))
    agg = terms.agg(
        F.sum("d1").alias("observed_1"),
        F.sum(F.col("d") * p).alias("expected_1"),
        F.sum(var).alias("variance"),
    )
    return agg.select(
        F.round("observed_1", round_dp).alias("observed_1"),
        F.round("expected_1", round_dp).alias("expected_1"),
        F.round("variance", round_dp).alias("variance"),
        F.round(
            F.pow(F.col("observed_1") - F.col("expected_1"), 2) / F.col("variance"),
            round_dp,
        ).alias("chi2"),
    )


#: cumulative Poisson(1) probabilities for k = 0..5 (weights cap at 6);
#: shared verbatim with SQL oracles so both engines draw identical weights
_POISSON1_CUM = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
)


def _lehmer_weight(seed: Column, b: int | Column) -> Column:
    """Poisson(1) weight from a 32-bit seed column and resample index
    (a Python int or an index Column): the seed streams through a
    3-round Lehmer mix (modulus 2^31−1, the classic MINSTD multipliers —
    every product stays < 2^48, so BOTH engines compute exact BIGINT
    arithmetic; no wrap-around, which DuckDB rejects), then inverts the
    Poisson(1) CDF. Pure integer math — ~10 codegen-friendly ops per
    weight, vs the md5-per-weight form whose 40 copies blew Janino's
    method limit and fell back to interpreted execution
    (13.7 s → 0.9 s at sf0.1)."""
    m = 2147483647
    z1 = (seed % m + 1 + b * 48271) % m
    z2 = (z1 * 69621) % m
    z3 = (z2 * 48271) % m
    u = z3.cast("double") / F.lit(float(m))
    w = F.lit(6)
    for k in reversed(range(6)):
        w = F.when(u < F.lit(_POISSON1_CUM[k]), F.lit(k)).otherwise(w)
    return w


def poisson_seed(key: Column, salt: str = "boot") -> Column:
    """32-bit md5-derived seed for :func:`_lehmer_weight` — ONE md5 + hex
    parse per row regardless of how many resamples consume it."""
    h = F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def poisson_weight(key: Column, b: int, salt: str = "boot") -> Column:
    """Deterministic Poisson(1) resample weight for row ``key`` in
    resample ``b`` (the distributed-bootstrap trick — Chamandy et al.
    2012, public: a with-replacement resample of N rows is ~ per-row
    independent Poisson(1) multiplicities, which needs NO global
    coordination). Composition of :func:`poisson_seed` +
    :func:`_lehmer_weight`; deterministic → SQL-replayable."""
    return _lehmer_weight(poisson_seed(key, salt), b)


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_resamples: int = 40,
    salt: str = "boot",
    round_dp: int = 4,
) -> DataFrame:
    """Bootstrap confidence interval for the mean via the POISSON
    bootstrap — the resampling scheme that actually distributes: classic
    bootstrap draws N rows WITH replacement (a global operation); the
    Poisson bootstrap replaces that with per-row independent Poisson(1)
    weights (:func:`poisson_weight`), so ALL ``n_resamples`` resample
    means come out of ONE scan as conditional weighted aggregates —
    map-side combinable, no shuffle beyond the single aggregate, no RNG
    state (hash-deterministic, replayable).

    The CI is the percentile method over the resample means: sorted
    ascending, ``lo`` = 2nd smallest and ``hi`` = 2nd largest (with the
    default B=40 a ~95% interval; the driver-side step is an
    arithmetic-on-B-numbers projection, not a collect). Returns one row
    ``(n, mean, ci_lo, ci_hi)``.

    Round-16 shape note (guide §1.2 step 2): the weighted sums were 2·B
    conditional aggregates in ONE agg call — a 82-expression aggregate
    whose per-call analysis + codegen cost ~3 s and whose single
    generated update path ran the whole 80-sum loop per row on one agg
    buffer. The resample index is now EXPLODED (b = −1 keeps the
    unweighted n/mean lane), the weight computed once per (row, b) in a
    codegen projection, and the sums come from a plain 3-aggregate
    ``groupBy(b)`` — map-side partials still collapse each task to B+1
    rows, so shuffle volume and the one-scan contract are unchanged
    (measured execution 1.7 → 0.9 s warm at sf0.1, end-to-end entry
    5.5 → ~1.5 s; same (n, mean, ci_lo, ci_hi) at 4 dp)."""
    if n_resamples < 4:
        raise ValueError("n_resamples must be >= 4")
    x = F.col(value_col).cast("double")
    # ONE md5-derived seed per row projects before an exchange (the
    # CollapseProject barrier + local-file parallelism); the per-(row, b)
    # weight is then 3 rounds of exact integer Lehmer mixing on that seed
    # column, computed once in the post-explode projection.
    seeded = df.select(
        x.alias("__x"), poisson_seed(F.col(key_col), salt).alias("__s")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    exploded = seeded.select(
        "__x", "__s", F.explode(F.lit(list(range(-1, n_resamples)))).alias("__b")
    )
    # b = -1 lane weight is isnotnull(x), not 1.0, so its sum(w·x)/sum(w)
    # reproduces avg()'s NULL-skipping denominator exactly (round-17 ADVICE
    # fix; the resample lanes keep the raw Poisson weight — their diluted
    # NULL semantics match the oracle's sum(w·value)/sum(w) replay).
    w = F.when(
        F.col("__b") == -1, F.col("__x").isNotNull().cast("double")
    ).otherwise(_lehmer_weight(F.col("__s"), F.col("__b")).cast("double"))
    per_b = (
        exploded.select(
            "__b", (w * F.col("__x")).alias("__wx"), w.alias("__w")
        )
        .groupBy("__b")
        .agg(
            F.sum("__wx").alias("__sx"),
            F.sum("__w").alias("__sw"),
            F.count(F.lit(1)).alias("__cnt"),
        )
    )
    mean_b = F.col("__sx") / F.col("__sw")
    resample_means = F.sort_array(
        F.collect_list(F.when(F.col("__b") >= 0, mean_b))
    )
    return per_b.agg(
        # coalesce: an EMPTY input produces zero (row, b) groups, and the
        # bare max would return n = NULL where the one-aggregate form (and
        # the oracle's count(*)) returns 0 (round-17 ADVICE fix)
        F.coalesce(
            F.max(F.when(F.col("__b") == -1, F.col("__cnt"))), F.lit(0).cast("long")
        ).alias("n"),
        F.round(F.max(F.when(F.col("__b") == -1, mean_b)), round_dp).alias("mean"),
        # try_element_at: on an EMPTY input the collected array has zero
        # elements and ANSI element_at would throw; every non-empty input
        # has exactly n_resamples elements, where try_ is identical
        F.round(F.try_element_at(resample_means, F.lit(2)), round_dp).alias("ci_lo"),
        F.round(
            F.try_element_at(resample_means, F.lit(n_resamples - 1)), round_dp
        ).alias("ci_hi"),
    )
