"""Logistic-regression quality classifier (operators/classify.py):
numpy-reference equivalence of the fixed-iteration rounded-gradient spec,
separability sanity, scoring contract, validation, and plan shape."""

from __future__ import annotations

import math
import random

import pytest

from zio_analytics_spark.operators.classify import logreg_score, logreg_train


def _naive_train(rows, d, n_iters, lr):
    w = [0.0] * (d + 1)
    out = []
    for it in range(n_iters):
        sums = [0.0] * (d + 1)
        for r in rows:
            y, xs = r[0], r[1:]
            z = w[0] + sum(wj * x for wj, x in zip(w[1:], xs))
            err = y - 1.0 / (1.0 + math.exp(-z))
            sums[0] += err
            for j, x in enumerate(xs):
                sums[j + 1] += x * err
        for j in range(d + 1):
            g = round(sums[j] / len(rows), 6)
            w[j] = round(w[j] + lr * g, 10)
            out.append((it, j, g, w[j]))
    return out


def test_matches_naive_reference(spark):
    rng = random.Random(5)
    rows = []
    for _ in range(400):
        x1, x2 = rng.uniform(-2, 2), rng.uniform(-2, 2)
        y = 1.0 if x1 + 0.5 * x2 + rng.uniform(-0.8, 0.8) > 0 else 0.0
        rows.append((y, x1, x2))
    df = spark.createDataFrame(rows, "label double, f1 double, f2 double")
    got = [
        (r["iter"], r["j"], r["grad"], r["w"])
        for r in logreg_train(df, ["f1", "f2"], n_iters=4, lr=0.5)
        .orderBy("iter", "j")
        .collect()
    ]
    want = _naive_train(rows, 2, 4, 0.5)
    assert len(got) == len(want) == 12
    for (gi, gj, gg, gw), (wi, wj, wg, ww) in zip(got, want):
        assert (gi, gj) == (wi, wj)
        assert gg == pytest.approx(wg, abs=2e-6)
        assert gw == pytest.approx(ww, abs=2e-6)


def test_learns_separable_data(spark):
    rows = [(1.0, 1.0 + 0.01 * i) for i in range(50)] + [
        (0.0, -1.0 - 0.01 * i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "label double, f double")
    trained = logreg_train(df, ["f"], n_iters=8, lr=1.0).collect()
    final = {r["j"]: r["w"] for r in trained if r["iter"] == 7}
    assert final[1] > 0.5  # positive slope separates the classes
    scored = logreg_score(df, [final[0], final[1]], ["f"]).collect()
    for r in scored:
        assert (r["score"] > 0.5) == (r["label"] == 1.0)


def test_score_is_rounded_sigmoid(spark):
    df = spark.createDataFrame([(2.0,), (-2.0,), (0.0,)], "f double")
    got = {r["f"]: r["score"] for r in logreg_score(df, [0.5, 1.0], ["f"]).collect()}
    for f, s in got.items():
        assert s == round(1.0 / (1.0 + math.exp(-(0.5 + f))), 6)


def test_validation(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "label double, f double")
    with pytest.raises(ValueError):
        logreg_train(df, [], n_iters=1)
    with pytest.raises(ValueError):
        logreg_train(df, ["f"], n_iters=0)
    with pytest.raises(ValueError):
        logreg_score(df, [0.0], ["f"])


def test_plan_no_udf_no_shuffle_on_score(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "f double")
    plan = (
        logreg_score(df, [0.1, 0.2], ["f"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure per-row expression, fused
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
