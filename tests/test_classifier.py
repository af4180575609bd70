"""Distributed logistic-regression quality classifier
(operators/classifier.py): exact-gradient parity with a numpy
reference, separable-data recovery, partitioning determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from iceberg_geo_poc_spark.operators.classifier import (
    accuracy,
    score_logreg,
    standardized,
    train_logreg,
)


def _np_train(X, y, n_iters, lr):
    w = np.zeros(X.shape[1] + 1)
    Xb = np.hstack([np.ones((len(X), 1)), X])
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        w -= lr * (Xb.T @ (p - y)) / len(X)
    return w


@pytest.fixture()
def toy(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(200, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(int)
    pdf = pd.DataFrame({"a": X[:, 0], "b": X[:, 1], "label": y})
    return spark.createDataFrame(pdf), X, y


def test_gradient_descent_matches_numpy_reference(toy):
    df, X, y = toy
    w = train_logreg(df, ["a", "b"], "label", n_iters=25, lr=0.7)
    ref = _np_train(X, y, 25, 0.7)
    assert np.allclose(w, ref, rtol=1e-9, atol=1e-9)


def test_separable_data_recovered(toy):
    df, X, y = toy
    w = train_logreg(df, ["a", "b"], "label", n_iters=60, lr=2.0)
    scored = score_logreg(df, ["a", "b"], w)
    assert accuracy(scored, "label") >= 0.95
    # learned direction matches the generating rule (a dominant, both +)
    assert w[1] > 0 and w[2] > 0 and w[1] > w[2]


def test_training_is_partitioning_invariant(toy):
    df, _, _ = toy
    w1 = train_logreg(df, ["a", "b"], "label", n_iters=10, lr=1.0)
    w2 = train_logreg(df.repartition(13), ["a", "b"], "label", n_iters=10, lr=1.0)
    assert np.allclose(w1, w2, rtol=1e-12, atol=1e-12)


def test_standardized_zero_mean_unit_var(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0], "c": [5.0] * 4})
    out = standardized(spark.createDataFrame(pdf), ["a", "c"]).toPandas()
    assert abs(out["a"].mean()) < 1e-12
    assert abs(out["a"].std(ddof=0) - 1.0) < 1e-12
    assert (out["c"] == 0.0).all()  # constant column centered, not blown up
