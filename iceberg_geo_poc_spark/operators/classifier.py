"""Distributed quality-classifier training (logistic regression).

Every production corpus pipeline trains a lightweight quality
classifier (the fastText-/CCNet-style filter) over cheap text features
and scores the whole corpus with it.  This module implements that
lifecycle Spark-first:

- TRAINING is batch gradient descent where each iteration is ONE
  codegen aggregation pass: the gradient of the logistic loss is a sum
  over rows of ``(sigmoid(w.x) - y) * x_j``, which Spark computes as a
  partial-agg (map-side combined) ``agg(sum(...))`` — the exact shape
  MLlib's optimizers use.  The driver holds only the weight vector
  (a few floats); per-iteration cost at 100 TB is one scan of the
  cached feature columns, never a collect.
- SCORING is a pure-codegen sigmoid expression — zero Python in the
  hot path, so corpus-wide scoring rides whole-stage codegen.

Determinism: full-batch gradients (no sampling) make training exactly
reproducible across partitionings, so tests can pin accuracy
contracts and the driver query's booleans are stable.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _z(feature_cols: list[str], weights: list[float]) -> Column:
    z = F.lit(float(weights[0]))  # intercept
    for c, w in zip(feature_cols, weights[1:]):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iters: int = 30,
    lr: float = 1.0,
) -> list[float]:
    """Full-batch gradient descent; returns [intercept, w1, ...].

    One aggregation job per iteration; the input should be cached by
    the caller when iterating over a recomputed-expensive source."""
    weights = [0.0] * (len(feature_cols) + 1)
    n = df.count()
    if n == 0:
        raise ValueError("empty training set")
    for _ in range(n_iters):
        err = _sigmoid(_z(feature_cols, weights)) - F.col(label_col).cast("double")
        grads = df.agg(
            F.sum(err).alias("g0"),
            *[
                F.sum(err * F.col(c)).alias(f"g{j + 1}")
                for j, c in enumerate(feature_cols)
            ],
        ).first()
        weights = [
            w - lr * float(grads[f"g{j}"]) / n for j, w in enumerate(weights)
        ]
    return weights


def score_logreg(
    df: DataFrame, feature_cols: list[str], weights: list[float]
) -> DataFrame:
    """Append ``quality_prob`` (sigmoid) and ``quality_pred`` (0/1)."""
    p = _sigmoid(_z(feature_cols, weights))
    return df.withColumn("quality_prob", p).withColumn(
        "quality_pred", (p >= F.lit(0.5)).cast("int")
    )


def accuracy(scored: DataFrame, label_col: str) -> float:
    row = scored.agg(
        F.avg(
            (F.col("quality_pred") == F.col(label_col).cast("int")).cast("double")
        ).alias("acc")
    ).first()
    return float(row["acc"])


def standardized(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Z-score features in one aggregation pass (numerics for GD);
    constant columns pass through centered at zero."""
    stats = df.agg(
        *[F.avg(c).alias(f"m_{c}") for c in feature_cols],
        *[F.stddev_pop(c).alias(f"s_{c}") for c in feature_cols],
    ).first()
    out = df
    for c in feature_cols:
        m = float(stats[f"m_{c}"])
        s = float(stats[f"s_{c}"]) or 1.0
        out = out.withColumn(c, (F.col(c) - F.lit(m)) / F.lit(s))
    return out


def logistic(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
