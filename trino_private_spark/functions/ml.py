"""ML functions — the ``plugin/trino-ml`` surface re-expressed Spark-first.

Reference: ``plugin/trino-ml/src/main/java/io/trino/plugin/ml/`` —
``LearnClassifierAggregation.java`` / ``LearnRegressorAggregation.java``
(aggregate a training set into a varbinary model), ``ClassifyFunction.java``
/ ``RegressFunction.java`` (apply a model to a feature vector),
``EvaluateClassifierPredictionsAggregation.java`` (precision/recall
summary), ``MLFeatures.java`` ``features(...)`` constructor.  The reference
delegates training to libsvm; here the models are trained with
numpy-on-Spark primitives so the whole path is dependency-free and
distributed:

- ``learn_classifier``: logistic regression by full-batch gradient descent.
  Each pass is ONE distributed scan — ``mapInPandas`` emits per-partition
  gradient partials (a (dim+1)-vector), the driver sums and steps.  This is
  the treeAggregate pattern MLlib uses; at 100 TB each pass streams, and
  only O(dim) bytes ever reach the driver.
- ``learn_regressor``: exact ridge-regularized least squares in ONE pass —
  per-partition partials of X'X and X'y, solved on the driver.
- ``classify`` / ``regress``: pure JVM-side column expressions
  (``zip_with`` + ``aggregate`` dot product against the broadcast weight
  literal) — no Python in the scoring hot path.
- ``evaluate_classifier_predictions``: single distributed aggregation
  returning accuracy/precision/recall/F1 (the reference formats the same
  counts as text).

Feature vectors are ``array<float|double>`` columns (the fixture's
``embeddings.embedding``); ``features(...)`` builds one from scalar
columns like the reference's map-based constructor.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "features",
    "learn_classifier",
    "learn_regressor",
    "classify",
    "regress",
    "evaluate_classifier_predictions",
    "LinearModel",
]


@dataclass
class LinearModel:
    """weights (dim,) + bias; kind 'classifier' (logistic) or 'regressor'."""

    weights: np.ndarray
    bias: float
    kind: str

    def serialize(self) -> bytes:
        return pickle.dumps(
            {"w": self.weights.tolist(), "b": self.bias, "kind": self.kind},
            protocol=4,
        )

    @staticmethod
    def deserialize(b: bytes) -> "LinearModel":
        d = pickle.loads(bytes(b))
        return LinearModel(np.asarray(d["w"], dtype=float), float(d["b"]), d["kind"])


def features(*cols) -> Column:
    """features(x1, x2, ...) -> array<double> (MLFeatures.java builds a
    0-indexed map; an array is the dense equivalent)."""
    return F.array(*[F.col(c).cast("double") if isinstance(c, str) else c.cast("double") for c in cols])


def _dot(features_col, model: LinearModel) -> Column:
    """JVM-side dot(w, x) + b via zip_with + aggregate (whole-stage
    codegen; no Python in scoring)."""
    w = F.array(*[F.lit(float(v)) for v in model.weights])
    prod = F.zip_with(features_col, w, lambda a, b: a.cast("double") * b)
    return (
        F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x) + F.lit(model.bias)
    )


def learn_classifier(
    df: DataFrame,
    label_col: str,
    features_col: str,
    iterations: int = 50,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> LinearModel:
    """Distributed logistic regression (LearnClassifierAggregation).

    Labels must be 0/1.  Each iteration runs one scan producing
    per-partition gradient partials; the driver applies the step."""
    dim = int(df.select(F.size(features_col).alias("d")).head()["d"])
    w = np.zeros(dim)
    b = 0.0
    src = df.select(
        F.col(label_col).cast("double").alias("_y"), F.col(features_col).alias("_x")
    ).cache()
    n_total = src.count()

    # Small-input fast path: one collect, then iterate locally. This is
    # exactly what the reference does at ANY size — its
    # LearnClassifierAggregation accumulates every row into the
    # aggregation state and trains single-node (learn_libsvm_*). We keep
    # the distributed per-iteration scan for inputs that don't fit.
    if n_total * dim <= 8_000_000:
        pdf = src.toPandas()
        X = np.vstack(pdf["_x"].map(np.asarray).to_numpy()).astype(float)
        y = pdf["_y"].to_numpy(dtype=float)
        for _ in range(iterations):
            z = X @ w + b
            p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
            err = p - y
            w -= lr * ((X.T @ err) / n_total + l2 * w)
            b -= lr * float(err.sum()) / n_total
        src.unpersist()
        return LinearModel(w, b, "classifier")

    schema = "grad array<double>, gb double, cnt long"

    for _ in range(iterations):
        wb = w.copy()
        bb = b

        def partial(batches, wb=wb, bb=bb):
            g = np.zeros(len(wb))
            gb = 0.0
            cnt = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.vstack(pdf["_x"].map(np.asarray).to_numpy()).astype(float)
                y = pdf["_y"].to_numpy(dtype=float)
                z = X @ wb + bb
                p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
                err = p - y
                g += X.T @ err
                gb += float(err.sum())
                cnt += len(y)
            yield pd.DataFrame({"grad": [g.tolist()], "gb": [gb], "cnt": [cnt]})

        parts = src.mapInPandas(partial, schema).collect()
        g = np.sum([np.asarray(r["grad"]) for r in parts], axis=0)
        gb = sum(r["gb"] for r in parts)
        w -= lr * (g / n_total + l2 * w)
        b -= lr * gb / n_total
    src.unpersist()
    return LinearModel(w, b, "classifier")


def learn_regressor(
    df: DataFrame, y_col: str, features_col: str, l2: float = 1e-6
) -> LinearModel:
    """Exact ridge least squares in ONE distributed pass
    (LearnRegressorAggregation): partial X'X / X'y per partition, solve on
    the driver.  O(dim^2) driver memory, O(n) scan."""
    dim = int(df.select(F.size(features_col).alias("d")).head()["d"])
    src = df.select(
        F.col(y_col).cast("double").alias("_y"), F.col(features_col).alias("_x")
    )
    d1 = dim + 1  # bias column appended
    schema = "xtx array<double>, xty array<double>"

    def partial(batches):
        xtx = np.zeros((d1, d1))
        xty = np.zeros(d1)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["_x"].map(np.asarray).to_numpy()).astype(float)
            X = np.hstack([X, np.ones((len(X), 1))])
            y = pdf["_y"].to_numpy(dtype=float)
            xtx += X.T @ X
            xty += X.T @ y
        yield pd.DataFrame({"xtx": [xtx.ravel().tolist()], "xty": [xty.tolist()]})

    parts = src.mapInPandas(partial, schema).collect()
    xtx = np.sum([np.asarray(r["xtx"]).reshape(d1, d1) for r in parts], axis=0)
    xty = np.sum([np.asarray(r["xty"]) for r in parts], axis=0)
    xtx += l2 * np.eye(d1)
    sol = np.linalg.solve(xtx, xty)
    return LinearModel(sol[:dim], float(sol[dim]), "regressor")


def classify(features_col, model: LinearModel) -> Column:
    """Predicted 0/1 label (ClassifyFunction) — JVM-side."""
    return (_dot(features_col, model) > 0).cast("int")


def regress(features_col, model: LinearModel) -> Column:
    """Predicted value (RegressFunction) — JVM-side."""
    return _dot(features_col, model)


def evaluate_classifier_predictions(
    df: DataFrame, actual_col: str, predicted_col: str
) -> DataFrame:
    """Accuracy/precision/recall/F1 for binary 0/1 labels in one
    aggregation (EvaluateClassifierPredictionsAggregation reports the same
    counts)."""
    a = F.col(actual_col).cast("int")
    p = F.col(predicted_col).cast("int")
    agg = df.agg(
        F.sum(((a == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((a == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((a == 1) & (p == 0)).cast("long")).alias("fn"),
        F.sum(((a == 0) & (p == 0)).cast("long")).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round((tp + tn) / (tp + fp + fn + tn), 6).alias("accuracy"),
        F.round(tp / F.greatest(tp + fp, F.lit(1)), 6).alias("precision"),
        F.round(tp / F.greatest(tp + fn, F.lit(1)), 6).alias("recall"),
        F.round(2 * tp / F.greatest(2 * tp + fp + fn, F.lit(1)), 6).alias("f1"),
    )
