"""trino-ml plugin equivalents (functions/ml.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from trino_private_spark.functions.ml import (
    LinearModel,
    classify,
    evaluate_classifier_predictions,
    features,
    learn_classifier,
    learn_regressor,
    regress,
)


@pytest.fixture(scope="module")
def synth(spark):
    rng = np.random.default_rng(17)
    X = rng.normal(0, 1, (2000, 8))
    w_true = np.array([2.0, -3.0, 0.5, 0.0, 1.0, 0.0, -0.5, 4.0])
    margin = X @ w_true + 0.25
    y_cls = (margin > 0).astype(int)
    y_reg = margin
    rows = [
        (int(yc), float(yr), [float(v) for v in x])
        for yc, yr, x in zip(y_cls, y_reg, X)
    ]
    return spark.createDataFrame(
        rows, "label int, target double, feat array<double>"
    ).repartition(8)


class TestClassifier:
    def test_learn_and_classify_separable(self, synth):
        model = learn_classifier(synth, "label", "feat", iterations=60, lr=1.0)
        scored = synth.select("label", classify(F.col("feat"), model).alias("pred"))
        acc = scored.agg(
            F.avg((F.col("label") == F.col("pred")).cast("double"))
        ).head()[0]
        assert acc > 0.95

    def test_model_roundtrip(self, synth):
        model = learn_classifier(synth, "label", "feat", iterations=5)
        rt = LinearModel.deserialize(model.serialize())
        assert np.allclose(rt.weights, model.weights) and rt.bias == model.bias

    def test_scoring_is_jvm_side(self, synth):
        model = LinearModel(np.ones(8), 0.0, "classifier")
        plan = synth.select(
            classify(F.col("feat"), model).alias("p")
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestRegressor:
    def test_exact_recovery(self, synth):
        model = learn_regressor(synth, "target", "feat")
        # noiseless linear target -> near-exact recovery in ONE pass
        assert abs(model.bias - 0.25) < 1e-6
        preds = synth.select(
            "target", regress(F.col("feat"), model).alias("pred")
        ).toPandas()
        resid = (preds["target"] - preds["pred"]).abs().max()
        assert resid < 1e-6


class TestEvaluate:
    def test_counts_and_metrics(self, spark):
        df = spark.createDataFrame(
            [(1, 1)] * 6 + [(0, 1)] * 2 + [(1, 0)] * 1 + [(0, 0)] * 11,
            "actual int, predicted int",
        )
        out = evaluate_classifier_predictions(df, "actual", "predicted").head()
        assert (out["tp"], out["fp"], out["fn"], out["tn"]) == (6, 2, 1, 11)
        assert out["accuracy"] == round(17 / 20, 6)
        assert out["precision"] == 0.75
        assert out["recall"] == round(6 / 7, 6)


class TestFeatures:
    def test_features_constructor(self, spark):
        df = spark.createDataFrame([(1.0, 2, 3.5)], "a double, b int, c double")
        row = df.select(features("a", "b", "c").alias("f")).head()
        assert row["f"] == [1.0, 2.0, 3.5]
