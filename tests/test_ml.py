"""Metric-tolerance tests for the MLlib surface (SURVEY §5.4: ML parity is
by metric bounds, not row identity — I1 sampling differs from sklearn)."""

from __future__ import annotations

import json
import os

from wnba_data_pipeline_spark.operators import ml

from .conftest import SF_ORACLE


def test_regressor_metrics_and_importances(spark):
    r = ml.train_regressor(spark, SF_ORACLE)
    assert r["n_train"] + r["n_test"] == 100  # sf0.01 has 100 suppliers
    assert r["n_test"] > 0
    assert r["mse"] >= 0.0
    assert -1.0 <= r["r2"] <= 1.0
    total = sum(r["importances"].values())
    assert abs(total - 1.0) < 1e-6
    assert set(r["importances"]) == set(ml.REG_FEATURES)
    # fit-only scaler exists and carries the training stats
    assert r["scaler"].mean.size == len(ml.REG_FEATURES)


def test_classifier_beats_chance(spark):
    r = ml.train_classifier(spark, SF_ORACLE)
    # price_mean correlates with qty via extendedprice; RF must beat coin flip
    assert r["accuracy"] >= 0.5
    assert abs(sum(r["importances"].values()) - 1.0) < 1e-6


def test_artifact_sinks(spark, tmp_path):
    r = ml.train_regressor(spark, SF_ORACLE)
    out = ml.save_artifacts(r, str(tmp_path), "reg")
    assert os.path.isdir(out["model_path"])  # MLlib model directory
    with open(out["metadata_path"]) as f:
        meta = json.load(f)
    assert meta["n_train"] == r["n_train"]
    assert set(meta["importances"]) == set(ml.REG_FEATURES)
    # reload round-trip
    from pyspark.ml.regression import RandomForestRegressionModel

    loaded = RandomForestRegressionModel.load(out["model_path"])
    assert loaded.getNumTrees == ml.NUM_TREES
