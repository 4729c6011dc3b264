"""Runtime-prediction pipeline (reference models/RF): featurization gate,
QError semantics, end-to-end training signal.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakehouse_variance_spark.ml import predictor


def test_qerror_column_semantics(spark):
    df = spark.createDataFrame(
        [(10.0, 5.0), (5.0, 10.0), (2.0, 2.0), (0.0, 0.0005)], "y double, yhat double"
    )
    got = [
        r["q"]
        for r in df.select(
            F.round(predictor.qerror(F.col("y"), F.col("yhat")), 4).alias("q")
        ).collect()
    ]
    # symmetric over/under-prediction; floor kicks in at tiny values
    assert got[0] == got[1] == 2.0
    assert got[2] == 1.0
    assert got[3] == pytest.approx(0.0005 / 1e-3)


def test_featurize_pca_gate(spark, monkeypatch):
    df = spark.createDataFrame(
        [("select a from t",), ("select b from u",), ("select c from v",)],
        "text string",
    )
    _, narrow = predictor.featurize_text(df, "text", num_features=64)
    assert "Vector" in type(narrow.schema["features"].dataType).__name__
    assert narrow.select("features").first()["features"].size == 64
    # above the reference's width threshold, PCA compresses to pca_dims
    # (threshold lowered so the test doesn't decompose a 5000² Gramian)
    monkeypatch.setattr(predictor, "PCA_THRESHOLD", 32)
    _, wide = predictor.featurize_text(df, "text", num_features=64, pca_dims=3)
    assert wide.select("features").first()["features"].size == 3


def test_train_and_evaluate_learns_signal(spark):
    # label is a deterministic function of token count — RF must beat the
    # trivial error bound and produce finite qerrors.
    rows = [(i, "tok " * (i % 20 + 1), math.log(i % 20 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    _, feats = predictor.featurize_text(df, "text")
    model = predictor.train_runtime_model(feats)
    summary = predictor.evaluate_predictions(model.transform(feats)).collect()[0]
    assert summary["n"] == 200
    assert summary["mae"] < 0.2  # in-sample fit on a deterministic signal
    assert 1.0 <= summary["p50_qerror"] <= summary["p99_qerror"]
