"""Native second-order gradient boosting (M4): the XGBoost algorithm's
defining properties, verified without the library."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from exact_spark.ml.models import NativeXGBoostDetector, get_model


@pytest.fixture(scope="module")
def xor_frame(spark):
    """A pattern a depth-1 model cannot fit: label = XOR of two feature
    signs — separable only with depth >= 2 trees, the boosting test."""
    rows = []
    rng = np.random.RandomState(0)
    for i in range(800):
        a, b = rng.uniform(-1, 1), rng.uniform(-1, 1)
        rows.append((i, float(a), float(b), int((a > 0) != (b > 0))))
    return spark.createDataFrame(rows, "id long, v1 double, v2 double, label int")


def test_learns_xor(spark, xor_frame):
    model = get_model("xgboost", n_estimators=30, max_depth=3)
    model.run(xor_frame, ["v1", "v2"])
    det = model.detect(xor_frame, ["v1", "v2"]).join(
        xor_frame.select("id", "label"), "id"
    )
    acc = det.filter(F.col("predicted") == F.col("label")).count() / det.count()
    assert acc > 0.95


def test_margin_training_reduces_logloss(spark, xor_frame):
    pdf = xor_frame.toPandas().sort_values("id")
    x = pdf[["v1", "v2"]].to_numpy(dtype=np.float64)
    y = pdf["label"].to_numpy(dtype=np.float64)

    def logloss(model):
        p = np.clip(model._score_closure()(x), 1e-9, 1 - 1e-9)
        return float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())

    weak = get_model("xgboost", n_estimators=2, max_depth=3)
    weak.run(xor_frame, ["v1", "v2"])
    strong = get_model("xgboost", n_estimators=30, max_depth=3)
    strong.run(xor_frame, ["v1", "v2"])
    assert logloss(strong) < logloss(weak) * 0.5


def test_scale_pos_weight_raises_recall(spark):
    """The imbalance knob (XGBoost.py:83-92): on a 5% positive class with
    overlapping distributions, weighting positives must not lower recall
    and shifts the decision volume toward the positive class."""
    rng = np.random.RandomState(1)
    rows = []
    for i in range(2000):
        pos = rng.rand() < 0.05
        v = rng.normal(1.1 if pos else 0.0, 1.0)
        rows.append((i, float(v), int(pos)))
    frame = spark.createDataFrame(rows, "id long, v double, label int")

    def fit(spw):
        m = NativeXGBoostDetector(n_estimators=20, max_depth=2, scale_pos_weight=spw)
        m.run(frame, ["v"])
        det = m.detect(frame, ["v"]).join(frame.select("id", "label"), "id").toPandas()
        tp = ((det.predicted == 1) & (det.label == 1)).sum()
        fn = ((det.predicted == 0) & (det.label == 1)).sum()
        fp = (det.predicted == 1).sum()
        return tp / max(tp + fn, 1), fp

    r1, n1 = fit(1.0)
    r10, n10 = fit(10.0)
    assert r10 >= r1
    assert n10 > n1  # more of the space predicted positive


def test_deterministic_under_repartition(spark, xor_frame):
    a = get_model("xgboost", n_estimators=5)
    a.run(xor_frame, ["v1", "v2"])
    b = get_model("xgboost", n_estimators=5)
    b.run(xor_frame.repartition(11), ["v1", "v2"])
    for ta, tb in zip(a.trees, b.trees):
        for k in ta:
            np.testing.assert_array_equal(ta[k], tb[k])
    assert a.base_margin == b.base_margin
