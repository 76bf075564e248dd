"""Hyperparameter search (M4/M5 RandomizedSearchCV analog) and isotonic
calibration (M6 CalibratedClassifierCV analog) tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from exact_spark.ml.calibrate import CalibratedMarginDetector
from exact_spark.ml.search import DEFAULT_GRIDS, enumerate_grid, param_search, sample_grid


@pytest.fixture(scope="module")
def labeled_series(spark):
    """600-row series where large v1 values are labeled anomalous — cleanly
    separable so fits are fast and scores meaningful."""
    return (
        spark.range(1, 601)
        .select(
            F.col("id"),
            (10.0 + F.sin(F.col("id") / 15.0)
             + F.when(F.col("id") % 7 == 0, 20.0).otherwise(0.0)).alias("v1"),
            (5.0 + F.cos(F.col("id") / 10.0)).alias("v2"),
            (F.col("id") % 7 == 0).cast("int").alias("label"),
        )
        .cache()
    )


def test_grid_enumeration_and_seeded_sample():
    grid = DEFAULT_GRIDS["gbt"]
    combos = enumerate_grid(grid)
    assert len(combos) == 2 * 2 * 2 * 2
    assert all(set(c) == set(grid) for c in combos)
    s1 = sample_grid(grid, 5, seed=42)
    s2 = sample_grid(grid, 5, seed=42)
    assert s1 == s2 and len(s1) == 5
    # a different seed reorders the candidates
    assert sample_grid(grid, 16, seed=1) != sample_grid(grid, 16, seed=42)


def test_param_search_selects_deterministically(spark, labeled_series):
    df = labeled_series
    best1, res1 = param_search(df, "decision_tree", ["v1", "v2"], n_iter=3, k=3)
    best2, res2 = param_search(
        df.repartition(13), "decision_tree", ["v1", "v2"], n_iter=3, k=3
    )
    # selected params identical under repartitioning (the determinism
    # contract every seeded operation in this engine carries)
    assert best1 == best2
    assert res1 == res2
    assert sum(r["selected"] for r in res1) == 1
    sel = next(r for r in res1 if r["selected"])
    assert sel["f1"] == max(r["f1"] for r in res1)
    assert set(json.loads(sel["params"])) == set(DEFAULT_GRIDS["decision_tree"])


def test_isotonic_calibration_properties(spark, labeled_series):
    df = labeled_series
    model = CalibratedMarginDetector()
    model.run(df, ["v1", "v2"])
    rows = (
        model.predict_proba_df(df, ["v1", "v2"])
        .orderBy("margin")
        .collect()
    )
    probs = [r["proba"] for r in rows]
    # bounded in [0, 1]
    assert all(0.0 <= p <= 1.0 for p in probs)
    # monotone non-decreasing in the raw margin (isotonic contract)
    assert all(a <= b + 1e-12 for a, b in zip(probs, probs[1:]))
    # the calibrated probabilities actually separate the classes
    det = model.detect(df, ["v1", "v2"]).join(df.select("id", "label"), "id")
    agg = det.agg(
        F.sum(F.when((F.col("predicted") == 1) & (F.col("label") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("predicted") == 1) & (F.col("label") == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("predicted") == 0) & (F.col("label") == 1), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    assert agg["tp"] > 0
    prec = agg["tp"] / (agg["tp"] + agg["fp"])
    rec = agg["tp"] / (agg["tp"] + agg["fn"])
    assert prec > 0.9 and rec > 0.9
