"""XAI operator tests (X1-X6 shape, G6 NDCG, W3 selection)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from exact_spark.ml.explain import (
    aggregate_importances,
    ndcg_at_k,
    ndcg_ground_truth,
    occlusion_importances,
    run_explanations,
    select_instances,
)
from exact_spark.ml.models import get_model
from exact_spark.operators.inject import AnomalySetting, inject_anomalies


def test_ndcg_properties():
    # perfect ranking => 1.0
    assert ndcg_at_k(["a", "b", "c"], {"a"}, 3) == 1.0
    assert ndcg_at_k(["a", "b", "c", "d"], {"a", "b"}, 3) == 1.0
    # no ground truth => 0.0 (utils.py:309-310)
    assert ndcg_at_k(["a", "b"], set(), 5) == 0.0
    # worst placement < perfect
    worst = ndcg_at_k(["x", "y", "a"], {"a"}, 3)
    assert 0 < worst < 1.0
    assert worst == pytest.approx(1.0 / math.log2(4))


@pytest.fixture(scope="module")
def injected_series(spark):
    base = spark.range(1, 601).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("timestamp"),
        (10.0 + F.sin(F.col("id") / 15.0)).alias("v1"),
        (5.0 + F.cos(F.col("id") / 10.0)).alias("v2"),
        F.lit(0).alias("label"),
        F.lit(False).alias("injected_anomaly"),
        F.lit(False).alias("is_anomaly"),
    )
    start = 1700000000 + 60
    settings = [
        AnomalySetting("custom", 400 * 60, 60 * 60, magnitude=30.0,
                       percentage=100.0, columns=["v1"])
    ]
    return inject_anomalies(base, settings, start).cache(), settings, start


def test_w3_selection_strategies(spark, injected_series):
    df, _, _ = injected_series
    for strat in ("first_n", "random", "first_n_anomalies", "last_n_anomalies",
                  "random_anomalies", "half_n_half"):
        got = select_instances(df, strat, 10)
        assert got.count() == 10, strat
    anoms = select_instances(df, "random_anomalies", 10)
    assert all(r["label"] == 1 for r in anoms.collect())
    # seeded => deterministic
    a = sorted(r["id"] for r in select_instances(df, "random", 10).collect())
    b = sorted(r["id"] for r in select_instances(df, "random", 10).collect())
    assert a == b


def test_occlusion_explains_injected_column(spark, injected_series):
    df, settings, start = injected_series
    model = get_model("pca_autoencoder")
    train = df.filter(F.col("id") <= 390)
    model.run(train, ["v1", "v2"])

    result = run_explanations(
        model, df, ["v1", "v2"], settings, start, strategy="random_anomalies",
        n_instances=15,
    )
    agg = result["aggregated_feature_importances"]
    # the spiked column must dominate the attribution
    assert agg["v1"] > 10 * agg["v2"]
    # ground truth = {v1}; top-ranked = v1 => perfect NDCG
    assert result["ndcg_at_3"] == 1.0
    assert result["execution_time_xai_occlusion_seconds"] >= 0


def test_ground_truth_interval_matching(injected_series):
    _, settings, start = injected_series
    truth = ndcg_ground_truth(
        {1: start + 400 * 60, 2: start + 400 * 60 + 59 * 60, 3: start + 461 * 60},
        settings, start,
    )
    assert truth[1] == {"v1"} and truth[2] == {"v1"} and truth[3] == set()
