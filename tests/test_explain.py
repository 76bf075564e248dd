"""XAI operator tests (X1-X6 shape, G6 NDCG, W3 selection)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from exact_spark.ml.explain import (
    METHODS,
    aggregate_importances,
    model_proba_fn,
    ndcg_at_k,
    ndcg_ground_truth,
    occlusion_importances,
    permutation_importances,
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


def test_both_methods_explain_injected_column(spark, injected_series, tmp_path):
    df, settings, start = injected_series
    model = get_model("pca_autoencoder")
    train = df.filter(F.col("id") <= 390)
    model.run(train, ["v1", "v2"])

    result = run_explanations(
        model, df, ["v1", "v2"], settings, start, strategy="random_anomalies",
        n_instances=15, output_dir=str(tmp_path), job_name="xai_demo",
    )
    assert result["methods"] == list(METHODS)
    for m in METHODS:
        r = result["per_method"][m]
        agg = r["aggregated_feature_importances"]
        # the spiked column must dominate the attribution for BOTH methods
        assert agg["v1"] > 10 * agg["v2"], m
        # ground truth = {v1}; top-ranked = v1 => perfect NDCG
        assert r["ndcg_at_3"] == 1.0, m
        assert r[f"execution_time_xai_{m}_seconds"] >= 0
    # X7 in-contract slice: the sidecar the frontend reads
    # (xai_runner.py:858-868) exists and matches the returned dicts
    import json as _json

    sidecar = tmp_path / "xai_demo" / "aggregated_feature_importances.json"
    assert sidecar.exists()
    assert result["aggregated_feature_importances_path"] == str(sidecar)
    on_disk = _json.loads(sidecar.read_text())
    assert on_disk == {
        m: result["per_method"][m]["aggregated_feature_importances"]
        for m in METHODS
    }
    # X7 DiCE artifact: per-instance original-vs-CF CSVs exist and carry
    # the original row (xai_visualizations.py:253-397's layout)
    dice_dir = tmp_path / "xai_demo" / "DiCE"
    assert result["dice_artifact_dir"] == str(dice_dir)
    csvs = list(dice_dir.glob("counterfactuals_instance_*.csv"))
    assert csvs, "no DiCE CSV artifacts written"
    import pandas as _pd

    one = _pd.read_csv(csvs[0])
    assert {"type", "cf_index", "v1", "v2"} <= set(one.columns)
    assert (one["type"] == "original").sum() == 1
    # X7 SHAP artifact: one signed-phi waterfall SVG per explained
    # instance (xai_visualizations.py:147-175's shap.plots.waterfall)
    import xml.etree.ElementTree as _ET

    wf = sorted((tmp_path / "xai_demo" / "SHAP").glob("waterfall_instance_*.svg"))
    assert len(wf) == result["n_instances"]
    assert result["shap_waterfall_paths"] == [str(p) for p in wf]
    for p in wf[:3]:
        root = _ET.fromstring(p.read_text())  # well-formed XML
        ns = "{http://www.w3.org/2000/svg}"
        assert root.findall(f"{ns}rect"), p.name  # signed bars present


def test_permutation_deterministic_under_repartition(spark, injected_series):
    df, settings, start = injected_series
    model = get_model("pca_autoencoder")
    model.run(df.filter(F.col("id") <= 390), ["v1", "v2"])
    inst = select_instances(df, "random_anomalies", 12)

    def agg_of(instances):
        imps = permutation_importances(model, instances, ["v1", "v2"])
        return {
            r["feature"]: round(r["mean_abs_importance"], 9)
            for r in aggregate_importances(imps).collect()
        }

    assert agg_of(inst) == agg_of(inst.repartition(7))


def test_model_proba_contract(spark, injected_series):
    """M8 (model_wrapper.py:147-242 + lstm.py:331-388): (N,2) shape, rows
    sum to 1, monotone in raw score, P(anomaly)=0.5 at the threshold,
    NaN rows -> neutral, empty input -> (0,2)."""
    import numpy as np

    df, _, _ = injected_series
    model = get_model("threshold")
    model.run(df.filter(F.col("id") <= 390), ["v1", "v2"])
    proba = model_proba_fn(model, ["v1", "v2"])

    x = np.array([[model.thr - 5.0, 0.0], [model.thr, 0.0], [model.thr + 5.0, 0.0]])
    p = proba(x)
    assert p.shape == (3, 2)
    assert np.allclose(p.sum(axis=1), 1.0)
    assert p[0, 1] < p[1, 1] < p[2, 1]  # monotone in score
    assert p[1, 1] == pytest.approx(0.5)  # sigmoid centered at threshold
    assert (p >= 0).all() and (p <= 1).all()

    p_nan = proba(np.array([[np.nan, 0.0]]))
    assert p_nan[0, 0] == 0.5 and p_nan[0, 1] == 0.5
    assert proba(np.empty((0, 2))).shape == (0, 2)

    # MLlib models have no picklable score fn -> neutral fallback
    # (model_wrapper.py:167-170)
    mllib = get_model("decision_tree")
    neutral = model_proba_fn(mllib, ["v1", "v2"])(x)
    assert (neutral == 0.5).all()


def test_ground_truth_interval_matching(injected_series):
    _, settings, start = injected_series
    truth = ndcg_ground_truth(
        {1: start + 400 * 60, 2: start + 400 * 60 + 59 * 60, 3: start + 461 * 60},
        settings, start,
    )
    assert truth[1] == {"v1"} and truth[2] == {"v1"} and truth[3] == set()


def test_intgrad_completeness_axiom(spark, injected_series):
    """IG's defining axiom: signed attributions sum to score(x) - score(
    baseline) up to quadrature/finite-difference error."""
    import numpy as np

    from exact_spark.ml.explain import _extract_score_fn

    df, _, _ = injected_series
    model = get_model("pca_autoencoder")
    train = df.filter(F.col("id") <= 390)
    model.run(train, ["v1", "v2"])
    score_fn = _extract_score_fn(model, ["v1", "v2"])

    stats = train.agg(
        F.avg("v1").alias("m1"), F.avg("v2").alias("m2"),
        F.stddev("v1").alias("s1"), F.stddev("v2").alias("s2"),
    ).collect()[0]
    means = np.array([stats["m1"], stats["m2"]])
    stds = np.maximum(np.array([stats["s1"], stats["s2"]]), 1e-6)

    rows = df.filter(F.col("label") == 1).orderBy("id").limit(5).collect()
    n_steps, m = 64, 2
    h = stds * 1e-3
    alphas = (np.arange(n_steps) + 0.5) / n_steps
    for r in rows:
        x = np.array([r["v1"], r["v2"]])
        path = means[None, :] + alphas[:, None] * (x - means)[None, :]
        plus = np.repeat(path, m, axis=0)
        minus = plus.copy()
        idx = np.tile(np.arange(m), n_steps)
        plus[np.arange(n_steps * m), idx] += h[idx]
        minus[np.arange(n_steps * m), idx] -= h[idx]
        sc = score_fn(np.vstack([plus, minus]))
        grads = (sc[: n_steps * m] - sc[n_steps * m :]) / (2.0 * h[idx])
        attr = (x - means) * grads.reshape(n_steps, m).mean(axis=0)
        total = float(score_fn(x[None])[0] - score_fn(means[None])[0])
        assert abs(attr.sum() - total) <= max(0.05 * abs(total), 1e-4)
