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
