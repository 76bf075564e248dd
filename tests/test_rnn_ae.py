"""LSTM autoencoder (M1 recurrence, lstm.py:89-115 analog): per-gate BPTT
gradient check, long-range memory the Elman cell lacked, order sensitivity
(the property no feed-forward AE has), and end-to-end anomaly detection on
windowed data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from exact_spark.ml.models import RecurrentAutoencoderDetector, _sigmoid, get_model


def _tiny_params(rng, hdim=3):
    """8-param LSTM layout: gate blocks [i|f|o|g] stacked to width 4H
    (the three sigmoid gates contiguous, candidate g last — matches
    models.py's _cell slicing)."""
    return [
        rng.normal(0, 0.5, (1, 4 * hdim)),      # Wxe
        rng.normal(0, 0.5, (hdim, 4 * hdim)),   # Whe
        rng.normal(0, 0.1, 4 * hdim),           # be
        rng.normal(0, 0.5, (hdim, 4 * hdim)),   # Wxd
        rng.normal(0, 0.5, (hdim, 4 * hdim)),   # Whd
        rng.normal(0, 0.1, 4 * hdim),           # bd
        rng.normal(0, 0.5, (hdim, 1)),          # Wo
        rng.normal(0, 0.1, 1),                  # bo
    ]


def test_bptt_matches_finite_differences():
    """Central finite differences over EVERY entry of all 8 parameter
    tensors — each gate's input/recurrent/bias block is covered, so the
    i/f/g/o chain rules and the cell-state carry are each pinned."""
    rng = np.random.default_rng(0)
    p = _tiny_params(rng)
    xb = rng.normal(0, 1, (4, 5))
    _, grads = RecurrentAutoencoderDetector._loss_grads(xb, p)
    eps = 1e-6
    for i in range(len(p)):
        num = np.zeros_like(p[i])
        it = np.nditer(p[i], flags=["multi_index"])
        for _ in it:
            idx = it.multi_index
            p[i][idx] += eps
            lp, _ = RecurrentAutoencoderDetector._loss_grads(xb, p)
            p[i][idx] -= 2 * eps
            lm, _ = RecurrentAutoencoderDetector._loss_grads(xb, p)
            p[i][idx] += eps
            num[idx] = (lp - lm) / (2 * eps)
        np.testing.assert_allclose(grads[i], num, rtol=1e-4, atol=1e-7,
                                   err_msg=f"param {i}")


def test_sigmoid_is_stable_and_correct():
    a = np.array([-750.0, -30.0, 0.0, 30.0, 750.0])
    s = _sigmoid(a)
    assert not np.isnan(s).any()
    np.testing.assert_allclose(s[2], 0.5)
    np.testing.assert_allclose(s, 1.0 - _sigmoid(-a), atol=1e-15)


def test_forget_gate_carries_cell_state():
    """With the forget gate saturated open and input gate shut, c_t must
    persist unchanged — the gating structure, not just a tanh recurrence."""
    hdim = 2
    wx = np.zeros((1, 4 * hdim))
    wh = np.zeros((hdim, 4 * hdim))
    b = np.zeros(4 * hdim)
    b[:hdim] = -30.0          # input gate ~0
    b[hdim:2 * hdim] = 30.0   # forget gate ~1
    c0 = np.array([[0.7, -0.3]])
    h, c, _ = RecurrentAutoencoderDetector._lstm_step(
        np.array([[1.0]]), np.zeros((1, hdim)), c0, wx, wh, b, hdim)
    np.testing.assert_allclose(c, c0, atol=1e-9)
    # and with forget gate shut the state is erased
    b[hdim:2 * hdim] = -30.0
    _, c2, _ = RecurrentAutoencoderDetector._lstm_step(
        np.array([[1.0]]), np.zeros((1, hdim)), c0, wx, wh, b, hdim)
    np.testing.assert_allclose(c2, 0.0, atol=1e-9)


def test_long_range_memory_beats_elman_style_decay():
    """A first-step impulse must still be present in the CELL STATE after
    40 zero steps when the forget gates are open: c_t = f*c_{t-1} + i*g is
    an additive carry with Jacobian ~f≈1, where a plain tanh recurrence
    (|Whh|<1 contraction — the old Elman cell) decays the same impulse
    geometrically to numerical dust."""
    rng = np.random.default_rng(9)
    hdim = 4
    p = _tiny_params(rng, hdim=hdim)
    p[2][hdim:2 * hdim] = 30.0  # saturate forget gates open: c integrates
    d_len = 41
    x0 = np.zeros((1, d_len))
    x1 = x0.copy()
    x1[0, 0] = 1.0  # impulse at t=0 only
    _, _, enc0, _, _ = RecurrentAutoencoderDetector._forward(x0, p, keep_states=True)
    _, _, enc1, _, _ = RecurrentAutoencoderDetector._forward(x1, p, keep_states=True)
    c_final0, c_final1 = enc0[-1][5], enc1[-1][5]
    assert np.abs(c_final1 - c_final0).max() > 0.1
    # the same impulse through a CONTRACTIVE tanh recurrence (the additive
    # cell path removed — what the old Elman cell degenerates to whenever
    # ||Whh|| < 1) is geometrically gone: ~0.4^40
    whh = 0.4 * np.eye(hdim)
    h0 = np.zeros((1, hdim))
    h1 = np.zeros((1, hdim))
    for t in range(d_len):
        h0 = np.tanh(x0[0, t] * 0.5 + h0 @ whh)
        h1 = np.tanh(x1[0, t] * 0.5 + h1 @ whh)
    assert np.abs(h1 - h0).max() < 1e-6


def test_recurrence_is_order_sensitive():
    """Reversing a window changes the reconstruction error — h_t depends
    on h_{t-1}. A feed-forward AE with permutation-covariant init scores
    many reversed windows identically; the RNN must not."""
    rng = np.random.default_rng(1)
    p = _tiny_params(rng, hdim=4)
    x = rng.normal(0, 1, (8, 6))
    fwd = RecurrentAutoencoderDetector._forward(x, p)
    rev = RecurrentAutoencoderDetector._forward(x[:, ::-1], p)
    err_f = ((x - fwd) ** 2).mean(axis=1)
    err_r = ((x[:, ::-1] - rev) ** 2).mean(axis=1)
    assert not np.allclose(err_f, err_r)


def test_training_reduces_loss():
    rng = np.random.default_rng(2)
    # smooth sinusoid windows: learnable sequential structure
    t0 = rng.uniform(0, 2 * np.pi, 200)
    xs = np.sin(t0[:, None] + np.linspace(0, 2, 8)[None, :]) * 0.4 + 0.5

    det = RecurrentAutoencoderDetector(hidden=6, epochs=15, batch=64, seed=3)
    det.lo = xs.min(axis=0)
    det.rng_ = xs.max(axis=0) - det.lo
    det.rng_[det.rng_ == 0] = 1.0
    xn = (xs - det.lo) / det.rng_
    rng2 = np.random.default_rng(det.seed)
    p0 = _tiny_params(rng2, hdim=det.hidden)
    l0, _ = det._loss_grads(xn, p0)
    # a few Adam steps through the real training math (run() on a
    # DataFrame is covered by the e2e test below)
    p = [q.copy() for q in p0]
    ms = [np.zeros_like(q) for q in p]
    vs = [np.zeros_like(q) for q in p]
    t_step = 0
    for _ in range(60):
        loss, g = det._loss_grads(xn, p)
        t_step += 1
        for i in range(len(p)):
            ms[i] = 0.9 * ms[i] + 0.1 * g[i]
            vs[i] = 0.999 * vs[i] + 0.001 * g[i] * g[i]
            p[i] = p[i] - 1e-2 * (ms[i] / (1 - 0.9**t_step)) / (
                np.sqrt(vs[i] / (1 - 0.999**t_step)) + 1e-8
            )
    l1, _ = det._loss_grads(xn, p)
    assert l1 < l0 * 0.5


@pytest.fixture(scope="module")
def windowed(spark):
    # 400 sliding windows of a sine wave, one spiked window
    rows = []
    for i in range(400):
        w = [float(np.sin((i + j) / 6.0)) for j in range(8)]
        if i == 390:
            w[4] += 6.0  # spike mid-window
        rows.append((i, *w, 1 if i == 390 else 0))
    cols = ", ".join(f"f{j} double" for j in range(8))
    return spark.createDataFrame(rows, f"id long, {cols}, label int")


def test_detects_spiked_window(spark, windowed):
    det = get_model("rnn_autoencoder", hidden=6, epochs=12, seed=5)
    feats = [f"f{j}" for j in range(8)]
    det.run(windowed.filter(F.col("id") < 300), feats)
    scored = det.detect(windowed, feats).toPandas()
    spiked = scored[scored.id == 390]
    assert bool(spiked.predicted.iloc[0]) is True
    # normal windows mostly below threshold
    normal = scored[scored.id != 390]
    assert (normal.predicted == 1).mean() < 0.15


def test_deterministic_under_repartition(spark, windowed):
    feats = [f"f{j}" for j in range(8)]
    a = get_model("rnn_autoencoder", hidden=4, epochs=4, seed=7)
    a.run(windowed, feats)
    b = get_model("rnn_autoencoder", hidden=4, epochs=4, seed=7)
    b.run(windowed.repartition(13), feats)
    for pa, pb in zip(a.params, b.params):
        np.testing.assert_allclose(pa, pb)
    assert a.thr == b.thr
