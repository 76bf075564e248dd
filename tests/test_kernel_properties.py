"""Hypothesis property tests for the pure (Spark-free) kernels that
several operators build on — run-length argmax, EWMA weights, session
splitting, KernelSHAP axioms, and the boosting tree math — so their
contracts hold on arbitrary inputs, not just the corpus fixtures."""

from __future__ import annotations

from collections import Counter

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from exact_spark.ml.explain import _kernelshap_single
from exact_spark.ml.models import NativeXGBoostDetector
from exact_spark.operators.timeseries import _ewma_weights
from exact_spark.streaming.replay import split_sessions


@given(st.lists(st.sampled_from("abcde"), min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_sorted_run_length_equals_mode_count(tokens):
    """The sort_array + run-length fold (text_repetition_profile's
    zero-shuffle mode count) must equal Counter's max multiplicity.
    Replicates the fold in plain Python against the spec."""
    arr = sorted(tokens)
    prev, run, best = None, 0, 0
    for x in arr:
        run = run + 1 if x == prev else 1
        best = max(best, run)
        prev = x
    assert best == max(Counter(tokens).values())


def test_ewma_weights_sum_to_one_and_decay():
    w = _ewma_weights()
    assert abs(sum(w) - 1.0) < 1e-12
    assert all(a > b for a, b in zip(w, w[1:]))  # strictly decaying lags


@given(
    st.lists(st.floats(0, 1e6, allow_nan=False), min_size=1, max_size=50).map(sorted),
    st.floats(0.1, 1e4),
)
@settings(max_examples=200, deadline=None)
def test_split_sessions_partitions_input(buf, gap):
    runs = split_sessions(buf, gap)
    flat = [t for r in runs for t in r]
    assert flat == buf  # partition, order preserved
    for r in runs:  # intra-run gaps within the threshold
        assert all(b - a <= gap for a, b in zip(r, r[1:]))
    for r1, r2 in zip(runs, runs[1:]):  # inter-run gaps exceed it
        assert r2[0] - r1[-1] > gap


@given(st.integers(2, 8), st.integers(0, 2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_kernelshap_efficiency_holds_for_any_dimension(m, seed):
    rng = np.random.RandomState(seed % 10_000)
    w = rng.randn(m)
    x, bg = rng.randn(m), rng.randn(m)
    fn = lambda X: np.tanh(X @ w)  # noqa: E731 — nonlinear
    phi = _kernelshap_single(fn, x, bg, instance_id=seed)
    assert abs(phi.sum() - (fn(x[None])[0] - fn(bg[None])[0])) < 1e-9


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_xgb_tree_margin_routes_every_row_to_a_leaf(seed):
    """_tree_margin's vectorized traversal must assign every row the
    weight of exactly the leaf its bins route to (checked against a
    scalar re-walk of the same tree)."""
    rng = np.random.RandomState(seed % 10_000)
    det = NativeXGBoostDetector(n_estimators=1, max_depth=3)
    x = rng.randn(80, 3)
    y = (x[:, 0] + x[:, 1] > 0).astype(float)
    qs = np.linspace(0, 1, det.n_bins + 1)[1:-1]
    det.edges = [np.unique(np.quantile(x[:, f], qs)) for f in range(3)]
    codes = det._bin(x)
    g = y - 0.5
    h = np.full_like(g, 0.25)
    tree = det._grow_tree(codes, g, h)
    fast = det._tree_margin(tree, codes)

    def walk(row):
        n = 0
        while tree["feature"][n] >= 0:
            n = tree["left"][n] if row[tree["feature"][n]] <= tree["bin"][n] else tree["right"][n]
        return tree["weight"][n]

    slow = np.array([walk(codes[i]) for i in range(len(codes))])
    np.testing.assert_allclose(fast, slow)


def test_np_fixed_kernels_match_spark_kernels(spark):
    """The driver-side MMR greedy rests on _np_dot_fixed/_np_cos_fixed
    being BIT-identical to the Column kernels (dot_fixed /
    cosine_from_fixed) — pin it on adversarial float32 vectors (mixed
    magnitudes, signs, exact zeros)."""
    import numpy as np
    from pyspark.sql import functions as F

    from exact_spark.operators.similarity import (
        _np_cos_fixed,
        _np_dot_fixed,
        cosine_from_fixed,
        dot_fixed,
    )

    rng = np.random.RandomState(7)
    vecs = []
    for i in range(12):
        v = (rng.randn(64) * (10.0 ** rng.randint(-3, 3))).astype(np.float32)
        if i % 4 == 0:
            v[:: i + 2] = 0.0
        vecs.append(v)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vid long, emb array<float>")
    a = df.select(
        F.col("vid"), F.col("emb").alias("ea"),
        dot_fixed(F.col("emb"), F.col("emb")).alias("na"),
    )
    b = df.select(
        F.col("vid").alias("vb"), F.col("emb").alias("eb"),
        dot_fixed(F.col("emb"), F.col("emb")).alias("nb"),
    )
    pairs = (
        a.join(b, F.col("vb") > F.col("vid"))
        .select(
            "vid", "vb", "na", "nb",
            dot_fixed(F.col("ea"), F.col("eb")).alias("dot_fx"),
            cosine_from_fixed(
                dot_fixed(F.col("ea"), F.col("eb")), F.col("na"), F.col("nb")
            ).alias("cos"),
        )
        .collect()
    )
    assert len(pairs) == 12 * 11 // 2
    for r in pairs:
        va, vb = vecs[r["vid"]].astype(np.float64), vecs[r["vb"]].astype(np.float64)
        assert _np_dot_fixed(va, vb) == r["dot_fx"], (r["vid"], r["vb"])
        np_cos = _np_cos_fixed(r["dot_fx"], r["na"], r["nb"])
        assert np_cos == r["cos"], (r["vid"], r["vb"])  # bitwise equal


@given(
    st.integers(2, 12),
    st.lists(st.integers(1, 300), min_size=1, max_size=80),
)
@settings(max_examples=200, deadline=None)
def test_span_merge_rule_is_exactly_interval_union(L, marked):
    """dedup_substring_spans merges marked gram positions with the rule
    'break when pos - prev > L'. That rule must equal the set union of
    the per-position intervals [p, p+L-1] EXACTLY — the edge is gap ==
    L, where the intervals are adjacent (not overlapping) and must still
    merge into one contiguous span. Also: produced spans are separated
    by a genuine uncovered gap (never adjacent), so n_spans is the true
    count of maximal duplicated regions."""
    marked = sorted(set(marked))
    covered = set()
    for p in marked:
        covered.update(range(p, p + L))
    spans = []
    s = prev = marked[0]
    for p in marked[1:]:
        if p - prev > L:
            spans.append((s, prev + L - 1))
            s = p
        prev = p
    spans.append((s, prev + L - 1))
    got = set()
    for a, b in spans:
        assert a <= b
        got.update(range(a, b + 1))
    assert got == covered
    for (_, b1), (a2, _) in zip(spans, spans[1:]):
        assert a2 > b1 + 1  # maximality: a real hole between spans


@given(
    st.integers(0, 10**6),
    st.sampled_from(["web", "books", "code", "wiki", "forums"]),
)
@settings(max_examples=200, deadline=None)
def test_url_canonicalizer_mirror_is_idempotent_and_normal(doc_id, source):
    """The python mirror of dedup_url_canonical's canonicalizer (the same
    one test_r08_ops round-trips against the Spark output): canonical
    forms are a FIXED POINT (canon(canon(x)) == canon(x)) and satisfy
    every normal-form clause for any (source, doc_id)-derived messy URL."""

    def canon(url: str) -> str:
        u = url.split("?", 1)[0].lower()
        u = u.replace("http://", "https://").replace("https://www.", "https://")
        return u[:-1] if u.endswith("/") else u

    host = f"{source}.example.com"
    raw = (
        ("http://" if doc_id % 2 == 0 else "https://")
        + ("www." if doc_id % 3 == 0 else "")
        + (host.upper() if doc_id % 11 == 0 else host)
        + f"/doc/{doc_id % 12}"
        + ("/" if doc_id % 7 == 0 else "")
        + (f"?utm_source=feed&utm_campaign=c{doc_id % 4}" if doc_id % 5 == 0 else "")
    )
    c = canon(raw)
    assert canon(c) == c
    assert c.startswith("https://") and "www." not in c
    assert "?" not in c and not c.endswith("/") and c == c.lower()
