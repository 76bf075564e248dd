"""Detector model tests (M1-M6 family, SURVEY §2.7)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from exact_spark.ml.models import get_model


@pytest.fixture(scope="module")
def series(spark):
    """1000 rows, two features; ids 900-919 carry an obvious spike."""
    df = spark.range(1, 1001).select(
        F.col("id"),
        (F.sin(F.col("id") / 10.0) + F.col("id") % 7 * 0.01).alias("v1"),
        (F.cos(F.col("id") / 15.0)).alias("v2"),
    )
    spiky = F.when((F.col("id") >= 900) & (F.col("id") < 920), F.col("v1") + 10.0).otherwise(
        F.col("v1")
    )
    df = df.withColumn("v1", spiky).withColumn(
        "label", ((F.col("id") >= 900) & (F.col("id") < 920)).cast("int")
    )
    return df.cache()


@pytest.mark.parametrize("name", ["threshold", "pca_autoencoder", "mlp_autoencoder", "ae_ocsvm", "isolation_forest"])
def test_unsupervised_detectors_flag_spike(spark, series, name):
    model = get_model(name)
    train = series.filter(F.col("id") <= 850)
    model.run(train, ["v1", "v2"])
    det = model.detect(series, ["v1", "v2"])
    got = {r["id"] for r in det.filter(F.col("predicted") == 1).collect()}
    spike_ids = set(range(900, 920))
    # every spiked row flagged
    assert spike_ids <= got, f"{name} missed {sorted(spike_ids - got)[:5]}"
    # false-positive rate bounded
    assert len(got - spike_ids) < 150, f"{name} flagged {len(got - spike_ids)} normals"


@pytest.mark.parametrize("name", ["decision_tree", "logistic_regression", "linear_svc"])
def test_supervised_detectors(spark, series, name):
    model = get_model(name)
    model.run(series.filter(F.col("id") <= 950), ["v1", "v2"])
    det = model.detect(series, ["v1", "v2"])
    got = {r["id"] for r in det.filter(F.col("predicted") == 1).collect()}
    spike_ids = set(range(900, 920))
    overlap = len(got & spike_ids) / len(spike_ids)
    assert overlap >= 0.9, f"{name} recalled only {overlap:.0%}"


def test_isolation_forest_deterministic(spark, series):
    outs = []
    for _ in range(2):
        m = get_model("isolation_forest", seed=7)
        m.run(series.filter(F.col("id") <= 850), ["v1", "v2"])
        det = m.detect(series, ["v1", "v2"]).orderBy("id").collect()
        outs.append([(r["id"], round(r["score"], 12)) for r in det])
    assert outs[0] == outs[1]


def test_pca_scores_distributed_match_driver(spark, series):
    """The mapInPandas scoring path must equal a driver-side recompute."""
    m = get_model("pca_autoencoder")
    train = series.filter(F.col("id") <= 850)
    m.run(train, ["v1", "v2"])
    det = {r["id"]: r["score"] for r in m.detect(series, ["v1", "v2"]).collect()}
    pdf = series.orderBy("id").toPandas()
    x = pdf[["v1", "v2"]].to_numpy()
    z = (x - m.mean) / m.std
    errs = ((z - z @ m.components.T @ m.components) ** 2).mean(axis=1)
    for i, rid in enumerate(pdf["id"]):
        assert abs(det[rid] - errs[i]) < 1e-12


def test_stratified_kfold_balance(spark, series):
    from exact_spark.ml.cv import FOLD_COL, stratified_kfold

    k = 4
    folded = stratified_kfold(series, "label", k=k)
    per = {
        (r["label"], r[FOLD_COL]): r["cnt"]
        for r in folded.groupBy("label", FOLD_COL).agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    # every class dealt round-robin: fold sizes within a class differ by <= 1
    for lab in (0, 1):
        sizes = [per.get((lab, f), 0) for f in range(k)]
        assert max(sizes) - min(sizes) <= 1, (lab, sizes)
    # deterministic across evaluations
    a = sorted(map(tuple, folded.select("id", FOLD_COL).collect()))
    b = sorted(map(tuple, folded.select("id", FOLD_COL).collect()))
    assert a == b


def test_mlp_autoencoder_deterministic_and_proba(spark, series):
    """M1: seeded weights => identical scores under any partitioning, and
    the sigmoid pseudo-proba contract holds around the trained threshold."""
    from exact_spark.ml.explain import model_proba_fn

    train = series.filter(F.col("id") <= 850)

    def fit_scores(df):
        m = get_model("mlp_autoencoder", epochs=10)
        m.run(df, ["v1", "v2"])
        return m, {r["id"]: round(r["score"], 12) for r in m.detect(series, ["v1", "v2"]).collect()}

    m1, s1 = fit_scores(train)
    m2, s2 = fit_scores(train.repartition(17))
    assert s1 == s2
    assert m1.thr == m2.thr

    proba = model_proba_fn(m1, ["v1", "v2"])
    # normal rows score under threshold -> P(anomaly) < 0.5; spiked above
    import numpy as np
    normal = np.array([[0.0, 1.0]])
    spiked = np.array([[10.0, 1.0]])
    p = proba(np.vstack([normal, spiked]))
    assert p.shape == (2, 2)
    assert p[0, 1] < 0.5 < p[1, 1]


def test_forest_vectorized_scoring_matches_reference_traversal(spark, series):
    """The (trees x rows) vectorized scorer must be bit-identical to the
    straightforward per-tree traversal (_itree_paths)."""
    from exact_spark.ml.models import _itree_paths

    model = get_model("isolation_forest", n_estimators=25)
    model.run(series.filter(F.col("id") <= 850), ["v1", "v2"])
    rng = np.random.default_rng(7)
    x = rng.normal(0, 5, size=(503, 2))  # odd size -> exercises tile tail
    new = model._score_closure()(x)
    paths = np.zeros(len(x))
    for t in model.trees:
        paths += _itree_paths(t, x)
    old = 2.0 ** (-(paths / model.n_estimators) / model.c_psi)
    assert np.array_equal(new, old)


def test_ae_ocsvm_nu_contract(spark, series):
    """OneClassSVM's nu semantics: ~nu of the TRAINING sample falls
    outside the learned boundary."""
    train = series.filter(F.col("id") <= 850)
    model = get_model("ae_ocsvm", nu=0.1, epochs=10)
    model.run(train, ["v1", "v2"])
    det = model.detect(train, ["v1", "v2"])
    frac = det.filter(F.col("predicted") == 1).count() / det.count()
    # quantile boundary on the capped ordered sample -> close to nu
    assert 0.05 <= frac <= 0.15


def test_rff_approximates_rbf_kernel():
    """The random-Fourier-feature map inside the M3 boundary:
    <phi(a), phi(b)> must converge to exp(-gamma ||a-b||^2)."""
    from exact_spark.ml.models import EncoderOneClassDetector

    det = EncoderOneClassDetector(n_rff=4096, seed=11)
    gamma = 0.7
    rng = np.random.default_rng(13)
    det.rff_w = rng.normal(0.0, np.sqrt(2.0 * gamma), (3, det.n_rff))
    det.rff_b = rng.uniform(0.0, 2.0 * np.pi, det.n_rff)
    a = rng.normal(0, 1, (50, 3))
    b = rng.normal(0, 1, (50, 3))
    approx = (det._phi(a) * det._phi(b)).sum(axis=1)
    exact = np.exp(-gamma * ((a - b) ** 2).sum(axis=1))
    assert np.abs(approx - exact).max() < 0.08


def test_rff_boundary_is_multimodal():
    """Two well-separated training clusters: the kernelized boundary must
    accept BOTH cluster centers and reject the midpoint between them — a
    raw latent hypersphere around the mean does the opposite."""
    from exact_spark.ml.models import EncoderOneClassDetector

    det = EncoderOneClassDetector(nu=0.05, n_rff=512, seed=3)
    rng = np.random.default_rng(5)
    h = np.vstack([
        rng.normal(-3, 0.2, (300, 2)),
        rng.normal(3, 0.2, (300, 2)),
    ])
    var = float(h.var()) or 1.0
    gamma = 1.0 / (h.shape[1] * var)
    r2 = np.random.default_rng(det.seed + 1)
    det.rff_w = r2.normal(0.0, np.sqrt(2.0 * gamma), (2, det.n_rff))
    det.rff_b = r2.uniform(0.0, 2.0 * np.pi, det.n_rff)
    p = det._phi(h)
    det.center = p.mean(axis=0)
    d = ((p - det.center) ** 2).sum(axis=1)
    thr = float(np.quantile(d, 1.0 - det.nu))
    probe = np.array([[-3.0, -3.0], [3.0, 3.0], [0.0, 0.0]])
    s = ((det._phi(probe) - det.center) ** 2).sum(axis=1)
    assert s[0] <= thr and s[1] <= thr  # both modes inside
    assert s[2] > thr                   # the empty midpoint outside
