"""Property tests for the round-4 analytics additions: CUSUM changepoint
localization, ACF structure, lift-table mass conservation, and chi-square
term identities (the oracle-parity gate covers exact cross-engine values;
these pin the STATISTICS' semantics on constructed inputs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from exact_spark.operators.timeseries import autocorrelation, cusum_changepoint


def _series(spark, values, key="s"):
    rows = [
        {"event_type": key, "id": i + 1, "ts_epoch": float(i), "value": float(v)}
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows).repartition(4)


def test_cusum_locates_step_shift(spark):
    # flat level 1.0 for 60 rows, then level 5.0 for 40: the max |deviation|
    # of the centered prefix sum is exactly at the last pre-shift row
    vals = [1.0] * 60 + [5.0] * 40
    out = cusum_changepoint(_series(spark, vals)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cp_index"] == 60
    assert r["n_rows"] == 100
    assert r["max_dev"] > 0


def test_cusum_constant_series_has_zero_deviation(spark):
    out = cusum_changepoint(_series(spark, [3.25] * 50)).collect()[0]
    # every prefix deviation is 0 -> argmax ties resolve to the earliest row
    assert out["max_dev"] == 0.0
    assert out["cp_index"] == 1


def test_acf_alternating_series(spark):
    # +1/-1 alternation: acf(k) = -1 at odd lags, +1 at even lags, up to
    # the truncation of the unnormalized overlap sum (n-k terms vs n in the
    # denominator) -> signs must alternate and magnitudes stay within 1
    vals = [1.0, -1.0] * 50
    out = {r["lag_k"]: r["acf"] for r in autocorrelation(_series(spark, vals)).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for k, v in out.items():
        assert abs(v) <= 1.0
        assert (v < 0) == (k % 2 == 1)


def test_acf_partitioning_invariance(spark):
    vals = [math.sin(i / 5.0) * 10 + 20 for i in range(200)]
    a = autocorrelation(_series(spark, vals)).collect()
    b = autocorrelation(_series(spark, vals).repartition(13)).collect()
    assert sorted((r["lag_k"], r["acf"]) for r in a) == sorted(
        (r["lag_k"], r["acf"]) for r in b
    )


def test_lift_table_mass_and_monotone_capture(spark, sf_dir):
    from exact_spark.operators.metrics import ml_lift_table

    rows = ml_lift_table(spark, sf_dir).orderBy("decile").collect()
    n_total = sum(r["n"] for r in rows)
    pos_total = sum(r["n_pos"] for r in rows)
    assert n_total > 0 and pos_total > 0
    # every event lands in exactly one decile
    from exact_spark.operators.timeseries import canonical_events

    assert n_total == canonical_events(spark, sf_dir).count()
    # cumulative capture is nondecreasing and ends at 1
    caps = [r["cum_capture"] for r in rows]
    assert all(b >= a for a, b in zip(caps, caps[1:]))
    assert caps[-1] == pytest.approx(1.0)


def test_chi2_terms_match_margin_identity(spark, sf_dir):
    from exact_spark.operators.metrics import ml_chi2_assoc

    rows = ml_chi2_assoc(spark, sf_dir).collect()
    n = sum(r["observed"] for r in rows)
    # expected counts reconstruct the grand total per margin identity
    assert sum(r["expected"] for r in rows) == pytest.approx(n)
    for r in rows:
        # chi2 term equals the textbook (O-E)^2/E within float tolerance
        assert r["chi2_term"] == pytest.approx(
            (r["observed"] - r["expected"]) ** 2 / r["expected"], rel=1e-9
        )


def test_triangle_census_consistency(spark, sf_dir):
    from exact_spark.operators.similarity import sim_graph_triangles

    r = sim_graph_triangles(spark, sf_dir).collect()[0]
    assert r["n_edges"] > 0 and r["n_nodes"] > 0
    # each triangle contributes 3 wedges; coefficient in [0, 1]
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["global_clustering"] <= 1.0
