"""Invariants of the classical additive decomposition (oracle-hash parity
is covered by the registry gate; these pin the algebra)."""

from __future__ import annotations

from pyspark.sql import functions as F

from exact_spark.operators.timeseries import (
    _DECOMP_HALF_WIN,
    ts_classical_decompose,
)
from tests.conftest import SF_DIR


def test_reconstruction_identity(spark):
    """y = trend + seasonal + residual holds row-for-row up to HALF a
    fixed-point unit (0.005): the detrended series is rounded to 1e-2
    integers before the seasonal census — the deliberate trade that keeps
    every cross-row reduction integer-exact — so the reconstruction error
    is bounded by that single rounding, never accumulated."""
    out = ts_classical_decompose(spark, SF_DIR)
    err = F.abs(
        F.col("y_mean") - (F.col("trend") + F.col("seasonal") + F.col("residual"))
    )
    assert out.filter(err > 0.005 + 1e-9).count() == 0
    # and the bound is tight in aggregate: mean error well under the cap
    mean_err = out.agg(F.avg(err)).collect()[0][0]
    assert mean_err < 0.004


def test_residual_centered_per_hod_cell(spark):
    """The seasonal component absorbs the hour-of-day mean: residuals sum
    to ~0 within every (series, hour-of-day) cell."""
    out = ts_classical_decompose(spark, SF_DIR)
    sums = out.groupBy("event_type", (F.col("hour") % 24).alias("hod")).agg(
        F.sum("residual").alias("s")
    )
    assert sums.filter(F.abs(F.col("s")) > 1e-6).count() == 0


def test_trend_smoother_than_series(spark):
    """The +/-12h moving average must damp variance: per series, the
    trend's variance is below the hourly series' variance."""
    out = ts_classical_decompose(spark, SF_DIR)
    v = out.groupBy("event_type").agg(
        F.var_pop("y_mean").alias("vy"), F.var_pop("trend").alias("vt")
    )
    assert v.filter(F.col("vt") >= F.col("vy")).count() == 0
    assert _DECOMP_HALF_WIN == 12
