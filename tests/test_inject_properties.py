"""Metamorphic/property tests for the injection operators (SURVEY §5 plan
item 3): identities, exact shifts, and flag/value consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from exact_spark.durations import parse_duration
from exact_spark.operators.inject import AnomalySetting, inject_anomalies

START = 1700000000.0


@pytest.fixture(scope="module")
def base(spark):
    df = spark.range(1, 501).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(START) + F.col("id") * 60).alias("timestamp"),
        (10.0 + F.sin(F.col("id") / 7.0)).alias("v1"),
        (5.0 + F.cos(F.col("id") / 11.0)).alias("v2"),
        F.lit(0).alias("label"),
        F.lit(False).alias("injected_anomaly"),
        F.lit(False).alias("is_anomaly"),
    )
    return df.cache()


def _span_setting(kind, **kw):
    # rows with 100*60 < offset <= duration window: minutes 100-200
    return AnomalySetting(kind, 100 * 60.0, 100 * 60.0, **kw)


def _collect(df):
    return {r["id"]: r for r in df.collect()}


def test_custom_magnitude_one_is_identity_on_values(spark, base):
    out = _collect(
        inject_anomalies(base, [_span_setting("custom", magnitude=1.0, columns=["v1"])], START + 60)
    )
    orig = _collect(base)
    for i, row in out.items():
        assert row["v1"] == pytest.approx(orig[i]["v1"], abs=0)
    # but flags ARE set on the span (A9)
    assert any(r["injected_anomaly"] for r in out.values())


def test_step_shifts_by_mean_times_magnitude_exactly(spark, base):
    mag, mean = 3.0, 2.5
    s = _span_setting("step", magnitude=mag, mean=mean, columns=["v1"])
    out = _collect(inject_anomalies(base, [s], START + 60))
    orig = _collect(base)
    for i, row in out.items():
        if row["injected_anomaly"]:
            assert row["v1"] == pytest.approx(orig[i]["v1"] + mean * mag, rel=1e-12)
        else:
            assert row["v1"] == orig[i]["v1"]


def test_offline_zeroes_selected_rows(spark, base):
    out = _collect(
        inject_anomalies(base, [_span_setting("offline", columns=["v1"])], START + 60)
    )
    for row in out.values():
        if row["injected_anomaly"]:
            assert row["v1"] == 0.0


def test_flags_set_iff_in_span_at_full_percentage(spark, base):
    s = _span_setting("custom", magnitude=2.0, percentage=100.0, columns=["v1"])
    start = START + 60  # first row's timestamp
    out = _collect(inject_anomalies(base, [s], start))
    for i, row in out.items():
        ts = START + i * 60
        in_span = start + s.timestamp <= ts < start + s.timestamp + s.duration
        assert bool(row["injected_anomaly"]) == in_span, (i, ts)
        assert row["label"] == (1 if in_span else 0)
        assert bool(row["is_anomaly"]) == in_span


def test_percentage_zero_changes_nothing(spark, base):
    s = _span_setting("spike", magnitude=5.0, percentage=0.0, columns=["v1"])
    out = _collect(inject_anomalies(base, [s], START + 60))
    orig = _collect(base)
    for i, row in out.items():
        assert row["v1"] == orig[i]["v1"]
        assert not row["injected_anomaly"]


def test_percentage_subsample_exact_count_and_determinism(spark, base):
    s = _span_setting("custom", magnitude=2.0, percentage=40.0, columns=["v1"])
    a = inject_anomalies(base, [s], START + 60)
    n_span = 100  # minutes 100-199 inclusive span rows
    k = int(n_span * 0.40)
    assert a.filter(F.col("injected_anomaly")).count() == k
    # deterministic under re-evaluation and different partitioning
    b = inject_anomalies(base.repartition(7), [s], START + 60)
    ids_a = {r["id"] for r in a.filter(F.col("injected_anomaly")).select("id").collect()}
    ids_b = {r["id"] for r in b.filter(F.col("injected_anomaly")).select("id").collect()}
    assert ids_a == ids_b


def test_duration_parser_roundtrips():
    assert parse_duration("1h") == 3600.0
    assert parse_duration("1h30m") == parse_duration("90m")
    assert parse_duration("2days") == 2 * parse_duration("1days")
