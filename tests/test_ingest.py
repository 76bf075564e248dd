"""Ingest + canonicalization (S1-S3, P1-P5, P12) unit tests."""

from __future__ import annotations

import pytest

from exact_spark.durations import parse_duration
from exact_spark.sources.ingest import canonicalize, feature_columns, read_file, with_dense_id


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "series.csv"
    rows = ["time,v1,v2,anom,Unnamed: 4"]
    # numeric epoch-seconds timestamps, mixed label forms, one bad timestamp
    rows.append("1700000000,1.0,10.0,true,x")
    rows.append("1700000060,2.0,20.0,false,x")
    rows.append("1700000120,3.0,30.0,1,x")
    rows.append("1700000030,4.0,40.0,0.0,x")
    rows.append("notatime,5.0,50.0,yes,x")  # dropped (NaT) — 'yes' -> 0 anyway
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_canonicalize_csv(spark, csv_path):
    df = canonicalize(read_file(spark, csv_path), time_col="time", label_col="anom")
    rows = df.orderBy("id").collect()
    assert [r["id"] for r in rows] == [1, 2, 3, 4]  # dense, time-ordered
    assert "Unnamed: 4" not in df.columns  # P1
    # P5: sorted by time — 1700000030 lands second
    assert [r["v1"] for r in rows] == [1.0, 4.0, 2.0, 3.0]
    # P4: true->1, 0.0->0, false->0, 1->1
    assert [r["label"] for r in rows] == [1, 0, 0, 1]
    # P3: numeric -> epoch seconds
    assert rows[0]["timestamp"].year == 2023
    # flags default false
    assert all(r["is_anomaly"] is False and r["injected_anomaly"] is False for r in rows)
    assert feature_columns(df) == ["v1", "v2"]


def test_dense_id_matches_global_order(spark):
    df = spark.range(1000).select(
        (F := __import__("pyspark.sql.functions", fromlist=["F"])).col("id").alias("k"),
        (F.col("id") * 37 % 1000).alias("ord"),
    )
    out = with_dense_id(df, ["ord"], id_col="did", num_partitions=7)
    rows = out.orderBy("ord").collect()
    assert [r["did"] for r in rows] == list(range(1, 1001))


def test_parse_duration():
    assert parse_duration("1h30m") == 5400.0
    assert parse_duration("2days 5hours") == 2 * 86400 + 5 * 3600
    assert parse_duration("10s") == 10.0
    assert parse_duration(90) == 90.0
    assert parse_duration("90") == 90.0
    assert parse_duration("1w") == 604800.0
    with pytest.raises(ValueError):
        parse_duration("10 parsecs")


def test_epoch_helpers_agree_on_int_seconds(spark):
    """Advisor guard: a 32-bit int column is epoch SECONDS to both
    dtype-driven converters (it cannot hold a ns epoch)."""
    from pyspark.sql import functions as F

    from exact_spark.functions import epoch_micros, epoch_seconds_any

    df = spark.createDataFrame([(1_700_000_000,), (1_700_000_060,)], "ts int")
    micros = [r[0] for r in df.select(epoch_micros(df, "ts")).collect()]
    secs = [r[0] for r in df.select(epoch_seconds_any(df, "ts")).collect()]
    assert micros == [int(s * 1_000_000) for s in secs]
    assert micros == [1_700_000_000_000_000, 1_700_000_060_000_000]


def test_orc_roundtrip_preserves_canonical_events(spark, sf_dir, tmp_path):
    """Source-format coverage: the canonical series round-trips through ORC
    (Spark-native, no extra package) with identical rows — the engine is
    not parquet-bound."""
    from pyspark.sql import functions as F

    from exact_spark.operators.timeseries import canonical_events

    canon = canonical_events(spark, sf_dir).select("id", "ts_epoch", "value", "label")
    orc_dir = str(tmp_path / "events_orc")
    canon.write.orc(orc_dir)
    back = spark.read.orc(orc_dir)
    assert back.count() == canon.count()
    a = canon.agg(
        F.sum("id").alias("si"), F.sum(F.floor(F.col("value") * 100)).alias("sv")
    ).collect()[0]
    b = back.agg(
        F.sum("id").alias("si"), F.sum(F.floor(F.col("value") * 100)).alias("sv")
    ).collect()[0]
    assert (a["si"], a["sv"]) == (b["si"], b["sv"])


def test_binaryfile_ingest_matches_synthesized_payloads(spark, sf_dir):
    """The binaryFile source path produces the same decode features as the
    in-plan synthesized payloads for the same docs."""
    from exact_spark.operators.multimodal import multimodal_binaryfile_ingest

    rows = multimodal_binaryfile_ingest(spark, sf_dir).collect()
    assert len(rows) == 64
    assert all(r["length_matches"] for r in rows)
    assert all(r["n_distinct_bytes"] > 0 for r in rows)
