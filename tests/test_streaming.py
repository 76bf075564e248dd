"""Structured-streaming replay + inline injection + foreachBatch scoring
(T1-T5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from exact_spark.operators.inject import AnomalySetting
from exact_spark.plans.batch import BatchJob
from exact_spark.plans.stream import run_stream
from exact_spark.sources.catalog import JobCatalog
from exact_spark.streaming.replay import (
    mean_interarrival_seconds,
    replay_rate,
    windowed_counts,
)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("stream") / "series.csv"
    lines = ["t,v,lab"]
    for i in range(600):
        lines.append(f"{1700000000 + i * 60},{10 + math.sin(i / 15.0):.6f},0")
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_run_stream_end_to_end(spark, csv_path, tmp_path):
    catalog = JobCatalog(spark, str(tmp_path / "wh"))
    job = BatchJob(
        job_name="s1",
        filepath=csv_path,
        time_col="t",
        label_col="lab",
        anomaly_settings=[
            AnomalySetting("custom", 400 * 60, 60 * 60, magnitude=50.0,
                           percentage=100.0, columns=["v"])
        ],
        model="threshold",
    )
    result = run_stream(spark, catalog, job, str(tmp_path / "work"), chunks=6)
    assert result["rows"] == 600
    assert result["table_name"] == "job_stream_s1"
    assert result["stream_status"]["isActive"] is False
    # all 60 injected rows detected by the pre-trained threshold model
    m = result["metrics_all"]
    assert m["tp"] == 60 and m["fn"] == 0
    assert m["precision"] >= 0.5
    # replay pacing contract: 60s inter-arrival, speedup 1000 -> ~16.7 rows/s
    assert abs(result["replay_rows_per_second"] - 1000.0 / 60.0) < 0.1

    # stored stream table has flags persisted
    flagged = catalog.read_data("job_stream_s1").filter(F.col("is_anomaly"))
    assert flagged.count() == m["tp"] + m["fp"]


def test_interarrival_and_windowed_counts(spark, csv_path, tmp_path):
    from exact_spark.sources.ingest import canonicalize, read_file

    canon = canonicalize(read_file(spark, csv_path), time_col="t", label_col="lab")
    assert abs(mean_interarrival_seconds(canon) - 60.0) < 1e-6
    assert abs(replay_rate(canon, speedup=60.0) - 1.0) < 1e-9

    # T5: watermarked windowed agg over a replay stream
    src = str(tmp_path / "winsrc")
    canon.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_counts(stream, window="60 minutes", watermark="120 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = sorted(
        spark.sql("SELECT * FROM win_counts").collect(), key=lambda r: r["window_start"]
    )
    assert sum(r["n_events"] for r in rows) == 600
    # data starts mid-hour, so edge windows are partial; interior ones are full
    assert len(rows) == 11
    assert all(r["n_events"] == 60 for r in rows[1:-1])
