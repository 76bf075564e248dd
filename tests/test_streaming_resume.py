"""Checkpoint recovery: a streaming aggregation stopped and restarted from
its checkpoint must produce exactly the rows a single uninterrupted run
produces — no lost windows, no duplicated emissions (the exactly-once
contract a 100 TB/day ingest depends on across deploys and crashes)."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from exact_spark.streaming.replay import windowed_counts


def _read_rows(spark, out_dir):
    files = list(pathlib.Path(out_dir).rglob("*.parquet"))
    if not files:
        return []
    df = spark.read.parquet(out_dir)
    return sorted(
        (r["window_start"], r["n_events"], r["n_anomalies"])
        for r in df.collect()
    )


def _run_stream(spark, src, ckpt, out):
    # all currently-available files in ONE micro-batch: per-file triggers
    # would consume files in modification-time order, which is not the
    # event-time order — a late-range file processed first advances the
    # watermark past earlier windows and (correctly!) drops them as late.
    # The restart boundary between the two _run_stream calls is the
    # micro-batch boundary under test.
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    win = windowed_counts(stream, window="6 hours", watermark="30 minutes")
    q = (
        win.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windowed_counts_survive_restart(spark, sf_dir, tmp_path):
    from exact_spark.streaming import _bounded_events

    base = _bounded_events(spark, sf_dir, days=3.0, user_mod=5).withColumn(
        "is_anomaly", F.lit(False)
    )
    chunks = base.repartitionByRange(3, "timestamp")

    # interrupted run: only chunk 0 visible, process, stop; then the rest
    # appear and the query restarts FROM THE SAME CHECKPOINT
    inc_src = str(tmp_path / "inc_src")
    inc_out = str(tmp_path / "inc_out")
    inc_ckpt = str(tmp_path / "inc_ckpt")
    chunks.filter(F.spark_partition_id() == 0).drop("__pid").write.parquet(inc_src)
    _run_stream(spark, inc_src, inc_ckpt, inc_out)
    chunks.filter(F.spark_partition_id() > 0).write.mode("append").parquet(inc_src)
    _run_stream(spark, inc_src, inc_ckpt, inc_out)

    # reference run: same data, one uninterrupted pass, fresh checkpoint
    ref_src = str(tmp_path / "ref_src")
    ref_out = str(tmp_path / "ref_out")
    chunks.write.parquet(ref_src)
    _run_stream(spark, ref_src, str(tmp_path / "ref_ckpt"), ref_out)

    inc_rows = _read_rows(spark, inc_out)
    ref_rows = _read_rows(spark, ref_out)
    assert inc_rows == ref_rows
    assert len(inc_rows) > 0
    # no window emitted twice across the restart
    starts = [r[0] for r in inc_rows]
    assert len(starts) == len(set(starts))
