"""Structured Streaming operators (SURVEY.md §2.9, T1-T5).

``replay`` holds the building blocks; ``stream_replay_e2e`` below is the
driver-visible bounded end-to-end run (rows-only check: streaming is not
SQL-expressible for the DuckDB oracle).
"""

from __future__ import annotations

import pathlib
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exact_spark.registry import register


@register(
    "stream_replay_e2e",
    sql=None,  # Structured Streaming run -> rows-only check
    doc="T1-T4 e2e (engine.py:207-255 intended semantics, rebuilt working): "
    "stage the canonical events series as a time-ordered chunked replay "
    "source, pre-train the threshold model, replay with inline injection "
    "(T2, row-local md5 percentage selection), score each micro-batch via "
    "foreachBatch with the broadcast model (only new rows — never the "
    "reference's full-table re-scan), append to the job_stream_ table, "
    "evaluate. Bounded with availableNow.",
)
def stream_replay_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exact_spark.operators.inject import AnomalySetting
    from exact_spark.operators.timeseries import canonical_events
    from exact_spark.plans.batch import BatchJob
    from exact_spark.plans.stream import run_stream
    from exact_spark.sources.catalog import JobCatalog

    work = pathlib.Path(tempfile.mkdtemp(prefix="exact_spark_stream_"))
    try:
        # stage the canonical series as the job's input file (the stream
        # path ingests files, simulator.py:133-219); bounded to the first
        # 4k ids — a demo replay, deterministic under the dense-id order
        canon = (
            canonical_events(spark, sf_dir)
            .filter(F.col("id") <= 4_000)
            .select(
                F.col("ts_epoch").alias("t"), F.col("value").alias("v"),
                F.col("label").alias("lab"),
            )
        )
        csv_dir = work / "input"
        canon.coalesce(1).write.option("header", True).mode("overwrite").csv(
            str(csv_dir)
        )
        csv_file = next(str(p) for p in csv_dir.glob("*.csv"))

        job = BatchJob(
            job_name="replay_demo",
            filepath=csv_file,
            time_col="t",
            label_col="lab",
            anomaly_settings=[
                AnomalySetting(
                    "custom", 3600.0, 7200.0, magnitude=25.0,
                    percentage=100.0, columns=["v"],
                )
            ],
            model="threshold",
        )
        catalog = JobCatalog(spark, str(work / "warehouse"))
        result = run_stream(
            spark, catalog, job, str(work / "work"), chunks=2, timeout_s=120.0
        )
        m = result["metrics_all"]
        row = {
            "table_name": result["table_name"],
            "rows": int(result["rows"]),
            "tp": int(m["tp"]),
            "fp": int(m["fp"]),
            "fn": int(m["fn"]),
            "stream_finished": not result["stream_status"]["isActive"],
        }
        return spark.createDataFrame(
            [row],
            schema="table_name string, rows long, tp long, "
            "fp long, fn long, stream_finished boolean",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
