"""run-batch job orchestration (SURVEY.md §3.1) — the engine's main "query".

Mirrors Backend/execute_calls.py:384-907 stage-for-stage, Spark-first:

1. ingest + canonicalize + inject (S1-S6, P1-P5, A1-A10) -> job table
2. read back from epoch 0 (S7)
3. prepare: P9 split, P6 feature selection, P7 train-fitted imputation
4. train (M* via factory; unsupervised get features only,
   execute_calls.py:36-40,594-631)
5. detect on test and all rows; S8 flag writeback as one MERGE-join
6. evaluate G1/G2 on both frames
7. run summary JSON (execute_calls.py:45-79,870-903 key set) with
   per-stage execution_time_* keys (execute_calls.py:404-405,891-895)
"""

from __future__ import annotations

import datetime as _dt
import json
import pathlib
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exact_spark.ml.models import UNSUPERVISED, get_model
from exact_spark.operators.inject import AnomalySetting, inject_anomalies
from exact_spark.sources.catalog import JobCatalog
from exact_spark.sources.ingest import canonicalize, feature_columns, read_file


@dataclass
class BatchJob:
    """Job descriptor (DBAPI/type_classes.py:3-10)."""

    job_name: str
    filepath: str
    time_col: str = "timestamp"
    label_col: str | None = "label"
    anomaly_settings: list[AnomalySetting] = field(default_factory=list)
    model: str = "threshold"
    model_params: dict[str, Any] = field(default_factory=dict)
    seed: int = 42


def _json_default(o):
    """NumPy/pandas/datetime/Path-aware serializer (execute_calls.py:52-71)."""
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, (_dt.datetime, _dt.date)):
        return o.isoformat()
    if isinstance(o, pathlib.Path):
        return str(o)
    return str(o)


def save_run_summary(summary: dict, job_name: str, output_dir: str) -> str:
    """S15: single-line JSON at <out>/<job>/logfile (execute_calls.py:45-79)."""
    out = pathlib.Path(output_dir) / job_name
    out.mkdir(parents=True, exist_ok=True)
    path = out / "logfile"
    path.write_text(json.dumps(summary, default=_json_default) + "\n")
    return str(path)


def evaluate_classification(df: DataFrame, actual: str = "label", predicted: str = "predicted") -> dict:
    """G1+G2 in one aggregate pass (execute_calls.py:354-381,811-839)."""
    row = df.agg(
        F.sum(F.when((F.col(predicted) == 1) & (F.col(actual) == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col(predicted) == 0) & (F.col(actual) == 0), 1).otherwise(0)).alias("tn"),
        F.sum(F.when((F.col(predicted) == 1) & (F.col(actual) == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col(predicted) == 0) & (F.col(actual) == 1), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, tn, fp, fn = row["tp"] or 0, row["tn"] or 0, row["fp"] or 0, row["fn"] or 0
    total = tp + tn + fp + fn
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return {
        "tp": tp,
        "tn": tn,
        "fp": fp,
        "fn": fn,
        "accuracy": round((tp + tn) / total, 4) if total else 0.0,
        "precision": round(prec, 4),
        "recall": round(rec, 4),
        "f1_score": round(2 * prec * rec / (prec + rec), 4) if prec + rec else 0.0,
        "specificity": round(tn / (tn + fp), 4) if tn + fp else 0.0,
    }


def run_batch(
    spark: SparkSession,
    catalog: JobCatalog,
    job: BatchJob,
    output_dir: str,
) -> dict:
    t_total = time.perf_counter()
    table = catalog.table_name(job.job_name)

    # 1. simulate/ingest ------------------------------------------------------
    t0 = time.perf_counter()
    raw = read_file(spark, job.filepath)
    canon = canonicalize(raw, time_col=job.time_col, label_col=job.label_col)
    start_epoch = canon.agg(F.min(F.col("timestamp").cast("double")).alias("s")).collect()[0]["s"]
    injected = inject_anomalies(canon, job.anomaly_settings, start_epoch, seed=job.seed)
    catalog.create_table(table, injected)
    t_sim = time.perf_counter() - t0

    # 2. read back (S7 from epoch 0) -----------------------------------------
    df = catalog.read_data(table).cache()
    n_rows = df.count()
    assert "id" in df.columns  # PK presence (execute_calls.py:509-510)

    # 3. prepare --------------------------------------------------------------
    feats = feature_columns(df)
    cut = int(0.85 * n_rows)  # P9 (execute_calls.py:333-346)
    train = df.filter(F.col("id") <= cut)
    test = df.filter(F.col("id") > cut)
    # P7: train-fitted mean imputation (fixing the reference's per-slice leakage)
    means = train.agg(*[F.avg(c).alias(c) for c in feats]).collect()[0].asDict()
    fill = {c: (means[c] if means[c] is not None else 0.0) for c in feats}
    train, test, df_all = train.fillna(fill), test.fillna(fill), df.fillna(fill)
    df_all = df_all.withColumn("label", F.col("label").cast("int"))

    # 4. train ----------------------------------------------------------------
    t0 = time.perf_counter()
    model = get_model(job.model, **job.model_params)
    model.run(train, feats)  # unsupervised models read features only
    t_train = time.perf_counter() - t0

    # 5. detect ---------------------------------------------------------------
    t0 = time.perf_counter()
    det_all = model.detect(df_all, feats).cache()
    pred_ids = det_all.filter(F.col("predicted") == 1).select("id")

    # 6. evaluate BEFORE the writeback: update_anomalies swaps the table
    # directory the cached frames' lineage points at, so any lost cache block
    # would recompute from a deleted path. Forcing the aggregates here fully
    # materializes everything we still need.
    joined = det_all.join(df_all.select("id", "label"), "id")
    t_eval0 = time.perf_counter()
    metrics_all = evaluate_classification(joined)
    metrics_test = evaluate_classification(joined.filter(F.col("id") > cut))
    t_eval = time.perf_counter() - t_eval0
    # what the DETECTOR flagged — not the table's total is_anomaly count,
    # which also includes injected ground-truth rows
    n_flagged = metrics_all["tp"] + metrics_all["fp"]

    # 7. S8 flag writeback (MERGE-style partition-scoped rewrite) -------------
    catalog.update_anomalies(table, pred_ids)
    # t_detect keeps its documented detect+writeback meaning: the evaluation
    # interval (which must run pre-swap, see above) is carved out and
    # reported under its own key
    t_detect = time.perf_counter() - t0 - t_eval

    summary = {
        "job_name": job.job_name,
        "table_name": table,
        "model": job.model,
        "rows": n_rows,
        "feature_columns": feats,
        "train_rows": cut,
        "test_rows": n_rows - cut,
        "anomalies_flagged": n_flagged,
        "metrics_all": metrics_all,
        "metrics_test": metrics_test,
        "anomaly_settings": [s.__dict__ for s in job.anomaly_settings],
        "execution_time_simulation_seconds": round(t_sim, 3),
        "execution_time_training_seconds": round(t_train, 3),
        "execution_time_detection_seconds": round(t_detect, 3),
        "execution_time_evaluation_seconds": round(t_eval, 3),
        "execution_time_total_seconds": round(time.perf_counter() - t_total, 3),
        "timestamp": _dt.datetime.now(_dt.timezone.utc),
    }
    # 8. X7 visual artifact: the job page's detection timeline as native
    # SVG (job_page_callbacks.py:1000's plot; matplotlib/plotly absent —
    # XML is not). The polyline goes through the M4 visual envelope so the
    # driver collects <= 4 points per screen bucket at ANY table size
    # (the frontend's 1000-point budget, engine-side), and anomaly
    # markers carry the reference's 500-marker cap
    # (job_page_callbacks.py:1038).
    summary["timeline_svg"] = _write_timeline_svg(
        df_all, det_all, feats[0], job.job_name, output_dir
    )
    summary["logfile"] = save_run_summary(summary, job.job_name, output_dir)
    df.unpersist()
    det_all.unpersist()
    return summary


_TL_BUCKETS = 1000  # frontend initial-zoom point budget
_TL_MARKER_CAP = 500  # anomaly marker constant (job_page_callbacks.py:1038)


def _write_timeline_svg(
    df_all, det_all, value_col: str, job_name: str, output_dir: str
) -> str:
    from exact_spark.ml.visualize import svg_timeseries

    ep = F.col("timestamp").cast("double")
    b = df_all.agg(F.min(ep).alias("t0"), F.max(ep).alias("t1"))
    bucket = F.least(
        F.lit(_TL_BUCKETS - 1).cast("long"),
        F.floor((ep - F.col("t0")) / (F.col("t1") - F.col("t0") + 1e-9) * _TL_BUCKETS).cast(
            "long"
        ),
    )
    m4 = (
        df_all.crossJoin(F.broadcast(b))
        .select(ep.alias("t"), F.col(value_col).cast("double").alias("v"), bucket.alias("b"))
        .groupBy("b")
        .agg(
            F.min_by("t", "t").alias("t_first"),
            F.min_by("v", "t").alias("v_first"),
            F.min_by("t", "v").alias("t_min"),
            F.min("v").alias("v_min"),
            F.max_by("t", "v").alias("t_max"),
            F.max("v").alias("v_max"),
            F.max("t").alias("t_last"),
            F.max_by("v", "t").alias("v_last"),
        )
        .collect()
    )
    points: list[tuple[float, float]] = []
    for r in m4:
        quad = [
            (r["t_first"], r["v_first"]),
            (r["t_min"], r["v_min"]),
            (r["t_max"], r["v_max"]),
            (r["t_last"], r["v_last"]),
        ]
        points.extend(sorted(set(quad)))
    points.sort()
    marks = [
        (float(r["t"]), float(r["v"]))
        for r in det_all.filter(F.col("predicted") == 1)
        .join(df_all.select("id", ep.alias("t"), F.col(value_col).cast("double").alias("v")), "id")
        .orderBy("id")
        .limit(_TL_MARKER_CAP)
        .collect()
    ]
    svg = svg_timeseries(f"{job_name} — {value_col} with detections", points, marks)
    out = pathlib.Path(output_dir) / job_name / "plots"
    out.mkdir(parents=True, exist_ok=True)
    path = out / "detection_timeline.svg"
    path.write_text(svg)
    return str(path)
