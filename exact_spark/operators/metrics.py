"""Evaluation aggregates (SURVEY.md §2.4: G1, G2, G5, G8).

The reference computes confusion counts with four boolean-mask passes
(Backend/execute_calls.py:354-381) and derived metrics rounded to 4dp
(execute_calls.py:811-839). Here it is one distributed aggregate pass.

The "model" used for the oracle-checkable evaluation queries is the
reference's statistical detector shape: flag a row anomalous when its value
exceeds the P95 threshold (lstm.py:156 uses P95 of reconstruction error;
the thresholding semantics are identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exact_spark import io
from exact_spark.functions import fround, sql_fround
from exact_spark.operators.timeseries import CANON_SQL, canonical_events
from exact_spark.registry import register
from exact_spark.session import tune_session

_P = 0.95


@register(
    "g5_percentile_threshold",
    sql=f"""
    SELECT event_type,
           {sql_fround('quantile_cont(value, 0.95)')} AS p95_value,
           count(*) AS n_rows
    FROM ({CANON_SQL})
    GROUP BY event_type
    """,
    doc="G5: exact interpolated percentile threshold per group "
    "(lstm.py:156, svm.py:149-151).",
)
def g5_percentile_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = canonical_events(spark, sf_dir)
    return df.groupBy("event_type").agg(
        fround(F.percentile(F.col("value"), F.lit(_P))).alias("p95_value"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# Confusion matrix: predicted = value > global P95; actual = label.
_CONFUSION_BASE = f"""
    WITH canon AS ({CANON_SQL}),
    thr AS (SELECT quantile_cont(value, 0.95) AS t FROM canon),
    scored AS (
        SELECT c.label AS actual,
               CASE WHEN c.value > thr.t THEN 1 ELSE 0 END AS predicted
        FROM canon c, thr
    ),
    cm AS (
        SELECT SUM(CASE WHEN predicted = 1 AND actual = 1 THEN 1 ELSE 0 END) AS tp,
               SUM(CASE WHEN predicted = 0 AND actual = 0 THEN 1 ELSE 0 END) AS tn,
               SUM(CASE WHEN predicted = 1 AND actual = 0 THEN 1 ELSE 0 END) AS fp,
               SUM(CASE WHEN predicted = 0 AND actual = 1 THEN 1 ELSE 0 END) AS fn
        FROM scored
    )
"""

_SQL_M4 = "{expr}"  # metrics rounded to 4dp with the floor formula


def _sql_metric(expr: str) -> str:
    return sql_fround(expr, 10_000)


@register(
    "g1_confusion_metrics",
    sql=f"""
    {_CONFUSION_BASE}
    SELECT CAST(tp AS BIGINT) AS tp, CAST(tn AS BIGINT) AS tn,
           CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
           {_sql_metric('(tp + tn) * 1.0 / (tp + tn + fp + fn)')} AS accuracy,
           {_sql_metric('CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp * 1.0 / (tp + fp) END')} AS precision_,
           {_sql_metric('CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp * 1.0 / (tp + fn) END')} AS recall_,
           {_sql_metric('CASE WHEN tp + fp = 0 OR tp + fn = 0 OR tp = 0 THEN 0.0 ELSE 2.0 * (tp * 1.0 / (tp + fp)) * (tp * 1.0 / (tp + fn)) / (tp * 1.0 / (tp + fp) + tp * 1.0 / (tp + fn)) END')} AS f1_score,
           {_sql_metric('CASE WHEN tn + fp = 0 THEN 0.0 ELSE tn * 1.0 / (tn + fp) END')} AS specificity
    FROM cm
    """,
    doc="G1+G2: confusion counts + derived metrics in one aggregate pass "
    "(execute_calls.py:354-381,811-839), P95-threshold detector.",
)
def g1_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = canonical_events(spark, sf_dir)
    thr = df.agg(F.percentile(F.col("value"), F.lit(_P)).alias("t"))
    scored = df.crossJoin(F.broadcast(thr)).select(
        F.col("label").alias("actual"),
        F.when(F.col("value") > F.col("t"), F.lit(1)).otherwise(F.lit(0)).alias("predicted"),
    )
    cm = scored.agg(
        F.sum(F.when((F.col("predicted") == 1) & (F.col("actual") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("predicted") == 0) & (F.col("actual") == 0), 1).otherwise(0)).alias("tn"),
        F.sum(F.when((F.col("predicted") == 1) & (F.col("actual") == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("predicted") == 0) & (F.col("actual") == 1), 1).otherwise(0)).alias("fn"),
    )
    tp, tn, fp, fn = (F.col(c) for c in ("tp", "tn", "fp", "fn"))
    prec = tp * 1.0 / (tp + fp)
    rec = tp * 1.0 / (tp + fn)

    def m4(col):
        return fround(col, 10_000)

    return cm.select(
        tp.cast("long").alias("tp"),
        tn.cast("long").alias("tn"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        m4((tp + tn) * 1.0 / (tp + tn + fp + fn)).alias("accuracy"),
        m4(F.when(tp + fp == 0, F.lit(0.0)).otherwise(prec)).alias("precision_"),
        m4(F.when(tp + fn == 0, F.lit(0.0)).otherwise(rec)).alias("recall_"),
        m4(
            F.when((tp + fp == 0) | (tp + fn == 0) | (tp == 0), F.lit(0.0)).otherwise(
                2.0 * prec * rec / (prec + rec)
            )
        ).alias("f1_score"),
        m4(F.when(tn + fp == 0, F.lit(0.0)).otherwise(tn * 1.0 / (tn + fp))).alias("specificity"),
    )


@register(
    "g8_class_counts",
    sql="""
    WITH counts AS (
        SELECT SUM(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS n_pos,
               SUM(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS n_neg
        FROM embeddings
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           CAST(FLOOR((n_neg * 1.0 / n_pos) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS scale_pos_weight
    FROM counts
    """,
    doc="G8: class counts + scale_pos_weight = n_neg/n_pos "
    "(XGBoost.py:327-337) — imbalance weighting input.",
)
def g8_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    emb = io.load(spark, sf_dir, "embeddings")
    counts = emb.agg(
        F.sum(F.when(F.col("label") >= 5, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("label") < 5, 1).otherwise(0)).alias("n_neg"),
    )
    return counts.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        fround(F.col("n_neg") * 1.0 / F.col("n_pos")).alias("scale_pos_weight"),
    )
