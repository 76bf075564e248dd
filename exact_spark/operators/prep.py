"""Data-prep operators (SURVEY.md §2.2: P7 imputation; §2.5: J1/J2 + S8
flag writeback as set-oriented joins).

The reference's flag writeback is a one-row-at-a-time UPDATE loop
(Database/timescaledb_api.py:238-274) — the canonical N+1 anti-pattern. The
Spark-native form is a single equi-join against the (small) predicted-id
set, broadcast so the fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exact_spark.functions import favg, sql_favg
from exact_spark.operators.timeseries import CANON_SQL, canonical_events
from exact_spark.registry import register


@register(
    "p7_impute",
    sql=f"""
    WITH canon AS ({CANON_SQL}),
    holes AS (
        SELECT id,
               CASE WHEN id % 10 = 0 THEN NULL ELSE value END AS value_raw,
               CASE WHEN id % 10 = 0 THEN NULL ELSE event_type END AS cat_raw
        FROM canon
    ),
    stats AS (SELECT {sql_favg('value_raw')} AS mean_value FROM holes),
    freq AS (
        SELECT cat_raw AS v, count(*) AS n FROM holes
        WHERE cat_raw IS NOT NULL GROUP BY cat_raw
    ),
    mode AS (
        SELECT v AS mode_value FROM freq
        ORDER BY n DESC, v LIMIT 1
    )
    SELECT h.id,
           COALESCE(h.value_raw, s.mean_value) AS value_imputed,
           COALESCE(h.cat_raw, m.mode_value) AS cat_imputed,
           CASE WHEN h.value_raw IS NULL THEN 1 ELSE 0 END AS was_missing
    FROM holes h, stats s, mode m
    """,
    doc="P7 both branches (execute_calls.py:546-579): numeric columns "
    "impute with the train-fitted mean (we fix the reference's per-slice "
    "leakage — SURVEY §7.4), non-numeric columns with the mode "
    "(execute_calls.py:565-575; groupBy count + deterministic tie-break). "
    "Both fitted statistics broadcast over the fact side in one pass; "
    "synthetic missingness on id%10 for the oracle check.",
)
def p7_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = canonical_events(spark, sf_dir)
    holes = df.select(
        "id",
        F.when(F.col("id") % 10 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value_raw"),
        F.when(F.col("id") % 10 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("event_type"))
        .alias("cat_raw"),
    )
    # Both fitted statistics from ONE pass: the separate mean and mode
    # aggregations each re-expanded the canonical-events lineage (3
    # corpus scans). value_raw and cat_raw are null on exactly the same
    # rows (id%10), so the global fixed-point mean reconstructs EXACTLY
    # from per-category integer sums (favg = sum(fixed)/ (scale*count),
    # and integer sums are associative); the mode reads the same tiny
    # cached per-category frame.
    from exact_spark.functions import SCALE6, fixed

    per = (
        holes.groupBy("cat_raw")
        .agg(
            F.count("value_raw").alias("nv"),
            F.sum(fixed(F.col("value_raw"))).alias("s_fx"),
            F.count(F.lit(1)).alias("n"),
        )
        .cache()
    )
    stats = per.agg(
        (F.sum("s_fx") / (F.lit(float(SCALE6)) * F.sum("nv"))).alias("mean_value")
    )
    mode = (
        per.filter(F.col("cat_raw").isNotNull())
        .orderBy(F.col("n").desc(), F.col("cat_raw"))
        .limit(1)
        .select(F.col("cat_raw").alias("mode_value"))
    )
    return (
        holes.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(mode))
        .select(
            "id",
            F.coalesce(F.col("value_raw"), F.col("mean_value")).alias("value_imputed"),
            F.coalesce(F.col("cat_raw"), F.col("mode_value")).alias("cat_imputed"),
            F.when(F.col("value_raw").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("was_missing"),
        )
    )


_P13_L = 3  # window length for the alignment demo


@register(
    "p13_alignment",
    sql=f"""
    WITH canon AS ({CANON_SQL}),
    win AS (
        SELECT id,
               count(*) OVER w AS w_n,
               SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS w_sum_fx
        FROM canon
        WINDOW w AS (ORDER BY id ROWS BETWEEN {_P13_L - 1} PRECEDING AND CURRENT ROW)
    ),
    thr AS (SELECT {sql_favg('value')} AS m FROM canon),
    winres AS (
        SELECT w.id, CASE WHEN w.w_sum_fx / {_P13_L}000000.0 > t.m THEN 1 ELSE 0 END AS flag
        FROM win w, thr t WHERE w.w_n = {_P13_L}
    )
    SELECT c.id, COALESCE(r.flag, 0) AS aligned_flag
    FROM canon c LEFT JOIN winres r ON c.id = r.id
    """,
    doc="P13: detection-result alignment (execute_calls.py:653-690) — a "
    "window model emits one result per full window; instead of positional "
    "padding, results key on the window-end id and left-join back with "
    "coalesce(flag, false) for the first L-1 rows.",
)
def p13_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    from exact_spark.functions import fixed

    df = canonical_events(spark, sf_dir)
    w = Window.orderBy("id").rowsBetween(-(_P13_L - 1), Window.currentRow)
    win = df.select(
        "id",
        F.count(F.lit(1)).over(w).alias("w_n"),
        F.sum(fixed(F.col("value"))).over(w).alias("w_sum_fx"),
    )
    thr = df.agg(favg(F.col("value")).alias("m"))
    winres = (
        win.filter(F.col("w_n") == _P13_L)
        .crossJoin(F.broadcast(thr))
        .select(
            "id",
            F.when(
                F.col("w_sum_fx") / F.lit(float(_P13_L * 1_000_000)) > F.col("m"), 1
            )
            .otherwise(0)
            .alias("flag"),
        )
    )
    return df.select("id").join(winres.withColumnRenamed("id", "wid"),
                                F.col("id") == F.col("wid"), "left").select(
        "id", F.coalesce(F.col("flag"), F.lit(0)).alias("aligned_flag")
    )


@register(
    "j1_flag_writeback",
    sql=f"""
    WITH canon AS ({CANON_SQL}),
    thr AS (SELECT quantile_cont(value, 0.95) AS t FROM canon),
    preds AS (
        SELECT c.id FROM canon c, thr WHERE c.value > thr.t
    )
    SELECT c.id,
           CASE WHEN p.id IS NOT NULL THEN 1 ELSE 0 END AS is_anomaly,
           c.label
    FROM canon c LEFT JOIN preds p ON c.id = p.id
    """,
    doc="J1/J2/S8: attach predictions and write is_anomaly flags as one "
    "set-oriented broadcast join (replaces timescaledb_api.py:238-274's "
    "per-row UPDATE loop and execute_calls.py:653-709's positional align).",
)
def j1_flag_writeback(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = canonical_events(spark, sf_dir)
    thr = df.agg(F.percentile(F.col("value"), F.lit(0.95)).alias("t"))
    preds = (
        df.crossJoin(F.broadcast(thr))
        .filter(F.col("value") > F.col("t"))
        .select(F.col("id").alias("pred_id"))
    )
    return df.join(F.broadcast(preds), df.id == F.col("pred_id"), "left").select(
        "id",
        F.when(F.col("pred_id").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_anomaly"),
        "label",
    )


