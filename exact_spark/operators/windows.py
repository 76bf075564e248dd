"""Window / sequence-construction operators (SURVEY.md §2.6: W1-W3) plus a
sessionization extension.

W1 (Backend/utils.py:147-282 ``dataframe_to_sequences``): all length-L
trailing windows of the feature columns, full windows only. The reference
materializes a 3-D NumPy tensor; the Spark-native form keeps windows as
window-aggregate columns (for SQL-expressible features) or as
``collect_list`` arrays for model scoring (see exact_spark.ml). Crossing
partition boundaries is handled by Spark's window exchange (hash partition
by the series key, sort within).

W3 (Backend/utils.py:7-145 ``select_explanation_indices``): instance
sampling strategies; seeded randomness re-expressed as md5-order so it is
stable under any partitioning (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from exact_spark.functions import fixed
from exact_spark.operators.timeseries import CANON_SQL, canonical_events
from exact_spark.registry import register

_L = 3  # sequence length for the oracle-checkable window query


@register(
    "w1_sliding_features",
    sql=f"""
    WITH canon AS ({CANON_SQL}),
    win AS (
        SELECT user_id, id,
               count(*) OVER w AS w_n,
               SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) OVER w AS w_sum_fx,
               min(value) OVER w AS w_min,
               max(value) OVER w AS w_max
        FROM canon
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_epoch, id
                     ROWS BETWEEN {_L - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, id,
           w_sum_fx / {_L}000000.0 AS w_avg,
           w_min, w_max
    FROM win WHERE w_n = {_L}
    """,
    doc="W1: trailing length-3 sliding window per series (utils.py:147-282), "
    "full windows only (count==L), fixed-point window sum for exactness.",
)
def w1_sliding_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = canonical_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch", "id")
        .rowsBetween(-(_L - 1), Window.currentRow)
    )
    out = df.select(
        "user_id",
        "id",
        F.count(F.lit(1)).over(w).alias("w_n"),
        F.sum(fixed(F.col("value"))).over(w).alias("w_sum_fx"),
        F.min("value").over(w).alias("w_min"),
        F.max("value").over(w).alias("w_max"),
    )
    return out.filter(F.col("w_n") == _L).select(
        "user_id",
        "id",
        (F.col("w_sum_fx") / F.lit(float(_L * 1_000_000))).alias("w_avg"),
        "w_min",
        "w_max",
    )


_N_SAMPLE = 20


@register(
    "w3_sampling_strategies",
    sql=f"""
    WITH canon AS ({CANON_SQL}),
    rnd AS (SELECT id, label, md5('w3:' || CAST(id AS VARCHAR)) AS rk FROM canon),
    first_n AS (
        SELECT 'first_n' AS strategy, id FROM
        (SELECT id, row_number() OVER (ORDER BY id) AS rn FROM rnd) WHERE rn <= {_N_SAMPLE}),
    rand_n AS (
        SELECT 'random' AS strategy, id FROM
        (SELECT id, row_number() OVER (ORDER BY rk, id) AS rn FROM rnd) WHERE rn <= {_N_SAMPLE}),
    first_anom AS (
        SELECT 'first_n_anomalies' AS strategy, id FROM
        (SELECT id, row_number() OVER (ORDER BY id) AS rn FROM rnd WHERE label = 1) WHERE rn <= {_N_SAMPLE}),
    last_anom AS (
        SELECT 'last_n_anomalies' AS strategy, id FROM
        (SELECT id, row_number() OVER (ORDER BY id DESC) AS rn FROM rnd WHERE label = 1) WHERE rn <= {_N_SAMPLE}),
    rand_anom AS (
        SELECT 'random_anomalies' AS strategy, id FROM
        (SELECT id, row_number() OVER (ORDER BY rk, id) AS rn FROM rnd WHERE label = 1) WHERE rn <= {_N_SAMPLE}),
    half_a AS (
        SELECT 'half_n_half' AS strategy, id FROM
        (SELECT id, row_number() OVER (ORDER BY id DESC) AS rn FROM rnd WHERE label = 1) WHERE rn <= {_N_SAMPLE // 2}),
    half_b AS (
        SELECT 'half_n_half' AS strategy, id FROM
        (SELECT id, row_number() OVER (ORDER BY id DESC) AS rn FROM rnd WHERE label = 0) WHERE rn <= {_N_SAMPLE // 2})
    SELECT * FROM first_n UNION ALL SELECT * FROM rand_n
    UNION ALL SELECT * FROM first_anom UNION ALL SELECT * FROM last_anom
    UNION ALL SELECT * FROM rand_anom UNION ALL SELECT * FROM half_a
    UNION ALL SELECT * FROM half_b
    """,
    doc="W3: explanation-instance sampling strategies (utils.py:7-145) — "
    "first_n / random / {{first,last,random}}_n_anomalies / half_n_half; "
    "seeded rng re-expressed as md5 ordering.",
)
def w3_sampling_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = canonical_events(spark, sf_dir).select(
        "id", "label", F.md5(F.concat(F.lit("w3:"), F.col("id").cast("string"))).alias("rk")
    )
    df = df.cache()

    def take(src: DataFrame, order, n: int, name: str) -> DataFrame:
        w = Window.orderBy(*order)
        return (
            src.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
            .select(F.lit(name).alias("strategy"), "id")
        )

    anom = df.filter(F.col("label") == 1)
    norm = df.filter(F.col("label") == 0)
    parts = [
        take(df, [F.col("id")], _N_SAMPLE, "first_n"),
        take(df, [F.col("rk"), F.col("id")], _N_SAMPLE, "random"),
        take(anom, [F.col("id")], _N_SAMPLE, "first_n_anomalies"),
        take(anom, [F.col("id").desc()], _N_SAMPLE, "last_n_anomalies"),
        take(anom, [F.col("rk"), F.col("id")], _N_SAMPLE, "random_anomalies"),
        take(anom, [F.col("id").desc()], _N_SAMPLE // 2, "half_n_half"),
        take(norm, [F.col("id").desc()], _N_SAMPLE // 2, "half_n_half"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_GAP_S = 1800.0


@register(
    "ts_sessionize",
    sql=f"""
    WITH canon AS ({CANON_SQL}),
    flagged AS (
        SELECT user_id, id, ts_epoch,
               CASE WHEN lag(ts_epoch) OVER w IS NULL
                         OR ts_epoch - lag(ts_epoch) OVER w > {_GAP_S!r}
                    THEN 1 ELSE 0 END AS new_session
        FROM canon
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_epoch, id)
    ),
    sessions AS (
        SELECT user_id, id, ts_epoch,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_epoch, id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           count(*) AS n_events,
           min(ts_epoch) AS start_epoch,
           max(ts_epoch) AS end_epoch,
           max(ts_epoch) - min(ts_epoch) AS duration_s
    FROM sessions GROUP BY user_id, session_seq
    """,
    doc="Extension: gap-based sessionization (30-min inactivity) via "
    "lag + cumulative window sum — the streaming session-window analog, "
    "expressed batch-side.",
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = canonical_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_epoch", "id")
    flagged = df.select(
        "user_id",
        "id",
        "ts_epoch",
        F.when(
            F.lag("ts_epoch").over(w).isNull()
            | ((F.col("ts_epoch") - F.lag("ts_epoch").over(w)) > _GAP_S),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("session_seq", F.sum("new_session").over(wc))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_epoch").alias("start_epoch"),
        F.max("ts_epoch").alias("end_epoch"),
        (F.max("ts_epoch") - F.min("ts_epoch")).alias("duration_s"),
    )


# --- interval (range) join via time-bin expansion ---------------------------

_IJ_PAD_S = 300.0
_IJ_BIN_S = 3600


@register(
    "ts_interval_join",
    sql=f"""
    WITH canon AS ({CANON_SQL}),
    flagged AS (
        SELECT user_id, id, ts_epoch,
               CASE WHEN lag(ts_epoch) OVER w IS NULL
                         OR ts_epoch - lag(ts_epoch) OVER w > {_GAP_S!r}
                    THEN 1 ELSE 0 END AS new_session
        FROM canon WHERE event_type = 'error'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_epoch, id)
    ),
    sessions AS (
        SELECT user_id, id, ts_epoch,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_epoch, id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM flagged
    ),
    ivals AS (
        SELECT user_id,
               min(ts_epoch) - {_IJ_PAD_S!r} AS interval_start,
               max(ts_epoch) + {_IJ_PAD_S!r} AS interval_end,
               count(*) AS n_errors
        FROM sessions GROUP BY user_id, session_seq
    )
    SELECT p.id AS purchase_id, p.user_id, p.ts_epoch AS purchase_epoch,
           i.interval_start, i.interval_end, i.n_errors
    FROM canon p
    JOIN ivals i ON p.user_id = i.user_id
                AND p.ts_epoch >= i.interval_start
                AND p.ts_epoch <= i.interval_end
    WHERE p.event_type = 'purchase'
    """,
    doc="Generic interval (range) join, the operator class Spark has no "
    "native physical strategy for: purchases joined into padded error-burst "
    "sessions of the same user. A naive inequality join plans as a nested-"
    "loop/cartesian product — O(|probe| x |intervals|) at scale. Here each "
    "interval explodes into the 1-hour time bins it covers (expansion "
    "factor = interval length / bin width, bounded and small) and each "
    "probe row maps to its single bin, turning the range predicate into an "
    "equi-join on (user_id, bin) + a residual filter. Padded sessions of "
    "one user never overlap (pad < gap/2), so each probe matches at most "
    "one interval and no dedup shuffle is needed. Two shuffles total: the "
    "sessionization window and the equi-join.",
)
def ts_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = canonical_events(spark, sf_dir)
    err = df.filter(F.col("event_type") == "error")
    w = Window.partitionBy("user_id").orderBy("ts_epoch", "id")
    flagged = err.select(
        "user_id",
        "id",
        "ts_epoch",
        F.when(
            F.lag("ts_epoch").over(w).isNull()
            | ((F.col("ts_epoch") - F.lag("ts_epoch").over(w)) > _GAP_S),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ivals = (
        flagged.withColumn("session_seq", F.sum("new_session").over(wc))
        .groupBy("user_id", "session_seq")
        .agg(
            (F.min("ts_epoch") - F.lit(_IJ_PAD_S)).alias("interval_start"),
            (F.max("ts_epoch") + F.lit(_IJ_PAD_S)).alias("interval_end"),
            F.count(F.lit(1)).alias("n_errors"),
        )
        .drop("session_seq")
    )
    # explode intervals into covered bins; probe rows map to exactly one bin
    ivals_b = ivals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col("interval_start") / _IJ_BIN_S),
                F.floor(F.col("interval_end") / _IJ_BIN_S),
            )
        ),
    )
    purch = df.filter(F.col("event_type") == "purchase").select(
        F.col("id").alias("purchase_id"),
        "user_id",
        F.col("ts_epoch").alias("purchase_epoch"),
        F.floor(F.col("ts_epoch") / _IJ_BIN_S).alias("__bin"),
    )
    return (
        purch.join(ivals_b, ["user_id", "__bin"])
        .filter(
            (F.col("purchase_epoch") >= F.col("interval_start"))
            & (F.col("purchase_epoch") <= F.col("interval_end"))
        )
        .select(
            "purchase_id",
            "user_id",
            "purchase_epoch",
            "interval_start",
            "interval_end",
            "n_errors",
        )
    )
