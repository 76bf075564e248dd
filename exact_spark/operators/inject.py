"""Anomaly injection operators (SURVEY.md §2.3: A1-A10).

Reference: Backend/Simulator/AnomalyInjector/anomalyinjector.py (driver,
seeded ``np.random.default_rng(42)`` at anomalyinjector.py:20-21) and
Backend/Simulator/InjectionMethods/{spike,step,lowered,offline,custom}.py.

Determinism under parallelism (SURVEY §7.4): the reference's rng semantics
depend on pandas row order. We re-express them so results are stable under
any partitioning:

- scalar random draws (the per-call factors of spike/lowered) are made on
  the driver with the same seeded generator and broadcast as literals;
- the percentage subsample (A3, anomalyinjector.py:133-142) ranks rows by
  ``md5(seed || id)`` — a deterministic pseudorandom order identical in any
  engine — and keeps the first ``floor(n * pct/100)``.

Injected rows get ``injected_anomaly=1, label=1`` (A9,
anomalyinjector.py:163-167).

Note ``offline`` raises TypeError in the reference (offline.py:1-4 called
with a data arg at anomalyinjector.py:206-209); we implement the evident
intent (constant 0).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from exact_spark.functions import sql_favg, favg
from exact_spark.operators.timeseries import CANON_SQL, canonical_events
from exact_spark.registry import register

# --- seeded scalar draws (mirrors anomalyinjector.py:20-21) -----------------
_rng = np.random.default_rng(42)
SPIKE_MAGNITUDE = 3.0
SPIKE_FACTOR = float(_rng.uniform(1.0, SPIKE_MAGNITUDE))  # spike.py:7-9
LOWERED_FACTOR = float(_rng.uniform(0.3, 0.4))  # lowered.py:9-22
STEP_MAGNITUDE = 2.0  # step.py:7-9
CUSTOM_MAGNITUDE = 2.5  # custom.py:6-9

# Injection span (A1): [2024-01-10, 2024-01-12) UTC.
SPAN_T0 = 1704844800.0
SPAN_T1 = 1705017600.0
PCT = 60.0  # A3 percentage subsample

_SPAN_SQL = f"""
    WITH canon AS ({CANON_SQL}),
    span AS (
        SELECT id, ts_epoch, value, label,
               md5('s42:' || CAST(id AS VARCHAR)) AS rk
        FROM canon
        WHERE ts_epoch >= {SPAN_T0!r} AND ts_epoch < {SPAN_T1!r}
    ),
    nsel AS (SELECT CAST(FLOOR(count(*) * {PCT!r} / 100.0) AS BIGINT) AS k FROM span),
    sel AS (
        SELECT s.id, s.ts_epoch, s.value, s.label,
               CASE WHEN row_number() OVER (ORDER BY s.rk, s.id) <= n.k
                    THEN 1 ELSE 0 END AS selected
        FROM span s, nsel n
    )
"""


def _span_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 span filter + A3 deterministic percentage subsample."""
    df = canonical_events(spark, sf_dir)
    span = df.filter((F.col("ts_epoch") >= SPAN_T0) & (F.col("ts_epoch") < SPAN_T1)).select(
        "id",
        "ts_epoch",
        "value",
        "label",
        F.md5(F.concat(F.lit("s42:"), F.col("id").cast("string"))).alias("rk"),
    )
    k = span.agg(F.floor(F.count(F.lit(1)) * PCT / 100.0).alias("k"))
    w = Window.orderBy("rk", "id")
    return (
        span.crossJoin(F.broadcast(k))
        .withColumn(
            "selected",
            F.when(F.row_number().over(w) <= F.col("k"), F.lit(1)).otherwise(F.lit(0)),
        )
        .drop("rk", "k")
    )


def _with_flags(df: DataFrame, value_out: Column) -> DataFrame:
    """A9: flag propagation on selected rows."""
    sel = F.col("selected") == 1
    return df.select(
        "id",
        F.when(sel, value_out).otherwise(F.col("value")).alias("value_out"),
        F.when(sel, F.lit(1)).otherwise(F.lit(0)).alias("injected_anomaly"),
        F.when(sel, F.lit(1)).otherwise(F.col("label")).alias("label"),
    )


def _sql_inject(value_out_expr: str, extra_ctes: str = "") -> str:
    return f"""
    {_SPAN_SQL}
    {extra_ctes}
    SELECT id,
           CASE WHEN selected = 1 THEN {value_out_expr} ELSE value END AS value_out,
           CASE WHEN selected = 1 THEN 1 ELSE 0 END AS injected_anomaly,
           CASE WHEN selected = 1 THEN 1 ELSE label END AS label
    FROM sel
    """


@register(
    "inject_spike",
    sql=_sql_inject(f"value * {SPIKE_FACTOR!r}"),
    doc="A4 spike: x * U(1, magnitude), one seeded scalar per injection call "
    "(spike.py:7-9); span A1 + 60% subsample A3 + flags A9.",
)
def inject_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _span_selected(spark, sf_dir)
    return _with_flags(df, F.col("value") * F.lit(SPIKE_FACTOR))


@register(
    "inject_step",
    sql=_sql_inject(
        f"value + stats.mean_sel * {STEP_MAGNITUDE!r}",
        extra_ctes=f", stats AS (SELECT {sql_favg('value')} AS mean_sel FROM sel WHERE selected = 1)",
    ).replace("FROM sel\n", "FROM sel, stats\n"),
    doc="A5 step: x + mean * magnitude, mean over the selected rows "
    "(step.py:7-9, stats pre-pass anomalyinjector.py:149-154).",
)
def inject_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _span_selected(spark, sf_dir)
    stats = df.filter(F.col("selected") == 1).agg(favg(F.col("value")).alias("mean_sel"))
    df = df.crossJoin(F.broadcast(stats))
    return _with_flags(df, F.col("value") + F.col("mean_sel") * F.lit(STEP_MAGNITUDE))


@register(
    "inject_lowered",
    sql=_sql_inject(
        f"""CASE WHEN GREATEST(value - stats.rng_sel * {LOWERED_FACTOR!r}, 0.0) = 0.0
                 THEN value * {LOWERED_FACTOR!r}
                 ELSE GREATEST(value - stats.rng_sel * {LOWERED_FACTOR!r}, 0.0) END""",
        extra_ctes=", stats AS (SELECT max(value) - min(value) AS rng_sel FROM sel WHERE selected = 1)",
    ).replace("FROM sel\n", "FROM sel, stats\n"),
    doc="A6 lowered: max(x - range*U(0.3,0.4), 0); zeros replaced by "
    "x*factor (lowered.py:9-22); range over selected rows (A10).",
)
def inject_lowered(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _span_selected(spark, sf_dir)
    stats = df.filter(F.col("selected") == 1).agg(
        (F.max("value") - F.min("value")).alias("rng_sel")
    )
    df = df.crossJoin(F.broadcast(stats))
    lowered = F.greatest(
        F.col("value") - F.col("rng_sel") * F.lit(LOWERED_FACTOR), F.lit(0.0)
    )
    out = F.when(lowered == 0.0, F.col("value") * F.lit(LOWERED_FACTOR)).otherwise(lowered)
    return _with_flags(df, out)


@register(
    "inject_offline",
    sql=_sql_inject("0.0"),
    doc="A7 offline: constant 0 — the evident intent; the reference method "
    "raises TypeError as shipped (offline.py:1-4 vs anomalyinjector.py:206-209).",
)
def inject_offline(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _span_selected(spark, sf_dir)
    return _with_flags(df, F.lit(0.0))


@register(
    "inject_custom",
    sql=_sql_inject(f"value * {CUSTOM_MAGNITUDE!r}"),
    doc="A8 custom: x * magnitude (custom.py:6-9).",
)
def inject_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _span_selected(spark, sf_dir)
    return _with_flags(df, F.col("value") * F.lit(CUSTOM_MAGNITUDE))
