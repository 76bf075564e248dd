"""Reusable column-expression helpers.

Cross-engine exactness
----------------------
The correctness gate hash-compares Spark output against a DuckDB oracle.
Per-row IEEE-754 double arithmetic is bit-identical across engines, but the
*reduction order* of SUM/AVG over doubles is not — so any float aggregate
would differ in the last ulp and fail a hash compare.

Fix: aggregate in fixed-point. ``fixed(col)`` maps a double to
``floor(x * scale + 0.5)`` as BIGINT (bit-identical per row in both engines
since it is a single multiply+add+floor), integer sums are exact and
order-independent, and the final divide back to double is again a single
identical operation. ``sql_*`` emit the same formula as ANSI SQL so both
sides compute literally the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE6 = 1_000_000
SCALE2 = 100


def fixed(col: Column, scale: int = SCALE6) -> Column:
    """Fixed-point encode a double column for order-independent aggregation."""
    return F.floor(col * F.lit(float(scale)) + F.lit(0.5)).cast("long")


def fsum(col: Column, scale: int = SCALE6) -> Column:
    """Exact cross-engine SUM of a double expression, returned as double."""
    return F.sum(fixed(col, scale)) / F.lit(float(scale))


def favg(col: Column, scale: int = SCALE6) -> Column:
    """Exact cross-engine AVG of a double expression, returned as double.

    Note: assumes the expression is non-null on counted rows (COUNT of the
    same expression is used as the denominator on both sides).
    """
    return F.sum(fixed(col, scale)) / (F.lit(float(scale)) * F.count(col))


def fround(col: Column, scale: int = SCALE6) -> Column:
    """Deterministic scalar round-to-scale via the same floor formula."""
    return fixed(col, scale) / F.lit(float(scale))


def epoch_seconds(ts: Column) -> Column:
    """Timestamp -> fractional epoch seconds (micros/1e6), tz-free.

    Matches DuckDB ``epoch(ts)`` exactly (both divide a micros integer by
    1e6 in double space).
    """
    return ts.cast("double")


def epoch_micros(df, col: str) -> Column:
    """LONG epoch microseconds from any timestamp storage the source data
    has shipped with:

    - ``bigint``: parquet TIMESTAMP(NANOS) read via
      ``spark.sql.legacy.parquet.nanosAsLong`` — integer-divide to micros
      (the ns epoch exceeds double's 2^53 exact range; micros are exact).
    - ``timestamp`` (LTZ): ``unix_micros`` directly.
    - ``timestamp_ntz``: parquet micros without UTC adjustment — Spark 4
      infers NTZ (``spark.sql.parquet.inferTimestampNTZ.enabled``). The
      data is naive-UTC and the session timezone is pinned UTC
      (session.tune_session), so the NTZ->LTZ cast is exact and matches
      DuckDB's ``epoch_us(ts)`` of the same file.
    """
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype in ("bigint", "long"):
        return F.expr(f"{col} DIV 1000")
    if dtype == "int":
        # a 32-bit int cannot hold a ns (or µs) epoch — it is epoch
        # SECONDS, the same reading epoch_seconds_any gives it
        return c.cast("long") * F.lit(1_000_000).cast("long")
    if dtype == "timestamp_ntz":
        c = c.cast("timestamp")
    return F.unix_micros(c)


def epoch_seconds_any(df, col: str) -> Column:
    """DOUBLE fractional epoch seconds from any supported timestamp dtype
    (see ``epoch_micros``); numeric columns pass through as-is (already
    epoch seconds)."""
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype in ("bigint", "long"):
        return F.expr(f"{col} DIV 1000") / F.lit(1e6)
    if dtype == "timestamp_ntz":
        c = c.cast("timestamp")
    if dtype.startswith("timestamp"):
        return c.cast("double")
    return c.cast("double")


# --- SQL-side mirrors (DuckDB oracle) ---------------------------------------

def sql_fixed(expr: str, scale: int = SCALE6) -> str:
    return f"CAST(FLOOR(({expr}) * {scale}.0 + 0.5) AS BIGINT)"


def sql_fsum(expr: str, scale: int = SCALE6) -> str:
    return f"(SUM({sql_fixed(expr, scale)}) / {scale}.0)"


def sql_favg(expr: str, scale: int = SCALE6) -> str:
    return f"(SUM({sql_fixed(expr, scale)}) / ({scale}.0 * COUNT({expr})))"


def sql_fround(expr: str, scale: int = SCALE6) -> str:
    return f"({sql_fixed(expr, scale)} / {scale}.0)"


def sql_epoch(expr: str) -> str:
    return f"epoch({expr})"
