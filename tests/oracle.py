"""Local mirror of the driver's correctness gate: run a registered query on
Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row count, schema (column names), and values order-insensitively.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from exact_spark.io import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # normalize ints (duckdb may give int32/hugeint; spark int64/int32)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == object and all(
            isinstance(v, int) for v in df[c].dropna().head(5)
        ):
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, OverflowError, ValueError):
                pass
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass).

    ``spark_df`` may be a Spark DataFrame or an already-collected pandas
    frame (so callers that need the rows anyway don't run the query twice).
    """
    errs: list[str] = []
    sp = _canon(spark_df.toPandas() if hasattr(spark_df, "toPandas") else spark_df)
    oc = _canon(oracle_df)
    if sorted(sp.columns) != sorted(oc.columns):
        errs.append(f"{name}: columns differ spark={sorted(sp.columns)} oracle={sorted(oc.columns)}")
        return errs
    if len(sp) != len(oc):
        errs.append(f"{name}: row count spark={len(sp)} oracle={len(oc)}")
        return errs
    for c in sp.columns:
        a, b = sp[c], oc[c]
        # Driver-strict: the driver hashes TYPED values, so an integer column
        # on one side vs a float column on the other (the DuckDB HUGEINT →
        # pandas float64 drift) is a hard failure even when values agree.
        int_a, int_b = pd.api.types.is_integer_dtype(a), pd.api.types.is_integer_dtype(b)
        flt_a, flt_b = pd.api.types.is_float_dtype(a), pd.api.types.is_float_dtype(b)
        if (int_a and flt_b) or (flt_a and int_b):
            errs.append(
                f"{name}.{c}: dtype drift spark={a.dtype} oracle={b.dtype} — "
                "driver's typed hash would fail (cast the oracle SQL, e.g. "
                "HUGEINT sums: CAST(SUM(..) AS BIGINT))"
            )
            continue
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            aa, bb = a.astype("float64"), b.astype("float64")
            neq = ~(
                (aa == bb)
                | (aa.isna() & bb.isna())
                | ((aa - bb).abs() <= 0)  # exact match required
            )
            if neq.any():
                i = neq.idxmax()
                maxdiff = (aa - bb).abs().max()
                errs.append(
                    f"{name}.{c}: {int(neq.sum())} float mismatches, first at row {i}: "
                    f"spark={aa[i]!r} oracle={bb[i]!r} maxdiff={maxdiff!r}"
                )
        else:
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                errs.append(
                    f"{name}.{c}: {int(neq.sum())} mismatches, first at row {i}: "
                    f"spark={a[i]!r} oracle={b[i]!r}"
                )
    return errs
