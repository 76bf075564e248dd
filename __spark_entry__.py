"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over exact_spark.registry — every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions) registers a
``(spark, sf_dir) -> DataFrame`` callable and, where SQL-expressible, a
DuckDB oracle query computing the same result.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from exact_spark.registry import all_oracles, all_queries

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the EXACT §7.2 end-to-end slice — canonicalize the
    events series, P95-threshold detection, confusion metrics."""
    from exact_spark.operators.metrics import g1_confusion_metrics

    return g1_confusion_metrics(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
