"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB oracle SQL string computing the same result on the same
parquet tables. ``__spark_entry__.py`` exposes this registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, doc: str = ""):
    """Decorator registering a query + its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: s.fn for n, s in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: s.sql for n, s in REGISTRY.items() if s.sql is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from exact_spark.operators import (  # noqa: F401
        dedup,
        inject,
        metrics,
        multimodal,
        prep,
        relational,
        similarity,
        text,
        timeseries,
        windows,
    )
    from exact_spark import ml as _ml  # noqa: F401
    from exact_spark import streaming as _streaming  # noqa: F401
    from exact_spark.plans import api as _api  # noqa: F401
    from exact_spark.sources import catalog as _catalog  # noqa: F401
    from exact_spark.sources import ingest as _ingest  # noqa: F401
    _LOADED = True
