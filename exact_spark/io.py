"""Testdata table access.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one testdata table.

    ``spread=True`` fans a too-coarse scan out to the session's full
    parallelism. The testdata files are single-row-group parquet, so the
    scan itself cannot split and every downstream expression would run in
    ONE task; compute-heavy operators (shingling, hashing, vector math)
    opt in. At real scale the source has many files/row groups and the
    condition below is false, making this a no-op — selective-filter
    operators must NOT use it, because a repartition barrier would keep
    their predicates from reaching the parquet scan.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df
