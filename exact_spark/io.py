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

#: (applicationId, resolved path, content fingerprint, variant) -> lazy
#: DataFrame. See read_parquet_memo.
_SCAN_MEMO: dict = {}


def read_parquet_memo(spark: SparkSession, path: str) -> DataFrame:
    """Memoized LAZY parquet scan of an immutable file/dir.

    ``spark.read.parquet`` pays ~100 ms of driver-side work per call
    (file listing + footer/schema inference) before any action runs; a
    266-query suite re-reads the same ten testdata tables and a dozen
    per-corpus artifacts hundreds of times, so this fixed cost alone was
    tens of seconds per run (guide §5: the driver should do almost no
    work; §6: repeated listings are cacheable). The memo stores the
    ANALYZED lazy plan only — no rows, no results; every action still
    computes from the parquet files, and `spark.catalog.clearCache()`
    does not touch it (nothing is persisted). Keys carry the session's
    applicationId (a DataFrame dies with its session) and the stat-based
    content fingerprint (names+sizes+mtimes), so changed data can never
    be served a stale plan. Entries go through artifacts.memo_put, which
    both bounds growth and enrolls the memo in the bench's retry
    snapshot/evict discipline. MUTABLE paths (the catalog's job tables)
    must NOT use this — they re-read via spark.read.parquet directly.
    """
    import pathlib

    from exact_spark.artifacts import memo_put, source_fingerprint

    p = str(pathlib.Path(path).resolve())
    key = (spark.sparkContext.applicationId, p, source_fingerprint(p), "scan")
    df = _SCAN_MEMO.get(key)
    if df is None:
        df = memo_put(_SCAN_MEMO, key, spark.read.parquet(p), cap=512)
    return df


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
    import pathlib

    from exact_spark.artifacts import memo_put, source_fingerprint

    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = str(pathlib.Path(f"{sf_dir}/{name}.parquet").resolve())
    variant = "spread" if spread else "scan"
    key = (spark.sparkContext.applicationId, path, source_fingerprint(path), variant)
    df = _SCAN_MEMO.get(key)
    if df is None:
        df = read_parquet_memo(spark, path)
        if spread:
            target = spark.sparkContext.defaultParallelism
            if df.rdd.getNumPartitions() < target:
                df = df.repartition(target)
            memo_put(_SCAN_MEMO, key, df, cap=512)
    return df
