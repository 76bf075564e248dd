"""Canonical-table materialization: granularity, fingerprint caching, and
partition pruning — including the DAY-granularity path (the 100 TB layout),
which small scale factors never hit organically."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from exact_spark.operators import timeseries as ts


@pytest.fixture()
def day_granularity(monkeypatch):
    """Force the day-partition decision a big source would take."""
    monkeypatch.setattr(ts, "_DAY_PARTITION_MIN_BYTES", 0)
    yield


def test_day_granularity_table_prunes(spark, sf_dir, day_granularity, tmp_path):
    # fresh materialization under the forced decision: point the cache at a
    # COPY of the source dir so the month-granularity cache of other tests
    # (keyed on the original's fingerprint) is not disturbed
    import shutil

    src = tmp_path / "sf"
    src.mkdir()
    shutil.copy(pathlib.Path(sf_dir) / "events.parquet", src / "events.parquet")
    path = pathlib.Path(ts.canonical_table_path(spark, str(src)))

    assert ts.canonical_granularity(str(path)) == "day"
    days = sorted(p.name for p in path.iterdir() if p.name.startswith("__date="))
    assert len(days) > 5  # one dir per day of the series

    # range read: only the in-range date dirs are listed (PartitionFilters)
    lo = ts.canonical_events(spark, str(src)).agg(F.min("ts_epoch")).collect()[0][0]
    t0, t1 = lo + 86400.0, lo + 3 * 86400.0
    ranged = ts.canonical_events_range(spark, str(src), t0, t1)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ranged.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "__date" in plan

    got = ranged.select("ts_epoch").collect()
    assert all(t0 <= r["ts_epoch"] < t1 for r in got)
    # exact row parity with an unpruned filter over the full table
    full = (
        ts.canonical_events(spark, str(src))
        .filter((F.col("ts_epoch") >= t0) & (F.col("ts_epoch") < t1))
        .count()
    )
    assert len(got) == full > 0


def test_fingerprint_cache_invalidation(spark, sf_dir, tmp_path):
    """A regenerated source dir must get a fresh canonical table — the
    cache key is the content fingerprint, not the path."""
    import shutil

    src = tmp_path / "sf"
    src.mkdir()
    shutil.copy(pathlib.Path(sf_dir) / "events.parquet", src / "events.parquet")
    p1 = ts.canonical_table_path(spark, str(src))
    # touching the file's mtime counts as regeneration
    import os

    st = (src / "events.parquet").stat()
    os.utime(src / "events.parquet", ns=(st.st_atime_ns, st.st_mtime_ns + 10**9))
    p2 = ts.canonical_table_path(spark, str(src))
    assert p1 != p2
    # same contents -> same row set either way
    n1 = spark.read.parquet(p1).count()
    n2 = spark.read.parquet(p2).count()
    assert n1 == n2 > 0
