"""Snapshot-versioned table layer: commit atomicity, time travel, retention."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from exact_spark.sources.versioned import VersionedTable


@pytest.fixture()
def tbl(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path), "t")


def _df(spark, lo, hi, flag=False):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(flag).alias("flag")
    )


def test_create_append_replace_time_travel(spark, tbl):
    tbl.create(_df(spark, 0, 100))
    tbl.append(_df(spark, 100, 150))
    tbl.replace_where(
        _df(spark, 0, 100, flag=True), keep_predicate=F.col("k") >= 100
    )
    # all three versions readable AFTER the later commits
    assert tbl.read(1).count() == 100
    assert tbl.read(2).count() == 150
    assert tbl.read(3).count() == 150
    assert tbl.read(3).filter("flag").count() == 100
    assert tbl.read(2).filter("flag").count() == 0  # old snapshot unchanged
    ops = [h["op"] for h in tbl.history()]
    assert ops == ["create", "append", "replace"]


def test_compact_preserves_rows_and_shrinks_files(spark, tbl):
    tbl.create(_df(spark, 0, 1000).repartition(8))
    n_before = tbl.manifest(1)["n_files"]
    tbl.compact(target_files=1)
    assert tbl.manifest(2)["n_files"] == 1 < n_before
    a = sorted(r["k"] for r in tbl.read(1).collect())
    b = sorted(r["k"] for r in tbl.read(2).collect())
    assert a == b


def test_uncommitted_stage_is_invisible(spark, tbl):
    tbl.create(_df(spark, 0, 10))
    # a crashed writer: staged files with no manifest commit
    tbl._stage(_df(spark, 10, 99))
    assert tbl.read().count() == 10  # reader resolves the manifest, not ls
    assert tbl.latest() == 1


def test_vacuum_retention(spark, tbl):
    tbl.create(_df(spark, 0, 10))
    tbl.append(_df(spark, 10, 20))
    tbl.compact(target_files=1)
    # keep_last=2 retains v2+v3 — every file is still referenced (v2 holds
    # the pre-compaction files), so only the v1 manifest goes
    res = tbl.vacuum(keep_last=2)
    assert res["removed_manifests"] == 1
    assert res["removed_files"] == 0
    assert tbl.versions() == [2, 3]
    assert tbl.read(2).count() == 20
    # retention down to the latest: the pre-compaction files unreference
    res = tbl.vacuum(keep_last=1)
    assert res["removed_files"] >= 2
    assert tbl.versions() == [3]
    assert tbl.read(3).count() == 20
    with pytest.raises(FileNotFoundError):
        tbl.manifest(1)


def test_commit_race_resolves_to_distinct_versions(spark, tbl):
    """Two writers staging concurrently both commit — exclusive manifest
    create forces the loser onto the next version number (no lost update)."""
    tbl.create(_df(spark, 0, 10))
    f1 = tbl._stage(_df(spark, 10, 20))
    f2 = tbl._stage(_df(spark, 20, 30))
    prev = tbl.manifest(tbl.latest())["files"]
    v_a = tbl._commit(prev + f1, "append")
    v_b = tbl._commit(prev + f2, "append")
    assert {v_a, v_b} == {2, 3}
    assert tbl.read(2).count() == 20 and tbl.read(3).count() == 20


def test_manifest_is_valid_json_with_sorted_files(spark, tbl):
    tbl.create(_df(spark, 0, 10))
    doc = json.loads((tbl.vdir / "v1.json").read_text())
    assert doc["files"] == sorted(doc["files"])
    assert doc["op"] == "create"


def test_schema_evolution_and_time_travel_schema(spark, tbl):
    """An append may add a column: the latest snapshot serves the union
    schema with nulls backfilled for pre-evolution files, while a time
    travel read of the old version sees only the old schema."""
    tbl.create(_df(spark, 0, 10))
    evolved = _df(spark, 10, 20).withColumn("score", F.col("k") * 2)
    tbl.append(evolved)
    cur = tbl.read()
    assert "score" in cur.columns
    assert cur.filter(F.col("score").isNull()).count() == 10  # backfilled
    assert cur.filter(F.col("score").isNotNull()).count() == 10
    assert "score" not in tbl.read(1).columns  # v1 schema untouched


def test_restore_rolls_back_without_copying(spark, tbl):
    tbl.create(_df(spark, 0, 10))
    tbl.replace_where(_df(spark, 0, 5), keep_predicate=F.lit(False))  # bad write
    assert tbl.read().count() == 5
    v = tbl.restore(1)
    assert v == 3
    assert tbl.read().count() == 10  # rolled back
    # no data copied: the restore manifest references v1's exact files
    assert tbl.manifest(3)["files"] == tbl.manifest(1)["files"]
    assert tbl.history()[-1]["op"] == "restore"


def test_merge_upsert_semantics(spark, tmp_path):
    from exact_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path), "mu")
    rows = [{"k": i, "v": float(i)} for i in range(10)]
    t.create(spark.createDataFrame(rows))
    batch = spark.createDataFrame(
        [{"k": 3, "v": 30.0}, {"k": 7, "v": 70.0}, {"k": 99, "v": 99.0}]
    )
    v2 = t.merge_upsert(batch, "k")
    cur = {r["k"]: r["v"] for r in t.read(v2).collect()}
    # matched updated, unmatched inserted, untouched preserved
    assert cur[3] == 30.0 and cur[7] == 70.0 and cur[99] == 99.0
    assert cur[0] == 0.0 and len(cur) == 11
    # time travel: v1 unchanged
    old = {r["k"]: r["v"] for r in t.read(1).collect()}
    assert old[3] == 3.0 and 99 not in old
    # merge twice with the same batch is idempotent on content
    v3 = t.merge_upsert(batch, "k")
    assert {r["k"]: r["v"] for r in t.read(v3).collect()} == cur


def test_overwrite_projection_drop(spark, tbl):
    """overwrite() commits a complete replacement snapshot (CTAS-style
    REPLACE): the column-drop-by-projection path. Prior versions keep
    their own schema AND their own rows."""
    tbl.create(_df(spark, 0, 10))
    tbl.append(_df(spark, 10, 20).withColumn("score", F.col("k") * 2))
    tbl.overwrite(tbl.read().select("k", "flag"), note="drop score")
    assert tbl.read().columns == ["k", "flag"]  # dropped in v3
    assert tbl.read().count() == 20  # rows preserved
    assert "score" in tbl.read(2).columns  # history schema intact
    assert tbl.read(2).filter(F.col("score").isNotNull()).count() == 10
    assert [h["op"] for h in tbl.history()][-1] == "overwrite"
