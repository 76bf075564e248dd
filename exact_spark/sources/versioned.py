"""Snapshot-versioned tables: manifest-committed parquet with time travel.

The ``JobCatalog`` (catalog.py) matches the reference's table lifecycle
(S4-S12) with directory-swap atomicity. This module is the LAKEHOUSE-grade
layer on top of the same warehouse: every write commits a JSON **manifest**
listing the table's exact data files, and the manifest rename IS the
commit — the Delta/Iceberg discipline, re-expressed minimally:

- **Readers never list data directories.** A read resolves one manifest and
  opens exactly the files it names. At 100 TB this kills both the
  eventual-consistency window (a half-written directory can never be read:
  its files are not in any committed manifest) and the O(files) listing on
  every query.
- **Snapshot isolation + time travel.** Writers REPLACE file references,
  never files: a replace/compact writes new files next to the old ones and
  commits a manifest pointing at the new set. Version N stays byte-stable
  and readable until retention vacuums it — ``read(version=N)`` is time
  travel, and a long-running reader pinned to N is unaffected by
  concurrent commits (the race ADVICE r03 flagged for the glob-based
  ``table_exists`` cannot exist here).
- **Optimistic concurrency.** A commit writes ``_v/v{N}.json.tmp`` and
  atomically renames to ``v{N}.json``; two racing writers both targeting N
  resolve by the rename failing for one (os.rename to an existing name is
  not atomic-exclusive on all platforms, so we use ``link``+``unlink``
  semantics via exclusive create), which retries against N+1.
- **Retention vacuum.** Files referenced by NO retained manifest are
  deleted; the latest manifest is always retained. This is the only
  deletion path — data files are immutable once committed.

No reference counterpart (the reference has no table versioning at all);
the design follows the published Delta-protocol shape (transaction-log
commit, file-level manifests) without any of its implementation.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class VersionedTable:
    """Manifest-committed parquet table inside a warehouse directory."""

    def __init__(self, spark: SparkSession, warehouse: str, name: str):
        self.spark = spark
        self.root = Path(warehouse) / name
        self.vdir = self.root / "_v"
        self.datadir = self.root / "data"

    # -- manifest plumbing ---------------------------------------------------
    def versions(self) -> list[int]:
        if not self.vdir.is_dir():
            return []
        out = []
        for p in self.vdir.glob("v*.json"):
            try:
                out.append(int(p.stem[1:]))
            except ValueError:
                continue
        return sorted(out)

    def latest(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int) -> dict:
        return json.loads((self.vdir / f"v{version}.json").read_text())

    def _commit(self, files: list[str], op: str, note: str = "") -> int:
        """Atomically commit a manifest for the next version; retries under
        optimistic concurrency (exclusive-create of the final name)."""
        self.vdir.mkdir(parents=True, exist_ok=True)
        while True:
            v = (self.latest() or 0) + 1
            doc = {
                "version": v,
                "op": op,
                "note": note,
                "files": sorted(files),
                "n_files": len(files),
                "committed_at": time.time(),
            }
            tmp = self.vdir / f"v{v}.json.tmp.{uuid.uuid4().hex[:8]}"
            tmp.write_text(json.dumps(doc, indent=1))
            final = self.vdir / f"v{v}.json"
            try:
                # exclusive create: the loser of a race gets FileExistsError
                # and retries against the next version number
                os.link(tmp, final)
            except FileExistsError:
                tmp.unlink()
                continue
            tmp.unlink()
            return v

    # -- writes (files are immutable; commits replace references) ------------
    def _stage(self, df: DataFrame) -> list[str]:
        """Write df's rows as new immutable parquet files; return their
        table-relative paths. Files outside a committed manifest are
        invisible to every reader."""
        stage = self.datadir / uuid.uuid4().hex[:12]
        df.write.parquet(str(stage))
        return [
            str(p.relative_to(self.root))
            for p in stage.glob("*.parquet")
            if not p.name.startswith(("_", "."))
        ]

    def create(self, df: DataFrame, note: str = "") -> int:
        return self._commit(self._stage(df), "create", note)

    def append(self, df: DataFrame, note: str = "") -> int:
        v = self.latest()
        prev = self.manifest(v)["files"] if v else []
        return self._commit(prev + self._stage(df), "append", note)

    def replace_where(self, df: DataFrame, keep_predicate, note: str = "") -> int:
        """MERGE-style partition replace: rows matching ``keep_predicate``
        in the CURRENT snapshot survive, everything else is replaced by
        ``df``. Old files stay on disk for older versions (time travel);
        only retention vacuum deletes them."""
        survivors = self.read().filter(keep_predicate)
        files = self._stage(survivors) + self._stage(df)
        return self._commit(files, "replace", note)

    def merge_upsert(self, df: DataFrame, key: str, note: str = "") -> int:
        """MERGE INTO by key: batch rows replace current rows with the same
        ``key`` (WHEN MATCHED UPDATE) and insert otherwise (WHEN NOT
        MATCHED INSERT) — the CDC apply step. Survivors are the current
        snapshot LEFT ANTI the batch keys (batch side broadcast when
        small); old files stay readable for time travel. This rewrites
        the survivor set; the production-scale refinement is file-level
        pruning on per-file key ranges so only files CONTAINING matched
        keys rewrite — the same partition-scoped discipline as
        catalog.update_anomalies' date-scoped swap."""
        batch_keys = df.select(key).distinct()
        survivors = self.read().join(F.broadcast(batch_keys), key, "left_anti")
        files = self._stage(survivors) + self._stage(df)
        return self._commit(files, "merge", note)

    def overwrite(self, df: DataFrame, note: str = "") -> int:
        """Commit ``df`` as the complete next snapshot (CTAS-style REPLACE
        TABLE — the schema-changing rewrite path, e.g. a logical column
        drop via projection). History stays time-travelable: prior
        versions keep their own files and their own schema."""
        return self._commit(self._stage(df), "overwrite", note)

    def compact(self, target_files: int = 1, note: str = "") -> int:
        """Bin-pack the current snapshot into ``target_files`` files —
        logically a no-op (same rows, new layout), committed like any
        other write so readers flip atomically."""
        cur = self.read().coalesce(target_files)
        return self._commit(self._stage(cur), "compact", note)

    def restore(self, version: int, note: str = "") -> int:
        """Delta-RESTORE-style rollback: commit a NEW version that references
        the file set of an older one — no data is copied, history is
        preserved (the bad versions stay inspectable until retention), and
        readers flip atomically like any other commit."""
        files = self.manifest(version)["files"]
        return self._commit(files, "restore", note or f"restore v{version}")

    # -- reads ---------------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        v = self.latest() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version in {self.root}")
        files = [str(self.root / f) for f in self.manifest(v)["files"]]
        # mergeSchema: an append may have evolved the schema (added a
        # column); the union schema serves the snapshot, with nulls
        # backfilled for files that predate the column — and a TIME TRAVEL
        # read of an old version sees only that version's schema
        return self.spark.read.option("mergeSchema", "true").parquet(*files)

    def exists(self) -> bool:
        return self.latest() is not None

    def history(self) -> list[dict]:
        return [
            {k: m[k] for k in ("version", "op", "note", "n_files", "committed_at")}
            for m in (self.manifest(v) for v in self.versions())
        ]

    # -- retention -----------------------------------------------------------
    def vacuum(self, keep_last: int = 2) -> dict:
        """Drop manifests older than the last ``keep_last`` and delete data
        files no retained manifest references. The latest version is always
        retained; files are immutable, so this is the only deletion path."""
        vs = self.versions()
        keep = vs[-max(1, keep_last):]
        retained: set[str] = set()
        for v in keep:
            retained.update(self.manifest(v)["files"])
        removed_files = 0
        if self.datadir.is_dir():
            for p in self.datadir.rglob("*.parquet"):
                if str(p.relative_to(self.root)) not in retained:
                    p.unlink()
                    removed_files += 1
            for d in sorted(self.datadir.iterdir(), reverse=True):
                if d.is_dir() and not any(d.iterdir()):
                    d.rmdir()
        removed_manifests = 0
        for v in vs:
            if v not in keep:
                (self.vdir / f"v{v}.json").unlink()
                removed_manifests += 1
        return {"removed_files": removed_files, "removed_manifests": removed_manifests}


# --------------------------------------------------------------------------
# Driver-visible bounded run of the snapshot layer.

from pyspark.sql import functions as F  # noqa: E402

from exact_spark.registry import register  # noqa: E402


# The lifecycle queries' outputs are deterministic functions of the events
# table (the filesystem is an implementation detail the result must not
# leak), so each gets a real DuckDB oracle computing the EXPECTED version
# history from the source data — the commit protocol is hash-checked, not
# just rows-counted.
_SQL_DAYNO = """
    ep AS (SELECT epoch_us(ts) AS e, event_id, value FROM events),
    lo AS (SELECT MIN(e) AS lo FROM ep),
    d AS (
        SELECT (ep.e - lo.lo) // 86400000000 AS day_no, event_id, value
        FROM ep, lo
    )
"""


@register(
    "catalog_time_travel",
    sql=f"""
    WITH {_SQL_DAYNO},
    c AS (
        SELECT CAST(SUM(CASE WHEN day_no = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN day_no = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN day_no = 0 AND value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS f0
        FROM d
    )
    SELECT 1 AS version, 'create' AS op, n0 AS n_rows,
           CAST(0 AS BIGINT) AS n_flagged, FALSE AS retained FROM c
    UNION ALL SELECT 2, 'append', n0 + n1, 0, FALSE FROM c
    UNION ALL SELECT 3, 'replace', n0 + n1, f0, TRUE FROM c
    UNION ALL SELECT 4, 'compact', n0 + n1, f0, TRUE FROM c
    UNION ALL SELECT 5, 'post_vacuum_latest', n0 + n1, -1, TRUE FROM c
    """,
    doc="Snapshot-versioned table lifecycle, driver-visible bounded run: "
    "create (v1, day-1 events) -> append (v2, day-2) -> MERGE-style "
    "replace of day-1 with flagged rows (v3) -> compact (v4). Every "
    "version stays readable after later commits (time travel: the v1/v2 "
    "row counts are re-read AFTER v3/v4 commit), replace changes rows "
    "but not count, compact changes layout but neither, and retention "
    "vacuum afterwards keeps the latest two versions readable while "
    "deleting every unreferenced file. The emitted table is the version "
    "history annotated with those re-read counts — the lakehouse commit "
    "discipline (manifest rename = commit, immutable data files, "
    "reader-never-lists) demonstrated end to end.",
)
def catalog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from exact_spark import io
    from exact_spark.functions import epoch_micros
    from exact_spark.session import tune_session

    tune_session(spark)
    work = tempfile.mkdtemp(prefix="exact_spark_vt_")
    try:
        ev = io.load(spark, sf_dir, "events")
        ev = ev.withColumn("__ep_us", epoch_micros(ev, "ts"))
        lo = ev.agg(F.min("__ep_us")).collect()[0][0] or 0
        day = 86400 * 1_000_000
        base = ev.select(
            "event_id", "user_id", "value",
            ((F.col("__ep_us") - lo) / day).cast("long").alias("day_no"),
        )
        d1 = base.filter(F.col("day_no") == 0)
        d2 = base.filter(F.col("day_no") == 1)

        t = VersionedTable(spark, work, "events_v")
        t.create(d1.withColumn("flag", F.lit(False)), note="day 1")
        t.append(d2.withColumn("flag", F.lit(False)), note="day 2")
        t.replace_where(
            d1.withColumn("flag", F.col("value") > 100.0),
            keep_predicate=F.col("day_no") != 0,
            note="flag writeback day 1",
        )
        t.compact(target_files=1, note="bin-pack")

        # every snapshot re-read AFTER all commits (time travel) — all
        # versions tagged and unioned so the whole census is ONE action
        # (count + flagged-count per version in the same aggregate; the
        # former per-version count()/filter().count() loop ran 8 jobs)
        tagged = None
        for v in t.versions():
            piece = t.read(v).select(F.lit(v).alias("__v"), "flag")
            tagged = piece if tagged is None else tagged.unionByName(piece)
        stats = {
            r["__v"]: (r["n"], r["nf"])
            for r in tagged.groupBy("__v")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("flag").cast("long")).alias("nf"),
            )
            .collect()
        }
        counts = {v: int(stats[v][0]) for v in stats}
        flags = {v: int(stats[v][1]) for v in stats}
        t.vacuum(keep_last=2)
        post_vacuum_latest = t.read().count()
        survivors = set(t.versions())

        rows = [
            (
                h["version"],
                h["op"],
                int(counts[h["version"]]),
                int(flags[h["version"]]),
                h["version"] in survivors,
            )
            for h in [
                {"version": v, "op": op}
                for v, op in [(1, "create"), (2, "append"), (3, "replace"), (4, "compact")]
            ]
        ] + [(5, "post_vacuum_latest", int(post_vacuum_latest), -1, True)]
        return spark.createDataFrame(
            rows,
            "version int, op string, n_rows long, n_flagged long, retained boolean",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "catalog_snapshot_diff",
    # the diff of two committed versions is a PURE function of the source
    # events (v1 = day<=1, v2 = day 1-2 with values doubled for user%3==0),
    # so the verdict census is SQL-expressible: day 0 -> removed, day 2 ->
    # added, day 1 -> changed iff the mutation changed the hashed value
    # (value*2 <> value <=> value <> 0), else unchanged
    sql="""
    WITH ep AS (SELECT epoch_us(ts) AS e, event_id, user_id, value FROM events),
    lo AS (SELECT MIN(e) AS lo FROM ep),
    d AS (
        SELECT (ep.e - lo.lo) // 86400000000 AS day_no, event_id, user_id, value
        FROM ep, lo
    ),
    v AS (
        SELECT CASE WHEN day_no = 0 THEN 'removed'
                    WHEN day_no = 2 THEN 'added'
                    WHEN user_id % 3 = 0 AND value <> 0.0 THEN 'changed'
                    ELSE 'unchanged' END AS verdict
        FROM d WHERE day_no <= 2
    )
    SELECT verdict, CAST(count(*) AS BIGINT) AS n_rows
    FROM v GROUP BY verdict ORDER BY verdict
    """,
    doc="Snapshot reconciliation (the CDC/audit read the versioned layer "
    "enables): diff two committed versions of a table by FULL OUTER join "
    "on the primary key comparing content hashes — rows classified "
    "added / removed / changed / unchanged, with only per-class COUNTS "
    "crossing to the driver. Bounded run: day-1 events commit as v1, a "
    "mutated snapshot (one day dropped, one day added, values scaled on "
    "a slice) commits as v2, and the diff of (v1, v2) must tally "
    "exactly. At scale both sides prune to their manifests' files and "
    "the join shuffles once on the key — never a full-history scan.",
)
def catalog_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from exact_spark import io
    from exact_spark.functions import epoch_micros
    from exact_spark.session import tune_session

    tune_session(spark)
    work = tempfile.mkdtemp(prefix="exact_spark_vdiff_")
    try:
        ev = io.load(spark, sf_dir, "events")
        ev = ev.withColumn("__ep_us", epoch_micros(ev, "ts"))
        lo = ev.agg(F.min("__ep_us")).collect()[0][0] or 0
        day = 86400 * 1_000_000
        base = ev.select(
            "event_id", "user_id", "value",
            ((F.col("__ep_us") - lo) / day).cast("long").alias("day_no"),
        )
        v1_rows = base.filter(F.col("day_no") <= 1)
        v2_rows = base.filter(F.col("day_no").between(1, 2)).withColumn(
            "value",
            F.when(F.col("user_id") % 3 == 0, F.col("value") * 2.0).otherwise(
                F.col("value")
            ),
        )
        t = VersionedTable(spark, work, "ev_diff")
        t.create(v1_rows)
        t.replace_where(v2_rows, keep_predicate=F.lit(False))

        def keyed(v: int):
            d = t.read(v)
            return d.select(
                F.col("event_id").alias("k"),
                F.md5(F.concat_ws("|", "user_id", F.col("value").cast("string"))).alias(
                    "h"
                ),
            )
        a, b = keyed(1), keyed(2)
        d = a.alias("a").join(
            b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer"
        ).select(
            F.when(F.col("a.k").isNull(), "added")
            .when(F.col("b.k").isNull(), "removed")
            .when(F.col("a.h") != F.col("b.h"), "changed")
            .otherwise("unchanged")
            .alias("verdict")
        )
        out = (
            d.groupBy("verdict")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy("verdict")
        )
        # materialize BEFORE the finally deletes the warehouse — the
        # returned frame must not lazily re-read vacuumed files
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "catalog_merge_upsert",
    sql=f"""
    WITH {_SQL_DAYNO},
    c AS (
        SELECT CAST(SUM(CASE WHEN day_no = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN day_no = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN day_no = 0 AND event_id % 2 = 0
                              AND value <> 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS nup
        FROM d
    )
    SELECT n0 AS v1_rows, n0 + n1 AS v2_rows, nup AS n_updated,
           n1 AS n_inserted, TRUE AS v1_stable
    FROM c
    """,
    doc="CDC MERGE-upsert into the snapshot-versioned table, driver-"
    "visible bounded run: day-1 events commit as v1; a change batch "
    "(half of day 1 re-scored + day 2 inserts) merges by event_id — "
    "matched rows replaced, unmatched inserted, untouched preserved — "
    "committing v2 while v1 stays readable (time travel). Result rows "
    "audit the contract: per-version counts, how many rows changed "
    "value, and that v1 is byte-stable after the merge. The batch-key "
    "anti-join broadcasts; at scale only files containing matched keys "
    "need rewriting (per-file key ranges — see merge_upsert's doc).",
)
def catalog_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from exact_spark import io
    from exact_spark.functions import epoch_micros
    from exact_spark.session import tune_session

    tune_session(spark)
    work = tempfile.mkdtemp(prefix="exact_spark_mu_")
    try:
        ev = io.load(spark, sf_dir, "events")
        ev = ev.withColumn("__ep_us", epoch_micros(ev, "ts"))
        lo = ev.agg(F.min("__ep_us")).collect()[0][0] or 0
        day = 86400 * 1_000_000
        base = ev.select(
            "event_id", "user_id", "value",
            ((F.col("__ep_us") - lo) / day).cast("long").alias("day_no"),
        )
        d1 = base.filter(F.col("day_no") == 0)
        d2 = base.filter(F.col("day_no") == 1)

        t = VersionedTable(spark, work, "events_mu")
        t.create(d1, note="day 1")
        updates = d1.filter(F.col("event_id") % 2 == 0).withColumn(
            "value", F.col("value") * 2.0
        )
        t.merge_upsert(updates.unionByName(d2), "event_id", note="cdc apply")

        v1, v2 = t.read(1), t.read(2)
        # ONE full-outer join aggregate replaces the former five separate
        # count actions (per-side counts, inner-join changed count,
        # anti-join inserted count): event_id is unique per version, so
        # side-presence markers recover every census exactly
        fo = v1.select(
            "event_id", F.col("value").alias("old_v"), F.lit(1).alias("in1")
        ).join(
            v2.select(
                "event_id", F.col("value").alias("new_v"), F.lit(1).alias("in2")
            ),
            "event_id",
            "full_outer",
        )
        r = fo.agg(
            F.sum("in1").cast("long").alias("v1_rows"),
            F.sum("in2").cast("long").alias("v2_rows"),
            F.sum(
                F.when(
                    F.col("in1").isNotNull()
                    & F.col("in2").isNotNull()
                    & (F.col("new_v") != F.col("old_v")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_updated"),
            F.sum(F.when(F.col("in1").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_inserted"),
        ).collect()[0]
        out = spark.createDataFrame(
            [
                {
                    "v1_rows": int(r["v1_rows"]),
                    "v2_rows": int(r["v2_rows"]),
                    "n_updated": int(r["n_updated"]),
                    "n_inserted": int(r["n_inserted"]),
                    "v1_stable": int(r["v1_rows"])
                    == t.read(1).count(),  # time travel intact post-merge
                }
            ]
        )
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "catalog_schema_evolution",
    sql="""
    WITH c AS (
        SELECT CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
               CAST(COUNT(*) AS BIGINT) AS n_all
        FROM events WHERE event_id <= 4000
    )
    SELECT 1 AS version, 2 AS n_cols, n_even AS n_rows,
           CAST(-1 AS BIGINT) AS n_label_nulls FROM c
    UNION ALL SELECT 2, 3, n_all, n_even FROM c
    UNION ALL SELECT 3, 2, n_all, -1 FROM c
    """,
    doc="Schema evolution across commits (the lakehouse ALTER TABLE ADD "
    "COLUMN discipline, without rewriting a byte of old data): v1 "
    "commits (event_id, value); v2 APPENDS rows that carry a new label "
    "column — the current snapshot serves the UNION schema with nulls "
    "backfilled for pre-evolution files (mergeSchema), while a TIME "
    "TRAVEL read of v1 still sees exactly the original two columns; v3 "
    "drops the column logically by committing a projection (old files "
    "remain for older versions — drop is a metadata-level rewrite of "
    "the SURVIVING rows only, never of history). Emits per-version "
    "(op, n_rows, n_cols, n_label_nulls) — the null count is the "
    "backfill evidence. At scale the evolution cost is zero for old "
    "files: the union schema is resolved at read, which is exactly why "
    "columnar formats make additive evolution free.",
)
def catalog_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from exact_spark import io
    from exact_spark.session import tune_session

    tune_session(spark)
    work = tempfile.mkdtemp(prefix="exact_spark_se_")
    try:
        ev = (
            io.load(spark, sf_dir, "events")
            .filter(F.col("event_id") <= 4000)  # deterministic bounded slice
            .select("event_id", "value")
        )
        old = ev.filter(F.col("event_id") % 2 == 0)
        new = ev.filter(F.col("event_id") % 2 == 1).withColumn(
            "label", (F.col("value") > 100.0).cast("int")
        )
        t = VersionedTable(spark, work, "events_se")
        t.create(old, note="pre-evolution schema")
        t.append(new, note="append with added label column")
        # logical column drop: overwrite with the projected snapshot; old
        # files stay readable for v1/v2 time travel
        t.overwrite(
            t.read().select("event_id", "value"),
            note="column drop via projection commit",
        )

        rows = []
        for v in t.versions():
            df = t.read(v)
            cols = df.columns
            n_label_nulls = (
                df.filter(F.col("label").isNull()).count() if "label" in cols else -1
            )
            rows.append((v, len(cols), int(df.count()), int(n_label_nulls)))
        return spark.createDataFrame(
            rows, "version int, n_cols int, n_rows long, n_label_nulls long"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
