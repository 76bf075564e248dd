"""Structured-streaming replay + inline injection + foreachBatch scoring
(T1-T5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from exact_spark.operators.inject import AnomalySetting
from exact_spark.plans.batch import BatchJob
from exact_spark.plans.stream import run_stream
from exact_spark.sources.catalog import JobCatalog
from exact_spark.streaming.replay import (
    mean_interarrival_seconds,
    replay_rate,
    stateful_session_counts,
    windowed_counts,
)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("stream") / "series.csv"
    lines = ["t,v,lab"]
    for i in range(600):
        lines.append(f"{1700000000 + i * 60},{10 + math.sin(i / 15.0):.6f},0")
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_run_stream_end_to_end(spark, csv_path, tmp_path):
    catalog = JobCatalog(spark, str(tmp_path / "wh"))
    job = BatchJob(
        job_name="s1",
        filepath=csv_path,
        time_col="t",
        label_col="lab",
        anomaly_settings=[
            AnomalySetting("custom", 400 * 60, 60 * 60, magnitude=50.0,
                           percentage=100.0, columns=["v"])
        ],
        model="threshold",
    )
    result = run_stream(spark, catalog, job, str(tmp_path / "work"), chunks=6)
    assert result["rows"] == 600
    assert result["table_name"] == "job_stream_s1"
    assert result["stream_status"]["isActive"] is False
    # all 60 injected rows detected by the pre-trained threshold model
    m = result["metrics_all"]
    assert m["tp"] == 60 and m["fn"] == 0
    assert m["precision"] >= 0.5
    # replay pacing contract: 60s inter-arrival, speedup 1000 -> ~16.7 rows/s
    assert abs(result["replay_rows_per_second"] - 1000.0 / 60.0) < 0.1

    # stored stream table has flags persisted
    flagged = catalog.read_data("job_stream_s1").filter(F.col("is_anomaly"))
    assert flagged.count() == m["tp"] + m["fp"]
    # per-micro-batch appends were bin-packed before handing to readers
    assert result["compaction"]["files_after"] <= result["compaction"]["files_before"]


def test_interarrival_and_windowed_counts(spark, csv_path, tmp_path):
    from exact_spark.sources.ingest import canonicalize, read_file

    canon = canonicalize(read_file(spark, csv_path), time_col="t", label_col="lab")
    assert abs(mean_interarrival_seconds(canon) - 60.0) < 1e-6
    assert abs(replay_rate(canon, speedup=60.0) - 1.0) < 1e-9

    # T5: watermarked windowed agg over a replay stream
    src = str(tmp_path / "winsrc")
    canon.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_counts(stream, window="60 minutes", watermark="120 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = sorted(
        spark.sql("SELECT * FROM win_counts").collect(), key=lambda r: r["window_start"]
    )
    assert sum(r["n_events"] for r in rows) == 600
    # data starts mid-hour, so edge windows are partial; interior ones are full
    assert len(rows) == 11
    assert all(r["n_events"] == 60 for r in rows[1:-1])


def test_stateful_session_counts(spark, tmp_path):
    """Custom stateful operator: per-key gap sessionization via
    applyInPandasWithState — state carries open sessions across
    micro-batches; closed sessions emit exactly once."""
    # two users: u1 has two sessions separated by a 2h gap, u2 one session
    rows = []
    for i in range(10):                      # u1 session 1: 10 events, 1min apart
        rows.append(("u1", 1700000000 + i * 60))
    for i in range(5):                       # u1 session 2: 2h later
        rows.append(("u1", 1700000000 + 7200 + 600 + i * 60))
    for i in range(7):                       # u2 single session
        rows.append(("u2", 1700000000 + i * 120))
    df = spark.createDataFrame(rows, ["user_id", "epoch"]).select(
        "user_id", F.timestamp_seconds("epoch").alias("timestamp")
    )
    # stage as TWO files so the state must survive across micro-batches
    src = str(tmp_path / "sessrc")
    df.repartitionByRange(2, "timestamp").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = stateful_session_counts(stream, gap_seconds=1800.0)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive, "bounded stateful query must terminate"
    got = {
        (r["key"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    }
    # u1's first session and u2's only session are watermark-final
    # (end + gap <= final wm); u1's tail session is NOT provable yet and
    # must stay in state — emitting it would be wrong
    assert got == {("u1", 10), ("u2", 7)}


def test_split_sessions_properties():
    """Hypothesis: for any sorted buffer and positive gap, the runs
    partition the input in order, intra-run gaps are <= gap, and
    consecutive runs are separated by > gap."""
    from hypothesis import given, settings, strategies as st

    from exact_spark.streaming.replay import split_sessions

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.floats(min_value=0, max_value=1e6, allow_nan=False), min_size=1, max_size=60),
        st.floats(min_value=1e-3, max_value=1e5, allow_nan=False),
    )
    def check(times, gap):
        buf = sorted(times)
        runs = split_sessions(buf, gap)
        assert [t for run in runs for t in run] == buf  # ordered partition
        for run in runs:
            assert all(b - a <= gap for a, b in zip(run, run[1:]))
        for r1, r2 in zip(runs, runs[1:]):
            assert r2[0] - r1[-1] > gap

    check()


def test_deduplicated_stream_watermark_semantics(spark, tmp_path):
    """Streaming exact dedup: first arrival wins within the watermark
    horizon; state is evicted past it (a far-later duplicate re-emits —
    the bounded-state contract, proven here so it can't silently change)."""
    import time as _time

    from exact_spark.streaming.replay import deduplicated_stream

    src = tmp_path / "dedupsrc"
    src.mkdir()

    def stage(name, rows):
        df = spark.createDataFrame(rows, ["id", "epoch", "v"]).select(
            "id", F.timestamp_seconds("epoch").alias("timestamp"), "v"
        )
        df.coalesce(1).write.parquet(str(tmp_path / "stage" / name))
        import shutil as _sh

        part = next((tmp_path / "stage" / name).glob("*.parquet"))
        _sh.copy(part, src / f"{name}.parquet")
        _time.sleep(0.05)  # file-stream order is (modTime, path)

    t0 = 1700000000
    # batch 1: ids 1..20, one per minute (span 19 min)
    stage("f1", [(i, t0 + i * 60, float(i)) for i in range(1, 21)])
    # batch 2: dups of 5,6,7 (in-horizon -> dropped) + fresh 21..30 far
    # ahead, pushing the watermark past id 1's state expiry
    stage(
        "f2",
        [(i, t0 + i * 60 + 10, 99.0) for i in (5, 6, 7)]
        + [(i, t0 + 3000 + i * 60, float(i)) for i in range(21, 31)],
    )
    # batch 3: a fresh key — state eviction runs at END of a batch, so this
    # batch is what actually clears id 1's expired state
    stage("f3", [(40, t0 + 4860, 40.0)])
    # batch 4: duplicate of id 1 AFTER its state horizon -> re-emits
    stage("f4", [(1, t0 + 4900, 111.0)])

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = deduplicated_stream(stream, ["id"], watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    out = spark.sql("SELECT * FROM dedup_stream").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["v"])
    # in-horizon duplicates collapsed to first arrival
    assert by_id[5] == [5.0] and by_id[6] == [6.0] and by_id[7] == [7.0]
    # fresh keys all present exactly once
    assert all(by_id[i] == [float(i)] for i in range(21, 31))
    # past-horizon duplicate re-emitted (bounded state, documented)
    assert sorted(by_id[1]) == [1.0, 111.0]
    assert by_id[40] == [40.0]
    assert len(out) == 20 + 10 + 1 + 1


def test_streaming_zscore_detector(spark, tmp_path):
    """Online per-key Welford z-score detector: state carries the running
    baseline across micro-batches, a spike after the baseline stabilizes
    is flagged, the stable tail is not, and replaying with different
    batch boundaries yields identical flags."""
    from exact_spark.streaming.replay import streaming_zscore_detector

    rows = []
    for i in range(40):  # stable baseline 10.0 +/- 0.5
        rows.append(("u1", 1700000000 + i * 60, 10.0 + (0.5 if i % 2 else -0.5)))
    rows.append(("u1", 1700000000 + 40 * 60, 50.0))  # spike
    for i in range(41, 50):
        rows.append(("u1", 1700000000 + i * 60, 10.0 + (0.5 if i % 2 else -0.5)))
    df = spark.createDataFrame(rows, ["user_id", "epoch", "value"]).select(
        "user_id", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )

    def run(n_chunks, name):
        # stage chunks one by one: parallel range-partition writes give the
        # part files nondeterministic mtimes, and the file stream replays
        # in (modTime, path) order — time order must be staged explicitly
        import time as _time

        src = tmp_path / f"zsrc{n_chunks}"
        src.mkdir()
        per = (len(rows) + n_chunks - 1) // n_chunks
        for k in range(n_chunks):
            lo, hi = k * per, min((k + 1) * per, len(rows))
            cdf = spark.createDataFrame(
                rows[lo:hi], ["user_id", "epoch", "value"]
            ).select(
                "user_id", F.timestamp_seconds("epoch").alias("timestamp"), "value"
            )
            cdf.coalesce(1).write.parquet(str(tmp_path / f"zstage{n_chunks}_{k}"))
            import shutil as _sh

            part = next((tmp_path / f"zstage{n_chunks}_{k}").glob("*.parquet"))
            _sh.copy(part, src / f"chunk{k}.parquet")
            _time.sleep(0.05)
        schema = spark.read.parquet(str(src)).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            streaming_zscore_detector(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt{n_chunks}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["event_epoch"], r["value"], r["is_anomaly"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )

    got = run(4, "zs4")
    assert len(got) == 50
    flagged = [ep for ep, v, a in got if a]
    assert flagged == [1700000000 + 40 * 60.0]  # exactly the spike
    # batch-boundary invariance (events fold in event-time order)
    assert got == run(2, "zs2")


def test_state_partitions_restores_on_error(spark):
    """The demo state-partition sizing must restore the session value even
    when the stream start throws (a leaked '4' would silently shrink every
    later shuffle in the session)."""
    import pytest

    from exact_spark.streaming import _state_partitions

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError):
        with _state_partitions(spark, 4):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


@pytest.mark.parametrize("chunks", [1, 2, 3])
def test_session_window_emits_at_exact_watermark_equality(spark, tmp_path, chunks):
    """The stream_session_window_native oracle's emission rule is
    `window end <= final watermark` — INCLUSIVE. Pin Spark's behavior at
    exact equality with a constructed boundary: user 1's session window
    end lands precisely ON the final watermark, and must be emitted.
    Parameterized over the micro-batch split (1/2/3 chunks, one file per
    trigger) to prove the invariant isn't split-shaped: the session may
    assemble within one batch or across batches, the final watermark is
    the same."""
    import shutil
    import time as _t

    from pyspark.sql import functions as F

    t0 = 1700000000
    # user 1 session: [t0, t0+60]; window end = t0 + 60 + 600 (gap)
    # user 2's lone event puts max event time at t0+960, so the final
    # watermark (delay 300s) = t0+660 == user 1's window end exactly
    rows = [(1, t0), (1, t0 + 60), (2, t0 + 60 + 600 + 300)]
    per = (len(rows) + chunks - 1) // chunks
    src = tmp_path / "src"
    src.mkdir()
    for k in range(chunks):
        part = rows[k * per:(k + 1) * per]
        if not part:
            continue
        df = spark.createDataFrame(part, "user_id long, ep long").select(
            "user_id", F.timestamp_seconds("ep").alias("timestamp")
        )
        tmp = tmp_path / f"stage{k}"
        df.coalesce(1).write.parquet(str(tmp))
        shutil.copy(next(tmp.glob("*.parquet")), src / f"c{k}.parquet")
        _t.sleep(0.05)  # file-stream order is (modTime, path)
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sess = (
        stream.withWatermark("timestamp", "300 seconds")
        .groupBy("user_id", F.session_window("timestamp", "600 seconds").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        sess.writeStream.format("memory")
        .queryName(f"wm_edge_{chunks}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql(
        f"SELECT user_id, CAST(sw.end AS LONG) AS e, n FROM wm_edge_{chunks}"
    ).collect()
    assert [(r["user_id"], r["e"], r["n"]) for r in out] == [(1, t0 + 660, 2)]


@pytest.mark.parametrize("chunks", [2, 3])
def test_stream_stream_join_matches_across_chunks_near_horizon(
    spark, tmp_path, chunks
):
    """The stream_stream_join oracle equals the batch interval join only
    if state eviction never drops a chunk-1 view a later-chunk purchase
    can still reach. Pin the worst case: a purchase in the LAST
    micro-batch matching a view from the FIRST, 5h59m earlier (just
    inside the 6h horizon, far past the 1h watermark delay).
    Parameterized over the micro-batch split (2/3 chunks) to prove the
    invariant isn't split-shaped — at 3 chunks an extra watermark
    advance lands between the view and the purchase."""
    import shutil
    import time as _t

    from pyspark.sql import functions as F

    t0, H = 1700000000, 3600
    if chunks == 2:
        batches = [
            [(7, 100, t0, "view", 1.0), (9, 101, t0 + 2 * H, "view", 1.0)],
            [(7, 200, t0 + 6 * H - 60, "purchase", 9.9)],
        ]
    else:
        batches = [
            [(7, 100, t0, "view", 1.0)],
            [(9, 101, t0 + 2 * H, "view", 1.0)],
            [(7, 200, t0 + 6 * H - 60, "purchase", 9.9)],
        ]
    src = tmp_path / "src"
    src.mkdir()

    def stage(name, rows):
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ep long, event_type string, value double"
        ).select(
            "user_id", "event_id", F.timestamp_seconds("ep").alias("timestamp"),
            "event_type", "value",
        )
        tmp = tmp_path / ("st_" + name)
        df.coalesce(1).write.parquet(str(tmp))
        shutil.copy(next(tmp.glob("*.parquet")), src / f"{name}.parquet")
        _t.sleep(0.05)  # file-stream order is (modTime, path)

    for bi, batch in enumerate(batches):
        stage(f"f{bi}", batch)
    schema = spark.read.parquet(str(src)).schema

    def reader():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    views = (
        reader().filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("timestamp").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purch = (
        reader().filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purch.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 6 HOURS")),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(f"sje_t_{chunks}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql(f"SELECT purchase_id, view_id FROM sje_t_{chunks}").collect()
    assert any(r["purchase_id"] == 200 and r["view_id"] == 100 for r in out), out
