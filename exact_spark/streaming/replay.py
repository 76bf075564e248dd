"""Streaming operators (SURVEY.md §2.9, T1-T5) on Structured Streaming.

The reference's stream path is vestigially broken (SURVEY §3.3); this is
the intended semantics rebuilt Spark-first:

- T1 paced replay: the reference sleeps ``mean_interarrival / speedup``
  between single-row inserts (simulator.py:185-217). Here the file is
  staged as a parquet stream source and read with a bounded trigger; the
  pacing contract (rows/sec = speedup / mean_interarrival) is exposed by
  ``replay_rate`` and applied via ``maxFilesPerTrigger``-chunked staging or
  a rate-source join.
- T2 inline injection: the batch injectors as streaming-safe expressions.
  Delta from batch: the exact-k percentage subsample needs a global rank,
  which a stream cannot do — selection becomes a deterministic per-row
  md5 percentage test (same expectation, per-row independent). Documented
  intentional difference.
- T3 detection: the reference re-reads and re-scores the WHOLE table every
  second (execute_calls.py:941-970). Here ``foreachBatch`` scores only the
  new micro-batch with the pre-trained broadcast model and appends —
  strictly better, identical row-local semantics.
- T4 status via StreamingQuery.status/lastProgress.
- T5 (extension beyond the reference): watermarked tumbling-window
  aggregation for late data.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exact_spark.functions import epoch_seconds_any
from exact_spark.operators.inject import AnomalySetting, resolve_target_columns


def mean_interarrival_seconds(df: DataFrame, ts_col: str = "timestamp") -> float:
    """G4 (simulator.py:185-203): mean gap between consecutive rows."""
    ep = epoch_seconds_any(df, ts_col)
    row = df.agg(
        ((F.max(ep) - F.min(ep)) / F.greatest(F.count(F.lit(1)) - 1, F.lit(1))).alias("dt")
    ).collect()[0]
    return float(row["dt"] or 0.0)


def replay_rate(df: DataFrame, speedup: float, ts_col: str = "timestamp") -> float:
    """Rows/second for the paced replay: speedup / mean_interarrival."""
    dt = mean_interarrival_seconds(df, ts_col)
    if dt <= 0:
        return 1000.0
    return speedup / dt


def stage_stream_source(df: DataFrame, path: str, chunks: int) -> None:
    """Stage a canonical table as `chunks` parquet files in time order; with
    ``maxFilesPerTrigger=1`` each trigger replays one time-slice (T1)."""
    df.repartitionByRange(chunks, "timestamp").write.mode("overwrite").parquet(path)


def read_replay_stream(
    spark: SparkSession, path: str, files_per_trigger: int = 1
) -> DataFrame:
    from exact_spark import io as _io

    schema = _io.read_parquet_memo(spark, path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def streaming_injection(
    df: DataFrame,
    settings: list[AnomalySetting],
    start_epoch: float,
    seed: int = 42,
    ts_col: str = "timestamp",
) -> DataFrame:
    """T2: A1-A10 as pure row-local streaming expressions.

    Per-row deterministic percentage selection:
    ``md5(seed:i:id) mod 100 < pct`` — independent of partitioning and
    arrival order, so a replayed stream injects identically every run.
    Stats-dependent methods (step/lowered) require setting-level ``mean`` /
    ``data_range`` overrides in streaming (the reference's stream path
    pre-computes them from the file: simulator.py:173-183).
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    ts_epoch = epoch_seconds_any(df, ts_col)
    out = df
    for i, s in enumerate(settings):
        t0, t1 = start_epoch + s.timestamp, start_epoch + s.timestamp + s.duration
        in_span = (ts_epoch >= F.lit(t0)) & (ts_epoch < F.lit(t1))
        bucket = (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:{i}:"), F.col("id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 100
        )
        sel = in_span & (bucket < F.lit(int(s.percentage)))
        cols = resolve_target_columns(df, s)

        if s.anomaly_type == "spike":
            factor = float(rng.uniform(1.0, s.magnitude))
        elif s.anomaly_type == "lowered":
            factor = float(rng.uniform(0.3, 0.4))
        else:
            factor = None

        for c in cols:
            x = F.col(c)
            if s.anomaly_type == "spike":
                new = x * F.lit(factor)
            elif s.anomaly_type == "step":
                new = x + F.lit(float(s.mean or 0.0) * s.magnitude)
            elif s.anomaly_type == "lowered":
                drange = float(s.data_range or 0.0)
                # lowered.py:9-22: max(x - spread*factor, 0) with zeros
                # replaced by x*factor; zero-range falls back to the mean as
                # the spread (same contract as inject_anomalies).
                spread = drange if drange != 0.0 else float(s.mean or 0.0)
                low = F.greatest(x - F.lit(spread * factor), F.lit(0.0))
                new = F.when(low == 0.0, x * F.lit(factor)).otherwise(low)
            elif s.anomaly_type == "offline":
                new = F.lit(0.0)
            elif s.anomaly_type == "custom":
                new = x * F.lit(s.magnitude)
            else:
                raise KeyError(f"unknown anomaly_type {s.anomaly_type!r}")
            out = out.withColumn(c, F.when(sel, new).otherwise(x))
        out = out.withColumn(
            "injected_anomaly", F.col("injected_anomaly") | sel
        ).withColumn("label", F.when(sel, F.lit(1)).otherwise(F.col("label")))
    return out.withColumn("is_anomaly", F.col("is_anomaly") | F.col("injected_anomaly"))


def score_stream(
    stream_df: DataFrame,
    model,
    feature_cols: list[str],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """T3: foreachBatch scoring with the pre-trained broadcast model; the
    sink receives (scored_batch, batch_id) — append/MERGE into the
    job_stream_ table lives there."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        det = model.detect(batch_df, feature_cols)
        scored = batch_df.join(det.select("id", "score", "predicted"), "id")
        sink(scored, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    stream_df: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "timestamp",
) -> DataFrame:
    """T5 extension: watermarked tumbling-window aggregate for late data."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("is_anomaly").cast("int")).alias("n_anomalies"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "n_anomalies",
        )
    )


def deduplicated_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    watermark: str = "30 minutes",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Streaming exact dedup for the training-data ingest path (extension
    beyond T5): keep the FIRST arrival per key, drop any duplicate that
    arrives within the watermark delay of it.

    ``dropDuplicatesWithinWatermark`` holds per-key state only until the
    watermark passes ``first_seen_event_time + delay`` — state is bounded
    by the keys of one watermark horizon, not by all history, which is the
    only viable contract for continuous ingest (a plain
    ``dropDuplicates`` on a stream keys state on ALL keys ever seen and
    grows without bound). The flip side is documented semantics, not a
    bug: a duplicate arriving farther apart than the horizon re-emits;
    global exact dedup is the batch ``dedup_exact`` path over the landed
    table. Key state is hash-partitioned by key across executors.
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def await_stream(query, timeout_s: float = 60.0) -> dict:
    """T4: wait for completion (availableNow) and return final status."""
    deadline = time.time() + timeout_s
    while query.isActive and time.time() < deadline:
        time.sleep(0.2)
    return {"isActive": query.isActive, "lastProgress": query.lastProgress}


def split_sessions(buf: list, gap_seconds: float) -> list:
    """Split a sorted time buffer into gap-separated runs — the pure
    sessionization kernel shared by the stateful operator (and property-
    tested on its own: runs partition the input, intra-run gaps <= gap,
    inter-run gaps > gap)."""
    runs, cur = [], [buf[0]]
    for t in buf[1:]:
        if t - cur[-1] > gap_seconds:
            runs.append(cur)
            cur = [t]
        else:
            cur.append(t)
    runs.append(cur)
    return runs


def stateful_session_counts(
    stream_df: DataFrame,
    gap_seconds: float = 1800.0,
    watermark: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "timestamp",
):
    """Custom stateful streaming operator (extension beyond T5): per-key
    gap-based sessionization with ``applyInPandasWithState`` — the pattern
    for operators Structured Streaming's built-ins can't express (a
    session is final only once no admissible event can extend it, so state
    must carry across micro-batches).

    Event-time correct under out-of-order arrival: state per key is the
    sorted buffer of not-yet-final event times. A session [start..end] is
    emitted exactly when the watermark passes ``end + gap`` — any event
    that could still extend or merge it would have ``ts <= end + gap <=
    wm`` and be dropped as late, so finality is proven by the watermark
    alone, not by arrival order. Event-time timeouts re-invoke the fold
    when the watermark crosses the earliest pending ``end + gap`` (the
    no-data batch after a bounded replay included), so tail sessions
    flush without any new event for the key. Finalized events leave the
    buffer, so state is bounded by the watermark horizon per key; the
    state store is hash-partitioned by key across executors — no global
    state, no driver involvement.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("session_start", T.DoubleType()),
            T.StructField("session_end", T.DoubleType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("buf", T.ArrayType(T.DoubleType()))]
    )

    def _sessions(buf: list) -> list:
        return split_sessions(buf, gap_seconds)

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        (buf,) = state.get if state.exists else ([],)
        buf = sorted(
            list(buf)
            + [
                ts.timestamp()
                for pdf in pdfs
                for ts in pd.to_datetime(pdf[ts_col])
            ]
        )
        closed, keep = [], []
        if buf:
            wm = state.getCurrentWatermarkMs() / 1000.0
            for run in _sessions(buf):
                if run[-1] + gap_seconds <= wm:  # provably final
                    closed.append((str(key[0]), run[0], run[-1], len(run)))
                else:
                    keep.append(run)
        if keep:
            state.update(([t for run in keep for t in run],))
            # wake up when the watermark can finalize the earliest pending
            # session (guaranteed > current wm by the branch above)
            state.setTimeoutTimestamp(
                int((min(run[-1] for run in keep) + gap_seconds) * 1000)
            )
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                closed, columns=["key", "session_start", "session_end", "n_events"]
            )

    return (
        stream_df.withColumn("__key", F.col(key_col).cast("string"))
        .withWatermark(ts_col, watermark)
        .groupBy("__key")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_zscore_detector(
    stream_df: DataFrame,
    threshold: float = 3.0,
    min_obs: int = 10,
    key_col: str = "user_id",
    ts_col: str = "timestamp",
    value_col: str = "value",
    watermark: str = "30 minutes",
):
    """Online per-key anomaly detector (extension beyond T5): running
    mean/variance via Welford's algorithm in ``applyInPandasWithState``,
    flagging |z| > threshold against the state BEFORE the event updates it.

    This is the adaptive complement to ``score_stream``'s pre-trained
    static model: no training pass, the baseline tracks each key forever,
    and state is O(1) per key (count, mean, M2) — the only viable shape
    for an unbounded keyed stream. Event-time correctness: within a
    micro-batch events are folded in event-time order, so a replay of the
    same stream produces identical flags regardless of batch boundaries
    (cross-batch reordering beyond the watermark is the usual streaming
    caveat and is documented, not hidden).
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("event_epoch", T.DoubleType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("zscore", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("m2", T.DoubleType()),
        ]
    )

    def fold(key, pdfs, state: GroupState):
        import math

        import pandas as pd

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        rows = []
        events = sorted(
            (
                (ts.timestamp(), float(v))
                for pdf in pdfs
                for ts, v in zip(pd.to_datetime(pdf[ts_col]), pdf[value_col])
            )
        )
        for ep, v in events:
            if n >= min_obs and m2 > 0:
                sd = math.sqrt(m2 / (n - 1))
                z = (v - mean) / sd if sd > 0 else 0.0
            else:
                z = 0.0
            rows.append((str(key[0]), ep, v, z, abs(z) > threshold))
            # Welford update AFTER scoring: the event can't vouch for itself
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        state.update((n, mean, m2))
        if rows:
            yield pd.DataFrame(
                rows, columns=["key", "event_epoch", "value", "zscore", "is_anomaly"]
            )

    return (
        stream_df.withColumn("__key", F.col(key_col).cast("string"))
        .withWatermark(ts_col, watermark)
        .groupBy("__key")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
