"""Streaming operators over the ``events`` table.

Design notes (scale-first):

- The stream is a *file source* (``readStream.parquet``) — on a real
  cluster this is a landing directory fed by an ingest job (the Spark
  analog of the reference's periodic-batch dbt freshness cadence,
  ``/root/reference/dbt/models/staging/sources.yml:24-26``). Kafka would
  drop in by swapping the reader; every transformation below is
  source-agnostic.
- Window aggregations are plain ``groupBy(window(...))`` — partial
  aggregation happens map-side, state lives in the executor state store
  keyed by (window, group), and the watermark bounds state size. Without
  a watermark, 100 TB of events would grow state without bound; with it,
  state is O(active windows × groups).
- The sessionizer is the one genuinely-stateful custom operator
  (SURVEY.md §7.2 M7 stretch): ``applyInPandasWithState`` with an
  Arrow-batched pandas function — state is one open session per user,
  closed sessions are emitted in append mode. Session merging assumes
  per-user event-time ordering within the watermark, which the staging
  helper guarantees and a production deployment gets from
  ``withWatermark`` + dropped-late semantics.

All window/session semantics have oracle-checked batch twins in
``plans/streaming.py`` — the functions here are shared by both paths
(they accept batch *or* streaming DataFrames).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Explicit schema: streaming file sources cannot infer (SURVEY.md §1.2 —
# the reference also pins explicit schemas, src/pipeline.py:388-413).
EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

_SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_s", LongType()),
    StructField("session_end_s", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

# Open-session state: (start_us, last_us, n, total) per user.
_SESSION_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def stage_event_batches(spark: SparkSession, sf_dir: str, out_dir: str,
                        n_batches: int = 4) -> None:
    """Replay the batch ``events`` table as ``n_batches`` parquet files in
    ``out_dir`` — a deterministic micro-batch arrival simulation. Files
    are written in event-time order so per-user ordering holds across
    triggers (what a watermark guarantees in production)."""
    from ..catalog import table

    events = table(spark, sf_dir, "events")
    ranked = events.withColumn(
        "_b", F.ntile(n_batches).over(Window.orderBy("ts", "event_id")))
    ranked.cache()
    try:
        for b in range(1, n_batches + 1):
            (ranked.filter(F.col("_b") == b).drop("_b")
             .coalesce(1).write.mode("append").parquet(out_dir))
    finally:
        ranked.unpersist()


def read_events_stream(spark: SparkSession, landing_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a landing directory of event parquet."""
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(landing_dir))


def _with_watermark(df: DataFrame, watermark: str | None) -> DataFrame:
    # Watermarks only apply to streams; batch twins skip them so the same
    # function body serves both the stream and the oracle-checked twin.
    if watermark and df.isStreaming:
        return df.withWatermark("ts", watermark)
    return df


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window: count + value sum per (window, type).

    Window bounds surface as epoch seconds (engine-portable, no
    timezone-dependent hashing). Map-side partial aggregation + state-store
    final merge; watermark bounds state at ~(active windows × types)."""
    w = F.window("ts", window)
    return (_with_watermark(events, watermark)
            .groupBy(w.alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").cast("long").alias("window_start_s"),
                    F.col("w.end").cast("long").alias("window_end_s"),
                    "event_type", "n_events", "sum_value"))


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Sliding window twin of ``tumbling_counts`` (each event lands in
    window/slide overlapping buckets)."""
    w = F.window("ts", window, slide)
    return (_with_watermark(events, watermark)
            .groupBy(w.alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").cast("long").alias("window_start_s"),
                    F.col("w.end").cast("long").alias("window_end_s"),
                    "event_type", "n_events", "sum_value"))


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours",
                    max_events_per_user: int | None = None) -> DataFrame:
    """Native session windows per user (``F.session_window``): a session
    closes after ``gap`` of inactivity; end = last event + gap.

    ``max_events_per_user`` (batch only) pre-caps pathological users
    with the skew-safe two-level salted ``textstats.cap_per_key``
    BEFORE the per-user session merge — a bot with 10⁶ events
    otherwise serializes its own partition. The kept slice is each
    user's EARLIEST events by (ts, event_id when present): sub-cap
    users are bit-identical to the uncapped result; a capped bot's
    later sessions are truncated — a sampling decision the caller
    owns, default off. Raises on a streaming frame (the cap is a
    window; the streaming guard is the sessionizer's own state-size
    bound plus upstream dedup)."""
    if max_events_per_user is not None:
        if events.isStreaming:
            raise ValueError(
                "max_events_per_user is batch-only: the salted cap is "
                "a window, which a streaming plan cannot host — bound "
                "state via the stateful sessionizer's timeout instead")
        if max_events_per_user < 1:
            raise ValueError("max_events_per_user must be >= 1, got "
                             f"{max_events_per_user}")
        from ..operators.textstats import cap_per_key

        order_cols = [F.col("ts")] + (
            [F.col("event_id")] if "event_id" in events.columns else [])
        events = cap_per_key(
            events.withColumn("__ord", F.struct(*order_cols)),
            ["user_id"], max_events_per_user,
            order_col="__ord").drop("__ord")
    sw = F.session_window("ts", gap)
    return (_with_watermark(events, watermark)
            .groupBy(sw.alias("sw"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select("user_id",
                    F.col("sw.start").cast("long").alias("session_start_s"),
                    F.col("sw.end").cast("long").alias("session_end_s"),
                    "n_events", "sum_value"))


def _gap_seconds(gap: str) -> int:
    qty, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
            "week": 604800, "weeks": 604800}
    if unit not in mult:
        raise ValueError(
            f"unsupported gap unit {unit!r}; use one of {sorted(mult)}")
    return int(qty) * mult[unit]


def sessionize_stateful(events: DataFrame, gap: str = "30 minutes",
                        timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful sessionizer via ``applyInPandasWithState``.

    Functionally equivalent to ``session_windows`` but hand-rolled state —
    the template for session logic Spark's built-in can't express
    (e.g. value-dependent gaps, per-session ML features). State is one
    open session per user; a closed session is emitted exactly once
    (append mode) when a later event exceeds the gap — or, when
    ``timeout_ms`` is set, on processing-time timeout (the production
    knob that flushes idle users; leave None for deterministic replays).
    Arrow-batched: each micro-batch ships one pandas frame per user
    group, not per-row Python calls."""
    gap_us = _gap_seconds(gap) * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start_s": [start_us // 1_000_000],
                "session_end_s": [last_us // 1_000_000 + gap_us // 1_000_000],
                "n_events": [n],
                "sum_value": [round(total, 2)],
            })
            return
        open_s = list(state.get) if state.exists else None
        closed: list[list] = []
        # A micro-batch may arrive as several Arrow chunks with no time
        # ordering across chunks — concat the whole group, sort ONCE.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0]).sort_values("ts")
            # unit-robust epoch micros (datetime64 resolution varies)
            ts_us = ((pdf["ts"] - pd.Timestamp(0))
                     // pd.Timedelta(microseconds=1)).tolist()
            vals = pdf["value"].tolist()
            for t, v in zip(ts_us, vals):
                if open_s is None:
                    open_s = [t, t, 1, float(v)]
                elif t - open_s[1] >= gap_us:  # session end is exclusive
                    closed.append(open_s)
                    open_s = [t, t, 1, float(v)]
                else:
                    open_s[1] = t
                    open_s[2] += 1
                    open_s[3] += float(v)
        if open_s is not None:
            state.update(tuple(open_s))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed),
                "session_start_s": [c[0] // 1_000_000 for c in closed],
                "session_end_s": [c[1] // 1_000_000 + gap_us // 1_000_000
                                  for c in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [round(c[3], 2) for c in closed],
            })

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if timeout_ms is not None else GroupStateTimeout.NoTimeout)
    return (events.groupBy("user_id").applyInPandasWithState(
        fn, _SESSION_OUT, _SESSION_STATE, "append", timeout))


_TRANS_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("prev_type", StringType()),
    StructField("next_type", StringType()),
    StructField("n", LongType()),
])

# Last-seen event per user: (last_us, last_type, last_id).
_TRANS_STATE = StructType([
    StructField("last_us", LongType()),
    StructField("last_type", StringType()),
    StructField("last_id", LongType()),
])


def transitions_stateful(events: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/temporal.event_transitions``:
    per-trigger (user, prev_type, next_type) transition increments via
    ``applyInPandasWithState`` — state is ONE row per user (the
    last-seen event), so the journey table maintains incrementally
    without ever rescanning history; O(users) state, O(batch) work per
    trigger. Sum the emitted ``n`` per (prev, next) downstream (counts
    are a monoid — the same fold discipline as the CMS/HLL
    maintenance).

    Matches the batch operator EXACTLY when per-user arrival is
    event-time-ordered across triggers (what a watermarked ingest
    guarantees; ``stage_event_batches`` simulates it) — within a
    trigger any arrival order is fine, the group sorts on
    ``(ts, event_id)`` before folding, the same tie pin as the batch
    window."""
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        last = list(state.get) if state.exists else None
        counts: dict[tuple[str, str], int] = {}
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   if len(chunks) > 1 else chunks[0]) \
                .sort_values(["ts", "event_id"])
            ts_us = ((pdf["ts"] - pd.Timestamp(0))
                     // pd.Timedelta(microseconds=1)).tolist()
            types = pdf["event_type"].tolist()
            ids = pdf["event_id"].tolist()
            for t, ty, i in zip(ts_us, types, ids):
                if last is not None:
                    k = (last[1], ty)
                    counts[k] = counts.get(k, 0) + 1
                last = [int(t), ty, int(i)]
        if last is not None:
            state.update(tuple(last))
        if counts:
            yield pd.DataFrame({
                "user_id": [user_id] * len(counts),
                "prev_type": [k[0] for k in counts],
                "next_type": [k[1] for k in counts],
                "n": list(counts.values()),
            })

    return (events.groupBy("user_id").applyInPandasWithState(
        fn, _TRANS_OUT, _TRANS_STATE, "append",
        GroupStateTimeout.NoTimeout))


def dedup_stream(events: DataFrame, key_cols: tuple[str, ...] = ("event_id",),
                 watermark: str = "1 hour", ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup — the at-least-once ingest guard a
    training-data pipeline needs in front of its landing zone (upstream
    file redelivery / replay re-emits whole batches).

    ``dropDuplicatesWithinWatermark``: per-key state is EVICTED once the
    key's event time falls behind the watermark, so state is bounded by
    the (watermark horizon × key arrival rate) instead of growing with
    the whole stream like plain ``dropDuplicates`` on a stream would —
    the property that keeps this runnable forever at 100 TB/day. The
    contract is correspondingly bounded: a duplicate arriving more than
    ``watermark`` after the original is NOT suppressed (size the horizon
    to the upstream's maximum redelivery lag).
    """
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(key_cols)))


def interval_join_stream(left: DataFrame, right: DataFrame,
                         on: str = "user_id",
                         left_ts: str = "ts", right_ts: str = "ts",
                         lookback_s: int = 3600,
                         watermark: str = "2 hours",
                         right_prefix: str = "r_") -> DataFrame:
    """Stream-stream interval join: pair each left row with every right
    row of the same key inside its lookback window —
    ``left_ts - lookback_s <= right_ts <= left_ts`` (inclusive; the
    streaming form of ``operators.temporal.range_join`` with
    right-derived intervals, and the click-window half of the
    oracle-checked ``purchase_attribution`` query).

    Right columns come back ``right_prefix``-renamed (both sides share
    the events schema).

    State story (the part that must survive 100 TB/day): BOTH sides are
    watermarked and the join condition carries an explicit event-time
    range, so Spark derives per-side state-eviction bounds — a buffered
    right row is dropped once the watermark passes ``right_ts +
    lookback_s`` (no future left row can reach back to it), a left row
    once matches can no longer arrive. Without the time-range condition
    the state store grows with the whole stream — that shape is refused
    by Spark for append streams, by design. Size ``watermark`` to the
    out-of-orderness bound, ``lookback_s`` to the business window.

    Works on batch frames too (watermarks skipped) — the equivalence the
    streaming test pins against ``range_join``.
    """
    r = right.select(*[F.col(c).alias(f"{right_prefix}{c}")
                       for c in right.columns])
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{right_prefix}{right_ts}", watermark)
    rts = F.col(f"{right_prefix}{right_ts}")
    cond = ((F.col(on) == F.col(f"{right_prefix}{on}"))
            & (rts >= F.col(left_ts)
               - F.expr(f"INTERVAL {int(lookback_s)} SECONDS"))
            & (rts <= F.col(left_ts)))
    return left.join(r, cond, "inner")


def dedup_within_horizon(events: DataFrame,
                         key_cols: tuple[str, ...] = ("event_id",),
                         horizon_s: int = 3600,
                         ts_col: str = "ts") -> DataFrame:
    """Batch twin of ``dedup_stream``: suppress a row iff the NEAREST
    earlier row with the same key is within ``horizon_s`` of it.

    One lag window per key — the 100 TB shape (a shuffle on the dedup
    key, no iteration). The contract relative to the streaming form:
    ``dropDuplicatesWithinWatermark`` anchors suppression at the FIRST
    kept occurrence (its state is not refreshed by dropped duplicates),
    so for redelivery chains a < b < c with b−a and c−b ≤ horizon but
    c−a > horizon the stream KEEPS c while this batch form suppresses it
    (nearest-earlier gap). The two agree whenever each key is redelivered
    at most once per horizon — the at-least-once replay pattern this
    guard exists for; chains tighter than that are already suppressed by
    both forms' first element. Ties on ``ts_col`` within a key break by
    the remaining key ordering being irrelevant (identical redeliveries
    produce identical rows).
    """
    keys = [F.col(c) for c in key_cols]
    win = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(ts_col)).over(win)
    gap = F.col(ts_col).cast("long") - prev.cast("long")
    return (events
            .withColumn("__gap", gap)
            .filter(F.col("__gap").isNull() | (F.col("__gap") > horizon_s))
            .drop("__gap"))


def stream_to_parquet(stream: DataFrame, out_dir: str, checkpoint_dir: str,
                      available_now: bool = True):
    """Parquet sink with exactly-once file-commit semantics (checkpointed
    offsets + file manifest). ``availableNow`` drains the backlog then
    stops — the batch-replay trigger."""
    writer = (stream.writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert_parquet(stream: DataFrame, path: str,
                          keys: list[str], partition_col: str,
                          checkpoint_dir: str,
                          version_col: str | None = None,
                          available_now: bool = True):
    """Continuous ingest → partition-scoped MERGE: every micro-batch is
    upserted into the parquet table via ``upsert_parquet_partitioned``
    (``foreachBatch`` — the standard Structured Streaming pattern for
    sinks with merge semantics Spark's file sink lacks).

    Delivery contract: the checkpoint makes batch REPLAY possible (a
    crashed trigger re-runs its batch), and the keyed MERGE makes replay
    IDEMPOTENT — re-upserting the same rows is a no-op, so the composite
    is effectively-once per key, the property an at-least-once source
    (redelivering landing files, Kafka without transactions) needs
    before a queryable table. Cost per trigger is O(touched partitions),
    so a steady stream into a date-partitioned table rewrites only the
    hot partitions.
    """
    from ..sources.sinks import upsert_parquet_partitioned

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert_parquet_partitioned(
            batch_df.sparkSession, path, batch_df,
            keys=keys, partition_col=partition_col,
            version_col=version_col)

    writer = (stream.writeStream.foreachBatch(merge_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str,
                  checkpoint_dir: str | None = None):
    """Drain a stream into an in-memory table (test/debug sink)."""
    writer = (stream_df.writeStream.format("memory")
              .queryName(name).outputMode(output_mode)
              .trigger(availableNow=True))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


__all__ = [
    "EVENTS_SCHEMA", "stage_event_batches", "read_events_stream",
    "tumbling_counts", "sliding_counts", "session_windows",
    "sessionize_stateful", "dedup_stream", "dedup_within_horizon",
    "interval_join_stream",
    "stream_to_parquet", "stream_upsert_parquet", "run_to_memory",
]
