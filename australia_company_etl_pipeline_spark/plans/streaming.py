"""Oracle-checked batch twins of the streaming operators (SURVEY §2.10).

The streaming package's window/session transformations accept batch OR
streaming DataFrames; registering the batch application here puts the
*semantics* under the driver's DuckDB correctness gate. The streaming
execution path itself (file-source micro-batches, watermarks, state-store
checkpoints, ``applyInPandasWithState``) is exercised by
``tests/test_streaming.py`` against these same twins.

Window bounds surface as epoch seconds (BIGINT) on both sides — immune to
timezone/precision drift in the hash compare.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..streaming.events_stream import (
    _SESSION_OUT,
    _gap_seconds,
    session_windows,
    sliding_counts,
    tumbling_counts,
)
from .registry import register


@register(
    "events_tumbling_counts",
    doc="Streaming extension: tumbling 1h event-time window — count + value "
        "sum per (window, event_type). Same function body serves the "
        "watermarked stream; oracle floors epoch seconds to the hour.",
    tags=("streaming",),
    oracle="""
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
       CAST(floor(epoch(ts) / 3600) * 3600 + 3600 AS BIGINT) AS window_end_s,
       event_type,
       COUNT(*) AS n_events,
       round(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(table(spark, sf_dir, "events"), window="1 hour")


@register(
    "events_sliding_counts",
    doc="Streaming extension: sliding window (1h length, 30min slide) — "
        "each event lands in exactly 2 overlapping buckets; the oracle "
        "materializes both bucket starts per event via an unnest cross "
        "join.",
    tags=("streaming",),
    oracle="""
WITH e AS (
  SELECT event_type, value,
         CAST(floor(epoch(ts) / 1800) AS BIGINT) AS half_bucket
  FROM events
), k AS (SELECT unnest([0, 1]) AS k)
SELECT (e.half_bucket - k.k) * 1800 AS window_start_s,
       (e.half_bucket - k.k) * 1800 + 3600 AS window_end_s,
       e.event_type,
       COUNT(*) AS n_events,
       round(SUM(e.value), 2) AS sum_value
FROM e CROSS JOIN k
GROUP BY 1, 2, 3
""",
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(table(spark, sf_dir, "events"),
                          window="1 hour", slide="30 minutes")


# Gaps-and-islands session oracle: break when the gap to the previous
# event is >= 30min (Spark session windows are [start, last+gap) — the
# end bound is exclusive, so an event exactly at the gap starts a new
# session); cumulative-sum the breaks into session ids, then aggregate.
_SESSION_ORACLE = """
WITH o AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value, event_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
       CAST(floor(epoch(MAX(ts))) + 1800 AS BIGINT) AS session_end_s,
       COUNT(*) AS n_events,
       round(SUM(value), 2) AS sum_value
FROM s
GROUP BY user_id, sid
"""


@register(
    "events_session_windows",
    doc="Streaming extension: native session windows per user "
        "(F.session_window, 30min inactivity gap); oracle is the "
        "gaps-and-islands rewrite (lag + cumulative break sum).",
    tags=("streaming",),
    oracle=_SESSION_ORACLE,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(table(spark, sf_dir, "events"), gap="30 minutes")


@register(
    "user_sessions_pandas",
    doc="Custom stateful-operator template, batch form: per-user "
        "sessionization in an Arrow-batched applyInPandas sharing the "
        "merge loop with the streaming applyInPandasWithState sessionizer. "
        "Same oracle as events_session_windows — the custom operator is "
        "held to the same SQL-checkable semantics as the built-in.",
    tags=("streaming", "pandas-udf"),
    oracle=_SESSION_ORACLE,
)
def user_sessions_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    gap_us = _gap_seconds("30 minutes") * 1_000_000

    def sessions(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        user_id = int(pdf["user_id"].iloc[0])
        # unit-robust epoch micros (datetime64 resolution varies: ns/us)
        ts_us = ((pdf["ts"] - pd.Timestamp(0))
                 // pd.Timedelta(microseconds=1)).to_numpy()
        vals = pdf["value"].to_numpy()
        out: list[list] = []
        open_s: list | None = None
        for t, v in zip(ts_us, vals):
            if open_s is None:
                open_s = [t, t, 1, float(v)]
            elif t - open_s[1] >= gap_us:  # end-exclusive, matches stream
                out.append(open_s)
                open_s = [t, t, 1, float(v)]
            else:
                open_s[1] = t
                open_s[2] += 1
                open_s[3] += float(v)
        if open_s is not None:
            out.append(open_s)
        return pd.DataFrame({
            "user_id": [user_id] * len(out),
            "session_start_s": [c[0] // 1_000_000 for c in out],
            "session_end_s": [c[1] // 1_000_000 + gap_us // 1_000_000
                              for c in out],
            "n_events": [c[2] for c in out],
            "sum_value": [round(c[3], 2) for c in out],
        })

    return events.groupBy("user_id").applyInPandas(
        sessions, schema=_SESSION_OUT)
