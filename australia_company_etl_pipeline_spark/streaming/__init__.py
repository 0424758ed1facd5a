"""Structured Streaming extension (SURVEY.md §2.10).

The reference is pure batch — its only "streaming" is incremental
gzip/XML decode during parse (``/root/reference/src/ingest/
parse_commoncrawl.py:79-122``) and a periodic-batch cadence implied by dbt
source-freshness SLAs (``dbt/models/staging/sources.yml:24-26``). This
package is the clearly-marked extension SURVEY.md §2.10 calls for: the
``events`` fixture table replayed as a file-source stream with watermarked
window aggregations and a custom stateful sessionizer.

Every streaming transformation here has a batch twin registered in
``plans/streaming.py`` with a DuckDB oracle, so the *semantics* are
correctness-gated even though the driver only collects batch DataFrames.
"""

from .events_stream import (  # noqa: F401
    EVENTS_SCHEMA,
    interval_join_stream,
    read_events_stream,
    session_windows,
    sessionize_stateful,
    sliding_counts,
    stage_event_batches,
    stream_to_parquet,
    tumbling_counts,
)
