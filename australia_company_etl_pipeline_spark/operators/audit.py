"""Run-metadata, stage-stats, and audit-log operators (SURVEY §1.2).

Re-expression of the reference's ops/audit surface as engine operators:

- ``pipeline_runs`` table (``/root/reference/src/load/create_tables.sql:
  115-128``): one row per run with status, stage record counts, and the
  run config as a JSON column — here ``pipeline_run_record``.
- stage-stats collection (``/root/reference/src/pipeline.py:216-309``):
  the reference re-counted each stage DataFrame with separate queries;
  ``stage_counts`` unions the per-stage count aggregates into ONE plan so
  a single action computes every count (SURVEY §4.2 point 1).
- ``data_quality_metrics`` (``create_tables.sql:130-137``): long-format
  (table, metric, value) rows — ``quality_metrics`` computes any number
  of metric expressions in ONE scan and unpivots with ``stack``.
- ``audit_log`` row-image trigger (``create_tables.sql:324-332``,
  trigger function :334-360): Postgres captures INSERT/UPDATE/DELETE row
  images per-statement; the distributed equivalent is a full-outer
  key-join diff of the old and new snapshots emitting the same
  (operation, old_data, new_data) JSON contract — ``audit_log_diff``.

All native expressions; the only shuffle in any of these is the
``audit_log_diff`` key join and the tiny per-stage aggregates.
"""

from __future__ import annotations

import json
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Spark's to_json drops null fields by default; the Postgres row images
# (and DuckDB's to_json) keep them — keep them for parity.
_JSON_OPTS = {"ignoreNullFields": "false"}


def stage_counts(stages: dict[str, DataFrame]) -> DataFrame:
    """(stage, records) — every stage count in one unioned plan.

    The reference issued one COUNT query per stage against live
    DataFrames (pipeline.py:255-281, recomputing lineage each time);
    unioning the 1-row aggregates means one action schedules every
    stage's scan together, and cached stages are counted from cache.
    """
    if not stages:
        raise ValueError("stage_counts needs at least one named stage; "
                         "got an empty dict")
    parts = [
        df.agg(F.count(F.lit(1)).cast("long").alias("records"))
        .select(F.lit(name).alias("stage"), "records")
        for name, df in stages.items()
    ]
    return reduce(DataFrame.unionByName, parts)


def pipeline_run_record(stages: dict[str, DataFrame], run_id: str,
                        pipeline_name: str, config: dict | None = None,
                        status: str = "completed",
                        started_at: str | None = None,
                        completed_at: str | None = None,
                        error_message: str | None = None) -> DataFrame:
    """One pipeline_runs row (create_tables.sql:115-128) as a DataFrame.

    ``records_processed/matched/loaded`` follow the reference's stage
    conventions (stages named 'processed', 'matched', 'loaded' feed them;
    absent stages report 0). All stage counts additionally land in a
    sorted-key ``stage_counts`` JSON map. ``config`` is serialized with
    sorted keys — deterministic, like Postgres JSONB's canonical form.
    Timestamps are caller-supplied (the engine never stamps wall-clock
    into data; the orchestrator owns time).
    """
    counts = stage_counts(stages)
    agg = counts.agg(F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("stage", "records"))))
        .alias("__m"))
    canonical = {"processed", "matched", "loaded"}

    def n_of(stage: str) -> Column:
        return F.coalesce(F.element_at("__m", stage), F.lit(0)).cast("long")

    return agg.select(
        F.lit(run_id).alias("run_id"),
        F.lit(pipeline_name).alias("pipeline_name"),
        F.lit(status).alias("status"),
        F.lit(started_at).cast("timestamp").alias("started_at"),
        F.lit(completed_at).cast("timestamp").alias("completed_at"),
        n_of("processed").alias("records_processed"),
        n_of("matched").alias("records_matched"),
        n_of("loaded").alias("records_loaded"),
        F.lit(error_message).cast("string").alias("error_message"),
        F.lit(json.dumps(config or {}, sort_keys=True)).alias("config"),
        F.to_json("__m", _JSON_OPTS).alias("stage_counts"))


def quality_metrics(df: DataFrame, table_name: str,
                    metrics: dict[str, Column],
                    run_id: str | None = None) -> DataFrame:
    """data_quality_metrics rows (create_tables.sql:130-137): any number
    of metric expressions over one table in ONE scan (single agg with
    map-side partials), unpivoted to long format. Metric names travel as
    Column literals (positional aliases + ``map_from_arrays``/``explode``,
    no SQL-text interpolation), so any name is safe."""
    if not metrics:
        raise ValueError("quality_metrics needs at least one metric; "
                         "got an empty dict")
    names = list(metrics)
    agg = df.agg(*[m.cast("double").alias(f"__m{i}")
                   for i, m in enumerate(metrics.values())])
    out = agg.select(F.explode(F.map_from_arrays(
        F.array(*[F.lit(n) for n in names]),
        F.array(*[F.col(f"__m{i}") for i in range(len(names))]),
    )).alias("metric_name", "metric_value"))
    return out.select(
        F.lit(run_id).cast("string").alias("run_id"),
        F.lit(table_name).alias("table_name"),
        "metric_name", "metric_value")


def audit_log_diff(old: DataFrame, new: DataFrame, keys: list[str],
                   table_name: str, compare_cols: list[str] | None = None,
                   changed_by: str = "spark") -> DataFrame:
    """Snapshot diff → audit_log rows (table_name, operation, key cols,
    old_data, new_data, changed_by).

    The reference's audit trigger (create_tables.sql:334-360) fires
    per-row inside Postgres; between immutable snapshots the same
    information is ONE full-outer join on the key: left-only = DELETE,
    right-only = INSERT, both-with-changes = UPDATE (unchanged rows emit
    nothing). Row images are ``to_json`` structs (nulls kept, Postgres
    ``to_jsonb`` parity). Scale: one shuffle on the key columns; the
    change test compares only ``compare_cols`` via a null-safe struct
    equality, so wide tables can diff on a column subset.
    """
    cc = compare_cols or [c for c in old.columns if c not in keys]
    image = [*keys, *cc]

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *[F.col(k).alias(f"__k_{tag}_{k}") for k in keys],
            F.to_json(F.struct(*image), _JSON_OPTS).alias(f"{tag}_data"),
            F.struct(*cc).alias(f"__cmp_{tag}"))

    o, n = side(old, "old"), side(new, "new")
    cond = reduce(lambda a, b: a & b,
                  [o[f"__k_old_{k}"] == n[f"__k_new_{k}"] for k in keys])
    j = o.join(n, cond, "full_outer")
    is_ins = o["__k_old_" + keys[0]].isNull()
    is_del = n["__k_new_" + keys[0]].isNull()
    changed = ~F.col("__cmp_old").eqNullSafe(F.col("__cmp_new"))
    return (j
            .withColumn("operation",
                        F.when(is_ins, "INSERT")
                        .when(is_del, "DELETE")
                        .when(changed, "UPDATE"))
            .filter(F.col("operation").isNotNull())
            .select(F.lit(table_name).alias("table_name"),
                    "operation",
                    *[F.coalesce(f"__k_new_{k}", f"__k_old_{k}").alias(k)
                      for k in keys],
                    F.when(~is_ins, F.col("old_data")).alias("old_data"),
                    F.when(~is_del, F.col("new_data")).alias("new_data"),
                    F.lit(changed_by).alias("changed_by")))
