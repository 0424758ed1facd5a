"""Ops/audit-surface queries (SURVEY §1.2): pipeline run metadata, stage
stats, data-quality metrics, and the audit-log row-image diff — the
reference's Postgres-side tracking tables (create_tables.sql:115-137,
324-360) re-expressed as engine operators under the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.audit import (audit_log_diff, pipeline_run_record,
                               quality_metrics)
from .core import davg
from .registry import register


def _customer_snapshots(spark: SparkSession,
                        sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic old/new snapshot pair: every 10th customer renamed,
    every 13th deleted, every 17th cloned as an insert (+1_000_000)."""
    old = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    k = F.col("c_custkey")
    new = (old.filter(k % 13 != 0)
           .withColumn("c_name",
                       F.when(k % 10 == 0,
                              F.concat("c_name", F.lit(" (renamed)")))
                       .otherwise(F.col("c_name")))
           .unionByName(old.filter(k % 17 == 0)
                        .withColumn("c_custkey", k + 1000000)))
    return old, new


@register(
    "run_audit_log",
    doc="Audit-log row-image diff (create_tables.sql:324-332, trigger "
        ":334-360): full-outer key-join of old/new snapshots emitting "
        "INSERT/UPDATE/DELETE rows with to_json row images (nulls kept, "
        "to_jsonb parity). One shuffle on the key.",
    tags=("ops",),
    oracle="""
WITH old AS (SELECT c_custkey, c_name, c_nationkey FROM customer),
new AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 0 THEN c_name || ' (renamed)'
              ELSE c_name END AS c_name,
         c_nationkey
  FROM old WHERE c_custkey % 13 != 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, c_nationkey
  FROM old WHERE c_custkey % 17 = 0
),
j AS (
  SELECT coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
         CASE WHEN o.c_custkey IS NULL THEN 'INSERT'
              WHEN n.c_custkey IS NULL THEN 'DELETE'
              WHEN o.c_name IS DISTINCT FROM n.c_name
                   OR o.c_nationkey IS DISTINCT FROM n.c_nationkey
              THEN 'UPDATE' END AS operation,
         CASE WHEN o.c_custkey IS NOT NULL THEN CAST(to_json(struct_pack(
              c_custkey := o.c_custkey, c_name := o.c_name,
              c_nationkey := o.c_nationkey)) AS VARCHAR) END AS old_data,
         CASE WHEN n.c_custkey IS NOT NULL THEN CAST(to_json(struct_pack(
              c_custkey := n.c_custkey, c_name := n.c_name,
              c_nationkey := n.c_nationkey)) AS VARCHAR) END AS new_data
  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
)
SELECT 'customer' AS table_name, operation, c_custkey, old_data, new_data,
       'spark' AS changed_by
FROM j WHERE operation IS NOT NULL
""",
)
def run_audit_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _customer_snapshots(spark, sf_dir)
    return audit_log_diff(old, new, keys=["c_custkey"],
                          table_name="customer",
                          compare_cols=["c_name", "c_nationkey"])


@register(
    "pipeline_run_summary",
    doc="pipeline_runs row (create_tables.sql:115-128): run metadata + "
        "stage record counts computed in ONE unioned plan (the reference "
        "re-counted per stage, pipeline.py:255-281), config as "
        "sorted-key JSON.",
    tags=("ops",),
    oracle="""
WITH c AS (
  SELECT (SELECT COUNT(*) FROM lineitem) AS extracted,
         (SELECT COUNT(*) FROM orders) AS processed,
         (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS matched,
         (SELECT COUNT(*) FROM customer) AS loaded
)
SELECT 'r-0001' AS run_id, 'company-etl' AS pipeline_name,
       'completed' AS status,
       TIMESTAMP '2024-01-01 00:00:00' AS started_at,
       TIMESTAMP '2024-01-01 00:05:00' AS completed_at,
       processed AS records_processed, matched AS records_matched,
       loaded AS records_loaded,
       CAST(NULL AS VARCHAR) AS error_message,
       '{"threshold": 0.75, "use_llm": false}' AS config,
       '{"extracted":' || extracted || ',"loaded":' || loaded
         || ',"matched":' || matched || ',"processed":' || processed || '}'
         AS stage_counts
FROM c
""",
)
def pipeline_run_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    stages = {
        "extracted": table(spark, sf_dir, "lineitem"),
        "processed": orders,
        "matched": orders.select("o_custkey").distinct(),
        "loaded": table(spark, sf_dir, "customer"),
    }
    return pipeline_run_record(
        stages, run_id="r-0001", pipeline_name="company-etl",
        config={"use_llm": False, "threshold": 0.75},
        started_at="2024-01-01 00:00:00",
        completed_at="2024-01-01 00:05:00")


@register(
    "dq_metrics_long",
    doc="data_quality_metrics rows (create_tables.sql:130-137): four "
        "metrics over lineitem in ONE scan (single agg, map-side "
        "partials) unpivoted with stack to (table, metric, value).",
    tags=("ops", "quality"),
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS row_count,
         round(avg(CASE WHEN l_shipdate IS NULL THEN 1.0 ELSE 0.0 END), 6)
           AS null_shipdate_rate,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(*), 6) AS avg_quantity,
         CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS distinct_orders
  FROM lineitem
)
SELECT CAST(NULL AS VARCHAR) AS run_id, 'lineitem' AS table_name, *
FROM (
  SELECT 'row_count' AS metric_name, row_count AS metric_value FROM m
  UNION ALL SELECT 'null_shipdate_rate', null_shipdate_rate FROM m
  UNION ALL SELECT 'avg_quantity', avg_quantity FROM m
  UNION ALL SELECT 'distinct_orders', distinct_orders FROM m
)
""",
)
def dq_metrics_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return quality_metrics(li, "lineitem", {
        "row_count": F.count(F.lit(1)),
        "null_shipdate_rate": F.round(
            davg(F.when(F.col("l_shipdate").isNull(), 1.0).otherwise(0.0)),
            6),
        "avg_quantity": F.round(davg(F.col("l_quantity")), 6),
        "distinct_orders": F.countDistinct("l_orderkey"),
    })
