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
    doc="data_quality_metrics rows (create_tables.sql:130-137) + the r4 "
        "column profiler (operators/profile.py) in the same long "
        "contract: the original four table metrics AND the full "
        "per-column profile of l_quantity / l_extendedprice / "
        "l_returnflag / l_shipdate (null rate, exact distinct, "
        "min/max/decimal-mean, exact p25/p50/p75, string-length and "
        "epoch-bound stats) are ALL expressions over ONE scan and one "
        "aggregate; per-column heavy hitters (top-3 of l_returnflag and "
        "l_linestatus, both columns through ONE exploded shuffle) union "
        "in as '<col>.top<rank>:<value>' rows, and the equi-width "
        "histogram of l_quantity (8 bins over its [1, 51] physical "
        "bounds — bounds given, so NO extra min/max pass; ≤8 reducer "
        "rows) as '<col>.hist<bin>' rows. The sketch modes (HLL++ "
        "distinct, GK percentiles — the 100 TB path, no Expand blowup, "
        "mergeable state) are pytest-pinned against these exact values "
        "(tests/test_ops_audit.py).",
    tags=("ops", "quality"),
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS row_count,
         round(avg(CASE WHEN l_shipdate IS NULL THEN 1.0 ELSE 0.0 END), 6)
           AS null_shipdate_rate,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(*), 6) AS avg_quantity,
         CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS distinct_orders,
         round(avg(CASE WHEN l_quantity IS NULL THEN 1.0 ELSE 0.0 END), 6)
           AS q_null_rate,
         round(avg(CASE WHEN l_quantity IS NOT NULL
                        AND isnan(CAST(l_quantity AS DOUBLE))
                   THEN 1.0 ELSE 0.0 END), 6) AS q_nan_rate,
         round(avg(CASE WHEN l_quantity IS NOT NULL
                        AND isinf(CAST(l_quantity AS DOUBLE))
                   THEN 1.0 ELSE 0.0 END), 6) AS q_inf_rate,
         CAST(COUNT(DISTINCT l_quantity) AS DOUBLE) AS q_n_distinct,
         CAST(min(l_quantity) AS DOUBLE) AS q_min,
         CAST(max(l_quantity) AS DOUBLE) AS q_max,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(l_quantity), 6) AS q_mean,
         round(quantile_cont(l_quantity, 0.25), 6) AS q_p25,
         round(quantile_cont(l_quantity, 0.5), 6) AS q_p50,
         round(quantile_cont(l_quantity, 0.75), 6) AS q_p75,
         round(avg(CASE WHEN l_extendedprice IS NULL THEN 1.0
                   ELSE 0.0 END), 6) AS ep_null_rate,
         round(avg(CASE WHEN l_extendedprice IS NOT NULL
                        AND isnan(CAST(l_extendedprice AS DOUBLE))
                   THEN 1.0 ELSE 0.0 END), 6) AS ep_nan_rate,
         round(avg(CASE WHEN l_extendedprice IS NOT NULL
                        AND isinf(CAST(l_extendedprice AS DOUBLE))
                   THEN 1.0 ELSE 0.0 END), 6) AS ep_inf_rate,
         CAST(COUNT(DISTINCT l_extendedprice) AS DOUBLE) AS ep_n_distinct,
         CAST(min(l_extendedprice) AS DOUBLE) AS ep_min,
         CAST(max(l_extendedprice) AS DOUBLE) AS ep_max,
         round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(l_extendedprice), 6) AS ep_mean,
         round(quantile_cont(l_extendedprice, 0.25), 6) AS ep_p25,
         round(quantile_cont(l_extendedprice, 0.5), 6) AS ep_p50,
         round(quantile_cont(l_extendedprice, 0.75), 6) AS ep_p75,
         round(avg(CASE WHEN l_returnflag IS NULL THEN 1.0
                   ELSE 0.0 END), 6) AS rf_null_rate,
         CAST(COUNT(DISTINCT l_returnflag) AS DOUBLE) AS rf_n_distinct,
         CAST(min(length(l_returnflag)) AS DOUBLE) AS rf_len_min,
         CAST(max(length(l_returnflag)) AS DOUBLE) AS rf_len_max,
         round(CAST(sum(CAST(length(l_returnflag) AS DECIMAL(30,6)))
                    AS DOUBLE) / COUNT(l_returnflag), 6) AS rf_len_mean,
         round(avg(CASE WHEN l_shipdate IS NULL THEN 1.0 ELSE 0.0 END), 6)
           AS sd_null_rate,
         CAST(COUNT(DISTINCT l_shipdate) AS DOUBLE) AS sd_n_distinct,
         CAST(min(CAST(floor(epoch(l_shipdate)) AS BIGINT)) AS DOUBLE)
           AS sd_min_s,
         CAST(max(CAST(floor(epoch(l_shipdate)) AS BIGINT)) AS DOUBLE)
           AS sd_max_s
  FROM lineitem
), m2 AS (
  -- the 'new snapshot' of the drift monitor: lineitem with
  -- l_quantity <= 25 (a simulated feed change), profiled with the
  -- SAME exact-mode expressions as m so old-side values are
  -- bit-identical to the base profile
  SELECT round(avg(CASE WHEN l_quantity IS NULL THEN 1.0 ELSE 0.0 END), 6)
           AS q2_null_rate,
         round(avg(CASE WHEN l_quantity IS NOT NULL
                        AND isnan(CAST(l_quantity AS DOUBLE))
                   THEN 1.0 ELSE 0.0 END), 6) AS q2_nan_rate,
         round(avg(CASE WHEN l_quantity IS NOT NULL
                        AND isinf(CAST(l_quantity AS DOUBLE))
                   THEN 1.0 ELSE 0.0 END), 6) AS q2_inf_rate,
         CAST(COUNT(DISTINCT l_quantity) AS DOUBLE) AS q2_n_distinct,
         CAST(min(l_quantity) AS DOUBLE) AS q2_min,
         CAST(max(l_quantity) AS DOUBLE) AS q2_max,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(l_quantity), 6) AS q2_mean,
         round(quantile_cont(l_quantity, 0.25), 6) AS q2_p25,
         round(quantile_cont(l_quantity, 0.5), 6) AS q2_p50,
         round(quantile_cont(l_quantity, 0.75), 6) AS q2_p75
  FROM lineitem WHERE l_quantity <= 25
), tv AS (
  SELECT column_name, value, n,
         row_number() OVER (PARTITION BY column_name
                            ORDER BY n DESC, value ASC) AS rank
  FROM (
    SELECT 'l_returnflag' AS column_name, l_returnflag AS value,
           COUNT(*) AS n
    FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 2
    UNION ALL
    SELECT 'l_linestatus', l_linestatus, COUNT(*)
    FROM lineitem WHERE l_linestatus IS NOT NULL GROUP BY 2
  )
), hist AS (
  -- clamp-then-bin, the histogram() operator's exact arithmetic:
  -- width = (51-1)/8 = 6.25, upper edge inclusive in the last bin
  SELECT CAST(least(7, floor(
           (least(51.0, greatest(1.0, CAST(l_quantity AS DOUBLE))) - 1.0)
           / 6.25)) AS INT) AS bin,
         COUNT(*) AS n
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND NOT isnan(CAST(l_quantity AS DOUBLE))
  GROUP BY 1
)
SELECT CAST(NULL AS VARCHAR) AS run_id, 'lineitem' AS table_name, *
FROM (
  SELECT 'row_count' AS metric_name, row_count AS metric_value FROM m
  UNION ALL SELECT 'null_shipdate_rate', null_shipdate_rate FROM m
  UNION ALL SELECT 'avg_quantity', avg_quantity FROM m
  UNION ALL SELECT 'distinct_orders', distinct_orders FROM m
  UNION ALL SELECT 'l_quantity.null_rate', q_null_rate FROM m
  UNION ALL SELECT 'l_quantity.nan_rate', q_nan_rate FROM m
  UNION ALL SELECT 'l_quantity.inf_rate', q_inf_rate FROM m
  UNION ALL SELECT 'l_quantity.n_distinct', q_n_distinct FROM m
  UNION ALL SELECT 'l_quantity.min', q_min FROM m
  UNION ALL SELECT 'l_quantity.max', q_max FROM m
  UNION ALL SELECT 'l_quantity.mean', q_mean FROM m
  UNION ALL SELECT 'l_quantity.p25', q_p25 FROM m
  UNION ALL SELECT 'l_quantity.p50', q_p50 FROM m
  UNION ALL SELECT 'l_quantity.p75', q_p75 FROM m
  UNION ALL SELECT 'l_extendedprice.null_rate', ep_null_rate FROM m
  UNION ALL SELECT 'l_extendedprice.nan_rate', ep_nan_rate FROM m
  UNION ALL SELECT 'l_extendedprice.inf_rate', ep_inf_rate FROM m
  UNION ALL SELECT 'l_extendedprice.n_distinct', ep_n_distinct FROM m
  UNION ALL SELECT 'l_extendedprice.min', ep_min FROM m
  UNION ALL SELECT 'l_extendedprice.max', ep_max FROM m
  UNION ALL SELECT 'l_extendedprice.mean', ep_mean FROM m
  UNION ALL SELECT 'l_extendedprice.p25', ep_p25 FROM m
  UNION ALL SELECT 'l_extendedprice.p50', ep_p50 FROM m
  UNION ALL SELECT 'l_extendedprice.p75', ep_p75 FROM m
  UNION ALL SELECT 'l_returnflag.null_rate', rf_null_rate FROM m
  UNION ALL SELECT 'l_returnflag.n_distinct', rf_n_distinct FROM m
  UNION ALL SELECT 'l_returnflag.len_min', rf_len_min FROM m
  UNION ALL SELECT 'l_returnflag.len_max', rf_len_max FROM m
  UNION ALL SELECT 'l_returnflag.len_mean', rf_len_mean FROM m
  UNION ALL SELECT 'l_shipdate.null_rate', sd_null_rate FROM m
  UNION ALL SELECT 'l_shipdate.n_distinct', sd_n_distinct FROM m
  UNION ALL SELECT 'l_shipdate.min_s', sd_min_s FROM m
  UNION ALL SELECT 'l_shipdate.max_s', sd_max_s FROM m
  UNION ALL
  SELECT column_name || '.top' || rank || ':' || value, CAST(n AS DOUBLE)
  FROM tv WHERE rank <= 3
  UNION ALL
  SELECT 'l_quantity.hist' || bin, CAST(n AS DOUBLE) FROM hist
  UNION ALL
  -- profile_drift rows: abs_change = new - old (unrounded diff of the
  -- two round-6 profile values); rel_change = abs/|old| rounded 6,
  -- NULL when old = 0 — the operator's exact arithmetic
  SELECT 'drift.' || name || '.abs', nv - ov FROM (
    SELECT * FROM (VALUES
      ('l_quantity.null_rate'),('l_quantity.nan_rate'),
      ('l_quantity.inf_rate'),('l_quantity.n_distinct'),
      ('l_quantity.min'),('l_quantity.max'),('l_quantity.mean'),
      ('l_quantity.p25'),('l_quantity.p50'),('l_quantity.p75')
    ) AS t(name),
    m, m2,
    LATERAL (SELECT CASE name
        WHEN 'l_quantity.null_rate' THEN q_null_rate
        WHEN 'l_quantity.nan_rate' THEN q_nan_rate
        WHEN 'l_quantity.inf_rate' THEN q_inf_rate
        WHEN 'l_quantity.n_distinct' THEN q_n_distinct
        WHEN 'l_quantity.min' THEN q_min
        WHEN 'l_quantity.max' THEN q_max
        WHEN 'l_quantity.mean' THEN q_mean
        WHEN 'l_quantity.p25' THEN q_p25
        WHEN 'l_quantity.p50' THEN q_p50
        WHEN 'l_quantity.p75' THEN q_p75 END AS ov,
      CASE name
        WHEN 'l_quantity.null_rate' THEN q2_null_rate
        WHEN 'l_quantity.nan_rate' THEN q2_nan_rate
        WHEN 'l_quantity.inf_rate' THEN q2_inf_rate
        WHEN 'l_quantity.n_distinct' THEN q2_n_distinct
        WHEN 'l_quantity.min' THEN q2_min
        WHEN 'l_quantity.max' THEN q2_max
        WHEN 'l_quantity.mean' THEN q2_mean
        WHEN 'l_quantity.p25' THEN q2_p25
        WHEN 'l_quantity.p50' THEN q2_p50
        WHEN 'l_quantity.p75' THEN q2_p75 END AS nv) x
  )
  UNION ALL
  SELECT 'drift.' || name || '.rel',
         CASE WHEN ov != 0 THEN round((nv - ov) / abs(ov), 6) END FROM (
    SELECT * FROM (VALUES
      ('l_quantity.null_rate'),('l_quantity.nan_rate'),
      ('l_quantity.inf_rate'),('l_quantity.n_distinct'),
      ('l_quantity.min'),('l_quantity.max'),('l_quantity.mean'),
      ('l_quantity.p25'),('l_quantity.p50'),('l_quantity.p75')
    ) AS t(name),
    m, m2,
    LATERAL (SELECT CASE name
        WHEN 'l_quantity.null_rate' THEN q_null_rate
        WHEN 'l_quantity.nan_rate' THEN q_nan_rate
        WHEN 'l_quantity.inf_rate' THEN q_inf_rate
        WHEN 'l_quantity.n_distinct' THEN q_n_distinct
        WHEN 'l_quantity.min' THEN q_min
        WHEN 'l_quantity.max' THEN q_max
        WHEN 'l_quantity.mean' THEN q_mean
        WHEN 'l_quantity.p25' THEN q_p25
        WHEN 'l_quantity.p50' THEN q_p50
        WHEN 'l_quantity.p75' THEN q_p75 END AS ov,
      CASE name
        WHEN 'l_quantity.null_rate' THEN q2_null_rate
        WHEN 'l_quantity.nan_rate' THEN q2_nan_rate
        WHEN 'l_quantity.inf_rate' THEN q2_inf_rate
        WHEN 'l_quantity.n_distinct' THEN q2_n_distinct
        WHEN 'l_quantity.min' THEN q2_min
        WHEN 'l_quantity.max' THEN q2_max
        WHEN 'l_quantity.mean' THEN q2_mean
        WHEN 'l_quantity.p25' THEN q2_p25
        WHEN 'l_quantity.p50' THEN q2_p50
        WHEN 'l_quantity.p75' THEN q2_p75 END AS nv) x
  )
)
""",
)
def dq_metrics_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import (histogram, profile_drift,
                                     profile_metrics, top_values)

    li = table(spark, sf_dir, "lineitem")
    metrics = {
        "row_count": F.count(F.lit(1)),
        "null_shipdate_rate": F.round(
            davg(F.when(F.col("l_shipdate").isNull(), 1.0).otherwise(0.0)),
            6),
        "avg_quantity": F.round(davg(F.col("l_quantity")), 6),
        "distinct_orders": F.countDistinct("l_orderkey"),
        **profile_metrics(li, ["l_quantity", "l_extendedprice",
                               "l_returnflag", "l_shipdate"]),
    }
    base = quality_metrics(li, "lineitem", metrics)
    tops = (top_values(li, ["l_returnflag", "l_linestatus"], k=3)
            .select(F.lit(None).cast("string").alias("run_id"),
                    F.lit("lineitem").alias("table_name"),
                    F.concat(F.col("column_name"), F.lit(".top"),
                             F.col("rank").cast("string"), F.lit(":"),
                             F.col("value")).alias("metric_name"),
                    F.col("n").cast("double").alias("metric_value")))
    hist = (histogram(li, "l_quantity", bins=8, lo=1.0, hi=51.0)
            .select(F.lit(None).cast("string").alias("run_id"),
                    F.lit("lineitem").alias("table_name"),
                    F.concat(F.lit("l_quantity.hist"),
                             F.col("bin").cast("string"))
                    .alias("metric_name"),
                    F.col("n").cast("double").alias("metric_value")))
    # drift monitor fold (r5): l_quantity's profile drift between the
    # table and a simulated feed change (qty <= 25) — one extra
    # single-aggregate scan PER SIDE (profile_drift profiles old and
    # new; at a real monitoring cadence the old profile is yesterday's
    # persisted report passed via old_profile=, dropping the old-side
    # scan) — 20 long-contract rows
    drift = profile_drift(li, li.filter(F.col("l_quantity") <= 25),
                          cols=["l_quantity"], table_name="lineitem")
    dcommon = [F.lit(None).cast("string").alias("run_id"),
               F.col("table_name")]
    dabs = drift.select(
        *dcommon,
        F.concat(F.lit("drift."), F.col("metric_name"), F.lit(".abs"))
        .alias("metric_name"),
        F.col("abs_change").alias("metric_value"))
    drel = drift.select(
        *dcommon,
        F.concat(F.lit("drift."), F.col("metric_name"), F.lit(".rel"))
        .alias("metric_name"),
        F.col("rel_change").alias("metric_value"))
    return (base.unionByName(tops).unionByName(hist)
            .unionByName(dabs).unionByName(drel))
