"""Data-quality assertion queries (SURVEY §2.12 Q1–Q4) under the oracle gate.

The reference runs dbt schema tests + three custom assertion SQL files
(``/root/reference/dbt/tests/*.sql``, ``dbt/models/*/schema.yml``); each is
a SELECT whose rows are violations. Our engine exposes the same checks as
library operators (``operators/quality.py``) and registers two driver-gate
queries here:

- ``dq_suite_report`` — the whole suite as one kind-tagged result:
  kind='assert' rows carry one check each with its violation count
  (checks aimed at columns of the test catalog that genuinely violate —
  discount range, status domain, part-size range, duplicate user-days —
  plus passing checks: PK uniqueness, not-null, match rate ≥ 20%, so the
  value-compare is meaningful in both directions); kind='freshness' rows
  (r4 fold of the former `source_freshness` slot — freed the window for
  `doc_search_bm25`) carry the dbt source-freshness SLA statuses.
- ``dq_status_violations`` — one representative row-level assertion
  (dbt-style: the violating rows themselves).

Scale notes: every check is a single scan→filter→(partial-)agg over one
table — map-side combined counts, no wide shuffle except the two
duplicate-key groupBys, which shuffle only the key columns (input pruned
to the grouping keys). The seven 1-row aggregates union on the driver for
free (each is its own tiny job; at cluster scale they parallelize
independently).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.quality import (
    assert_accepted_range,
    assert_accepted_values,
    assert_minimum_match_rate,
    assert_no_duplicates,
    assert_not_null,
    assert_valid_scores,
    source_freshness,
)
from .registry import register


def _count_row(name: str, violations: DataFrame) -> DataFrame:
    return violations.agg(
        F.count(F.lit(1)).cast("long").alias("violations")).select(
        F.lit("assert").alias("kind"), F.lit(name).alias("name"),
        "violations",
        F.lit(None).cast("timestamp").alias("max_ts"),
        F.lit(None).cast("double").alias("age_hours"),
        F.lit(None).cast("string").alias("status"))


_FRESH_NOW = "2024-02-01 00:00:00"


def _fresh_sql(src_sql: str, tbl: str, warn: float, error: float) -> str:
    age = (f"round((epoch_us(TIMESTAMP '{_FRESH_NOW}') - epoch_us(max_ts))"
           f" / 3600000000.0, 6)")
    return f"""
SELECT 'freshness' AS kind, '{tbl}' AS name, CAST(NULL AS BIGINT)
         AS violations, max_ts, {age} AS age_hours,
       CASE WHEN max_ts IS NULL OR {age} > {error} THEN 'error'
            WHEN {age} > {warn} THEN 'warn'
            ELSE 'fresh' END AS status
FROM ({src_sql})"""


@register(
    "dq_suite_report",
    doc="Q1–Q4 assertion suite (dbt/tests/assert_valid_confidence_scores"
        ".sql:3-7, assert_minimum_match_rate.sql:4-10, "
        "assert_no_duplicate_abns.sql:3-8, dbt schema tests "
        "models/staging/schema.yml:9-77) as one violation-count report, "
        "plus (kind='freshness', r4 fold) the dbt source-freshness SLA "
        "(dbt/models/staging/sources.yml:24-26: warn_after 24h / "
        "error_after 48h): max-age of a loaded_at timestamp vs a pinned "
        "'now', statused fresh/warn/error across three sources that "
        "exercise all three states (events ~24.5h stale → warn, orders "
        "wide thresholds → fresh, empty slice → error with NULL max_ts). "
        "Every branch is a single scan→filter→(partial-)agg.",
    tags=("quality",),
    oracle=("""
SELECT * FROM (
  SELECT 'assert' AS kind, 'q1_score_range' AS name, CAST((
    SELECT COUNT(*) FROM lineitem
    WHERE l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.05
  ) AS BIGINT) AS violations, CAST(NULL AS TIMESTAMP) AS max_ts,
    CAST(NULL AS DOUBLE) AS age_hours, CAST(NULL AS VARCHAR) AS status
  UNION ALL SELECT 'assert', 'q2_match_rate', CAST((
    SELECT CASE WHEN COUNT(DISTINCT o_custkey) * 100.0
                     / (SELECT COUNT(*) FROM customer) < 20.0
           THEN 1 ELSE 0 END FROM orders
  ) AS BIGINT), NULL, NULL, NULL
  UNION ALL SELECT 'assert', 'q3_dup_user_days', CAST((
    SELECT COUNT(*) FROM (
      SELECT user_id, CAST(ts AS DATE) AS day FROM events
      GROUP BY user_id, day HAVING COUNT(*) > 1)
  ) AS BIGINT), NULL, NULL, NULL
  UNION ALL SELECT 'assert', 'q3_pk_orders', CAST((
    SELECT COUNT(*) FROM (
      SELECT o_orderkey FROM orders
      GROUP BY o_orderkey HAVING COUNT(*) > 1)
  ) AS BIGINT), NULL, NULL, NULL
  UNION ALL SELECT 'assert', 'q4_not_null_docs', CAST((
    SELECT COUNT(*) FROM documents WHERE text IS NULL OR lang IS NULL
  ) AS BIGINT), NULL, NULL, NULL
  UNION ALL SELECT 'assert', 'q4_size_range', CAST((
    SELECT COUNT(*) FROM part
    WHERE p_size IS NOT NULL AND (p_size < 1 OR p_size > 25)
  ) AS BIGINT), NULL, NULL, NULL
  UNION ALL SELECT 'assert', 'q4_status_values', CAST((
    SELECT COUNT(*) FROM orders
    WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F')
  ) AS BIGINT), NULL, NULL, NULL"""
            + "\n  UNION ALL"
            + _fresh_sql(
                "SELECT max(CAST(ts AS TIMESTAMP)) AS max_ts FROM events",
                "events", 24, 48)
            + "\n  UNION ALL"
            + _fresh_sql(
                "SELECT max(CAST(o_orderdate AS TIMESTAMP)) AS max_ts "
                "FROM orders", "orders", 200000, 300000)
            + "\n  UNION ALL"
            + _fresh_sql(
                "SELECT max(CAST(ts AS TIMESTAMP)) AS max_ts FROM "
                "events WHERE event_type = 'no_such_type'",
                "events_empty", 24, 48)
            + "\n) ORDER BY kind, name\n"))
def dq_suite_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    customer = table(spark, sf_dir, "customer")
    events = table(spark, sf_dir, "events")
    documents = table(spark, sf_dir, "documents")

    # Q2 fixture: "match rate" = % of customers with ≥1 order, via the
    # J10-style 1×1 cross join of scalar aggregates.
    fct = (orders.agg(F.countDistinct("o_custkey").alias("matched"))
           .crossJoin(customer.agg(F.count(F.lit(1)).alias("total")))
           .select((F.col("matched") * 100.0 / F.col("total"))
                   .alias("match_rate_percent")))

    rows = [
        _count_row("q1_score_range",
                   assert_valid_scores(lineitem, col="l_discount",
                                       lo=0.0, hi=0.05)),
        _count_row("q2_match_rate", assert_minimum_match_rate(fct, 20.0)),
        _count_row("q3_dup_user_days",
                   assert_no_duplicates(
                       events.select("user_id",
                                     F.to_date("ts").alias("day")),
                       ["user_id", "day"])),
        _count_row("q3_pk_orders",
                   assert_no_duplicates(orders, ["o_orderkey"])),
        _count_row("q4_not_null_docs",
                   assert_not_null(documents, ["text", "lang"])),
        _count_row("q4_size_range",
                   assert_accepted_range(part, "p_size", 1, 25)),
        _count_row("q4_status_values",
                   assert_accepted_values(orders, "o_orderstatus",
                                          ["O", "F"])),
    ]

    def fresh_row(src: DataFrame, ts_col: str, warn: float, error: float,
                  tbl: str) -> DataFrame:
        return (source_freshness(src, ts_col, _FRESH_NOW, warn, error, tbl)
                .select(F.lit("freshness").alias("kind"),
                        F.col("table_name").alias("name"),
                        F.lit(None).cast("long").alias("violations"),
                        "max_ts", "age_hours", "status"))

    rows += [
        fresh_row(events, "ts", 24, 48, "events"),
        fresh_row(orders.select(F.col("o_orderdate").alias("ts")), "ts",
                  200000, 300000, "orders"),
        fresh_row(events.filter(F.col("event_type") == "no_such_type"),
                  "ts", 24, 48, "events_empty"),
    ]
    return reduce(DataFrame.unionByName, rows).orderBy("kind", "name")


@register(
    "dq_status_violations",
    doc="Q4 accepted_values as a dbt-style row-level assertion: the "
        "violating rows themselves (dbt/models/staging/schema.yml "
        "accepted_values; runner semantics dbt/tests/*.sql).",
    tags=("quality",),
    oracle="""
SELECT o_orderkey, o_orderstatus FROM orders
WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F')
ORDER BY o_orderkey
""")
def dq_status_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (assert_accepted_values(orders, "o_orderstatus", ["O", "F"])
            .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey"))
