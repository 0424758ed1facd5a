"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ``australia_company_etl_pipeline_spark.plans.registry``:
- ``entry(spark)`` — flagship blocking-join + top-1-window query at sf0.001
- ``queries()`` — one named query per implemented SURVEY.md §2 operator
- ``oracle_sql()`` — DuckDB oracle SQL for every SQL-expressible query
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from australia_company_etl_pipeline_spark import plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.REGISTRY["best_supplier_match"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; keys ⊆ queries().keys()."""
    return plans.oracles()
