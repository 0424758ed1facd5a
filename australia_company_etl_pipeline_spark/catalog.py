"""Table catalog over the test parquet datasets.

The engine's "schema catalog" (SURVEY.md §1.1) exposed as plain parquet
scans — filters/column pruning push down into the scan, which the reference
never got because all its data entered via driver-side ``createDataFrame``
(``/root/reference/src/pipeline.py:388-413``, the 50 MB-task defect).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Timestamp-bearing columns per table. Testdata generations have shipped
# timestamps as TIMESTAMP(MICROS), TIMESTAMP(NANOS) (which Spark rejects
# by default), and NTZ variants — normalize every one of them to the
# session-zone timestamp the operators expect, whatever physical type
# the current generation uses.
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table. Pure parquet scan — Catalyst handles
    predicate pushdown / column pruning / partition sizing."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    ts_cols = _TS_COLS.get(name, ())
    if ts_cols:
        # NANOS would otherwise fail the read outright; as long + rebuild
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if ts_cols:
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        for c in ts_cols:
            t = df.schema[c].dataType
            if isinstance(t, LongType):  # NANOS read as epoch-nano longs
                # integer div, NOT (col/1000).cast: double division loses
                # exactness above 2^53 — epoch-nanos are ~2^60, so the
                # rounded quotient can land a whole-second boundary on
                # x.999999s and shift every floor(epoch) comparison
                df = df.withColumn(
                    c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
            elif isinstance(t, TimestampNTZType):
                # session tz is pinned UTC, so NTZ→LTZ keeps wall-clock
                # values; downstream (windows, epoch casts) expects LTZ
                df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for spark.sql queries
    (the engine's analog of the reference's dbt sources,
    ``dbt/models/staging/sources.yml``)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
