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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table. Pure parquet scan — Catalyst handles
    predicate pushdown / column pruning / partition sizing."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    if name == "events":
        # events.ts has shipped as both TIMESTAMP(NANOS) and
        # TIMESTAMP(MICROS) parquet across testdata generations. Spark
        # rejects NANOS by default — read nanos as long and rebuild a
        # proper timestamp; MICROS arrives as a timestamp already and
        # needs nothing.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        elif isinstance(ts_type, TimestampNTZType):
            # session tz is pinned UTC, so NTZ→LTZ keeps wall-clock values;
            # downstream (windows, epoch casts) expects the LTZ family
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for spark.sql queries
    (the engine's analog of the reference's dbt sources,
    ``dbt/models/staging/sources.yml``)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
