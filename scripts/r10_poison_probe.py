"""r10 probe: WHICH part of the py_sentinel poisons the next JVM query?

Variants before each entity_match rep:
  jvm_range   — spark.range(1M).sum (no Python) — control
  pysent_1p   — py_sentinel coalesced to 1 partition (1 python worker)
  pysent_32p  — py_sentinel as in bench (32 partitions)
  pysent_gap  — py_sentinel, then 5s sleep + extra System.gc()
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import functions as F  # noqa: E402

from australia_company_etl_pipeline_spark import plans  # noqa: E402
from australia_company_etl_pipeline_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402

SF = "/root/testdata/sf0.1"


def py_sent_1p(spark):
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ident(s):
        return s * 1.0

    df = spark.range(1_000_000).coalesce(1).select(
        (F.col("id") % 9973).cast("double").alias("x"))
    return df.select(F.sum(_ident(F.col("x"))).alias("s"))


def main():
    spark = get_spark("r10-poison",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    em = plans.REGISTRY["entity_match_blocking"].builder
    bench.force(em(spark, SF))
    bench.force(bench.py_sentinel_df(spark))

    def rep(label, pre_fn=None, gap=0.0):
        if pre_fn is not None:
            bench.force(pre_fn(spark))
        if gap:
            time.sleep(gap)
            spark._jvm.System.gc()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        bench.force(em(spark, SF))
        print(label, round(time.perf_counter() - t0, 2), flush=True)

    for _ in range(4):
        rep("jvm_range", lambda sp: sp.range(1_000_000)
            .agg(F.sum("id")))
    for _ in range(4):
        rep("pysent_1p", py_sent_1p)
    for _ in range(4):
        rep("pysent_32p", bench.py_sentinel_df)
    for _ in range(4):
        rep("pysent_gap", bench.py_sentinel_df, gap=5.0)
    spark.stop()


if __name__ == "__main__":
    main()
