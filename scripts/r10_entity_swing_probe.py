"""r10 probe: isolate the entity_match_blocking rep swings seen in the
bench windows (4s..122s on an idle host, JVM sentinel flat).

Phase A: 6 reps alone (gc barrier between) — stable?
Phase B: 6 reps each preceded by the py_sentinel — does the Python
         boundary neighbor destabilize it?
Phase C: 6 reps each preceded by match_cascade_best — does the cascade
         neighbor (pandas_udf) destabilize it?
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from australia_company_etl_pipeline_spark import plans  # noqa: E402
from australia_company_etl_pipeline_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402

SF = "/root/testdata/sf0.1"


def main():
    spark = get_spark("r10-entity-swing",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    em = plans.REGISTRY["entity_match_blocking"].builder
    mc = plans.REGISTRY["match_cascade_best"].builder
    bench.force(em(spark, SF))  # warm

    def rep(label, pre=None):
        if pre is not None:
            bench.force(pre)
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        bench.force(em(spark, SF))
        dt = time.perf_counter() - t0
        print(label, round(dt, 2), flush=True)

    for i in range(6):
        rep("A-alone")
    bench.force(bench.py_sentinel_df(spark))  # warm python workers
    for i in range(6):
        rep("B-after-pysent", pre=bench.py_sentinel_df(spark))
    for i in range(6):
        rep("C-after-cascade", pre=mc(spark, SF))
    spark.stop()


if __name__ == "__main__":
    main()
