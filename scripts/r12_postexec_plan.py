#!/usr/bin/env python
"""r12: capture the POST-EXECUTION adaptive plan (AQE's final plan,
where ReusedExchange / AQEShuffleRead decisions are visible — the
static explain shows isFinalPlan=false placeholders) for named
queries, plus job/stage counts for the forcing action.

Usage: python scripts/r12_postexec_plan.py <tag> <query> [query ...]
Writes plans/r12/<query>_postexec_<tag>.txt and prints a summary line.
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import bench  # noqa: E402
from australia_company_etl_pipeline_spark import plans  # noqa: E402
from australia_company_etl_pipeline_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1]
NAMES = sys.argv[2:]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join("plans", "r12")
os.makedirs(OUT, exist_ok=True)

spark = get_spark("postexec-plan",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

for name in NAMES:
    reg = plans.REGISTRY[name]
    # warm pass fills persisted index caches so the measured pass is
    # steady state
    bench.force(reg.builder(spark, SF))
    bench._release_operator_caches()
    bench.gc_barrier(spark)
    group = f"postexec-{name}-{time.time()}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    df = reg.builder(spark, SF)
    bench.force(df)
    dt = time.perf_counter() - t0
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    nstages = sum(
        len(sc.statusTracker().getJobInfo(j).stageIds) for j in jobs)
    # the noop write runs its OWN QueryExecution, so df's QE stays
    # unexecuted (isFinalPlan=false). collect() executes df's QE —
    # headline results are all driver-small — and the final adaptive
    # plan (ReusedExchange / AQEShuffleRead decisions) becomes visible.
    bench._release_operator_caches()
    df2 = reg.builder(spark, SF)
    df2.collect()
    plan = df2._jdf.queryExecution().executedPlan().toString()
    with open(os.path.join(OUT, f"{name}_postexec_{TAG}.txt"), "w") as f:
        f.write(plan)
    counts = {k: len(re.findall(k, plan))
              for k in ("ReusedExchange", "Exchange", "AQEShuffleRead",
                        "InMemoryTableScan", "Scan parquet",
                        "BroadcastHashJoin", "SortMergeJoin",
                        "ShuffledHashJoin")}
    print(f"{name}: {dt:.2f}s jobs={len(jobs)} stages={nstages} "
          + " ".join(f"{k}={v}" for k, v in counts.items()), flush=True)
    bench._release_operator_caches()
spark.stop()
