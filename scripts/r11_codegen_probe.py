#!/usr/bin/env python
"""r11 codegen-churn probe: doc_search_bm25 loads ~160-200 fresh JVM
classes and pays 2.5-5.7s of background JIT compile on EVERY rep at
steady state (bench_detail_last.json queries_jvm), while every other
query settles near zero by warm-up #2. Fresh classes at steady state
mean the whole-stage-codegen source is changing run to run — a codegen
cache miss class somewhere in the fold.

This probe runs a query N times and records, per run: Janino
compilation count/time deltas (CodegenMetrics), generated-class counts,
classloading deltas, and wall time — then (optionally, with branches)
repeats per branch to localize WHICH branch churns.

Usage: python scripts/r11_codegen_probe.py <query> [reps] [--branches]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import bench  # noqa: E402
from australia_company_etl_pipeline_spark import plans  # noqa: E402
from australia_company_etl_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("codegen-probe",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")


def codegen_counters():
    """CodegenMetrics (Janino-side) + classloading: the direct signal
    for 'Spark compiled brand-new generated source this run'."""
    jvm = spark._jvm
    out = {}
    try:
        # Scala object: py4j exposes the module via the $ class's
        # MODULE$ static field
        mod = getattr(getattr(
            jvm.org.apache.spark.metrics.source, "CodegenMetrics$"),
            "MODULE$")
        out["janino_n"] = mod.METRIC_SOURCE_CODE_SIZE().getCount()
        out["compile_hist_n"] = mod.METRIC_COMPILATION_TIME().getCount()
    except Exception as e:  # noqa: BLE001
        out["janino_err"] = str(e)[:80]
    mf = jvm.java.lang.management.ManagementFactory
    out["loaded"] = int(
        mf.getClassLoadingMXBean().getTotalLoadedClassCount())
    out["compile_ms"] = int(
        mf.getCompilationMXBean().getTotalCompilationTime())
    return out


def run(label, builder, reps):
    for i in range(reps):
        bench._release_operator_caches()
        bench.gc_barrier(spark)
        c0 = codegen_counters()
        t0 = time.perf_counter()
        bench.force(builder(spark, SF))
        dt = time.perf_counter() - t0
        c1 = codegen_counters()
        delta = {k: c1[k] - c0[k] for k in c0
                 if isinstance(c0.get(k), int) and k in c1}
        print(f"{label:40s} rep{i} {dt:7.2f}s  "
              + "  ".join(f"{k}+{v}" for k, v in delta.items()), flush=True)
    bench._release_operator_caches()


name = sys.argv[1] if len(sys.argv) > 1 else "doc_search_bm25"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
reg = plans.REGISTRY[name]
run(name, reg.builder, reps)
if "--branches" in sys.argv:
    for bname, bb in reg.branches.items():
        run(f"{name}::{bname}", bb, max(2, reps - 1))
spark.stop()
