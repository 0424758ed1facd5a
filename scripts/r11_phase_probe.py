#!/usr/bin/env python
"""r11 phase probe (guide §1.1/§1.2): for each headline query — and
each branch of the folded ones — split the bench's timed region into
its phases and count the Spark jobs it schedules:

  build  — driver-side DataFrame construction (py4j + analysis)
  exec1  — first noop-sink force after the build (cold caches)
  exec2  — second force of the SAME DataFrame object (plan reuse;
           isolates execution from re-build)
  jobs   — number of Spark jobs the build+exec1 pair scheduled
           (eager materializations inside builders show up here)

Usage: python scripts/r11_phase_probe.py [query ...]
Defaults to the heavy set. Writes /tmp/phase_probe.json and prints a
table. Branch rows run the registered branch builders standalone.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import bench  # noqa: E402
from australia_company_etl_pipeline_spark import plans  # noqa: E402
from australia_company_etl_pipeline_spark.session import get_spark  # noqa: E402

HEAVY = [
    "ngram_jaccard_dup_pairs", "doc_search_bm25", "corpus_filter_stats",
    "vocab_ngram_counts", "ann_approx_topk", "hashed_dup_pairs",
    "match_cascade_best", "segment_dedup_docs", "ann_bruteforce_topk",
    "entity_match_blocking", "doc_profile",
]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("phase-probe",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def probe(label, builder, warm=True):
    bench._release_operator_caches()
    if warm:
        # one untimed pass absorbs codegen/JIT & fills persisted index
        # caches so the phases below measure steady state
        bench.force(builder(spark, SF))
        bench._release_operator_caches()
    bench.gc_barrier(spark)
    group = f"probe-{label}-{time.time()}"
    sc.setJobGroup(group, label)
    t0 = time.perf_counter()
    df = builder(spark, SF)
    t1 = time.perf_counter()
    bench.force(df)
    t2 = time.perf_counter()
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    nstages = 0
    for jid in sc.statusTracker().getJobIdsForGroup(group):
        ji = sc.statusTracker().getJobInfo(jid)
        if ji is not None:
            nstages += len(ji.stageIds)
    bench.force(df)
    t3 = time.perf_counter()
    sc.setJobGroup(None, None)
    rec = {"build": round(t1 - t0, 3), "exec1": round(t2 - t1, 3),
           "exec2": round(t3 - t2, 3), "jobs": jobs, "stages": nstages}
    print(f"{label:48s} build {rec['build']:7.3f}  exec1 {rec['exec1']:7.3f}"
          f"  exec2 {rec['exec2']:7.3f}  jobs {jobs:3d} stages {nstages:4d}",
          flush=True)
    return rec


names = sys.argv[1:] or HEAVY
out = {}
for name in names:
    reg = plans.REGISTRY[name]
    out[name] = probe(name, reg.builder)
    for bname, bb in reg.branches.items():
        out[f"{name}::{bname}"] = probe(f"{name}::{bname}", bb)

with open("/tmp/phase_probe.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("wrote /tmp/phase_probe.json")
spark.stop()
