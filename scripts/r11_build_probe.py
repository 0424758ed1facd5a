#!/usr/bin/env python
"""r11 session-4 build-tail probe (guide §1.2 / §5): time ONLY the
driver-side DataFrame construction of each heavy query, repeated REPS
times warm, and count the py4j commands one build issues (the
round-trip chatter that OPTIMIZATION_r11.md's "Not yet optimized" #1
tracks). No data is executed beyond what builders do eagerly.

Usage: python scripts/r11_build_probe.py [query ...]
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

HEAVY = [
    "doc_search_bm25", "corpus_filter_stats", "ngram_jaccard_dup_pairs",
    "vocab_ngram_counts", "ann_approx_topk", "hashed_dup_pairs",
    "segment_dedup_docs", "ann_bruteforce_topk", "entity_match_blocking",
    "match_cascade_best",
]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3

spark = get_spark("build-probe",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")


def count_commands(fn):
    """Count py4j send_command round trips during fn() by wrapping the
    gateway client's send_command."""
    import py4j.clientserver as cs
    orig = cs.ClientServerConnection.send_command
    n = [0]

    def patched(self, *a, **k):
        n[0] += 1
        return orig(self, *a, **k)

    cs.ClientServerConnection.send_command = patched
    try:
        fn()
    finally:
        cs.ClientServerConnection.send_command = orig
    return n[0]


names = sys.argv[1:] or HEAVY
for name in names:
    b = plans.REGISTRY[name].builder
    # warm pass: fills metadata caches, rag cache, persisted indexes
    bench.force(b(spark, SF))
    bench._release_operator_caches()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        b(spark, SF)
        ts.append(time.perf_counter() - t0)
        bench._release_operator_caches()
    ncmd = count_commands(lambda: b(spark, SF))
    bench._release_operator_caches()
    print(f"{name:28s} build {min(ts):7.3f} (min of {REPS}: "
          f"{[round(t, 3) for t in ts]})  py4j_cmds {ncmd}", flush=True)
spark.stop()
