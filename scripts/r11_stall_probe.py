#!/usr/bin/env python
"""r11 stall adjudication probe (VERDICT task 1): reproduce the bench
rotation at sf0.1 and CATCH a stalled rep in the act — a watchdog
thread fires `jcmd <jvm> Thread.print` + /proc/loadavg + GC counters
the moment a timed rep exceeds STALL_FACTOR x its baseline median, so
the stall class (GC storm / JIT deopt / safepoint / host steal) is
adjudicated from evidence instead of post-hoc counter deltas.

Usage: python scripts/r11_stall_probe.py [rounds] [dump_dir]
Optional env SPARK_GRAFT_PROBE_CONF='k=v;k=v' adds session conf (to
A/B candidate fixes, e.g. spark.cleaner.periodicGC.interval=60s).
"""
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import bench  # noqa: E402
from australia_company_etl_pipeline_spark import plans  # noqa: E402
from australia_company_etl_pipeline_spark.session import get_spark  # noqa: E402

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
DUMP_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stall_dumps"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STALL_FACTOR = 2.5
MAX_DUMPS_PER_REP = 3

# baseline medians (r11 pre-change window) for the stall threshold
BASE = json.load(open("/tmp/bench_detail_r11_baseline.json"))["queries"]

os.makedirs(DUMP_DIR, exist_ok=True)

extra = {"spark.ui.showConsoleProgress": "false"}
for kv in os.environ.get("SPARK_GRAFT_PROBE_CONF", "").split(";"):
    if "=" in kv:
        k, v = kv.split("=", 1)
        extra[k] = v
spark = get_spark("stall-probe", extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
JVM_PID = int(spark._jvm.java.lang.ProcessHandle.current().pid())
print(f"jvm pid {JVM_PID}, extra conf {extra}", flush=True)

_cur = {"q": None, "t0": 0.0, "thr": 1e9, "rep": 0, "dumps": 0}
_lock = threading.Lock()
_stop = False


def _watchdog():
    while not _stop:
        time.sleep(2.0)
        with _lock:
            q, t0, thr = _cur["q"], _cur["t0"], _cur["thr"]
            rep, dumps = _cur["rep"], _cur["dumps"]
            if q is None or dumps >= MAX_DUMPS_PER_REP:
                continue
            el = time.perf_counter() - t0
            if el < thr:
                continue
            _cur["dumps"] += 1
            n = _cur["dumps"]
        stamp = time.strftime("%H%M%S")
        base = os.path.join(DUMP_DIR, f"{q}_r{rep}_d{n}_{stamp}")
        try:
            td = subprocess.run(["jcmd", str(JVM_PID), "Thread.print"],
                                capture_output=True, text=True, timeout=30)
            with open(base + ".jstack", "w") as f:
                f.write(td.stdout or td.stderr)
        except Exception as e:  # noqa: BLE001
            with open(base + ".jstack", "w") as f:
                f.write(f"jcmd failed: {e}")
        try:
            gclog = subprocess.run(
                ["jcmd", str(JVM_PID), "GC.heap_info"],
                capture_output=True, text=True, timeout=30).stdout
            load = open("/proc/loadavg").read().strip()
            pstat = subprocess.run(
                ["ps", "-eo", "pid,pcpu,pmem,etime,comm", "--sort=-pcpu"],
                capture_output=True, text=True, timeout=10).stdout
            with open(base + ".sys", "w") as f:
                f.write(f"elapsed={el:.1f}s load={load}\n\n"
                        f"{gclog}\n\n{pstat[:2000]}")
        except Exception:  # noqa: BLE001
            pass
        print(f"  !! dump {n} for {q} rep {rep} at {el:.1f}s", flush=True)


threading.Thread(target=_watchdog, daemon=True).start()

names = [n for n in bench.HEADLINE if n in plans.REGISTRY]
sentinel_builder = plans.REGISTRY[bench.SENTINEL].builder

# one untimed warm-up round (the bench discipline)
print("warmup...", flush=True)
bench.force(bench.py_sentinel_df(spark))
for name in names:
    with _lock:
        _cur.update(q="WARMUP_" + name, t0=time.perf_counter(),
                    thr=max(20.0, STALL_FACTOR * BASE.get(name, 8.0)),
                    rep=0, dumps=0)
    t0 = time.perf_counter()
    bench.force(plans.REGISTRY[name].builder(spark, SF))
    with _lock:
        _cur["q"] = None
    print(f"  warm {name}: {time.perf_counter() - t0:.2f}s", flush=True)
    bench._release_operator_caches()

times = {n: [] for n in names}
for rep in range(ROUNDS):
    bench.gc_barrier(spark)
    t0 = time.perf_counter()
    bench.force(sentinel_builder(spark, SF))
    s = time.perf_counter() - t0
    bench.gc_barrier(spark)
    t0 = time.perf_counter()
    bench.force(bench.py_sentinel_df(spark))
    ps = time.perf_counter() - t0
    print(f"round {rep}: sentinel {s:.2f}s py {ps:.2f}s", flush=True)
    for name in names:
        bench.gc_barrier(spark)
        c0 = bench.jvm_counters(spark)
        with _lock:
            _cur.update(q=name, t0=time.perf_counter(),
                        thr=max(10.0, STALL_FACTOR * BASE.get(name, 8.0)),
                        rep=rep, dumps=0)
        t0 = time.perf_counter()
        bench.force(plans.REGISTRY[name].builder(spark, SF))
        el = time.perf_counter() - t0
        with _lock:
            _cur["q"] = None
        c1 = bench.jvm_counters(spark)
        d = bench._jvm_delta(c0, c1, 0, 0)
        times[name].append(el)
        print(f"  {name}: {el:.2f}s gc={d['gc_ms']} "
              f"comp={d['compile_ms']} load={d['load']}", flush=True)
        bench._release_operator_caches()

_stop = True
import statistics  # noqa: E402

print(json.dumps({n: {"med": round(statistics.median(ts), 2),
                      "min": round(min(ts), 2),
                      "max": round(max(ts), 2)}
                  for n, ts in times.items()}, indent=1), flush=True)
spark.stop()
