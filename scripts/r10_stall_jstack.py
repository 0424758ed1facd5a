"""r10 probe: catch an entity_match stall in the act and jstack the JVM.

Interleaves py_sentinel + entity_match like the bench; a watchdog
thread takes a jstack + ps snapshot if the timed run exceeds 25s."""
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from australia_company_etl_pipeline_spark import plans  # noqa: E402
from australia_company_etl_pipeline_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402

SF = "/root/testdata/sf0.1"


def jvm_pid():
    out = subprocess.run(
        ["bash", "-c",
         "ps aux | grep '[o]rg.apache.spark.deploy' | awk '{print $2}' "
         "| head -1"],
        capture_output=True, text=True).stdout.strip()
    return out


def main():
    spark = get_spark("r10-stall",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    em = plans.REGISTRY["entity_match_blocking"].builder
    bench.force(em(spark, SF))
    bench.force(bench.py_sentinel_df(spark))
    pid = jvm_pid()
    print("jvm pid:", pid, flush=True)

    state = {"deadline": None}

    def watchdog():
        n = 0
        while True:
            time.sleep(1)
            dl = state["deadline"]
            if dl and time.time() > dl and n < 2:
                n += 1
                print("== STALL: jstack ==", flush=True)
                out = subprocess.run(["jstack", pid],
                                     capture_output=True, text=True)
                open(f"/tmp/stall_jstack_{n}.txt", "w").write(out.stdout)
                ps = subprocess.run(
                    ["bash", "-c",
                     "ps aux --sort=-%cpu | head -15; echo; free -m"],
                    capture_output=True, text=True).stdout
                open(f"/tmp/stall_ps_{n}.txt", "w").write(ps)
                print("snapshots written", flush=True)
                state["deadline"] = None

    threading.Thread(target=watchdog, daemon=True).start()

    for i in range(10):
        bench.force(bench.py_sentinel_df(spark))
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        state["deadline"] = time.time() + 25
        bench.force(em(spark, SF))
        state["deadline"] = None
        dt = time.perf_counter() - t0
        print(f"rep {i}: {dt:.2f}", flush=True)
        if os.path.exists("/tmp/stall_jstack_2.txt"):
            break
    spark.stop()


if __name__ == "__main__":
    main()
