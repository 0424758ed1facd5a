"""Single-query oracle check: python scripts/oracle_one.py <query ...>
[--sf <dir>]. Same gate as scripts/driver_sim.py, restricted to the
named queries — the fast inner loop while optimizing one fold."""
import importlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = sys.argv[1:]
sf = "/root/testdata/sf0.01"
if "--sf" in args:
    i = args.index("--sf")
    sf = args[i + 1]
    del args[i:i + 2]
names = args

mod = importlib.import_module("__spark_entry__")
from australia_company_etl_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark("oracle-one",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf}/{t}.parquet')")
sys.path.insert(0, "tests")
from conftest import compare_frames  # noqa: E402

bad = 0
qs = mod.queries()
for name in names:
    sdf = qs[name](spark, sf)
    sql = mod.oracle_sql().get(name)
    if sql is None:
        print(name, "rows-only:", sdf.count())
        continue
    probs = compare_frames(sdf, con.execute(sql).df())
    if probs:
        bad += 1
        print(name, "MISMATCH", probs)
    else:
        print(name, "ok")
print("DONE mismatches:", bad)
sys.exit(1 if bad else 0)
