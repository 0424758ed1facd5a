"""Local replica of the driver's correctness gate (see .claude/skills/verify).

Runs entry() as a smoke check, then every queries() entry against its
oracle_sql() in DuckDB at sf0.01, printing per-query status and a final
mismatch count. Usage: python scripts/driver_sim.py [sf_dir]
"""
import importlib
import os
import sys

import duckdb

sys.path.insert(0, os.getcwd())

mod = importlib.import_module('__spark_entry__')
from australia_company_etl_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark('driver-sim',
                  extra_conf={'spark.ui.showConsoleProgress': 'false'})
spark.sparkContext.setLogLevel('ERROR')

rows = mod.entry(spark).collect()
assert rows, "entry() returned 0 rows"
print("entry rows:", len(rows))

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf}/{t}.parquet')")
sys.path.insert(0, 'tests')
from conftest import compare_frames  # noqa: E402

bad = 0
for name, builder in mod.queries().items():
    sdf = builder(spark, sf)
    sql = mod.oracle_sql().get(name)
    if sql is None:
        print(name, 'rows-only:', sdf.count())
        continue
    probs = compare_frames(sdf, con.execute(sql).df())
    if probs:
        bad += 1
        print(name, 'MISMATCH', probs)
print("DONE mismatches:", bad)
sys.exit(1 if bad else 0)
