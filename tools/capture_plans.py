"""Dump .explain('formatted') for every queries() entry to a directory.
Building a cycle query's frame executes its commits (side effects), so
this is ~2 min; the explain itself is driver-only."""
import os, sys, time

sys.path.insert(0, os.getcwd())  # run from the repo root

OUT = sys.argv[1]
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
os.makedirs(OUT, exist_ok=True)

import __spark_entry__ as entry
from tibame_project_spark.session import get_spark

spark = get_spark("plans")
spark.sparkContext.setLogLevel("ERROR")
for name, fn in entry.queries().items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.perf_counter()
    try:
        df = fn(spark, "/root/testdata/sf0.1")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:
        plan = f"ERROR building {name}: {e}"
    with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
        f.write(plan)
    print(f"{name} {time.perf_counter()-t0:.1f}s", flush=True)
    spark.catalog.clearCache()
spark.stop()
