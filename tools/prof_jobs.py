"""Count Spark jobs + wall time for queries, warm, one timed run."""
import os, sys, time

sys.path.insert(0, os.getcwd())  # run from the repo root


import __spark_entry__ as entry
from tibame_project_spark.session import get_spark

names = sys.argv[1].split(",")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("jobs"); spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
tracker = sc.statusTracker()
def njobs():
    ids = tracker.getJobIdsForGroup(None)
    return (max(ids) + 1) if ids else 0
spark.read.parquet(os.path.join(SF, "region.parquet")).count()
qs = entry.queries()
for name in names:
    fn = qs[name]
    fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
    spark.catalog.clearCache()
    j0, t0 = njobs(), time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    t1, j1 = time.perf_counter(), njobs()
    spark.catalog.clearCache()
    legs = getattr(entry, "_LAST_LEGS", {}).get(name, {})
    print(f"{name}: jobs={j1-j0} wall={t1-t0:.2f}s legs={ {k: round(v,2) for k,v in legs.items()} }", flush=True)
spark.stop()
