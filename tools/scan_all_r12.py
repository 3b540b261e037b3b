"""One-shot noop timing scan over every registered query at sf0.01.

Scouting, not adjudication: single run each, shared session, prints a
sorted list. Used to verify no conformance-tier query hides a
pathological plan the 87-headliner bench never times.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

SF = "/root/testdata/sf0.01"
qs = e.queries()
out = {}
for i, name in enumerate(sorted(qs)):
    spark.sparkContext.setJobDescription(f"scan {name}")
    t0 = time.perf_counter()
    try:
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    except Exception as ex:
        out[name] = f"ERR {type(ex).__name__}: {str(ex)[:120]}"
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)
    if i % 25 == 0:
        print(f"[{i}/{len(qs)}]", flush=True)

errs = {k: v for k, v in out.items() if isinstance(v, str)}
times = {k: v for k, v in out.items() if not isinstance(v, str)}
print(json.dumps({"n": len(out), "errors": errs,
                  "total": round(sum(times.values()), 1)}))
for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{v:8.2f}  {k}")
