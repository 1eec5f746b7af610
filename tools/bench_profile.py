"""Per-query cost attribution for the headline bench (guide §1).

For each headline query, splits wall time into:
  build  — calling queries[name]() (driver-side construction: any collect()
           -based training, expression assembly)
  exec   — the noop-sink write (planning + run of the final plan)
and counts Spark jobs launched by each phase (statusTracker delta), so
driver-loop-heavy queries (iterative trainers) are visible.

Second exec run is also timed: exec2 ≈ steady-state; exec1 - exec2 ≈
first-run planning/codegen cost for that query shape.

Usage: python tools/bench_profile.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from venice_spark.session import get_spark

    import __spark_entry__ as entrymod
    from bench import HEADLINE

    spark = get_spark("bench_profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = sys.argv[1:] or [n for n in HEADLINE if n in queries]
    tracker = spark.sparkContext.statusTracker()

    # warm like bench.py: JVM/codegen/Arrow pool
    for t in ("lineitem", "documents", "embeddings", "events"):
        try:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        except Exception:
            pass
    spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
        "md5(text)", "split(text, ' ')"
    ).write.format("noop").mode("overwrite").save()
    spark.range(10_000).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    rows = []
    for name in names:
        fn = queries[name]
        j0 = len(tracker.getJobIdsForGroup(None))
        t0 = time.monotonic()
        try:
            df = fn(spark, SF_DIR)
        except Exception as e:
            rows.append({"q": name, "err": str(e)[:120]})
            continue
        t1 = time.monotonic()
        j1 = len(tracker.getJobIdsForGroup(None))
        try:
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:
            rows.append({"q": name, "err": str(e)[:120]})
            continue
        t2 = time.monotonic()
        j2 = len(tracker.getJobIdsForGroup(None))
        # second full invocation (fresh build, like bench's min-of-2)
        t3 = time.monotonic()
        df2 = fn(spark, SF_DIR)
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.monotonic()
        rows.append(
            {
                "q": name,
                "build": round(t1 - t0, 3),
                "exec": round(t2 - t1, 3),
                "run2": round(t4 - t3, 3),
                "jobs_build": j1 - j0,
                "jobs_exec": j2 - j1,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print("== sorted by run2 ==")
    for r in sorted(rows, key=lambda r: -(r.get("run2") or 0)):
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
