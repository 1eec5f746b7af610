"""Dump `.explain("formatted")` for headline queries to plans/r11/.

Usage: python tools/explain_dump.py <suffix> [query ...]
  suffix: "before" or "after" — file becomes plans/r11/<query>_<suffix>.txt
  With no query args, dumps every headline query from bench.py.

Each file carries the formatted explain of the UNEXECUTED plan (what the
optimizer produced) plus the AQE-final executed plan string, so plan-shape
claims (Exchange count, join strategy, PushedFilters, Python eval nodes)
are checkable without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.environ.get("SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r11")


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from venice_spark.session import get_spark

    import __spark_entry__ as entrymod
    from bench import HEADLINE

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE

    spark = get_spark("explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)

    for name in names:
        if name not in queries:
            print(f"skip {name}: not registered")
            continue
        try:
            df = queries[name](spark, SF_DIR)
            formatted = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            # execute so AQE's final plan (BHJ conversions, coalesced
            # exchanges) is visible alongside the initial sketch
            df.write.format("noop").mode("overwrite").save()
            executed = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            formatted, executed = f"ERROR: {e}", ""
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {SF_DIR} — explain('formatted') ==\n\n")
            f.write(formatted)
            f.write("\n\n== executed plan (AQE-final) ==\n\n")
            f.write(executed)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
