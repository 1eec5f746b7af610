"""Local mimic of the driver's correctness gate.

Runs every `queries()[name]` from __spark_entry__.py at a given sf dir and
compares against `oracle_sql()[name]` via DuckDB: row count, column-name
set, and an order-insensitive exact value comparison (stricter than any
reasonable hash — if this passes, a value-hash comparison passes too).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    import numpy as np

    if v is None:
        return "∅"
    # bool BEFORE int: isinstance(True, int) is True, so the int branch
    # would normalize a Python bool to '1' while a numpy bool_ hit this
    # branch as 'True' — identical values comparing unequal by carrier type
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return repr(int(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return tuple(normalize(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((str(k), normalize(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_to_multiset(df, cols):
    rows = [tuple(normalize(r[c]) for c in cols) for _, r in df.iterrows()]
    return Counter(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from venice_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo'd filter must not report '0/0 passed' and exit green
        print(f"unknown query names: {sorted(unknown)}")
        sys.exit(2)
    from venice_spark.plans.reference_queries import DRIVER_WINDOW

    window_names = set(list(queries)[:DRIVER_WINDOW])
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            results[name] = f"SPARK ERROR: {e}"
            continue
        # Mirror the driver's canonicalizer limitation: it sorts result
        # frames with pandas, which cannot factorize list/dict values. A
        # window query with a complex-typed column errs there even when the
        # values match (CORRECTNESS_r03) — flag it here too instead of
        # normalizing it away.
        if name in window_names:
            from pyspark.sql.types import ArrayType, MapType, StructType

            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                results[name] = (
                    f"DRIVER-UNSORTABLE OUTPUT: complex columns {complex_cols} "
                    "inside the driver window (explode or serialize them)"
                )
                continue
        if name not in oracles:
            results[name] = f"rows-only ({len(spdf)} rows)"
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        scols, ocols = sorted(spdf.columns), sorted(odf.columns)
        if scols != ocols:
            results[name] = f"SCHEMA MISMATCH spark={scols} oracle={ocols}"
            continue
        if len(spdf) != len(odf):
            results[name] = f"ROWCOUNT MISMATCH spark={len(spdf)} oracle={len(odf)}"
            continue
        sm, om = frame_to_multiset(spdf, scols), frame_to_multiset(odf, scols)
        if sm == om:
            results[name] = f"OK ({len(spdf)} rows)"
        else:
            diff_s = list((sm - om).items())[:3]
            diff_o = list((om - sm).items())[:3]
            results[name] = (
                f"VALUE MISMATCH ({len(list((sm - om).elements()))} rows differ)\n"
                f"    spark-only: {diff_s}\n    oracle-only: {diff_o}\n    cols: {scols}"
            )

    failed = 0
    for name, res in sorted(results.items()):
        ok = res.startswith("OK") or res.startswith("rows-only")
        if not ok:
            failed += 1
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {res}")
    print(f"\n{len(results) - failed}/{len(results)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
