"""Bucketed-AA crossover sweep (VERDICT r6 #6).

SCALE.md's r6 note recorded the bucketed layout's negative result at local
scale ("fixed ~5 s listing/write overhead, crossover past what this box
can hold") but gave no rule. This sweep measures the AA append log's
per-trigger merge cost across buckets ∈ {0, 16, 64, 256, 1024} at two
store sizes, so the 100 TB bucket recommendation in SCALE.md is a fitted
formula instead of an assertion.

Cost model being fitted (per trigger, fixed batch):
    flat:      T0(n)            = a + scan(n)      # scan grows with rows
    bucketed:  T(n, b)          = a + list(b) + scan(n * cover(batch, b) / b)
list(b) is the per-trigger directory/file listing+write overhead, roughly
linear in b on a local FS; cover(batch, b) = expected touched buckets =
b * (1 - (1 - 1/b)^batch), ~min(batch, b). Crossover: bucketing wins once
scan(n) - scan(n * cover/b) > list(b), i.e. once the pruned rows outweigh
the listing tax — which grows with n and shrinks with b only up to the
point where list(b) dominates.

Usage: python tools/bucket_sweep.py [sizes...]   (default: 2000000 20000000)
Prints one JSON line per (rows, buckets): min-of-2 warm seconds.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from serving_probe import BATCH_ROWS, probe_aa  # noqa: E402

from venice_spark.session import get_spark  # noqa: E402

BUCKETS = [0, 16, 64, 256, 1024]


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [2_000_000, 20_000_000]
    spark = get_spark("bucket_sweep")
    workdir = tempfile.mkdtemp(prefix="vs_bucket_sweep_")
    try:
        for n in sizes:
            for b in BUCKETS:
                sec = probe_aa(spark, workdir, n, "append", buckets=b)
                print(
                    json.dumps(
                        {
                            "engine": "aa",
                            "mode": "append",
                            "rows": n,
                            "buckets": b,
                            "batch": BATCH_ROWS,
                            "sec": sec,
                        }
                    ),
                    flush=True,
                )
                # free the seeded table before the next config: two 20M
                # seeds side by side double the probe's disk footprint
                shutil.rmtree(workdir, ignore_errors=True)
                import os

                os.makedirs(workdir, exist_ok=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
