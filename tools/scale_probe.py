"""Scaling-curve probe: replicate the sf0.1 testdata N× (with key rewriting
so cardinalities scale too) and time a representative operator set at each
factor. Near-linear wall growth with unchanged plan shapes is the evidence
behind SCALE.md's 100 TB claims — a super-linear curve means a shuffle,
skew, or state problem that small-SF correctness runs cannot see.

Usage: python tools/scale_probe.py [factors...]   (default: 1 4 16)
Writes replicas under /tmp/vs_scale_probe/ and prints one JSON line per
factor: {"factor": k, "rows": {...}, "timings": {...}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/vs_scale_probe"


def replicate(spark, factor: int) -> str:
    """Union `factor` copies of each table, remapping ids so keys stay
    unique across copies (otherwise dedup/groupBy cardinalities would not
    scale and the probe would flatter itself)."""
    out = f"{WORK}/x{factor}"
    marker = f"{out}/_REPLICA_OK"
    if os.path.exists(marker):
        return out
    # a half-written leftover from a killed prior run must never be timed —
    # rebuild unless the success marker is present
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    specs = {
        # table: (id columns to offset, text column to salt or None).
        # orders is a FACT table and its keys join events.user_id and
        # lineitem.l_orderkey — leaving it unreplicated starves the right
        # side of every join probe at k>0 and flatters the curve
        "lineitem": (["l_orderkey"], None),
        "documents": (["doc_id"], "text"),
        "embeddings": (["vec_id"], None),
        "events": (["event_id", "user_id"], None),
        "customer": (["c_custkey"], None),
        "orders": (["o_orderkey", "o_custkey"], None),
    }
    # genuinely small dimension tables ride along unreplicated
    for table in ("region", "nation", "supplier", "part"):
        src = f"{BASE}/{table}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{out}/{table}.parquet"
            )
    # ONE shared per-copy offset across all tables (larger than any base
    # id): events.user_id <-> orders.o_custkey/customer.c_custkey and
    # lineitem.l_orderkey <-> orders.o_orderkey must keep matching WITHIN
    # each copy, or join cardinalities stop scaling with the factor
    stride = 10**9
    for table, (id_cols, text_col) in specs.items():
        df = spark.read.parquet(f"{BASE}/{table}.parquet")
        copies = []
        for k in range(factor):
            c = df
            for col in id_cols:
                c = c.withColumn(col, F.col(col) + F.lit(k * stride))
            if text_col is not None and k > 0:
                # salt a suffix token so replicas are near- but not exact
                # duplicates (keeps minhash candidate structure realistic)
                c = c.withColumn(
                    text_col, F.concat(F.col(text_col), F.lit(f" copytag{k}"))
                )
            copies.append(c)
        u = copies[0]
        for c in copies[1:]:
            u = u.unionByName(c)
        u.repartition(32).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    open(marker, "w").close()
    return out


PROBE_QUERIES = [
    # one per cost family: scan+agg, shuffle join, window dedup, Python fold,
    # LSH candidate generation, per-row expression chain
    "r11_count_group_by_value",
    "w1_put_latest_wins",
    "w7_dcr_merge",
    "x_dedup_exact",
    "x_minhash_near_dup",
    "x_repetition_filter",
    "x_asof_join",
    "x_ngram_counts",
    # round-3 late additions: corpus-LM scoring (explode + 2-key shuffles)
    # and window dedup (explode + hash-key shuffle + fold)
    "x_unigram_logprob",
    "x_dup_ngram_spans",
    "x_fuzzy_key_pairs",
    "x_feature_hash",
    # continuation: broadcast-query vectorized kNN scan, seeded shard assignment
    "x_knn_classify",
    "x_shard_plan",
    # round 4: order-2 LM (pair-key shuffle), CDC chunk dedup (row-local
    # chunking + 8-byte-hash shuffle), PQ (Arrow encode + ADC heap top-k)
    "x_bigram_logprob",
    "x_cdc_chunk_dedup",
    "x_pq_topk",
    # round-4 continuation: IVF-blocked kNN join (list-id candidate shuffle)
    "x_ivf_knn_join",
    # survivor selection (iterative label propagation + narrow rank) and
    # span decontamination (broadcast window-set semi join)
    "x_canonical_docs",
    "x_decontaminate_spans",
    # round-4 continuation: composed two-day ingest dedup math (two prep
    # passes + fingerprint anti-join vs day-1 survivors)
    "x_crawl_ingest",
]


def main(factors: list[int]) -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from venice_spark.session import get_spark
    from venice_spark.plans.reference_queries import QUERIES

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    for factor in factors:
        sf_dir = replicate(spark, factor)
        rows = {
            t: spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
            for t in ("lineitem", "documents", "events")
        }
        timings = {}
        errs = {}
        for name in PROBE_QUERIES:
            best = None
            try:
                for _ in range(2):
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.monotonic()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.monotonic() - t0
                    best = dt if best is None else min(best, dt)
            except Exception:
                # one broken query must not abort the factor (and take the
                # already-timed queries and the replicas down with it)
                import traceback

                errs[name] = traceback.format_exc(limit=2)
                continue
            timings[name] = round(best, 2)
        payload = {"factor": factor, "rows": rows, "timings": timings}
        if errs:
            payload["errors"] = errs
        print(json.dumps(payload))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    try:
        main(factors)
    finally:
        shutil.rmtree(WORK, ignore_errors=True)
