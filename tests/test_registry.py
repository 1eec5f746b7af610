"""Registry-wide guards.

Round-2 postmortem: a testdata schema change (events.ts NANOS -> MICROS)
broke five registered queries while 130 unit tests stayed green, because
nothing ran the registry against the real testdata. These tests close that
hole:

  - every registered query must ANALYZE AND RUN against the actual testdata;
  - the driver checks only the first DRIVER_WINDOW queries, so that window
    must contain only oracle-bearing queries (no wasted slots);
  - window membership rotates OLDEST-GREEN-FIRST (VERDICT r5 #5), with the
    certification gates pinned — enforced structurally below, and the
    LAST_GREEN metadata is recomputed from the CORRECTNESS files on disk so
    it cannot silently drift;
  - dedup queries must not leak cached plans into a long-lived session.
"""

import glob
import json
import os
import re

import pytest

from venice_spark.plans.reference_queries import (
    DRIVER_WINDOW,
    LAST_GREEN,
    ORACLES,
    PINNED_GATES,
    QUERIES,
)


def test_window_is_all_oracle_bearing():
    names = list(QUERIES)
    window = names[:DRIVER_WINDOW]
    missing = [n for n in window if n not in ORACLES]
    assert missing == [], f"driver-window queries without an oracle: {missing}"


def test_certification_gates_are_pinned_in_window():
    """The gates are the only driver-checkable evidence for the rows-only
    families (HLL/ANN/PQ/BPE/classifier/frame/audio); rotation must never
    park one."""
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    parked = PINNED_GATES - window
    assert not parked, f"certification gates rotated out of the window: {parked}"
    assert PINNED_GATES <= set(ORACLES)


def test_window_rotates_oldest_green_first():
    """Rotation invariant: no oracle query OUTSIDE the window may be
    strictly staler (older last-green round, or never green) than any
    non-pinned query INSIDE it. Never-green queries (new operators) have no
    LAST_GREEN entry, sort stalest, and must therefore be in-window."""
    names = list(QUERIES)
    inside = [n for n in names[:DRIVER_WINDOW] if n not in PINNED_GATES]
    outside = [n for n in names[DRIVER_WINDOW:] if n in ORACLES]
    freshest_inside = max(LAST_GREEN.get(n, 0) for n in inside)
    stale_outside = {
        n: LAST_GREEN.get(n, 0)
        for n in outside
        if LAST_GREEN.get(n, 0) < freshest_inside
    }
    assert not stale_outside, (
        f"oracle queries staler than the freshest in-window green "
        f"(round {freshest_inside}) are stranded outside: {stale_outside}"
    )
    never_green_outside = [n for n in outside if n not in LAST_GREEN]
    assert not never_green_outside, (
        f"never-certified oracle queries outside the window: {never_green_outside}"
    )


def test_last_green_matches_correctness_files():
    """LAST_GREEN is maintained by hand each round; recompute it from the
    driver's CORRECTNESS_r{N}.json files and fail on drift. Only queries
    still registered are compared (renamed/retired queries drop out)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r0*.json")))
    if not files:
        pytest.skip("no CORRECTNESS files next to the repo")
    recomputed = {}
    for f in files:
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        with open(f) as fh:
            d = json.load(fh)
        for name, row in d.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                recomputed[name] = max(recomputed.get(name, 0), rnd)
    expected = {n: r for n, r in recomputed.items() if n in QUERIES}
    assert LAST_GREEN == expected, (
        "LAST_GREEN drifted from the CORRECTNESS files — fold the newest "
        f"round in. missing/stale: "
        f"{ {n: (LAST_GREEN.get(n), expected.get(n)) for n in set(LAST_GREEN) ^ set(expected) | {n for n in LAST_GREEN if LAST_GREEN.get(n) != expected.get(n)} } }"
    )


@pytest.mark.parametrize("name", list(QUERIES))
def test_registry_query_runs(spark, sf_dir, name):
    """Smoke-run every registered query against the real testdata parquet.

    `.limit(1).collect()` forces analysis, optimization, and at least one
    task — an AnalysisException from a testdata type drift fails here even
    when the query sits outside the driver's checked window.
    """
    df = QUERIES[name](spark, sf_dir)
    df.limit(1).collect()


# Window queries allowed to return array/map/struct columns. EMPTY on
# purpose: the driver canonicalizes result frames with pandas sort_values,
# which cannot factorize list values — a raw complex column errs the row
# even when values match the oracle (CORRECTNESS_r03: x_random_projection,
# x_dup_ngram_spans). Explode or serialize instead; whitelist only if the
# driver's canonicalizer ever learns to sort complex values.
_COMPLEX_OK: set[str] = set()


@pytest.mark.slow
def test_window_outputs_are_driver_canonicalizable(spark, sf_dir):
    """No query inside the driver's checked window may expose a raw
    array/map/struct column (VERDICT r3 'Next round' #2 — closes the
    local-gate/driver-canonicalizer asymmetry that hid the r03 errs)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name in list(QUERIES)[:DRIVER_WINDOW]:
        if name in _COMPLEX_OK:
            continue
        schema = QUERIES[name](spark, sf_dir).schema
        complex_cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, (
        "driver-window queries output complex-typed columns the driver's "
        f"pandas canonicalizer cannot sort: {bad} — explode or serialize "
        "(see x_random_projection / x_dup_ngram_spans)"
    )


def test_dedup_queries_leave_no_cached_plans(spark, sf_dir):
    """minhash/simhash/cluster queries persist intermediates internally; the
    persists must be function-local. CacheManager entries live until an
    explicit unpersist (a leak in a 50-query driver session); RDD-scoped
    localCheckpoint blocks are reclaimed by the ContextCleaner, so only the
    former counts as a leak."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    before = cm.cachedData().size()  # other fixtures may cache legitimately
    for name in (
        "x_minhash_near_dup",
        "x_simhash_pairs",
        "x_dup_clusters",
        "x_cdc_chunk_dedup",
    ):
        QUERIES[name](spark, sf_dir).count()
        after = cm.cachedData().size()
        assert after == before, f"{name} left {after - before} cache entries behind"
