"""Registry-wide guards.

Round-2 postmortem: a testdata schema change (events.ts NANOS -> MICROS)
broke five registered queries while 130 unit tests stayed green, because
nothing ran the registry against the real testdata. These tests close that
hole:

  - every registered query must ANALYZE AND RUN against the actual testdata;
  - the driver checks only the first DRIVER_WINDOW queries, so that window
    must contain only oracle-bearing queries (no wasted slots);
  - dedup queries must not leak cached plans into a long-lived session.
"""

import pytest

from venice_spark.plans.reference_queries import DRIVER_WINDOW, ORACLES, QUERIES, _TAIL


def test_window_is_all_oracle_bearing():
    names = list(QUERIES)
    window = names[:DRIVER_WINDOW]
    missing = [n for n in window if n not in ORACLES]
    assert missing == [], f"driver-window queries without an oracle: {missing}"


def test_tail_is_only_redundant_or_rows_only():
    # everything pushed out of the window must be declared in _TAIL (a
    # conscious demotion), never silently evicted by registration order
    names = list(QUERIES)
    dark = names[DRIVER_WINDOW:]
    undeclared = [n for n in dark if n not in _TAIL]
    assert undeclared == [], (
        f"queries fell outside the driver's {DRIVER_WINDOW}-slot window without "
        f"an explicit _TAIL demotion: {undeclared}"
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


def test_driver_window_carries_only_oracle_queries():
    """The driver checks the FIRST 50 registered queries; every slot must
    carry an oracle (rows-only and redundant variants belong in the tail).
    Guards against a future registration silently evicting a checked query
    (VERDICT r2 'What's wrong #3')."""
    from venice_spark.plans.reference_queries import DRIVER_WINDOW, ORACLES, QUERIES

    head = list(QUERIES)[:DRIVER_WINDOW]
    missing = [n for n in head if n not in ORACLES]
    assert not missing, f"driver-window queries without oracles: {missing}"
    # every oracle-bearing query should sit inside the window
    outside = [n for n in list(QUERIES)[DRIVER_WINDOW:] if n in ORACLES]
    allowed_outside = {
        # redundant twins parked in the tail on purpose
        "r3_streaming_batch_get",
        "x_token_count", "x_fingerprint", "r8_count_array", "x_simhash",
        "x_knn_join",
        # round-3 demotions: each family keeps a stronger in-window query
        # (x_text_quality, x_minhash_near_dup, w1's WindowGroupLimit shape)
        "x_bpe_token_count", "x_dedup_ngram_jaccard",
        # round-3 late demotions: r4 is exercised by every query's select,
        # the salted count is the r11 answer with a skew-safe plan twin
        "r4_project", "x_skew_salted_count",
        # blocked-cosine family carried in-window by x_knn_join_lsh
        "x_embedding_near_dup",
        # round-4 rotation demotions: driver-certified green in r03, parked
        # to make window room for previously-uncertified families
        "x_pii_scrub", "x_lang_id", "x_repetition_filter",
        "x_event_percentiles", "x_ngram_counts",
        # late r4 rotation: the new bigram-LM and CDC families took these
        # driver-green r03 slots (x_event_rollup carries event aggs,
        # x_bigram_logprob carries the LM family)
        "x_rollup_agg", "x_unigram_logprob",
        # certification-gate rotation: the self-verifying gates took these
        # driver-green r03 slots (x_hll_error_gate subsumes r16_unique_keys;
        # x_minhash_near_dup/x_fuzzy_key_pairs carry near-dup pairs;
        # x_event_rollup carries events; x_asof_join carries interval joins;
        # x_pq_recall carries quantization; x_dedup_exact shares the
        # fingerprint anti-join shape)
        "r16_unique_keys", "x_simhash_pairs", "x_sessionize",
        "x_range_join", "x_embed_quantize", "x_decontaminate",
        "x_asof_join",
        # x_ann_topk was driver-green r03 and the ANN family still holds
        # four window slots; slot given to the frame-dedup gate
        "x_ann_topk",
        # driver-green r03, subsumed by the in-window x_crawl_ingest (same
        # gates + in-batch dedup math, plus the history anti-join stage)
        "x_training_pipeline",
        # round-5 rotation (VERDICT r4 #1): 4x-consecutive-driver-green
        # queries parked so the 17 never-certified oracle queries get their
        # first window pass; carriers annotated per entry in _TAIL
        "r1_single_get", "r5_dot_product", "r6_cosine_similarity",
        "r7_hadamard_product", "r11_count_group_by_value",
        "r12_count_group_by_bucket", "r13_predicate_algebra",
        "w2_delete_tombstone", "w3_partial_update_set_field",
        "w4_w5_list_ops", "w6_map_ops", "w10_repush_offset_dedup",
        "cdc_change_events", "i6_duplicate_key_check", "i9_consistency_check",
        "x_dedup_exact", "x_sequence_packing",
        # slot given to the composed x_ivfpq_recall gate; lifecycle
        # pytest-pinned (test_view_maintenance + index-view suites)
        "w15_materialized_view",
        # slot given to the x_audio_tone_gate; latest-wins subset of w7,
        # WindowGroupLimit shape plan-pinned
        "w1_put_latest_wins",
    }
    stranded = [n for n in outside if n not in allowed_outside]
    assert not stranded, f"oracle queries stranded outside the driver window: {stranded}"
