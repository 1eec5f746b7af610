"""Streaming corpus ingestion: quality gates + watermark-bounded exact
dedup (streaming/corpus.py) and incremental dedup against a historical
corpus (dedup.exact_dedup_incremental)."""

import pytest

from venice_spark.dedup import exact_dedup_incremental
from venice_spark.streaming.corpus import streaming_corpus_prep

HOUR_NS = 3_600 * 1_000_000_000
SCHEMA = "doc_id long, ts long, text string"

GOOD = "the quick brown fox jumps over the lazy dog and runs away"
DUP = "all of this boilerplate is exactly the same text in every copy"
SHORT = "too short"


@pytest.fixture()
def dirs(tmp_path):
    base = str(tmp_path)
    return f"{base}/src", f"{base}/sink", f"{base}/ckpt"


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)


def _run(spark, src, sink, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_corpus_prep(
        stream, "text", ts_col="ts",
        watermark_delay="30 minutes", min_tokens=5, min_stopword_ratio=0.0,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_prep_gates_and_dedups(spark, dirs):
    src, sink, ckpt = dirs
    rows = [
        (1, int(0.1 * HOUR_NS), GOOD),
        (2, int(0.2 * HOUR_NS), DUP),
        (3, int(0.3 * HOUR_NS), DUP),       # duplicate inside watermark
        (4, int(0.4 * HOUR_NS), SHORT),     # gated: under min_tokens
        (5, int(0.5 * HOUR_NS), GOOD + " extra"),
    ]
    _write(spark, src, rows)
    _run(spark, src, sink, ckpt)
    got = {r["doc_id"]: r["n_tokens"] for r in spark.read.parquet(sink).collect()}
    assert 4 not in got                      # quality-gated
    assert (2 in got) != (3 in got)          # exactly one of the dups
    assert 1 in got and 5 in got
    assert got[1] == len(GOOD.split())


def test_streaming_prep_dedups_across_batches(spark, dirs):
    """A duplicate arriving in a LATER micro-batch (still inside the
    watermark horizon) is dropped by cross-batch fingerprint state."""
    src, sink, ckpt = dirs
    _write(spark, src, [(1, int(0.1 * HOUR_NS), DUP)])
    _run(spark, src, sink, ckpt)
    _write(spark, src, [(2, int(0.2 * HOUR_NS), DUP),
                        (3, int(0.3 * HOUR_NS), GOOD)])
    _run(spark, src, sink, ckpt)
    ids = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    assert ids == {1, 3}


def test_streaming_prep_batch_mode_matches_exact_dedup(spark):
    """The same call on a batch frame equals batch semantics: one survivor
    per fingerprint."""
    rows = [(i, 0, DUP) for i in range(5)] + [(10, 0, GOOD)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = streaming_corpus_prep(df, "text", min_tokens=5, min_stopword_ratio=0.0)
    texts = [r["text"] for r in out.collect()]
    assert sorted(texts) == sorted([DUP, GOOD])


# --------------------------------------------------- incremental vs history


def test_exact_dedup_incremental_against_history(spark):
    history = spark.createDataFrame(
        [(100, GOOD), (101, DUP)], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [
            (1, GOOD),            # duplicates history -> dropped
            (2, "fresh content never seen before in the corpus"),
            (3, "fresh content never seen before in the corpus"),  # in-batch dup
            (4, DUP),             # duplicates history -> dropped
        ],
        ["doc_id", "text"],
    )
    kept = {r["doc_id"] for r in exact_dedup_incremental(new, history).collect()}
    assert kept == {2}


def test_exact_dedup_incremental_with_fp_table(spark):
    """The cheap path: history as a precomputed fingerprint table."""
    from venice_spark.functions import text as TX
    import pyspark.sql.functions as F

    history = spark.createDataFrame([(100, GOOD)], ["doc_id", "text"]).select(
        TX.fingerprint(F.col("text")).alias("fp")
    )
    new = spark.createDataFrame(
        [(1, GOOD), (2, "completely novel words here today")], ["doc_id", "text"]
    )
    kept = {
        r["doc_id"]
        for r in exact_dedup_incremental(new, history, history_fp_col="fp").collect()
    }
    assert kept == {2}


# ---------------------------------------------------- ingest-to-store loop


def test_corpus_ingest_to_store_end_to_end(spark, tmp_path):
    """crawl stream -> gates -> in-stream dedup -> history anti-join ->
    incremental push: the serving store ends up with exactly the clean,
    distinct documents, across two separate stream runs."""
    from venice_spark import VeniceSparkEngine
    from venice_spark.streaming.corpus import run_corpus_ingest_to_store

    src = f"{tmp_path}/src"
    ckpt = f"{tmp_path}/ckpt"
    eng = VeniceSparkEngine(spark, f"{tmp_path}/root")
    eng.create_store("corpus", key_fields=["doc_id"], partition_count=2)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = run_corpus_ingest_to_store(
            stream, eng, "corpus", ckpt,
            ts_col="ts", min_tokens=5, min_stopword_ratio=0.0,
        )
        q.awaitTermination(120)

    _write(spark, src, [
        (1, int(0.1 * HOUR_NS), GOOD),
        (2, int(0.2 * HOUR_NS), DUP),
        (3, int(0.3 * HOUR_NS), SHORT),      # gated
    ])
    run()
    st = eng.store("corpus")
    assert {r["doc_id"] for r in st.df().collect()} == {1, 2}

    # second run: new unique doc lands; re-crawled GOOD content under a NEW
    # id is caught by the history anti-join (not by in-stream state)
    _write(spark, src, [
        (4, int(5.0 * HOUR_NS), GOOD),                 # content dup of doc 1
        (5, int(5.1 * HOUR_NS), GOOD + " brand new"),  # genuinely new
    ])
    run()
    ids = {r["doc_id"] for r in st.df().collect()}
    assert ids == {1, 2, 5}


@pytest.mark.slow
def test_corpus_ingest_with_fingerprint_store(spark, tmp_path):
    """The 100 TB history path: a companion fingerprint store (16 bytes per
    historical doc) carries the anti-join instead of re-fingerprinting the
    corpus text every batch; the loop maintains it alongside the corpus."""
    from venice_spark import VeniceSparkEngine
    from venice_spark.streaming.corpus import run_corpus_ingest_to_store

    src = f"{tmp_path}/src"
    ckpt = f"{tmp_path}/ckpt"
    eng = VeniceSparkEngine(spark, f"{tmp_path}/root")
    eng.create_store("corpus", key_fields=["doc_id"], partition_count=2)
    eng.create_store("corpus_fps", key_fields=["fingerprint"], partition_count=2)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = run_corpus_ingest_to_store(
            stream, eng, "corpus", ckpt, ts_col="ts",
            fp_store="corpus_fps", min_tokens=5, min_stopword_ratio=0.0,
        )
        q.awaitTermination(120)

    _write(spark, src, [(1, int(0.1 * HOUR_NS), GOOD), (2, int(0.2 * HOUR_NS), DUP)])
    run()
    assert eng.store("corpus_fps").df().count() == 2

    _write(spark, src, [
        (3, int(5.0 * HOUR_NS), GOOD),                 # content dup -> fp-store hit
        (4, int(5.1 * HOUR_NS), GOOD + " brand new"),
    ])
    run()
    assert {r["doc_id"] for r in eng.store("corpus").df().collect()} == {1, 2, 4}
    assert eng.store("corpus_fps").df().count() == 3


# ------------------------------------------- incremental NEAR-dup vs history


def test_minhash_pairs_vs_history(spark):
    """A new batch probes the stored LSH band table: near-dups of history
    are found with exact jaccard, fresh content is not, and the pair set
    equals the full-corpus LSH run restricted to (new x history)."""
    from venice_spark.dedup import (
        minhash_band_table,
        minhash_lsh_pairs,
        minhash_pairs_vs_history,
    )

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight while everyone sleeps")
    hist_rows = [
        (100, base),
        (101, "completely different historical text about databases and storage engines"),
    ]
    new_rows = [
        (1, base),                                  # exact dup of 100
        (2, base.replace("dark", "misty")),          # near dup of 100
        (3, "entirely novel content with nothing shared against anything else here"),
    ]
    hist = spark.createDataFrame(hist_rows, ["doc_id", "text"])
    new = spark.createDataFrame(new_rows, ["doc_id", "text"])

    bands = minhash_band_table(hist, "text", "doc_id", bands=8)
    got = {
        (r["new_id"], r["hist_id"]): r["jaccard"]
        for r in minhash_pairs_vs_history(
            new, bands, hist, "text", "doc_id", bands=8, threshold=0.5
        ).collect()
    }
    assert (1, 100) in got and got[(1, 100)] == 1.0
    assert (2, 100) in got and 0.5 <= got[(2, 100)] < 1.0
    assert all(nid != 3 for nid, _ in got)

    # parity with the batch operator over the union corpus
    both = hist.union(new)
    full = minhash_lsh_pairs(both, "text", "doc_id", bands=8, threshold=0.5)
    cross = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in full.collect()
        if (r["id_a"] < 100) != (r["id_b"] < 100)
    }
    assert {(n, h) for (n, h) in got} == cross


@pytest.mark.slow
def test_minhash_band_param_guards(spark):
    """Bad banding parameters fail loudly at every band-row entry point
    (bands>num_hashes = empty-string band hash = O(n²) candidate blowup;
    non-divisor = silently dropped trailing hashes), and a probe whose
    parameters differ from what the persisted band table was built with is
    rejected instead of silently missing near-duplicates (ADVICE r3)."""
    import pytest

    from venice_spark.dedup import (
        minhash_band_table,
        minhash_pairs_vs_history,
    )

    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="divide"):
        minhash_band_table(df, "text", "doc_id", num_hashes=16, bands=24)
    with pytest.raises(ValueError, match="divide"):
        minhash_band_table(df, "text", "doc_id", num_hashes=16, bands=3)
    with pytest.raises(ValueError, match="divide"):
        minhash_pairs_vs_history(
            df, df, df, "text", "doc_id", num_hashes=16, bands=5
        )

    bands = minhash_band_table(df, "text", "doc_id", num_hashes=16, bands=8)
    assert {"num_hashes", "bands", "shingle_n"} <= set(bands.columns)
    with pytest.raises(ValueError, match="parameter mismatch"):
        minhash_pairs_vs_history(
            df, bands, df, "text", "doc_id", num_hashes=16, bands=4
        )
    with pytest.raises(ValueError, match="parameter mismatch"):
        minhash_pairs_vs_history(
            df, bands, df, "text", "doc_id", num_hashes=16, bands=8, shingle_n=5
        )
    # matching parameters pass the gate (and drop the metadata columns)
    ok = minhash_pairs_vs_history(
        df, bands, df, "text", "doc_id", num_hashes=16, bands=8
    )
    assert set(ok.columns) == {"new_id", "hist_id", "jaccard"}


def test_corpus_ingest_replay_is_idempotent(spark, tmp_path):
    """Losing the checkpoint and replaying the same source must leave the
    store unchanged: per-key latest-wins makes the doc push idempotent and
    the history anti-join drops re-seen content — exactly-once EFFECTS
    without exactly-once delivery."""
    from venice_spark import VeniceSparkEngine
    from venice_spark.streaming.corpus import run_corpus_ingest_to_store

    src = f"{tmp_path}/src"
    eng = VeniceSparkEngine(spark, f"{tmp_path}/root")
    eng.create_store("corpus", key_fields=["doc_id"], partition_count=2)
    _write(spark, src, [
        (1, int(0.1 * HOUR_NS), GOOD),
        (2, int(0.2 * HOUR_NS), DUP),
    ])

    def run(ckpt):
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = run_corpus_ingest_to_store(
            stream, eng, "corpus", ckpt,
            ts_col="ts", min_tokens=5, min_stopword_ratio=0.0,
        )
        q.awaitTermination(120)

    run(f"{tmp_path}/ckpt1")
    before = sorted((r["doc_id"], r["text"]) for r in eng.store("corpus").df().collect())
    # fresh checkpoint = full replay of the same files
    run(f"{tmp_path}/ckpt2")
    after = sorted((r["doc_id"], r["text"]) for r in eng.store("corpus").df().collect())
    assert before == after == [(1, GOOD), (2, DUP)]


def test_streaming_prep_extra_gate_with_classifier_and_blocklist(spark, tmp_path):
    """A seed-classifier score and a blocklist budget fold into the stage-1
    gate of the STREAMING prep path — both are pure expressions, so the
    stream accepts them (no stateful op, no Python)."""
    import pyspark.sql.functions as F

    from venice_spark.functions import text as TX
    from venice_spark.quality import quality_prob_col, train_quality_classifier
    from venice_spark.streaming.corpus import streaming_corpus_prep

    eng_rows = [
        (i, f"the quick brown fox number {i} jumps over the lazy dog today")
        for i in range(4)
    ]
    junk_rows = [(10 + i, "zxq wvv kjh qqpz mnx bbv hjkl zzz xxy qwe") for i in range(4)]
    pos = spark.createDataFrame(eng_rows, ["doc_id", "text"])
    neg = spark.createDataFrame(junk_rows, ["doc_id", "text"])
    model = train_quality_classifier(pos, neg, dim=64, max_iter=20)

    src = str(tmp_path / "src")
    all_rows = pos.unionByName(neg).withColumn(
        "text",
        F.when(F.col("doc_id") == 2, F.concat(F.col("text"), F.lit(" badword"))).otherwise(
            F.col("text")
        ),
    )
    all_rows.write.parquet(src)
    stream = spark.readStream.schema(all_rows.schema).parquet(src)

    gate = (quality_prob_col(model) >= 0.5) & (
        TX.blocklist_hits("text", ["badword"]) == 0
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_corpus_prep(
            stream, min_tokens=3, min_stopword_ratio=0.0, extra_gate=gate, dedup=False
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {0, 1, 3}  # junk cut by the classifier, doc 2 by the blocklist


@pytest.mark.slow
def test_fp_store_enabled_on_existing_corpus_bootstraps_history(spark, tmp_path):
    """code-review r4: enabling fp_store on a corpus that ALREADY has
    content must bootstrap the digest table from the existing corpus —
    otherwise re-crawls of pre-existing documents sail through the
    anti-join forever."""
    from venice_spark import VeniceSparkEngine
    from venice_spark.streaming.corpus import run_corpus_ingest_to_store

    src = f"{tmp_path}/src"
    ckpt = f"{tmp_path}/ckpt"
    eng = VeniceSparkEngine(spark, f"{tmp_path}/root")
    eng.create_store("corpus", key_fields=["doc_id"], partition_count=2)
    # pre-existing corpus content pushed OUTSIDE the ingest loop
    eng.push(
        "corpus",
        spark.createDataFrame([(100, 0, GOOD)], SCHEMA).select("doc_id", "text", "ts"),
    )
    # fp_store created (empty) only now
    eng.create_store("corpus_fps", key_fields=["fingerprint"], partition_count=2)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = run_corpus_ingest_to_store(
            stream, eng, "corpus", ckpt, ts_col="ts",
            fp_store="corpus_fps", min_tokens=5, min_stopword_ratio=0.0,
        )
        q.awaitTermination(120)

    # batch 1: a re-crawl of the PRE-EXISTING doc under a new id + one new doc
    _write(spark, src, [
        (1, int(0.1 * HOUR_NS), GOOD),               # content dup of doc 100
        (2, int(0.2 * HOUR_NS), GOOD + " brand new"),
    ])
    run()
    ids = {r["doc_id"] for r in eng.store("corpus").df().collect()}
    assert ids == {100, 2}, f"pre-existing content re-ingested: {ids}"
    # digest store now covers pre-existing + new content
    assert eng.store("corpus_fps").df().count() == 2


@pytest.mark.slow
def test_corpus_ingest_with_band_view_near_dup(spark, tmp_path):
    """Streaming ingest with the persisted MinHash band index: a micro-batch
    doc that NEAR-duplicates history (no exact fingerprint match) is
    dropped by the band-view probe; an update for an EXISTING id still
    lands (upsert); a declared-but-unknown view fails before the stream."""
    import pytest

    from venice_spark import VeniceSparkEngine
    from venice_spark.push import BandIndexViewDef
    from venice_spark.streaming.corpus import run_corpus_ingest_to_store

    src = f"{tmp_path}/src"
    ckpt = f"{tmp_path}/ckpt"
    eng = VeniceSparkEngine(spark, f"{tmp_path}/root")
    # declare the band index AT CREATION: the bootstrap push builds it and
    # every later push maintains it (object normalized to its spec dict)
    eng.create_store(
        "corpus", key_fields=["doc_id"], partition_count=2,
        views=[BandIndexViewDef("ndx", text_col="text")],
    )

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = run_corpus_ingest_to_store(
            stream, eng, "corpus", ckpt,
            ts_col="ts", min_tokens=5, min_stopword_ratio=0.0,
            band_view="ndx", near_dup_threshold=0.5,
        )
        q.awaitTermination(120)

    _write(spark, src, [(1, int(0.1 * HOUR_NS), GOOD)])
    with pytest.raises(ValueError, match="no band index view"):
        run_corpus_ingest_to_store(
            spark.readStream.schema(SCHEMA).parquet(src), eng, "corpus",
            ckpt, band_view="ghost",
        )
    run()
    # view landed with the bootstrap push
    v = eng.catalog.current_version("corpus")
    import os
    assert os.path.isdir(f"{eng.catalog.version_dir('corpus', v)}__view_ndx")

    _write(spark, src, [
        (2, int(5.0 * HOUR_NS), GOOD + " extra"),   # near-dup of doc 1
        (3, int(5.1 * HOUR_NS), DUP),               # genuinely new content
        (1, int(5.2 * HOUR_NS), GOOD + " v2 edit"), # upsert of existing id
    ])
    run()
    st = eng.store("corpus")
    rows = {r["doc_id"]: r["text"] for r in st.df().collect()}
    assert set(rows) == {1, 3}
    assert rows[1].endswith("v2 edit")


@pytest.mark.slow
def test_streaming_exact_dup_update_is_upsert(spark, tmp_path):
    """An update whose NEW text exactly matches some OTHER historical doc
    must still land (upsert) — the history fingerprint anti-join only
    applies to fresh ids, matching ingest_crawl_batch's semantics. (The
    IN-STREAM watermark dedup still applies while the matching content's
    state is inside the horizon — documented limitation — so the update
    arrives after the watermark has evicted it.)"""
    from venice_spark import VeniceSparkEngine
    from venice_spark.streaming.corpus import run_corpus_ingest_to_store

    src = f"{tmp_path}/src"
    ckpt = f"{tmp_path}/ckpt"
    eng = VeniceSparkEngine(spark, f"{tmp_path}/root")
    eng.create_store("corpus", key_fields=["doc_id"], partition_count=2)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = run_corpus_ingest_to_store(
            stream, eng, "corpus", ckpt,
            ts_col="ts", min_tokens=5, min_stopword_ratio=0.0,
        )
        q.awaitTermination(120)

    _write(spark, src, [
        (1, int(0.1 * HOUR_NS), GOOD),
        (2, int(0.2 * HOUR_NS), DUP),
    ])
    run()
    # advance the watermark far past 0.2h+delay so DUP's fp state evicts
    _write(spark, src, [(3, int(10 * HOUR_NS), GOOD + " unrelated new doc")])
    run()
    # doc 1's page now mirrors doc 2's content exactly — an UPSERT: the
    # history anti-join must not drop it (the store serves doc 1 forever)
    _write(spark, src, [(1, int(11 * HOUR_NS), DUP)])
    run()
    rows = {r["doc_id"]: r["text"] for r in eng.store("corpus").df().collect()}
    assert rows[1] == DUP  # the update landed, not the stale GOOD
    assert rows[2] == DUP
