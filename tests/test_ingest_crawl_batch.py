"""ingest_crawl_batch: the batch edition of the daily-crawl ingest loop —
prep gates + exact-vs-history + band-index near-dup + decontamination +
incremental push, every history probe batch-sized."""

import pytest

from venice_spark.engine import VeniceSparkEngine
from venice_spark.pipeline import CorpusPrepConfig, ingest_crawl_batch
from venice_spark.push import BandIndexViewDef


def _doc(i, salt=""):
    # disjoint token sets across ids -> deterministic near-dup structure
    return f"doc number {i} with body " + " ".join(
        f"w{i}x{j}{salt}" for j in range(16)
    )


@pytest.fixture()
def engine(spark, tmp_root):
    eng = VeniceSparkEngine(spark, tmp_root)
    eng.create_store("corpus", key_fields=["doc_id"], partition_count=2)
    return eng


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_batch_bootstraps_then_history_dedup(engine, spark):
    cfg = CorpusPrepConfig(min_tokens=3, min_stopword_ratio=0.0)
    day1 = _frame(spark, [(i, _doc(i)) for i in range(10)])
    s1 = ingest_crawl_batch(engine, "corpus", day1, config=cfg)
    assert s1["received"] == 10 and s1["pushed"] == 10 and s1["version"] == 1
    assert "after_history_exact" not in s1  # no history on day 1

    # day 2: 3 re-crawls of day-1 content (new ids), 4 genuinely new docs
    day2 = _frame(
        spark,
        [(100 + i, _doc(i)) for i in range(3)]
        + [(200 + i, _doc(50 + i)) for i in range(4)],
    )
    s2 = ingest_crawl_batch(engine, "corpus", day2, config=cfg)
    assert s2["after_prep"] == 7
    assert s2["after_history_exact"] == 4  # the 3 exact re-crawls dropped
    assert s2["pushed"] == 4 and s2["version"] == 1  # lazy delta, same version
    assert engine.store("corpus").df().count() == 14


def test_band_view_drops_near_dups_of_history(engine, spark):
    cfg = CorpusPrepConfig(min_tokens=3, min_stopword_ratio=0.0)
    day1 = _frame(spark, [(i, _doc(i)) for i in range(8)])
    engine.push("corpus", day1, views=[BandIndexViewDef("ndx", text_col="text")])

    # near-dup of doc 3 (one trailing token differs), plus one novel doc
    day2 = _frame(spark, [(900, _doc(3) + " tail"), (901, _doc(77))])
    s = ingest_crawl_batch(
        engine, "corpus", day2, config=cfg, band_view="ndx",
        near_dup_threshold=0.5,
    )
    assert s["after_history_exact"] == 2      # neither is an exact dup
    assert s["after_history_near_dup"] == 1   # the near-dup of doc 3 dropped
    assert s["pushed"] == 1
    got = {r["doc_id"] for r in engine.store("corpus").df().select("doc_id").collect()}
    assert 901 in got and 900 not in got


def test_self_pairs_are_upserts_not_duplicates(engine, spark):
    """Re-ingesting the SAME id (a content update) must not be dropped as a
    near-duplicate of itself."""
    cfg = CorpusPrepConfig(min_tokens=3, min_stopword_ratio=0.0)
    day1 = _frame(spark, [(i, _doc(i)) for i in range(6)])
    engine.push("corpus", day1, views=[BandIndexViewDef("ndx", text_col="text")])
    update = _frame(spark, [(2, _doc(2) + " minor edit")])
    s = ingest_crawl_batch(
        engine, "corpus", update, config=cfg, band_view="ndx",
    )
    assert s["pushed"] == 1
    row = engine.store("corpus").get(2)
    assert row["text"].endswith("minor edit")


def test_decontaminate_and_fp_store(engine, spark):
    cfg = CorpusPrepConfig(min_tokens=3, min_stopword_ratio=0.0)
    engine.create_store("fps", key_fields=["fingerprint"], partition_count=2)
    day1 = _frame(spark, [(i, _doc(i)) for i in range(6)])
    s1 = ingest_crawl_batch(engine, "corpus", day1, config=cfg, fp_store="fps")
    assert s1["pushed"] == 6
    # fp store bootstrapped from the whole corpus
    assert engine.store("fps").df().count() == 6

    # day 2 probes the fp STORE, not the corpus text; eval overlap dropped
    ev = spark.createDataFrame([(_doc(40),)], "text string")
    day2 = _frame(
        spark,
        [(100, _doc(0)), (101, _doc(40)), (102, _doc(41))],
    )
    s2 = ingest_crawl_batch(
        engine, "corpus", day2, config=cfg, fp_store="fps", eval_df=ev
    )
    assert s2["after_history_exact"] == 2     # re-crawl of doc 0 dropped
    assert s2["after_decontaminate"] == 1     # eval-overlapping doc dropped
    assert s2["pushed"] == 1
    assert engine.store("fps").df().count() == 7


def test_empty_survivors_skip_push(engine, spark):
    cfg = CorpusPrepConfig(min_tokens=3, min_stopword_ratio=0.0)
    day1 = _frame(spark, [(1, _doc(1))])
    ingest_crawl_batch(engine, "corpus", day1, config=cfg)
    again = _frame(spark, [(2, _doc(1))])  # pure re-crawl
    s = ingest_crawl_batch(engine, "corpus", again, config=cfg)
    assert s["pushed"] == 0 and s["version"] == 1
    assert engine.catalog.list_delta_dirs("corpus", 1) == []


def test_rejects_pack_budget(engine, spark):
    with pytest.raises(ValueError, match="pack at"):
        ingest_crawl_batch(
            engine, "corpus", _frame(spark, [(1, _doc(1))]),
            config=CorpusPrepConfig(pack_budget=512),
        )


def test_upsert_colliding_with_other_doc_content_is_kept(engine, spark):
    """A content UPDATE for an existing id must land even when its new text
    exactly matches (or nearly matches) a DIFFERENT historical doc —
    dropping it would serve the stale row forever."""
    cfg = CorpusPrepConfig(min_tokens=3, min_stopword_ratio=0.0)
    day1 = _frame(spark, [(i, _doc(i)) for i in range(6)])
    engine.push("corpus", day1, views=[BandIndexViewDef("ndx", text_col="text")])
    # doc 2's page now mirrors doc 5's content exactly
    update = _frame(spark, [(2, _doc(5))])
    s = ingest_crawl_batch(engine, "corpus", update, config=cfg, band_view="ndx")
    assert s["pushed"] == 1
    assert engine.store("corpus").get(2)["text"] == _doc(5)


def test_misconfigs_fail_before_any_store_mutation(engine, spark):
    cfg = CorpusPrepConfig(min_tokens=3, min_stopword_ratio=0.0)
    batch = _frame(spark, [(1, _doc(1))])
    # missing fp store: rejected before the corpus push lands
    with pytest.raises(Exception):
        ingest_crawl_batch(engine, "corpus", batch, config=cfg, fp_store="nope")
    assert engine.catalog.current_version("corpus") == 0  # nothing mutated
    # views after bootstrap: rejected
    ingest_crawl_batch(engine, "corpus", batch, config=cfg)
    with pytest.raises(ValueError, match="bootstrap"):
        ingest_crawl_batch(
            engine, "corpus", _frame(spark, [(2, _doc(2))]), config=cfg,
            views=[BandIndexViewDef("ndx", text_col="text")],
        )
    # unknown band view: rejected before the prep stage runs
    with pytest.raises(ValueError, match="no band index view"):
        ingest_crawl_batch(
            engine, "corpus", _frame(spark, [(3, _doc(3))]), config=cfg,
            band_view="ghost",
        )


def test_fp_store_bootstraps_even_on_all_duplicate_batch(engine, spark):
    """Enabling fp_store on a corpus with history must build the digest
    table even when the first probed batch dedups to zero survivors —
    otherwise every later batch pays the full-corpus fallback."""
    cfg = CorpusPrepConfig(min_tokens=3, min_stopword_ratio=0.0)
    day1 = _frame(spark, [(i, _doc(i)) for i in range(5)])
    ingest_crawl_batch(engine, "corpus", day1, config=cfg)  # no fp store yet
    engine.create_store("fps", key_fields=["fingerprint"], partition_count=2)
    recrawl = _frame(spark, [(100 + i, _doc(i)) for i in range(5)])
    s = ingest_crawl_batch(engine, "corpus", recrawl, config=cfg, fp_store="fps")
    assert s["pushed"] == 0
    assert engine.store("fps").df().count() == 5  # bootstrapped anyway
