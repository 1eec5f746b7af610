"""Declared MinHash band-index views: the persistent near-dup index
maintained at write time like any W15 view (push.BandIndexViewDef), probed
by ingest batches without re-shingling history (store.near_dups_vs), and
delta-aware after lazy pushes."""

import pytest

from venice_spark.engine import VeniceSparkEngine
from venice_spark.push import BandIndexViewDef, view_from_spec


def _text(i):
    # fully disjoint token sets across docs: jaccard 0 between different
    # docs, 1.0 for an exact copy — deterministic pair structure
    return f"doc {i} " + " ".join(f"tok{i}x{j}" for j in range(14))


@pytest.fixture()
def engine(spark, tmp_root):
    eng = VeniceSparkEngine(spark, tmp_root)
    eng.create_store("docs", key_fields=["doc_id"], partition_count=2)
    df = spark.createDataFrame(
        [(i, _text(i)) for i in range(30)], "doc_id long, text string"
    )
    eng.push("docs", df, views=[BandIndexViewDef("ndx", text_col="text")])
    return eng


def _probe(engine, spark, rows, threshold=0.5):
    batch = spark.createDataFrame(rows, "pid long, body string")
    return {
        (r["new_id"], r["hist_id"]): r["jaccard"]
        for r in engine.store("docs")
        .near_dups_vs("ndx", batch, id_col="pid", text_col="body", threshold=threshold)
        .collect()
    }


def test_probe_finds_exact_copy_not_novel_text(engine, spark):
    pairs = _probe(engine, spark, [(900, _text(3)), (901, _text(777))])
    assert pairs == {(900, 3): 1.0}
    # registration rode along on the store declaration
    specs = engine.catalog.get_store("docs").config["views"]
    assert specs[0]["kind"] == "band_index" and specs[0]["text_col"] == "text"


def test_index_carries_parameter_columns(engine, spark):
    v = engine.catalog.current_version("docs")
    path = f"{engine.catalog.version_dir('docs', v)}__view_ndx"
    row = spark.read.parquet(path).select("num_hashes", "bands", "shingle_n").first()
    assert (row["num_hashes"], row["bands"], row["shingle_n"]) == (16, 4, 3)
    # a probe digested with different parameters is refused, not silently empty
    from venice_spark.dedup import minhash_pairs_vs_history

    batch = spark.createDataFrame([(900, _text(3))], "doc_id long, text string")
    hist = engine.store("docs").df().select("doc_id", "text")
    with pytest.raises(ValueError, match="parameter mismatch"):
        minhash_pairs_vs_history(
            batch, spark.read.parquet(path), hist, "text", "doc_id", num_hashes=8, bands=4
        )


def test_lazy_delta_rebands_touched_keys(engine, spark):
    old3 = _text(3)
    delta = spark.createDataFrame([(3, _text(555))], "doc_id long, text string")
    engine.incremental_push("docs", delta, eager=False)
    # the stale bands must not pair the OLD text anymore...
    assert _probe(engine, spark, [(900, old3)]) == {}
    # ...and the re-banded current text must pair
    assert _probe(engine, spark, [(900, _text(555))]) == {(900, 3): 1.0}


def test_lazy_delete_leaves_the_index(engine, spark):
    delta = spark.createDataFrame([(7, None)], "doc_id long, text string")
    engine.incremental_push("docs", delta, eager=False, nulls_as_deletes=True)
    assert _probe(engine, spark, [(900, _text(7))]) == {}
    # untouched keys still probe normally
    assert _probe(engine, spark, [(901, _text(8))]) == {(901, 8): 1.0}


def test_compaction_folds_deltas_into_index(engine, spark):
    delta = spark.createDataFrame([(3, _text(555))], "doc_id long, text string")
    engine.incremental_push("docs", delta, eager=False)
    engine.compact("docs")
    v = engine.catalog.current_version("docs")
    assert engine.catalog.list_delta_dirs("docs", v) == []
    assert _probe(engine, spark, [(900, _text(555))]) == {(900, 3): 1.0}
    assert _probe(engine, spark, [(900, _text(3))]) == {}


def test_view_df_rejects_band_views(engine):
    with pytest.raises(ValueError, match="near_dups_vs"):
        engine.store("docs").view_df("ndx")


def test_spec_roundtrip():
    d = BandIndexViewDef("n", text_col="t", num_hashes=32, bands=8, shingle_n=2)
    w = view_from_spec(d.spec())
    assert isinstance(w, BandIndexViewDef)
    assert (w.name, w.text_col, w.num_hashes, w.bands, w.shingle_n) == (
        "n", "t", 32, 8, 2,
    )


def test_multi_field_key_store_refused(spark, tmp_root):
    eng = VeniceSparkEngine(spark, tmp_root)
    eng.create_store("mk", key_fields=["a", "b"], partition_count=2)
    df = spark.createDataFrame([(1, 2, "x y z")], "a long, b long, text string")
    with pytest.raises(ValueError, match="single-field"):
        eng.push("mk", df, views=[BandIndexViewDef("ndx", text_col="text")])


def test_probe_and_search_survive_two_lazy_deltas(engine, spark):
    """Two (or more) lazy delta dirs used to kill near_dups_vs/ann_topk
    with CONFLICTING_DIRECTORY_STRUCTURES: a single multi-path parquet
    read over partition_id-partitioned sibling dirs cannot infer a base
    path (found by the ingest lifecycle fuzzer). Touched keys now union
    per delta dir."""
    d1 = spark.createDataFrame([(3, _text(300))], "doc_id long, text string")
    d2 = spark.createDataFrame([(4, _text(400))], "doc_id long, text string")
    engine.incremental_push("docs", d1, eager=False)
    engine.incremental_push("docs", d2, eager=False)
    assert len(engine.catalog.list_delta_dirs(
        "docs", engine.catalog.current_version("docs"))) == 2
    # exact self-copy of doc 3's NEW text pairs; its OLD text finds nothing
    pairs = _probe(engine, spark, [(900, _text(300)), (901, _text(3))])
    assert pairs == {(900, 3): 1.0}
