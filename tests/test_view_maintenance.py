"""W15 view lifecycle: declared views must survive EVERY write path.

The reference registers views on the Store (ZKStore viewConfigs) and
maintains them on every write — batch push, incremental push, repush.
Before this round a view existed only on the version whose push happened
to pass `views=[...]`; the next incremental push / compaction / repush
created a version with no view dirs and `view_df` raised. These tests pin
the full lifecycle: registration, eager incremental maintenance, lazy
delta-aware reads, compaction, repush, and store-key retention under
projections."""

import pyspark.sql.functions as F
import pytest

from venice_spark.engine import VeniceSparkEngine
from venice_spark.push import (
    BucketedViewDef,
    MaterializedViewDef,
    declared_views,
    view_from_spec,
)


@pytest.fixture()
def engine(spark, tmp_root):
    eng = VeniceSparkEngine(spark, tmp_root)
    eng.create_store("s", key_fields=["key"], partition_count=2)
    base = spark.createDataFrame(
        [("a", 1.0, "US", 10), ("b", 2.0, "DE", 10), ("c", 3.0, "US", 10)],
        "key string, val double, region string, _rmd_ts long",
    )
    view = MaterializedViewDef(
        "by_region", partition_count=2, key_fields=["region"], projection=["val"]
    )
    eng.push("s", base, views=[view])
    return eng


def _view_rows(engine, name="by_region"):
    return {
        (r["key"], r["region"], r["val"])
        for r in engine.store("s").view_df(name).collect()
    }


def test_push_registers_views_on_store(engine):
    meta = engine.catalog.get_store("s")
    specs = meta.config.get("views")
    assert specs and specs[0]["name"] == "by_region"
    # round-trips through the spec codec
    v = view_from_spec(specs[0])
    assert isinstance(v, MaterializedViewDef)
    assert v.key_fields == ["region"] and v.projection == ["val"]
    assert [d.name for d in declared_views(meta)] == ["by_region"]


def test_view_retains_store_keys_under_projection(engine):
    vdf = engine.store("s").view_df("by_region")
    # projection was ["val"] but the store key must ride along
    assert {"key", "region", "val"} <= set(vdf.columns)
    assert _view_rows(engine) == {("a", "US", 1.0), ("b", "DE", 2.0), ("c", "US", 3.0)}


def test_next_batch_push_maintains_declared_views(engine, spark):
    df2 = spark.createDataFrame(
        [("a", 5.0, "FR", 20)], "key string, val double, region string, _rmd_ts long"
    )
    engine.push("s", df2, allow_duplicate_key=True)  # no views arg
    assert _view_rows(engine) == {("a", "FR", 5.0)}


def test_eager_incremental_push_maintains_view(engine, spark):
    delta = spark.createDataFrame(
        [("b", 99.0, "JP", 20), ("d", 4.0, "BR", 20)],
        "key string, val double, region string, _rmd_ts long",
    )
    engine.incremental_push("s", delta)
    # b moved region DE -> JP: the old view row must be REMOVED, not joined
    assert _view_rows(engine) == {
        ("a", "US", 1.0),
        ("b", "JP", 99.0),
        ("c", "US", 3.0),
        ("d", "BR", 4.0),
    }
    # get_by routes through the maintained view
    got = engine.store("s").get_by("by_region", region="JP").collect()
    assert [(r["key"], r["val"]) for r in got] == [("b", 99.0)]


def test_eager_incremental_deletes_remove_view_rows(engine, spark):
    delta = spark.createDataFrame(
        [("c", None, None, 30)], "key string, val double, region string, _rmd_ts long"
    )
    engine.incremental_push("s", delta, nulls_as_deletes=True, order_col="_rmd_ts")
    assert _view_rows(engine) == {("a", "US", 1.0), ("b", "DE", 2.0)}


def test_lazy_incremental_push_resolves_view_through_delta_log(engine, spark):
    delta = spark.createDataFrame(
        [("b", 99.0, "JP", 20), ("d", 4.0, "BR", 20)],
        "key string, val double, region string, _rmd_ts long",
    )
    res = engine.incremental_push("s", delta, eager=False)
    # no new version: the view files are stale, the READ resolves the log
    assert engine.catalog.current_version("s") == res.version
    assert _view_rows(engine) == {
        ("a", "US", 1.0),
        ("b", "JP", 99.0),
        ("c", "US", 3.0),
        ("d", "BR", 4.0),
    }
    # a second lazy delta overriding the first: latest slot wins in the view
    d2 = spark.createDataFrame(
        [("b", 7.0, "CN", 25)], "key string, val double, region string, _rmd_ts long"
    )
    engine.incremental_push("s", d2, eager=False)
    assert ("b", "CN", 7.0) in _view_rows(engine)
    assert not any(k == "b" and r != "CN" for k, r, _ in _view_rows(engine))


def test_compaction_rematerializes_view(engine, spark):
    delta = spark.createDataFrame(
        [("b", 99.0, "JP", 20)], "key string, val double, region string, _rmd_ts long"
    )
    engine.incremental_push("s", delta, eager=False)
    engine.compact("s")
    # post-compaction: no deltas left, view files themselves are current
    assert engine.catalog.list_delta_dirs("s", engine.catalog.current_version("s")) == []
    assert _view_rows(engine) == {("a", "US", 1.0), ("b", "JP", 99.0), ("c", "US", 3.0)}


def test_repush_carries_views(engine):
    engine.repush("s", ttl_seconds=1000, now_ts=20)  # keeps everything
    assert _view_rows(engine) == {("a", "US", 1.0), ("b", "DE", 2.0), ("c", "US", 3.0)}


def test_bucketed_view_rebuilt_on_incremental_push(spark, tmp_root):
    from venice_spark.push import read_bucketed_view

    eng = VeniceSparkEngine(spark, tmp_root)
    eng.create_store("t", key_fields=["k"], partition_count=2)
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, n int")
    bv = BucketedViewDef(name="bk", n_buckets=2, key_fields=["k"])
    eng.push("t", df, views=[bv])
    delta = spark.createDataFrame([("c", 3)], "k string, n int")
    res = eng.incremental_push("t", delta)
    out = read_bucketed_view(spark, eng.catalog, "t", bv, version=res.version)
    assert {(r["k"], r["n"]) for r in out.collect()} == {("a", 1), ("b", 2), ("c", 3)}


def test_view_after_incremental_push_matches_base_projection(engine, spark):
    """Property: after any eager incremental push the view must equal the
    new base version projected through the view spec."""
    delta = spark.createDataFrame(
        [("a", 8.0, "MX", 40), ("e", 5.0, "IN", 40)],
        "key string, val double, region string, _rmd_ts long",
    )
    engine.incremental_push("s", delta)
    store_df = engine.store("s").df()
    expected = {
        (r["key"], r["region"], r["val"])
        for r in store_df.select("key", "region", "val").collect()
    }
    assert _view_rows(engine) == expected


def test_hybrid_view_df_projects_live_state(engine, spark, tmp_path):
    """Views over hybrid stores: the live replay state projected through
    the declared spec (the reference maintains views on nearline writes;
    here the projection rides the already-resolved serving table)."""
    import os

    from venice_spark.streaming.hybrid import HybridReplay

    serving = str(tmp_path / "serving")
    engine.store("s").df().drop("partition_id").withColumn(
        "ts", F.lit(0).cast("long")
    ).write.parquet(serving)
    rt_dir = str(tmp_path / "rt")
    os.makedirs(rt_dir)
    schema = "key string, val double, region string, _rmd_ts long, ts long"
    spark.createDataFrame([("b", 99.0, "JP", 20, 20)], schema).write.mode(
        "append"
    ).parquet(rt_dir)
    replay = HybridReplay(engine.spark, engine.catalog, "s", serving)
    q = replay.start(spark.readStream.schema(schema).parquet(rt_dir), str(tmp_path / "ck"))
    q.awaitTermination(120)
    vdf = engine.store("s").hybrid_view_df("by_region", replay)
    got = {(r["key"], r["region"], r["val"]) for r in vdf.collect()}
    assert ("b", "JP", 99.0) in got and ("a", "US", 1.0) in got
    with pytest.raises(ValueError, match="declares no repartition view"):
        engine.store("s").hybrid_view_df("nope", replay)


def test_empty_views_list_deregisters(engine, spark):
    """views=[] is an explicit deregistration: the new version has no view
    dirs AND the declaration is cleared, so later pushes stay view-free."""
    df2 = spark.createDataFrame(
        [("z", 1.0, "XX", 50)], "key string, val double, region string, _rmd_ts long"
    )
    engine.push("s", df2, views=[], allow_duplicate_key=True)
    assert engine.catalog.get_store("s").config.get("views") == []
    with pytest.raises(ValueError, match="no materialized view"):
        engine.store("s").view_df("by_region")
    # next default push maintains the (now empty) declaration
    engine.push("s", df2, allow_duplicate_key=True)
    with pytest.raises(ValueError, match="no materialized view"):
        engine.store("s").view_df("by_region")


def test_failed_push_does_not_register_views(engine, spark):
    """Registration is deferred past validation/dedup: a failed push must
    not mutate the store's view declaration."""
    from venice_spark.push import DuplicateKeyError

    dup = spark.createDataFrame(
        [("k", 1.0, "US", 1), ("k", 2.0, "DE", 1)],
        "key string, val double, region string, _rmd_ts long",
    )
    new_view = MaterializedViewDef("by_val", partition_count=1, key_fields=["val"])
    with pytest.raises(DuplicateKeyError):
        engine.push("s", dup, views=[new_view])
    specs = engine.catalog.get_store("s").config.get("views")
    assert [s["name"] for s in specs] == ["by_region"]  # unchanged


def test_view_df_schema_stable_across_delta_state(engine, spark):
    """The delta-resolved path must expose the same columns (incl. the
    view's partition_id routing column) as the plain-parquet path."""
    before = set(engine.store("s").view_df("by_region").columns)
    delta = spark.createDataFrame(
        [("d", 4.0, "BR", 20)], "key string, val double, region string, _rmd_ts long"
    )
    engine.incremental_push("s", delta, eager=False)
    after = set(engine.store("s").view_df("by_region").columns)
    assert before == after and "partition_id" in after


def test_bucketed_view_resolves_lazy_delta_log(spark, tmp_root):
    """read_bucketed_view must serve delta-resolved data, not silently
    stale files, when a lazy push has appended to the version's log."""
    from venice_spark.push import read_bucketed_view

    eng = VeniceSparkEngine(spark, tmp_root)
    eng.create_store("t", key_fields=["k"], partition_count=2)
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, n int")
    bv = BucketedViewDef(name="bk", n_buckets=2, key_fields=["k"])
    eng.push("t", df, views=[bv])
    delta = spark.createDataFrame([("b", 9), ("c", 3)], "k string, n int")
    eng.incremental_push("t", delta, eager=False)
    out = read_bucketed_view(spark, eng.catalog, "t", bv)
    assert {(r["k"], r["n"]) for r in out.collect()} == {("a", 1), ("b", 9), ("c", 3)}


def test_get_by_pushes_filter_to_view_scan(engine):
    """The GSI claim: an equality lookup on the view's key reaches the
    parquet scan as a pushed filter (the view is sorted by its key, so
    rowgroup min/max pruning applies — the re-keyed routing the reference
    serves by partition)."""
    df = engine.store("s").get_by("by_region", region="US")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "region" in plan.split("PushedFilters")[1][:200], plan
