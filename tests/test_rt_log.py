"""RT transport layer: Kafka wiring (I2/W12) through a wire-identical
file-backed stand-in, DIV-style producer-coordinate dedup, and the
record-transformer side sink (W14)."""

import os
import random

import duckdb
import pyspark.sql.functions as F
import pytest

from venice_spark.catalog import StoreCatalog
from venice_spark.engine import VeniceSparkEngine
from venice_spark.push import RecordTransformer
from venice_spark.sources.inputs import (
    KAFKA_WIRE_SCHEMA,
    decode_kafka_updates,
    read_kafka_topic,
)
from venice_spark.streaming.div import div_check, div_dedup
from venice_spark.streaming.hybrid import HybridReplay, latest_wins


def _wire_rows(spark, msgs, topic="rt"):
    """msgs: list of (key_str, value_json_str, ts_millis, offset)."""
    from datetime import datetime, timezone

    rows = [
        (
            k.encode(),
            v.encode(),
            topic,
            0,
            off,
            datetime.fromtimestamp(ts / 1000, tz=timezone.utc),
            0,
        )
        for (k, v, ts, off) in msgs
    ]
    return spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)


# ---------------------------------------------------------------- I2 wiring


def test_kafka_option_construction_all_variants():
    """The exact option dict format("kafka") receives, per rewind/seek
    variant — the residual untested sliver of I2/W12 (no broker in env) is
    confined to these strings, so pin them (VERDICT r3 'Next round' #7)."""
    import json

    import pytest

    from venice_spark.sources.inputs import kafka_source_options as K

    assert K("h:9092", "rt") == {
        "kafka.bootstrap.servers": "h:9092",
        "subscribe": "rt",
    }
    assert K("h:9092", "rt", starting_timestamp_ms=12_345)["startingTimestamp"] == "12345"
    assert K("h:9092", subscribe_pattern="store_v.*")["subscribePattern"] == "store_v.*"
    got = K("h:9092", "rt", starting_offsets_by_timestamp={1: 200, 0: 100})
    assert json.loads(got["startingOffsetsByTimestamp"]) == {
        "rt": {"0": 100, "1": 200}
    }
    assert K("h:9092", "rt", starting_offsets="earliest")["startingOffsets"] == "earliest"

    with pytest.raises(ValueError, match="exactly one"):
        K("h:9092")  # no subscription
    with pytest.raises(ValueError, match="exactly one"):
        K("h:9092", "rt", subscribe_pattern="rt.*")  # both
    with pytest.raises(ValueError, match="at most one"):
        K("h:9092", "rt", starting_timestamp_ms=1, starting_offsets="latest")
    with pytest.raises(ValueError, match="concrete topic"):
        K("h:9092", subscribe_pattern="rt.*", starting_offsets_by_timestamp={0: 1})
    with pytest.raises(ValueError, match="earliest"):
        K("h:9092", "rt", starting_offsets="beginning")


class _RecordingReader:
    """DataFrameReader stub capturing what read_kafka_topic configures."""

    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, f):
        self.fmt = f
        return self

    def options(self, **kw):
        self.opts.update(kw)
        return self

    def load(self):
        return "LOADED"


class _RecordingSpark:
    def __init__(self):
        self.read = _RecordingReader()
        self.readStream = _RecordingReader()


def test_read_kafka_topic_wires_options_into_reader():
    """read_kafka_topic must pass kafka_source_options verbatim into a
    format('kafka') reader — batch uses spark.read, streaming spark.readStream."""
    fake = _RecordingSpark()
    out = read_kafka_topic(
        fake, "h:9092", "rt", starting_timestamp_ms=777, source_format="kafka"
    )
    assert out == "LOADED" and fake.read.fmt == "kafka"
    assert fake.read.opts == {
        "kafka.bootstrap.servers": "h:9092",
        "subscribe": "rt",
        "startingTimestamp": "777",
    }
    fake = _RecordingSpark()
    read_kafka_topic(
        fake,
        "h:9092",
        "rt",
        streaming=True,
        source_format="kafka",
        starting_offsets_by_timestamp={0: 5, 2: 9},
    )
    assert fake.readStream.fmt == "kafka"
    assert "startingOffsetsByTimestamp" in fake.readStream.opts
    assert fake.read.fmt is None  # batch reader untouched in streaming mode


def test_kafka_batch_read_through_standin(spark, tmp_path):
    wire_dir = str(tmp_path / "wire")
    _wire_rows(
        spark,
        [
            ("a", '{"key": "a", "val": 1.5, "ts": 100}', 1000, 0),
            ("b", '{"key": "b", "val": 2.5, "ts": null}', 2000, 1),
        ],
    ).write.parquet(wire_dir)

    wire = read_kafka_topic(
        spark, "unused:9092", "rt", source_format="parquet", source_path=wire_dir
    )
    assert set(wire.columns) >= {"key", "value", "topic", "partition", "offset", "timestamp"}
    upd = decode_kafka_updates(wire, "key string, val double, ts long")
    out = {r["key"]: (r["val"], r["ts"]) for r in upd.collect()}
    # payload ts wins; null payload ts falls back to broker millis
    assert out == {"a": (1.5, 100), "b": (2.5, 2000)}


def test_kafka_rewind_timestamp_filter(spark, tmp_path):
    wire_dir = str(tmp_path / "wire")
    _wire_rows(
        spark,
        [
            ("old", '{"key": "old", "val": 1.0, "ts": 1}', 1_000, 0),
            ("new", '{"key": "new", "val": 2.0, "ts": 2}', 9_000, 1),
        ],
    ).write.parquet(wire_dir)
    wire = read_kafka_topic(
        spark,
        "unused:9092",
        "rt",
        starting_timestamp_ms=5_000,
        source_format="parquet",
        source_path=wire_dir,
    )
    assert [r["key"] for r in wire.collect()] == [b"new"]


def test_kafka_stream_feeds_hybrid_replay_end_to_end(spark, tmp_path):
    """The production shape: readStream(kafka wire) -> decode -> HybridReplay.
    Only the format() line differs from a real broker."""
    root = str(tmp_path / "cat")
    catalog = StoreCatalog(root)
    catalog.create_store("h", key_fields=["key"], hybrid=True, rewind_seconds=0)

    serving = str(tmp_path / "serving")
    spark.createDataFrame(
        [("a", 1.0, 10), ("b", 1.0, 10)], "key string, val double, ts long"
    ).write.parquet(serving)

    wire_dir = str(tmp_path / "wire")
    os.makedirs(wire_dir)
    _wire_rows(
        spark,
        [
            ("a", '{"key": "a", "val": 5.0, "ts": 20, "op": "PUT"}', 1000, 0),
            ("b", '{"key": "b", "val": 0.0, "ts": 30, "op": "DELETE"}', 1000, 1),
            ("c", '{"key": "c", "val": 7.0, "ts": 15, "op": "PUT"}', 1000, 2),
        ],
    ).write.mode("append").parquet(wire_dir)

    wire_stream = read_kafka_topic(
        spark,
        "unused:9092",
        "rt",
        streaming=True,
        source_format="parquet",
        source_path=wire_dir,
    )
    upd = decode_kafka_updates(
        wire_stream, "key string, val double, ts long, op string"
    )
    replay = HybridReplay(spark, catalog, "h", serving)
    q = replay.start(upd, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    out = {r["key"]: r["val"] for r in replay.read().collect()}
    assert out == {"a": 5.0, "c": 7.0}  # b deleted


# ---------------------------------------------------------------- DIV dedup

DIV_SCHEMA = "producer_guid string, segment int, sequence int, key string, val double, ts long"


def test_div_dedup_drops_redelivered(spark):
    log = spark.createDataFrame(
        [
            ("p1", 0, 0, "a", 1.0, 10),
            ("p1", 0, 0, "a", 1.0, 10),  # broker redelivery
            ("p1", 0, 1, "b", 2.0, 11),
            ("p2", 0, 0, "c", 3.0, 12),
        ],
        DIV_SCHEMA,
    )
    assert div_dedup(log).count() == 3
    rep = {(r["producer_guid"], r["segment"]): r for r in div_check(log).collect()}
    assert rep[("p1", 0)]["duplicates"] == 1
    assert rep[("p1", 0)]["missing"] == 0


def test_div_check_detects_gap(spark):
    log = spark.createDataFrame(
        [("p1", 0, 0, "a", 1.0, 10), ("p1", 0, 3, "b", 2.0, 11)], DIV_SCHEMA
    )
    rep = div_check(log).collect()[0]
    assert rep["missing"] == 2  # seqs 1, 2 lost


def test_div_missing_columns_raises(spark):
    df = spark.createDataFrame([("a", 1.0)], "key string, val double")
    with pytest.raises(ValueError, match="DIV coordinate"):
        div_dedup(df)


def test_div_replayed_segments_identical_state(spark):
    """Determinism property: duplicating and shuffling log segments, then
    DIV-dedup + latest-wins, yields the exact state of the clean log
    (Merge.java:27-31 contract extended to transport re-delivery)."""
    rng = random.Random(7)
    clean = [
        ("p1", s, q, f"k{rng.randrange(6)}", float(rng.randrange(100)), s * 100 + q)
        for s in range(3)
        for q in range(5)
    ]
    replayed = clean + [m for m in clean if m[1] == 1] + [m for m in clean if m[1] == 2]
    rng.shuffle(replayed)

    def state(msgs):
        df = div_dedup(spark.createDataFrame(msgs, DIV_SCHEMA))
        merged = latest_wins(df, ["key"], "ts", tiebreak=["val"])
        return {(r["key"], r["val"], r["ts"]) for r in merged.collect()}

    assert state(replayed) == state(clean)


# ---------------------------------------------------------------- W14 sink


def test_record_transformer_side_sink_duckdb(spark, tmp_root, tmp_path):
    """The DuckDB side-sink shape (DuckDBDaVinciRecordTransformer.java):
    the transformer mirrors transformed records into an external SQL table
    during the push."""
    db = str(tmp_path / "side.db")

    class SideSink(RecordTransformer):
        def transform(self, df):
            return df.withColumn("val", F.col("val") * 10)

        def sink(self, df):
            con = duckdb.connect(db)
            pdf = df.select("key", "val").toPandas()
            con.execute("CREATE TABLE side AS SELECT * FROM pdf")
            con.close()

    eng = VeniceSparkEngine(spark, tmp_root)
    eng.create_store("s", key_fields=["key"], partition_count=2)
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "key string, val double")
    eng.push("s", df, record_transformer=SideSink())

    # main store got the transformed rows
    out = {r["key"]: r["val"] for r in eng.store("s").df().collect()}
    assert out == {"a": 10.0, "b": 20.0}
    # side table mirrors them
    con = duckdb.connect(db)
    side = dict(con.execute("SELECT key, val FROM side ORDER BY key").fetchall())
    con.close()
    assert side == {"a": 10.0, "b": 20.0}


def test_record_transformer_side_sink_parquet(spark, tmp_root, tmp_path):
    """Distributed side sink: a second parquet table written during the push
    (no driver collect — the scale-path flavor)."""
    side_dir = str(tmp_path / "side_pq")

    class PqSink(RecordTransformer):
        def sink(self, df):
            df.write.mode("overwrite").parquet(side_dir)

    eng = VeniceSparkEngine(spark, tmp_root)
    eng.create_store("s", key_fields=["key"], partition_count=2)
    df = spark.createDataFrame([("a", 1.0)], "key string, val double")
    eng.push("s", df, record_transformer=PqSink())
    assert spark.read.parquet(side_dir).count() == 1


def test_rt_log_read_merges_flush_schemas(spark, tmp_root):
    """Review regression: each flush writes only the columns its buffered
    ops carried; reading the log must merge footers or value columns from
    other flushes silently vanish."""
    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import read_rt_log

    eng = VeniceSparkEngine(spark, tmp_root)
    eng.create_store("r", key_fields=["id"], hybrid=True)
    p = eng.store("r").producer()
    p.delete(1, ts=5)
    p.flush()              # delete-only flush: no value columns in footer
    p.put(2, {"x": 7.0}, ts=6)
    p.flush()
    log = read_rt_log(spark, eng.catalog, "r")
    assert "x" in log.columns
    vals = {r["id"]: (r["op"], r["x"]) for r in log.collect()}
    assert vals[2][1] == 7.0 and vals[1][0] == "DELETE"


def test_standin_applies_seek_semantics(spark, tmp_path):
    """The file-backed stand-in must honor every seek/subscription variant
    the kafka path would, as filters on the wire columns — and reject the
    same invalid combinations (code-review r4)."""
    import pytest

    wire_dir = str(tmp_path / "wire2")
    a = _wire_rows(
        spark,
        [("a", "{}", 1000, 0), ("b", "{}", 5000, 1)],
        topic="rt",
    )
    b = _wire_rows(spark, [("c", "{}", 3000, 2)], topic="other_v7")
    # move c to partition 1 so per-partition seeks are distinguishable
    b = b.withColumn("partition", F.lit(1))
    a.union(b).write.parquet(wire_dir)
    std = dict(source_format="parquet", source_path=wire_dir)

    def keys(df):
        return {bytes(r["key"]).decode() for r in df.collect()}

    # topic filter
    assert keys(read_kafka_topic(spark, "u:9", "rt", **std)) == {"a", "b"}
    # full-match pattern subscription
    assert keys(
        read_kafka_topic(spark, "u:9", subscribe_pattern="other_v.*", **std)
    ) == {"c"}
    assert keys(read_kafka_topic(spark, "u:9", subscribe_pattern=".*", **std)) == {
        "a", "b", "c",
    }
    # global timestamp rewind
    assert keys(
        read_kafka_topic(spark, "u:9", "rt", starting_timestamp_ms=2000, **std)
    ) == {"b"}
    # per-partition rewind: p0 from 5000, unlisted partitions from beginning
    assert keys(
        read_kafka_topic(
            spark, "u:9", subscribe_pattern=".*",
            starting_offsets_by_timestamp=None, **std,
        )
    ) == {"a", "b", "c"}
    assert keys(
        read_kafka_topic(
            spark, "u:9", "rt", starting_offsets_by_timestamp={0: 5000}, **std
        )
    ) == {"b"}
    # earliest = everything; latest = empty batch
    assert keys(
        read_kafka_topic(spark, "u:9", "rt", starting_offsets="earliest", **std)
    ) == {"a", "b"}
    assert keys(
        read_kafka_topic(spark, "u:9", "rt", starting_offsets="latest", **std)
    ) == set()
    # invalid combos rejected exactly like the kafka path
    with pytest.raises(ValueError, match="exactly one"):
        read_kafka_topic(spark, "u:9", **std)
    with pytest.raises(ValueError, match="at most one"):
        read_kafka_topic(
            spark, "u:9", "rt", starting_timestamp_ms=1, starting_offsets="latest", **std
        )


def test_div_check_detects_head_loss(spark):
    """code-review r4: segments number from 0, so losing the HEAD of a
    segment (first_seq > 0) is data loss; the interior-gap-only formula
    reported it clean."""
    log = spark.createDataFrame(
        [("p1", 0, s, "k", 1.0, 10) for s in range(5, 11)], DIV_SCHEMA
    )
    r = div_check(log).collect()[0]
    assert r["first_seq"] == 5 and r["missing"] == 5 and r["duplicates"] == 0


def test_standin_rejects_streaming_latest(spark, tmp_path):
    """code-review r4: a file stream replays existing files, so streaming
    startingOffsets='latest' has no faithful stand-in emulation — it must
    fail loudly instead of silently replaying history production would skip."""
    import pytest

    wire_dir = str(tmp_path / "wire3")
    _wire_rows(spark, [("a", "{}", 1000, 0)]).write.parquet(wire_dir)
    with pytest.raises(ValueError, match="cannot emulate"):
        read_kafka_topic(
            spark, "u:9", "rt", streaming=True, starting_offsets="latest",
            source_format="parquet", source_path=wire_dir,
        )


def test_producer_flush_types_all_null_columns_merge_compatibly(spark, tmp_path):
    """code-review r4: an all-None update column typed from the fallback
    must merge with what later inference-typed flushes write, or the whole
    RT log becomes unreadable under the mandatory mergeSchema read."""
    from pyspark.sql import types as T

    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import read_rt_log

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.catalog.create_store(
        "p2",
        key_fields=["k"],
        hybrid=True,
        value_schema=T.StructType(
            [T.StructField("k", T.StringType()), T.StructField("x", T.IntegerType())]
        ),
    )
    st = eng.store("p2")
    p = st.producer()
    p.update("1").set_field("x", None).produce()
    p.flush()  # all-None set_x: typed from declared x (WIDENED to long)
    p.update("2").set_field("x", 5).produce()
    p.flush()  # inference types set_x as long
    merged = read_rt_log(spark, eng.catalog, "p2")
    vals = {r["k"]: r["set_x"] for r in merged.collect()}
    assert vals == {"1": None, "2": 5}


def test_rt_log_sidecar_replaces_mergeschema_in_read(spark, tmp_path, monkeypatch):
    """r7: every flush maintains the RT log's `_log_schema.json` sidecar
    write-ahead, and read_rt_log reads with the sidecar union — one JSON
    read instead of mergeSchema's O(flushes) footer reads per serve call.
    Column union across heterogeneous flushes must be identical to the
    old mergeSchema answer."""
    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import read_rt_log
    from venice_spark.streaming.hybrid import log_schema

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store("s", key_fields=["k"], hybrid=True)
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"a": 1.0}, ts=10)
    p.flush()
    p.delete(2, ts=20)  # delete-only flush: no value columns
    p.flush()
    p.put(3, {"b": "x"}, ts=30)  # different value column
    p.flush()

    rt_dir = eng.catalog.update_log_dir("s")
    side = log_schema(rt_dir)
    assert side is not None
    assert {"k", "op", "ts", "colo", "a", "b"} <= set(side.names)

    # the hot read path must not touch mergeSchema anymore
    import pyspark.sql.readwriter as rw

    real = rw.DataFrameReader.option

    def guard(self, key, value=None):
        assert str(key).lower() != "mergeschema", "read_rt_log used mergeSchema"
        return real(self, key, value)

    monkeypatch.setattr(rw.DataFrameReader, "option", guard)
    df = read_rt_log(spark, eng.catalog, "s")
    rows = {r["k"]: (r["a"], r["b"], r["op"]) for r in df.collect()}
    monkeypatch.undo()
    assert rows[1] == (1.0, None, "PUT")
    assert rows[2][2] == "DELETE"
    assert rows[3] == (None, "x", "PUT")


def test_truncate_rt_log_is_file_granular_and_ts_safe(spark, tmp_path):
    """r7 RT retention: only files whose EVERY record predates the cutoff
    are deleted; a file mixing old and fresh rows is kept whole, and the
    replayable content at/after the cutoff is untouched."""
    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import read_rt_log

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store("s", key_fields=["k"], hybrid=True)
    eng.push("s", spark.createDataFrame([(9, 9.0)], "k long, v double"))
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=10)
    p.put(2, {"v": 2.0}, ts=20)
    p.flush()  # old-only file(s): all < 100 -> eligible
    # ONE physical file mixing old and fresh rows (a flush may split rows
    # across part files, so build the mixed file explicitly): must be
    # kept whole — its ts=50 row survives because its file holds ts=150
    rt_dir = eng.catalog.update_log_dir("s")
    spark.createDataFrame(
        [(3, "PUT", 50, 0, 3.0), (4, "PUT", 150, 0, 4.0)],
        "k long, op string, ts long, colo int, v double",
    ).coalesce(1).write.mode("append").parquet(rt_dir)
    p.put(5, {"v": 5.0}, ts=200)
    p.flush()  # fresh -> kept

    removed = st.truncate_rt(before_ts=100)
    assert removed >= 1
    left = {r["k"]: r["ts"] for r in read_rt_log(spark, eng.catalog, "s").collect()}
    assert 1 not in left and 2 not in left, "pre-cutoff file survived"
    assert left[3] == 50, "mixed file lost its old rows (must be kept whole)"
    assert left[4] == 150 and left[5] == 200

    # idempotent + nothing eligible
    assert st.truncate_rt(before_ts=100) == 0

    # and a serve over the truncated log still works end-to-end
    out = {r["k"]: r["v"] for r in st.hybrid_serve().read().collect()}
    assert out[3] == 3.0 and out[4] == 4.0 and out[5] == 5.0 and out[9] == 9.0


def test_truncate_rt_refuses_when_consumer_lags(spark, tmp_path):
    """VERDICT r7 #3: the 'behind every live consumer's checkpoint'
    contract is enforced, not documented — a below-cutoff file an existing
    consumer checkpoint has NOT committed blocks the whole truncation
    (nothing deleted), and force=True overrides."""
    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import RtTruncateBlockedError, read_rt_log

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store("s", key_fields=["k"], hybrid=True)
    eng.push("s", spark.createDataFrame([(9, 9.0)], "k long, v double"))
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=10)
    p.flush()
    st.hybrid_serve()  # consumer commits everything flushed so far

    # caught-up consumer: committed old files truncate normally
    assert st.truncate_rt(before_ts=100) >= 1

    # a new old file lands AFTER the consumer stopped — unread, so the
    # truncation refuses atomically and the file survives
    p.put(2, {"v": 2.0}, ts=20)
    p.flush()
    with pytest.raises(RtTruncateBlockedError, match="has not committed"):
        st.truncate_rt(before_ts=100)
    left = {r["k"] for r in read_rt_log(spark, eng.catalog, "s").collect()}
    assert 2 in left, "refusal must not delete anything"

    # force: operator accepts the loss (dead checkpoint case)
    assert st.truncate_rt(before_ts=100, force=True) >= 1
    left = {r["k"] for r in read_rt_log(spark, eng.catalog, "s").collect()}
    assert 2 not in left


def test_rt_retention_config_truncates_after_serve(spark, tmp_path):
    """Per-store RT retention (reference: the hybrid config derives the RT
    topic's broker-enforced retention — ZKStore.getRetentionTime): with
    `rt_retention_seconds` set and a finite rewind window, a completed
    hybrid_serve truncates RT files wholly older than now - retention;
    files inside the window survive, and a lagging second consumer's
    unread files survive with a warning instead of being lost."""
    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import read_rt_log

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    # retention == rewind: files outside the rewind window (which the
    # replay filters anyway — their content is the next push's job) are
    # exactly the truncatable set
    eng.create_store(
        "s",
        key_fields=["k"],
        hybrid=True,
        rewind_seconds=100,
        rt_retention_seconds=100,
    )
    eng.push("s", spark.createDataFrame([(9, 9.0)], "k long, v double"))
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=1_000)  # outside the rewind window
    p.flush()
    p.put(2, {"v": 2.0}, ts=150_000)  # inside
    p.flush()

    live = st.hybrid_serve(now_ts=200_000)  # cutoff = 200_000 - 100_000
    left = {r["k"] for r in read_rt_log(spark, eng.catalog, "s").collect()}
    assert 1 not in left, "retention did not truncate the out-of-window file"
    assert 2 in left, "retention deleted a file inside the window"
    out = {r["k"]: r["v"] for r in live.read().collect()}
    # k=1 is outside the rewind window by CONTRACT: the replay filters it
    # (its content is expected in the next batch push), so truncating its
    # file changes nothing a re-seed would replay
    assert out == {2: 2.0, 9: 9.0}, out

    # a SECOND consumer's checkpoint that lags keeps its unread files:
    # aa-serve once (creates _aa_checkpoint), then land an old file the AA
    # checkpoint has not committed — the hybrid serve's retention pass
    # must skip with a warning, not delete it
    st.aa_serve(["v"], now_ts=200_000)
    p.put(3, {"v": 3.0}, ts=2_000)
    p.flush()
    with pytest.warns(RuntimeWarning, match="lagging consumer"):
        st.hybrid_serve(now_ts=200_000)
    left = {r["k"] for r in read_rt_log(spark, eng.catalog, "s").collect()}
    assert 3 in left, "lagging consumer's unread file was deleted"


def test_rt_retention_skips_scan_when_fileset_unchanged(spark, tmp_path, monkeypatch):
    """Serve-path retention cost (code-review r8): when the RT fileset is
    unchanged since the last retention pass, the serve must not pay the
    ts scan — the dir cannot grow without a flush."""
    import venice_spark.producer as prod
    from venice_spark.engine import VeniceSparkEngine

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store(
        "s", key_fields=["k"], hybrid=True,
        rewind_seconds=100, rt_retention_seconds=100,
    )
    eng.push("s", spark.createDataFrame([(9, 9.0)], "k long, v double"))
    st = eng.store("s")
    p = st.producer()
    p.put(2, {"v": 2.0}, ts=150_000)
    p.flush()
    st.hybrid_serve(now_ts=200_000)  # pass 1: scans, writes the marker

    calls = []
    real = prod.truncate_rt_log

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(prod, "truncate_rt_log", counting)
    st.hybrid_serve(now_ts=200_500)  # no new flush: fileset unchanged
    assert calls == [], "retention re-scanned an unchanged RT fileset"
    p.put(3, {"v": 3.0}, ts=151_000)
    p.flush()
    st.hybrid_serve(now_ts=201_000)  # new file: scan again
    assert calls, "retention skipped the scan after a new flush"


def test_rt_retention_below_rewind_is_refused(spark, tmp_path):
    """Retention must keep at least the rewind window (a re-seed replays
    rewind from the RT log — StoreUtils.getExpectedRetentionTimeInMs
    floors retention at rewind + margin), must refuse rewind=0 (in this
    engine that means full-log replay: any truncation loses data), and
    honors a per-call rewind override — all refused at serve ENTRY,
    before any replay work."""
    from venice_spark.engine import VeniceSparkEngine

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store(
        "s",
        key_fields=["k"],
        hybrid=True,
        rewind_seconds=500,
        rt_retention_seconds=100,
    )
    eng.push("s", spark.createDataFrame([(9, 9.0)], "k long, v double"))
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=1_000)
    p.flush()
    with pytest.raises(ValueError, match="must be >= "):
        st.hybrid_serve(now_ts=200_000)

    # rewind=0 (full-log replay) with retention: refused
    eng2 = VeniceSparkEngine(spark, str(tmp_path / "root2"))
    eng2.create_store(
        "z", key_fields=["k"], hybrid=True, rt_retention_seconds=100
    )
    eng2.push("z", spark.createDataFrame([(9, 9.0)], "k long, v double"))
    with pytest.raises(ValueError, match="finite rewind"):
        eng2.store("z").hybrid_serve(now_ts=200_000)
    # a per-call override can SATISFY the contract too
    eng2.store("z").hybrid_serve(now_ts=200_000, rewind_seconds=100)


def test_truncate_rt_unlinks_url_encoded_paths(spark, tmp_path):
    """ADVICE r7 (low): input_file_name() returns a URL-encoded URI; a
    catalog root containing a space used to fail os.path.isfile after the
    bare 'file:' strip, so below-cutoff files silently survived retention
    forever. The decoded path must unlink."""
    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import read_rt_log

    eng = VeniceSparkEngine(spark, str(tmp_path / "cat root"))  # space -> %20
    eng.create_store("s", key_fields=["k"], hybrid=True)
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=10)
    p.flush()
    p.put(2, {"v": 2.0}, ts=200)
    p.flush()

    assert st.truncate_rt(before_ts=100) >= 1
    left = {r["k"] for r in read_rt_log(spark, eng.catalog, "s").collect()}
    assert left == {2}


def test_truncate_rt_respects_registered_consumer_checkpoint(spark, tmp_path):
    """ADVICE r8 (medium): the retention guard probed only the two
    built-in checkpoints, so a CDC reader with a caller-chosen checkpoint
    dir could lose unread RT files. A checkpoint registered via
    catalog.register_consumer_checkpoint (ChangeCaptureStream.start does
    it when given its store) now blocks truncation of its unread files;
    unregistering the dead consumer unblocks."""
    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import RtTruncateBlockedError, read_rt_log
    from venice_spark.streaming.cdc import ChangeCaptureStream

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store("s", key_fields=["k"], hybrid=True)
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=10)
    p.flush()

    rt_dir = eng.catalog.update_log_dir("s")
    ckpt = str(tmp_path / "cdc_ckpt")  # OUTSIDE the store dir: only the
    # registration makes it visible to the guard
    cdc = ChangeCaptureStream(
        spark, str(tmp_path / "snap"), str(tmp_path / "events"), ["k"], "v"
    )
    schema = read_rt_log(spark, eng.catalog, "s").schema
    stream = spark.readStream.schema(schema).parquet(rt_dir)
    cdc.start(stream, ckpt, catalog=eng.catalog, store="s").awaitTermination()
    roster = eng.catalog.consumer_checkpoints("s")
    assert roster and ckpt in roster.values(), "start() must auto-register"

    # consumer committed everything so far: truncation proceeds
    assert st.truncate_rt(before_ts=100) >= 1

    # a new below-cutoff file the CDC checkpoint has NOT committed blocks
    p.put(2, {"v": 2.0}, ts=20)
    p.flush()
    with pytest.raises(RtTruncateBlockedError, match="registered:"):
        st.truncate_rt(before_ts=100)
    left = {r["k"] for r in read_rt_log(spark, eng.catalog, "s").collect()}
    assert 2 in left, "refusal must not delete anything"

    # dead consumer: unregister drops the protection
    (name,) = list(roster)
    assert eng.catalog.unregister_consumer_checkpoint("s", name)
    assert st.truncate_rt(before_ts=100) >= 1


def test_truncate_rt_blocks_on_registered_checkpoint_with_no_dir_yet(
    spark, tmp_path
):
    """ADVICE r9 (low): between ChangeCaptureStream.start's registration
    and the stream's first checkpoint write, the registered checkpoint
    dir does not exist; treating that as 'consumer never existed' let
    truncate_rt delete the very files the just-registered consumer was
    meant to replay — a reopening of the ADVICE r8 gap the roster closed.
    A REGISTERED entry with a missing dir now means 'committed nothing
    yet' and blocks; the built-in probe names keep the skip."""
    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import RtTruncateBlockedError, read_rt_log

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store("s", key_fields=["k"], hybrid=True)
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=10)
    p.flush()

    # registration happened; the stream has not completed a batch yet
    eng.catalog.register_consumer_checkpoint(
        "s", str(tmp_path / "ckpt_not_yet_written"), name="cdc_reader"
    )
    with pytest.raises(RtTruncateBlockedError, match="registered:cdc_reader"):
        st.truncate_rt(before_ts=100)
    left = {r["k"] for r in read_rt_log(spark, eng.catalog, "s").collect()}
    assert left == {1}, "refusal must not delete anything"

    # force still overrides (operator escape hatch) ...
    # ... but first: unregistering restores normal truncation
    assert eng.catalog.unregister_consumer_checkpoint("s", "cdc_reader")
    assert st.truncate_rt(before_ts=100) >= 1


def test_truncate_rt_scans_in_store_dir_checkpoints(spark, tmp_path):
    """ADVICE r8 (medium), defensive half: an UNREGISTERED checkpoint
    placed inside the store dir (an `offsets` subdir is the Spark
    streaming-checkpoint signature) is also probed — a started-but-
    nothing-committed consumer conservatively blocks truncation."""
    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import RtTruncateBlockedError

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store("s", key_fields=["k"], hybrid=True)
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=10)
    p.flush()

    ckpt = os.path.join(eng.catalog.store_dir("s"), "_third_party_ckpt")
    os.makedirs(os.path.join(ckpt, "offsets"))
    with pytest.raises(RtTruncateBlockedError, match="_third_party_ckpt"):
        st.truncate_rt(before_ts=100)
    # force still overrides (dead-consumer escape hatch)
    assert st.truncate_rt(before_ts=100, force=True) >= 1


def test_checkpoint_committed_files_credits_compact_entries(tmp_path):
    """ADVICE r8 (low): Spark prunes per-batch delta files after writing
    <n>.compact, so when batch n itself is uncommitted, skipping the whole
    compact file reported files committed MANY batches ago as unread
    (spurious RtTruncateBlockedError until the next batch commits).
    Entries carry batchId: credit the ones at or below the max committed
    batch even while batch n is in flight."""
    import json as _json

    from venice_spark.producer import _checkpoint_committed_files

    ckpt = tmp_path / "ckpt"
    src = ckpt / "sources" / "0"
    commits = ckpt / "commits"
    src.mkdir(parents=True)
    commits.mkdir(parents=True)
    # batches 0..8 committed; 9.compact is the in-flight batch's rewrite
    for b in range(9):
        (commits / str(b)).write_text("{}")
    lines = ["v1"] + [
        _json.dumps(
            {"path": f"file:///data/f{b}.parquet", "timestamp": b, "batchId": b}
        )
        for b in range(10)
    ]
    (src / "9.compact").write_text("\n".join(lines))
    # plus a plain uncommitted delta: still NOT credited
    (src / "10").write_text(
        "v1\n"
        + _json.dumps(
            {"path": "file:///data/f10.parquet", "timestamp": 10, "batchId": 10}
        )
    )

    out = _checkpoint_committed_files(str(ckpt))
    got = {os.path.basename(p) for p in out}
    assert {f"f{b}.parquet" for b in range(9)} <= got, got
    assert "f9.parquet" not in got, "in-flight batch credited"
    assert "f10.parquet" not in got, "uncommitted delta credited"


def test_rt_retention_honors_rt_ts_unit(spark, tmp_path):
    """ADVICE r8 (low): the retention cutoff hard-assumed epoch-ms
    (retention*1000 + time.time()*1000 default) — a second-scaled ts
    column made every RT file look ancient and the whole log was deleted
    right after a serve. Store config rt_ts_unit='s' now scales BOTH the
    replay's rewind window and the retention cutoff; rt_ts_unit='raw'
    (non-epoch/logical ts) refuses retention at serve entry."""
    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import read_rt_log

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store(
        "s",
        key_fields=["k"],
        hybrid=True,
        rewind_seconds=100,
        rt_retention_seconds=100,
        rt_ts_unit="s",
    )
    eng.push("s", spark.createDataFrame([(9, 9.0)], "k long, v double"))
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=1_000)  # seconds; outside the rewind window
    p.flush()
    # the discriminating file: the old ms-fixed cutoff (200_000 - 100*1000
    # = 100_000) wrongly KEPT this out-of-window file forever; the
    # second-scaled cutoff (199_900) truncates it
    p.put(3, {"v": 3.0}, ts=150_000)
    p.flush()
    p.put(2, {"v": 2.0}, ts=199_950)  # inside
    p.flush()

    live = st.hybrid_serve(now_ts=200_000)  # cutoff = 200_000 - 100 (sec)
    left = {r["k"] for r in read_rt_log(spark, eng.catalog, "s").collect()}
    assert 1 not in left, "second-scaled retention did not truncate"
    assert 3 not in left, "ms-fixed cutoff kept an out-of-window file"
    assert 2 in left, "second-scaled retention deleted an in-window file"
    out = {r["k"]: r["v"] for r in live.read().collect()}
    assert out == {2: 2.0, 9: 9.0}, out

    # non-epoch ts domain: retention refused at serve entry
    eng.create_store(
        "z",
        key_fields=["k"],
        hybrid=True,
        rewind_seconds=100,
        rt_retention_seconds=100,
        rt_ts_unit="raw",
    )
    eng.push("z", spark.createDataFrame([(9, 9.0)], "k long, v double"))
    with pytest.raises(ValueError, match="epoch-based"):
        eng.store("z").hybrid_serve(now_ts=200_000)


def test_dead_job_staging_cannot_resurrect_unacked_rows(spark, tmp_path):
    """Code-review r9 (exposed by the real-SIGKILL test): a producer
    killed between a write-task commit and the job commit leaves its
    staged rows under the rt dir's shared `_temporary/<job>`, and
    FileOutputCommitter merges every committed task dir into the NEXT
    job's commit on that dir — silently publishing rows the dead producer
    never acked. All rt/serving writers hold the store lock, so any
    `_temporary` seen under the lock is a dead job's: flush clears it
    before writing, and `admin recover --clean-staging` clears it for
    operators."""
    import importlib.util

    from venice_spark.engine import VeniceSparkEngine
    from venice_spark.producer import read_rt_log

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store("s", key_fields=["k"], hybrid=True)
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=10)
    p.flush(schema="k long, op string, ts long, colo int, v double")

    # plant a dead job's committed task staging: a REAL parquet row the
    # committer would merge in (k=666 marks the never-acked ghost)
    rt_dir = eng.catalog.update_log_dir("s")
    task_dir = os.path.join(
        rt_dir, "_temporary", "0", "task_20990101000000_0001_m_000000"
    )
    os.makedirs(task_dir)
    spark.createDataFrame(
        [(666, "PUT", 99, 0, 6.66)], "k long, op string, ts long, colo int, v double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "ghost"))
    import glob as _glob
    import shutil as _shutil

    (ghost_file,) = _glob.glob(str(tmp_path / "ghost" / "part-*.parquet"))
    _shutil.copy(ghost_file, os.path.join(task_dir, os.path.basename(ghost_file)))

    # the next flush must NOT merge the ghost in
    p.put(2, {"v": 2.0}, ts=20)
    p.flush(schema="k long, op string, ts long, colo int, v double")
    keys = {r["k"] for r in read_rt_log(spark, eng.catalog, "s").collect()}
    assert 666 not in keys, "dead job's un-acked rows were resurrected"
    assert keys == {1, 2}, keys
    assert not os.path.isdir(os.path.join(rt_dir, "_temporary"))

    # operator path: recover --clean-staging clears a planted one too
    os.makedirs(task_dir)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _spec = importlib.util.spec_from_file_location(
        "admin_staging", os.path.join(repo, "tools", "admin.py")
    )
    admin = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(admin)
    assert admin.main([str(tmp_path / "root"), "recover", "s", "--clean-staging"]) == 0
    assert not os.path.isdir(os.path.join(rt_dir, "_temporary"))


def test_blocked_retention_writes_sig_marker_once_per_fileset(spark, tmp_path):
    """code-review r10: a blocked serve-path retention pass used to skip
    the `_rt_retention_sig` marker, so a persistently lagging (or
    registered-but-uncommitted) consumer forced the store-sized per-file
    ts scan — the exact job the marker exists to elide — plus a warning
    on EVERY serve. Blocked is a stable outcome of the unchanged
    fileset: the marker is now written, deferring the retry (and the
    deletion) to the pass after the next flush, the same deferral the
    clock-advance case already accepts."""
    import warnings as _w

    from venice_spark.engine import VeniceSparkEngine

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store(
        "s",
        key_fields=["k"],
        hybrid=True,
        rewind_seconds=100,
        rt_retention_seconds=500,
    )
    eng.push("s", spark.createDataFrame([(9, 9.0)], "k long, v double"))
    st = eng.store("s")
    p = st.producer()
    p.put(1, {"v": 1.0}, ts=1_000)
    p.flush()
    # a registered consumer that never commits: retention blocks
    eng.catalog.register_consumer_checkpoint(
        "s", str(tmp_path / "never_ckpt"), name="dead"
    )
    rt_dir = eng.catalog.update_log_dir("s")
    marker = os.path.join(rt_dir, "_rt_retention_sig")

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        st.hybrid_serve(now_ts=700_000)
    assert any("deferred" in str(r.message) for r in rec), [
        str(r.message) for r in rec
    ]
    assert os.path.exists(marker), "blocked pass must still write the marker"

    # unchanged fileset: the next serve neither warns nor rescans
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        st.hybrid_serve(now_ts=700_000)
    assert not any("deferred" in str(r.message) for r in rec), [
        str(r.message) for r in rec
    ]

    # nothing was deleted while blocked
    from venice_spark.producer import read_rt_log

    assert {r["k"] for r in read_rt_log(spark, eng.catalog, "s").collect()} == {1}
