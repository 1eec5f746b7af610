"""Windowed streaming rollup (streaming/windows.py): watermark semantics
pinned empirically —

- availableNow runs a final no-data micro-batch, so watermark-finalized
  windows ARE emitted before termination;
- a row older than the checkpointed watermark is dropped on replay
  (late-data policy, the bounded-state trade Venice's KV-only design never
  has to make — SURVEY §2.5);
- the same `windowed_rollup` plan over the same rows as a BATCH frame
  agrees with the streamed sink on every finalized window.
"""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from venice_spark.streaming.windows import run_rollup_to_sink, windowed_rollup

HOUR_NS = 3_600_000_000_000
SCHEMA = "ts long, event_type string, value double"


def _rows(*specs):
    return [(int(h * HOUR_NS), t, float(v)) for h, t, v in specs]


@pytest.fixture()
def dirs(tmp_path):
    base = str(tmp_path)
    return f"{base}/src", f"{base}/sink", f"{base}/ckpt"


def _run(spark, src, sink, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    roll = windowed_rollup(
        stream,
        "ts",
        ["event_type"],
        {"n": "count(*)", "total": "sum(value)"},
        "1 hour",
        watermark_delay="30 minutes",
    )
    q = run_rollup_to_sink(roll, ckpt, sink)
    q.awaitTermination(120)


def _sink_rows(spark, sink):
    return sorted(
        (str(r["window_start"]), r["event_type"], r["n"], r["total"])
        for r in spark.read.parquet(sink).collect()
    )


def test_stream_emits_finalized_windows_and_matches_batch(spark, dirs):
    src, sink, ckpt = dirs
    data = _rows((0.2, "a", 1), (0.5, "a", 2), (1.3, "b", 3), (2.1, "a", 4), (3.5, "a", 5))
    spark.createDataFrame(data, SCHEMA).write.mode("append").parquet(src)
    _run(spark, src, sink, ckpt)

    got = _sink_rows(spark, sink)
    # watermark = 3.5h - 30min = 3h -> windows ending <= 3h are final;
    # [3,4) (the 3.5h row) is still open and must NOT be in the sink
    assert got == [
        ("1970-01-01 00:00:00", "a", 2, 3.0),
        ("1970-01-01 01:00:00", "b", 1, 3.0),
        ("1970-01-01 02:00:00", "a", 1, 4.0),
    ]

    # batch plan over the same rows, restricted to the finalized windows,
    # must agree exactly (same plan, no watermark on the batch side)
    batch = windowed_rollup(
        spark.createDataFrame(data, SCHEMA),
        "ts",
        ["event_type"],
        {"n": "count(*)", "total": "sum(value)"},
        "1 hour",
    )
    final = batch.filter(F.col("window_end") <= F.lit("1970-01-01 03:00:00").cast("timestamp"))
    expect = sorted(
        (str(r["window_start"]), r["event_type"], r["n"], r["total"])
        for r in final.collect()
    )
    assert got == expect


def test_late_rows_dropped_and_windows_emitted_once(spark, dirs):
    src, sink, ckpt = dirs
    spark.createDataFrame(
        _rows((0.2, "a", 1), (0.5, "a", 2), (1.3, "b", 3), (2.1, "a", 4), (3.5, "a", 5)),
        SCHEMA,
    ).write.mode("append").parquet(src)
    _run(spark, src, sink, ckpt)

    # restart from the checkpoint with one LATE row (0.4h < watermark 3h)
    # and one advancing row (5.9h -> watermark 5.4h, finalizing [3,4))
    spark.createDataFrame(
        _rows((0.4, "a", 100), (5.9, "a", 6)), SCHEMA
    ).write.mode("append").parquet(src)
    _run(spark, src, sink, ckpt)

    got = _sink_rows(spark, sink)
    assert got == [
        # [0,1) exactly once, WITHOUT the late value-100 row
        ("1970-01-01 00:00:00", "a", 2, 3.0),
        ("1970-01-01 01:00:00", "b", 1, 3.0),
        ("1970-01-01 02:00:00", "a", 1, 4.0),
        # finalized by the second run's watermark advance
        ("1970-01-01 03:00:00", "a", 1, 5.0),
    ]


def test_sliding_window_batch(spark):
    df = spark.createDataFrame(_rows((0.2, "a", 1), (0.7, "a", 2)), SCHEMA)
    out = windowed_rollup(
        df, "ts", ["event_type"], {"n": "count(*)"},
        window_duration="1 hour", slide_duration="30 minutes",
    )
    rows = sorted((str(r["window_start"]), r["n"]) for r in out.collect())
    # 0.2h falls in windows [-0.5,0.5) and [0,1); 0.7h in [0,1) and [0.5,1.5)
    assert rows == [
        ("1969-12-31 23:30:00", 1),
        ("1970-01-01 00:00:00", 2),
        ("1970-01-01 00:30:00", 1),
    ]


def test_timestamp_column_passthrough(spark):
    # a real timestamp column skips the nanos conversion
    df = spark.createDataFrame(
        [("1970-01-01 00:10:00", "a")], "t string, event_type string"
    ).select(F.col("t").cast("timestamp").alias("t"), "event_type")
    out = windowed_rollup(df, "t", ["event_type"], {"n": "count(*)"}, "1 hour")
    r = out.collect()[0]
    assert str(r["window_start"]) == "1970-01-01 00:00:00" and r["n"] == 1


def _run_sessions(spark, src, sink, ckpt, gap="30 minutes"):
    from venice_spark.streaming.windows import session_rollup

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    roll = session_rollup(
        stream, "ts", ["event_type"], {"n": "count(*)"},
        gap_duration=gap, watermark_delay="30 minutes",
    )
    q = run_rollup_to_sink(roll, ckpt, sink)
    q.awaitTermination(120)


def test_session_windows_stream(spark, dirs):
    src, sink, ckpt = dirs
    # user "a": events at 0.0h and 0.2h (one session, gap 0.5h), then 2.0h
    # (new session); user "b": single event at 0.1h. Sentinel at 9h pushes
    # the watermark (8.5h) past every session end so all finalize.
    spark.createDataFrame(
        _rows((0.0, "a", 1), (0.2, "a", 1), (2.0, "a", 1), (0.1, "b", 1), (9.0, "z", 0)),
        SCHEMA,
    ).write.mode("append").parquet(src)
    _run_sessions(spark, src, sink, ckpt)
    got = sorted(
        (r["event_type"], str(r["session_start"]), str(r["session_end"]), r["n"])
        for r in spark.read.parquet(sink).collect()
    )
    assert got == [
        ("a", "1970-01-01 00:00:00", "1970-01-01 00:42:00", 2),  # 0.2h + 30min gap
        ("a", "1970-01-01 02:00:00", "1970-01-01 02:30:00", 1),
        ("b", "1970-01-01 00:06:00", "1970-01-01 00:36:00", 1),
        # the 9h sentinel's own session ends at 9:30 > watermark 8.5h,
        # so it correctly stays open and unemitted
    ]


def test_session_count_agrees_with_batch_sessionize(spark, dirs):
    """The streaming session_window and the batch lag-over-window
    sessionizer (sessions.sessionize) must agree on the NUMBER of sessions
    per key (their boundary conventions differ only at delta == gap
    exactly, which this data avoids)."""
    from venice_spark.sessions import sessionize
    from venice_spark.streaming.windows import session_rollup

    src, sink, ckpt = dirs
    specs = [
        (0.0, "a", 1), (0.1, "a", 1), (0.9, "a", 1),   # sessions: {0,0.1}, {0.9}
        (0.2, "b", 1), (0.3, "b", 1),                   # one session
        (9.0, "z", 0),                                  # watermark sentinel
    ]
    df = spark.createDataFrame(_rows(*specs), SCHEMA)
    df.write.mode("append").parquet(src)
    _run_sessions(spark, src, sink, ckpt)
    stream_sessions = (
        spark.read.parquet(sink).groupBy("event_type").count().collect()
    )
    got = {r["event_type"]: r["count"] for r in stream_sessions}

    gap_ns = 30 * 60 * 1_000_000_000
    batch = sessionize(df, "event_type", "ts", gap_ns)
    expect = {
        r["event_type"]: r["n"]
        for r in batch.groupBy("event_type")
        .agg(F.countDistinct("session_seq").alias("n"))
        .collect()
    }
    # the sentinel's own session is still open on the stream side; compare
    # the finalized keys (the batch run, having no watermark, sees them all)
    expect.pop("z")
    assert got == expect == {"a": 2, "b": 1}


@pytest.mark.slow
def test_rollup_into_store_serves_finalized_windows(spark, dirs, tmp_path):
    """End-to-end: event stream -> watermarked windowed rollup ->
    incremental push per micro-batch -> versioned store serves every
    finalized window exactly once; a later stream run appends the newly
    finalized windows to the same store."""
    from venice_spark import VeniceSparkEngine
    from venice_spark.streaming.windows import run_rollup_to_store

    src, _, ckpt = dirs
    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store("rollups", key_fields=["window_start", "event_type"])
    seed = spark.createDataFrame(
        [],
        "window_start timestamp, window_end timestamp, event_type string, "
        "n bigint, total double",
    )
    eng.push("rollups", seed, allow_duplicate_key=True)

    def _start():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        roll = windowed_rollup(
            stream, "ts", ["event_type"], {"n": "count(*)", "total": "sum(value)"},
            "1 hour", watermark_delay="30 minutes",
        )
        q = run_rollup_to_store(roll, eng, "rollups", ckpt)
        q.awaitTermination(120)

    spark.createDataFrame(
        _rows((0.2, "a", 1), (0.5, "a", 2), (1.3, "b", 3), (3.5, "a", 5)), SCHEMA
    ).write.mode("append").parquet(src)
    _start()
    served = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total"])
        for r in eng.catalog.read_current(spark, "rollups").collect()
    }
    assert served == {
        ("1970-01-01 00:00:00", "a"): (2, 3.0),
        ("1970-01-01 01:00:00", "b"): (1, 3.0),
    }

    # advance the stream; the [3,4) window finalizes and lands in the store
    spark.createDataFrame(_rows((5.9, "z", 0)), SCHEMA).write.mode("append").parquet(src)
    _start()
    served2 = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total"])
        for r in eng.catalog.read_current(spark, "rollups").collect()
    }
    assert served2 == {
        ("1970-01-01 00:00:00", "a"): (2, 3.0),
        ("1970-01-01 01:00:00", "b"): (1, 3.0),
        ("1970-01-01 03:00:00", "a"): (1, 5.0),
    }


def test_windowed_hll_distinct_count_stream(spark, dirs):
    """Sketch aggregates run inside the streaming rollup unchanged:
    approx_count_distinct per window (unique users/hour) matches the exact
    per-window distinct count on this small log — the bounded-state
    streaming edition of R16's HLL."""
    src, sink, ckpt = dirs
    schema = "ts long, user string, value double"
    rows = [
        (int(0.1 * HOUR_NS), "u1", 1.0),
        (int(0.2 * HOUR_NS), "u2", 1.0),
        (int(0.3 * HOUR_NS), "u1", 1.0),   # dup user in hour 0
        (int(1.2 * HOUR_NS), "u3", 1.0),
        (int(3.5 * HOUR_NS), "u1", 1.0),   # advances watermark past hours 0-1
    ]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    roll = windowed_rollup(
        stream, "ts", [], {"uniques": "approx_count_distinct(user)"},
        "1 hour", watermark_delay="30 minutes",
    )
    q = run_rollup_to_sink(roll, ckpt, sink)
    q.awaitTermination(120)
    got = {
        str(r["window_start"]): r["uniques"]
        for r in spark.read.parquet(sink).collect()
    }
    assert got["1970-01-01 00:00:00"] == 2
    assert got["1970-01-01 01:00:00"] == 1
