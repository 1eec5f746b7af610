"""Stateful streaming latest-wins (applyInPandasWithState): per-key state,
out-of-order arrival, delete-wins-ties, tombstone blocks stale puts."""

import pytest
import os

import pyspark.sql.types as T

from venice_spark.streaming.stateful import latest_wins_stateful

VALUE = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("val", T.DoubleType(), True),
    ]
)
SRC = "key string, val double, ts long, op string"


def _run(spark, tmp_path, rows):
    rt_dir = str(tmp_path / "rt")
    out_dir = str(tmp_path / "out")
    os.makedirs(rt_dir)
    spark.createDataFrame(rows, schema=SRC).coalesce(1).write.mode("append").parquet(rt_dir)
    stream = spark.readStream.schema(SRC).parquet(rt_dir)
    resolved = latest_wins_stateful(stream, ["key"], VALUE)
    q = (
        resolved.writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination(120)
    return {r["key"]: (r["val"], r["ts"]) for r in spark.read.parquet(out_dir).collect()}


def test_stateful_latest_wins_out_of_order(spark, tmp_path):
    out = _run(
        spark,
        tmp_path,
        [
            ("a", 2.0, 20, "PUT"),
            ("a", 1.0, 10, "PUT"),   # stale, arrives later — ignored
            ("b", 3.0, 5, "PUT"),
            ("b", 4.0, 7, "PUT"),
        ],
    )
    assert out == {"a": (2.0, 20), "b": (4.0, 7)}


def test_stateful_delete_wins_ties_and_blocks_stale_puts(spark, tmp_path):
    out = _run(
        spark,
        tmp_path,
        [
            ("a", 1.0, 10, "PUT"),
            ("a", None, 20, "DELETE"),
            ("a", 9.0, 20, "PUT"),   # tie with tombstone -> delete wins
            ("b", 1.0, 10, "PUT"),
            ("b", None, 15, "DELETE"),
            ("b", 2.0, 12, "PUT"),   # older than tombstone -> stays deleted
            ("c", 5.0, 30, "PUT"),
        ],
    )
    # a and b end deleted: no output row with a live value
    assert out == {"c": (5.0, 30)}


def test_stateful_put_tie_is_arrival_order_independent(spark, tmp_path):
    """Two PUTs with equal ts resolve by the deterministic value-rank
    tiebreak (merge/dcr._rank: larger canonical JSON wins), not by arrival
    order — run both orders, same winner."""
    rows_ab = [("k", 1.0, 10, "PUT"), ("k", 2.0, 10, "PUT")]
    out1 = _run(spark, tmp_path / "o1", rows_ab)
    out2 = _run(spark, tmp_path / "o2", list(reversed(rows_ab)))
    assert out1 == out2 == {"k": (2.0, 10)}


def test_windowed_rollup_under_stream(spark, tmp_path):
    """The x_event_rollup aggregation shape under readStream + watermark:
    tumbling 1h windows, availableNow trigger, append after watermark close."""
    import datetime as dt

    src = str(tmp_path / "ev")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1, 10, 5)
    rows = [
        (t0, "click", 1.0),
        (t0 + dt.timedelta(minutes=10), "click", 2.0),
        (t0 + dt.timedelta(hours=1), "click", 5.0),
        (t0 + dt.timedelta(hours=3), "view", 1.0),  # advances watermark past earlier windows
    ]
    spark.createDataFrame(rows, "ts timestamp, event_type string, value double") \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(src)
    import pyspark.sql.functions as F
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    out_dir = str(tmp_path / "out")
    q = (
        agg.writeStream.foreachBatch(lambda b, _i: b.write.mode("append").parquet(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["w"]["start"].hour, r["event_type"]): (r["n"], r["total"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[(10, "click")] == (2, 3.0)
    assert got[(11, "click")] == (1, 5.0)


def test_dcr_stateful_cross_trigger(spark, tmp_path):
    """Full field-level DCR as a streaming operator: state (serialized
    RecordState) survives across triggers; result equals the batch kernel
    folding the same ops."""
    import pyspark.sql.types as T
    from venice_spark.merge.dcr import merge_ops
    from venice_spark.streaming.stateful import dcr_stateful

    SRC = (
        "key string, op string, ts long, colo int, val double, "
        "tags array<string>, add_tags array<string>, rem_tags array<string>"
    )
    VALUE = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("val", T.DoubleType(), True),
            T.StructField("tags", T.ArrayType(T.StringType()), True),
        ]
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    batch1 = [
        ("a", "PUT", 10, 0, 1.0, ["x"], None, None),
        ("a", "UPDATE", 12, 1, None, None, ["y"], None),
    ]
    batch2 = [
        ("a", "UPDATE", 11, 0, None, None, None, ["x"]),  # out-of-order remove
        ("a", "PUT", 9, 1, 99.0, ["stale"], None, None),  # stale put, ignored
    ]

    def run_once(rows, out_dir):
        spark.createDataFrame(rows, SRC).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(SRC).parquet(src)
        q = (
            dcr_stateful(stream, ["key"], VALUE, list_fields={"tags"})
            .writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, out + "1")
    run_once(batch2, out + "2")

    first = spark.read.parquet(out + "1").collect()[0]
    assert sorted(first["tags"]) == ["x", "y"]  # state after trigger 1
    last = spark.read.parquet(out + "2").collect()[0]
    ops = [
        {"op": "PUT", "ts": 10, "colo": 0, "value": {"val": 1.0, "tags": ["x"]}},
        {"op": "UPDATE", "ts": 12, "colo": 1, "update": {"add_tags": ["y"]}},
        {"op": "UPDATE", "ts": 11, "colo": 0, "update": {"rem_tags": ["x"]}},
        {"op": "PUT", "ts": 9, "colo": 1, "value": {"val": 99.0, "tags": ["stale"]}},
    ]
    expected = merge_ops(ops, list_fields={"tags"})
    assert last["val"] == expected["val"] == 1.0
    assert sorted(last["tags"]) == sorted(expected["tags"]) == ["y"]


# -------------------------------------------- r4 review regressions


def _run_batches(spark, tmp_path, batches, ttl=None):
    """Run latest_wins_stateful across several availableNow restarts,
    returning the per-batch emitted frames."""
    rt_dir = str(tmp_path / "rt2")
    out_dir = str(tmp_path / "out2")
    os.makedirs(rt_dir, exist_ok=True)
    emitted = []
    for rows in batches:
        spark.createDataFrame(rows, schema=SRC).coalesce(1).write.mode(
            "append"
        ).parquet(rt_dir)
        stream = spark.readStream.schema(SRC).parquet(rt_dir)
        resolved = latest_wins_stateful(
            stream, ["key"], VALUE, state_ttl_minutes=ttl
        )
        batch_rows = []
        q = (
            resolved.writeStream.foreachBatch(
                lambda b, _i: batch_rows.extend(b.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination(120)
        emitted.append(batch_rows)
    return emitted


def test_stateful_stale_replay_emits_nothing(spark, tmp_path):
    """code-review r4 (dcr twin of the same contract): a later batch of
    purely-stale ops must emit NO rows — re-emitting unchanged keys turns
    replays into spurious downstream writes."""
    emitted = _run_batches(
        spark,
        tmp_path,
        [
            [("a", 2.0, 20, "PUT")],
            [("a", 1.0, 10, "PUT")],  # stale: state unchanged
        ],
    )
    assert len(emitted[0]) == 1
    assert emitted[1] == []


@pytest.mark.slow
def test_stateful_ttl_parameter_runs(spark, tmp_path):
    """state_ttl_minutes plumbs through ProcessingTimeTimeout; within-run
    results are identical (expiry only affects idle keys much later)."""
    emitted = _run_batches(
        spark,
        tmp_path,
        [[("a", 2.0, 20, "PUT"), ("b", 1.0, 5, "PUT")]],
        ttl=60,
    )
    assert {r["key"] for r in emitted[0]} == {"a", "b"}


def test_batch_and_stateful_pick_same_tie_winner(spark, tmp_path):
    """code-review r4: resolve_latest (batch/foreachBatch path) and
    latest_wins_stateful (state path) must agree on equal-ts PUT/PUT
    ties — both use the larger-canonical-JSON value rule."""
    from venice_spark.merge.dcr import _rank
    from venice_spark.streaming.hybrid import resolve_latest

    rows = [("k", "aa", 10, "PUT"), ("k", "b", 10, "PUT")]
    batch = spark.createDataFrame(rows, SRC.replace("val double", "val string"))
    batch_winner = resolve_latest(batch, ["key"], "ts").collect()[0]["val"]
    expected = max(({"val": "aa"}, {"val": "b"}), key=_rank)["val"]
    assert batch_winner == expected == "b"

    val_schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("val", T.StringType(), True),
        ]
    )
    rt_dir = str(tmp_path / "rt3")
    spark.createDataFrame(rows, SRC.replace("val double", "val string")).coalesce(
        1
    ).write.mode("append").parquet(rt_dir)
    stream = spark.readStream.schema(SRC.replace("val double", "val string")).parquet(rt_dir)
    got = []
    q = (
        latest_wins_stateful(stream, ["key"], val_schema)
        .writeStream.foreachBatch(lambda b, _i: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination(120)
    assert [r["val"] for r in got] == [expected]
