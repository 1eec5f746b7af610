"""Stream-stream attribution join: watermark-bounded state, batch/stream
parity with the oracle-checked batch range join."""

import pytest

from venice_spark.streaming.joins import attribution_join

HOUR_NS = 3_600 * 1_000_000_000
SCHEMA = "event_id long, ts long, user_id long, event_type string"


def _rows(*specs):
    return [(i, int(h * HOUR_NS), u, t) for i, h, u, t in specs]


@pytest.fixture()
def log(spark):
    # purchases at h=1 (u1) and h=2 (u2); views land in/out of the 1h window
    return spark.createDataFrame(
        _rows(
            (1, 1.0, 1, "purchase"),
            (2, 1.2, 1, "view"),    # inside u1 window
            (3, 1.9, 1, "view"),    # inside, near edge
            (4, 2.5, 1, "view"),    # outside u1 window
            (5, 2.0, 2, "purchase"),
            (6, 2.4, 2, "view"),    # inside u2 window
            (7, 2.2, 3, "view"),    # no purchase for u3
            (8, 0.5, 1, "view"),    # BEFORE the purchase -> excluded
        ),
        SCHEMA,
    )


def _expected():
    # (probe event_id, anchor event_id): purchase itself also matches (t == anchor t)
    return {(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)}


def test_attribution_join_batch(spark, log):
    probes = log
    anchors = log.filter("event_type = 'purchase'")
    out = attribution_join(probes, anchors, ["user_id"], "ts", "ts", 3600)
    got = {(r["event_id"], r["anchor_event_id"]) for r in out.collect()}
    assert got == _expected()


def test_attribution_join_stream_matches_batch(spark, log, tmp_path):
    src_p, src_a = f"{tmp_path}/p", f"{tmp_path}/a"
    sink, ckpt = f"{tmp_path}/sink", f"{tmp_path}/ckpt"
    log.write.parquet(src_p)
    log.filter("event_type = 'purchase'").write.parquet(src_a)

    probes = spark.readStream.schema(SCHEMA).parquet(src_p)
    anchors = spark.readStream.schema(SCHEMA).parquet(src_a)
    out = attribution_join(
        probes, anchors, ["user_id"], "ts", "ts", 3600, watermark_delay="30 minutes"
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["anchor_event_id"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == _expected()


def test_attribution_join_agrees_with_range_join_on_events(spark, sf_dir):
    """Batch parity against the oracle-checked bucketized range join on the
    real events table: identical (probe, anchor) pair sets."""
    import pyspark.sql.functions as F

    from venice_spark.operators.asof import range_join
    from venice_spark.plans.reference_queries import _t

    HOUR_US = 3_600 * 1_000_000
    ev = _t(spark, sf_dir, "events")
    probes = ev.select("event_id", "user_id", "ts")
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )

    att = attribution_join(probes, anchors, ["user_id"], "ts", "ts", 3600)
    got = {(r["event_id"], r["anchor_event_id"]) for r in att.collect()}

    evu = probes.withColumn("tus", F.expr("ts div 1000")).select(
        "event_id", "user_id", "tus"
    )
    iv = anchors.select(
        "user_id",
        F.col("event_id").alias("iv_id"),
        F.expr("ts div 1000").alias("s"),
        (F.expr("ts div 1000") + HOUR_US).alias("e"),
    )
    rj = range_join(evu, iv, ["user_id"], "tus", "s", "e", bucket_width=HOUR_US)
    expected = {(r["event_id"], r["iv_id"]) for r in rj.collect()}
    assert got == expected and len(got) > 0


def test_event_time_nanos_integer_division(spark):
    """code-review r4: `/ 1000` on bigint is DOUBLE division; modern nano
    timestamps exceed double's 53-bit mantissa so the microsecond value
    could be off by ±1, moving boundary events across windows."""
    from venice_spark.streaming.joins import _event_time

    # values chosen so double(ns)/1000 rounds to a DIFFERENT integer than
    # ns div 1000
    bad = []
    for base in (10**18, 1_700_000_000_000_000_000):
        for off in range(0, 4000, 7):
            n = base + off
            if int(float(n) / 1000.0) != n // 1000:
                bad.append(n)
            if len(bad) >= 5:
                break
        if len(bad) >= 5:
            break
    assert bad, "no adversarial values found (unexpected)"
    df = spark.createDataFrame([(i, n) for i, n in enumerate(bad)], "id long, ts long")
    out = _event_time(df, "ts", "_t")
    import pyspark.sql.functions as F

    got = {
        r["id"]: r["us"]
        for r in out.select("id", F.unix_micros(F.col("_t")).alias("us")).collect()
    }
    for i, n in enumerate(bad):
        assert got[i] == n // 1000, (n, got[i], n // 1000)
