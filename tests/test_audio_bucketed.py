"""Tests for the real WAV audio codec path and bucketed co-located views."""

import math

import numpy as np
import pytest
import pyspark.sql.functions as F

from venice_spark import VeniceSparkEngine
from venice_spark import multimodal as MM
from venice_spark.push import BucketedViewDef, read_bucketed_view


# ---------------------------------------------------------------- audio


def _sine(freq=440.0, rate=8000, secs=1.0, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return amp * np.sin(2 * math.pi * freq * t)


def test_wav_round_trip():
    x = _sine()
    payload = MM.encode_wav(x, 8000)
    samples, rate = MM.decode_wav(payload)
    assert rate == 8000
    assert samples.shape == (8000, 1)
    assert np.abs(samples[:, 0] - x).max() < 1e-3  # 16-bit quantization


def test_wav_decode_stereo_and_8bit():
    x = np.stack([_sine(220), _sine(880)], axis=1)
    samples, rate = MM.decode_wav(MM.encode_wav(x, 8000))
    assert samples.shape == (8000, 2)
    # 8-bit unsigned path
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        pcm8 = (np.clip(_sine(), -1, 1) * 127 + 128).astype(np.uint8)
        w.writeframes(pcm8.tobytes())
    samples, rate = MM.decode_wav(buf.getvalue())
    assert samples.shape[1] == 1
    assert abs(float(np.sqrt((samples**2).mean())) - 0.5 / math.sqrt(2)) < 0.02


def test_audio_features_physics():
    # 440 Hz sine at amp 0.5: duration 1s, rms = amp/sqrt(2), zcr ≈ 2*freq,
    # spectral energy concentrated in the band containing 440 Hz
    x = _sine(440.0, 8000, 1.0, 0.5)
    feats = MM.audio_features(x[:, None], 8000, n_bands=8)
    duration, rms, peak, zcr = feats[:4]
    bands = feats[4:]
    assert duration == pytest.approx(1.0)
    assert rms == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert peak == pytest.approx(0.5, rel=1e-3)
    assert zcr == pytest.approx(2 * 440, rel=0.02)
    # Nyquist 4000 Hz over 8 bands -> 440 Hz lives in band 0 (0-500 Hz)
    assert bands[0] > 0.95
    assert sum(bands) == pytest.approx(1.0, abs=1e-6)


def test_extract_audio_features_distributed(spark):
    rows = [
        (1, bytearray(MM.encode_wav(_sine(440), 8000))),
        (2, bytearray(MM.encode_wav(_sine(1800), 8000))),
        (3, bytearray(b"not a wav at all")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r["features"] for r in MM.extract_audio_features(df).collect()}
    assert out[1] is not None and len(out[1]) == 12
    # 1800 Hz lives in band 3 (1500-2000 of 8 bands to 4000 Hz Nyquist)
    assert out[2][4 + 3] > 0.9
    # corrupt + null payloads give null features, never a task failure
    assert out[3] is None and out[4] is None


# ------------------------------------------------------- bucketed views


@pytest.fixture()
def bucketed_stores(spark, tmp_path):
    eng = VeniceSparkEngine(spark, str(tmp_path))
    bv = BucketedViewDef(name="bykey", n_buckets=4, key_fields=["k"])
    eng.create_store("facts", key_fields=["k"], partition_count=4)
    eng.create_store("dims", key_fields=["k"], partition_count=4)
    facts = spark.createDataFrame([(i, float(i * 2)) for i in range(200)], ["k", "v"])
    dims = spark.createDataFrame([(i, f"d{i}") for i in range(0, 200, 2)], ["k", "d"])
    eng.push("facts", facts, views=[bv])
    eng.push("dims", dims, views=[bv])
    return eng, bv


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_has_no_exchange(spark, bucketed_stores):
    eng, bv = bucketed_stores
    a = read_bucketed_view(spark, eng.catalog, "facts", bv)
    b = read_bucketed_view(spark, eng.catalog, "dims", bv)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "k")
        plan = _executed_plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_stores):
    eng, bv = bucketed_stores
    a = read_bucketed_view(spark, eng.catalog, "facts", bv)
    agg = a.groupBy("k").agg(F.sum("v").alias("s"))
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 200


def test_bucketed_view_reregisters_across_sessions(spark, bucketed_stores):
    eng, bv = bucketed_stores
    # simulate a fresh session: drop the catalog entries, keep the files
    for s in ("facts", "dims"):
        spark.sql(f"DROP TABLE IF EXISTS {bv.table_name(s, 1)}")
    a = read_bucketed_view(spark, eng.catalog, "facts", bv)
    b = read_bucketed_view(spark, eng.catalog, "dims", bv)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _executed_plan(a.join(b, "k"))
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_retirement_drops_bucketed_view_tables(spark, bucketed_stores):
    """ADVICE r3: retiring a version must drop its bucketed-view catalog
    tables (spark=...), and even without that, read_bucketed_view must
    verify the LOCATION exists instead of trusting a stale tableExists."""
    import pytest as _pt

    eng, bv = bucketed_stores
    facts2 = spark.createDataFrame([(i, float(i)) for i in range(50)], ["k", "v"])
    eng.push("facts", facts2, views=[bv])  # v2 becomes current
    tn1 = bv.table_name("facts", 1)
    assert spark.catalog.tableExists(tn1)

    # sparkless retirement: table entry survives, but the read fails loudly
    # (and cleans the stale entry) instead of serving a deleted LOCATION
    eng.catalog.retire_old_versions("facts", keep=1)
    assert spark.catalog.tableExists(tn1)
    with _pt.raises(ValueError, match="retired or never wrote"):
        read_bucketed_view(spark, eng.catalog, "facts", bv, version=1)
    assert not spark.catalog.tableExists(tn1)  # stale entry dropped

    # spark-aware retirement drops the catalog table with the data
    facts3 = spark.createDataFrame([(1, 1.0)], ["k", "v"])
    eng.push("facts", facts3, views=[bv])  # v3
    tn2 = bv.table_name("facts", 2)
    assert spark.catalog.tableExists(tn2)
    eng.catalog.retire_old_versions("facts", keep=1, spark=spark)
    assert not spark.catalog.tableExists(tn2)
    # the current version's view still reads fine
    assert read_bucketed_view(spark, eng.catalog, "facts", bv).count() == 1


def test_bucketed_view_matches_plain_read(spark, bucketed_stores):
    eng, bv = bucketed_stores
    a = read_bucketed_view(spark, eng.catalog, "facts", bv)
    plain = eng.store("facts").df().select("k", "v")
    assert a.select("k", "v").exceptAll(plain).count() == 0
    assert plain.exceptAll(a.select("k", "v")).count() == 0


def test_bucketed_view_writes_one_file_per_bucket(spark, bucketed_stores):
    import glob
    import os

    eng, bv = bucketed_stores
    d = bv.view_dir(eng.catalog, "facts", 1)
    files = [f for f in glob.glob(os.path.join(d, "*.parquet")) if os.path.getsize(f)]
    # pre-repartition aligns tasks with buckets: n_buckets files, not n_tasks × n_buckets
    assert len(files) == bv.n_buckets, files
